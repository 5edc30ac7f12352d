"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema, partition sizing, UDF signatures,
batch shapes — is real and tested.  The actual media decode is STUBBED
(no PIL/ffmpeg/torchaudio in this container): ``decode_stub`` derives
deterministic pseudo-features from the bytes, and ``decode_real`` raises
NotImplementedError at the exact seam where a real decoder plugs in.

Scale notes:
- payloads stay in executor memory one Arrow batch at a time; tune
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (and parquet row
  group size) so batch_bytes ~ batch_rows x avg_payload fits the
  executor — for multi-MB media, hundreds of rows per batch, not 10k;
- feature extraction is embarrassingly parallel: no shuffle, output is
  narrow (features only), so the wide binary column is dropped as early
  as possible (column pruning keeps it out of downstream exchanges);
- frame sampling EXPANDS rows (one per frame): emit frames from the
  iterator incrementally — never materialize a whole video's frames in
  one pandas DataFrame.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum long, width int, height int"
)


def attach_binary_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic fake media column: utf-8 bytes of the text play the
    role of an encoded image, plus typed metadata (mime, size).  In a
    real pipeline this column comes straight from the lakehouse."""
    # NB: no spread_small_scan here — fanning a small fixture out to N
    # Python workers costs more (worker startup + Arrow shuffle) than
    # the single-batch decode saves; real media inputs arrive in many
    # splits and parallelize naturally.
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_real(payload: bytes):
    """The real-decoder seam: PIL.Image.open(io.BytesIO(payload)) etc.
    Media libraries are not in this container."""
    raise NotImplementedError(
        "real image decode requires PIL/ffmpeg; plug in here"
    )


def decode_stub(payload: bytes) -> tuple[int, int, int]:
    """Deterministic pseudo-decode: (checksum, width, height) derived
    from the bytes — stable stand-in keeping the plumbing testable."""
    crc = zlib.adler32(payload)
    return crc, 16 + crc % 64, 16 + (crc >> 8) % 64


def image_features(
    df: DataFrame, id_col: str = "doc_id", use_real_decoder: bool = False
) -> DataFrame:
    """Batch feature extraction over the binary column via mapInPandas.
    Output is narrow — the payload column never survives the operator."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = decode_real if use_real_decoder else decode_stub
        for pdf in it:
            feats = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "checksum": [f[0] for f in feats],
                    "width": [f[1] for f in feats],
                    "height": [f[2] for f in feats],
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        _batches, schema=IMAGE_FEATURE_SCHEMA
    )


RESIZE_SCHEMA = "doc_id long, width int, height int, pixels binary"


def image_resize(
    df: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    id_col: str = "doc_id",
    use_real_decoder: bool = False,
) -> DataFrame:
    """Resize plumbing: decode -> resample -> re-encode over the binary
    column, one Arrow batch at a time.  The stub "resamples" by strided
    byte subsampling to exactly out_w*out_h bytes (deterministic); the
    real seam is PIL ``Image.resize`` at ``decode_real``.  Output is
    fixed-size small payloads — the wide input column dies here."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = out_w * out_h
        for pdf in it:
            if use_real_decoder:
                decode_real(b"")
            pixels = []
            for p in pdf["payload"]:
                stride = max(len(p) // n_out, 1)
                pixels.append(bytes(p[::stride][:n_out]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "width": out_w,
                    "height": out_h,
                    "pixels": pixels,
                }
            )

    return df.select(id_col, "payload").mapInPandas(_batches, schema=RESIZE_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, n_samples long, duration_s double, mean_amp double, peak_amp int"
)


def audio_features(
    df: DataFrame, sample_rate: int = 16000, id_col: str = "doc_id"
) -> DataFrame:
    """Audio feature extraction: the payload is interpreted as unsigned
    8-bit PCM (the stub stand-in for a torchaudio/ffmpeg decode) and
    reduced to duration + amplitude stats with vectorized numpy per
    batch.  Same scale shape as image_features: map-side only, narrow
    output, payload pruned immediately after."""
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ns, dur, mean, peak = [], [], [], []
            for p in pdf["payload"]:
                arr = np.frombuffer(p, dtype=np.uint8)
                n = len(arr)
                ns.append(n)
                dur.append(round(n / sample_rate, 6))
                mean.append(round(float(arr.mean()) if n else 0.0, 4))
                peak.append(int(arr.max()) if n else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_samples": ns,
                    "duration_s": dur,
                    "mean_amp": mean,
                    "peak_amp": peak,
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        _batches, schema=AUDIO_FEATURE_SCHEMA
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary"


def frame_sample(
    df: DataFrame, n_frames: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Frame sampling for video-like payloads: emit ``n_frames`` evenly
    spaced byte-slices per payload (a real impl samples decoded frames).
    Row-expanding mapInPandas — frames stream out batch by batch."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, blobs = [], [], []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                step = max(len(p) // n_frames, 1)
                for k in range(n_frames):
                    ids.append(i)
                    idxs.append(k)
                    blobs.append(bytes(p[k * step : k * step + step]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": blobs}
            )

    return df.select(id_col, "payload").mapInPandas(_batches, schema=FRAME_SCHEMA)
