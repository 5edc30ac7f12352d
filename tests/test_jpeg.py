"""Baseline JPEG codec (operators/jpeg.py) — round-trip tests in the
decode_png pattern, plus the Spark-operator dispatch path."""

from __future__ import annotations

import numpy as np
import pytest


def _codec():
    from clear_map_data_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    return decode_jpeg, encode_jpeg


def test_jpeg_flat_gray_roundtrip_exact():
    """A flat image quantizes to DC-only blocks, which decode EXACTLY —
    the codec's zero-error fixed point."""
    decode_jpeg, encode_jpeg = _codec()
    w, h = 24, 16
    flat = bytes([128]) * (w * h)
    got = decode_jpeg(encode_jpeg(w, h, 1, flat, quality=90))
    assert got == (w, h, 1, flat)


def test_jpeg_rgb_roundtrip_bounded_error():
    """Smooth gradients at quality 92: 4:4:4 and 4:2:0 must reproduce
    within tight quantization-error bounds; odd (non-multiple-of-8)
    dims crop correctly."""
    decode_jpeg, encode_jpeg = _codec()
    w, h = 41, 27
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = ((x * 4) % 256, (y * 6) % 256, ((x + y) * 3) % 256)
    for sub, bound in [("444", 6.0), ("420", 20.0)]:
        enc = encode_jpeg(w, h, 3, img.tobytes(), quality=92, subsampling=sub)
        gw, gh, gch, pix = decode_jpeg(enc)
        assert (gw, gh, gch) == (w, h, 3)
        dec = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3).astype(int)
        assert np.abs(dec - img.astype(int)).mean() < bound


def test_jpeg_restart_markers_roundtrip():
    """DRI + RSTn every N MCUs: 8-aligned constant blocks are DC-only,
    so the restart-segmented stream must decode EXACTLY — any realign
    or DC-predictor-reset bug corrupts everything after the first RST."""
    decode_jpeg, encode_jpeg = _codec()
    w, h = 48, 40
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (h // 8, w // 8), dtype=np.uint8)
    img = base.repeat(8, axis=0).repeat(8, axis=1)
    for ri in (1, 2, 5):
        enc = encode_jpeg(
            w, h, 1, img.tobytes(), quality=90, restart_interval=ri
        )
        gw, gh, gch, pix = decode_jpeg(enc)
        assert (gw, gh, gch) == (w, h, 1)
        assert pix == img.tobytes(), f"restart_interval={ri}"


def test_jpeg_doctored_sof2_rejected_and_arithmetic_still_raises():
    """(a) A baseline stream relabeled SOF2 carries a baseline SOS
    header (Ss=0, Se=63) that is invalid for a progressive DC scan —
    ValueError, not a mis-decode (stub fallback upstream).  (b) The
    arithmetic-coding seam still raises NotImplementedError."""
    decode_jpeg, encode_jpeg = _codec()
    enc = bytearray(encode_jpeg(8, 8, 1, bytes(64), quality=90))
    sof = enc.find(b"\xff\xc0")
    assert sof != -1
    enc[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive scan band"):
        decode_jpeg(bytes(enc))
    enc[sof + 1] = 0xC9  # arithmetic sequential
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(enc))


def test_jpeg_progressive_flat_gray_exact():
    """Progressive encode of a flat gray image decodes EXACTLY (flat
    blocks quantize to DC-only) — the mm_jpeg_decode fixture shape."""
    from clear_map_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    decode_jpeg, _ = _codec()
    w, h = 16, 8
    flat = bytes([77]) * (w * h)
    got = decode_jpeg(encode_jpeg_progressive(w, h, 1, flat, quality=90))
    assert got == (w, h, 1, flat)


def test_jpeg_progressive_matches_baseline_decode_exactly():
    """Progressive coding is a lossless reordering of the same
    quantized coefficients: for any image, decode(progressive stream)
    must be BYTE-IDENTICAL to decode(baseline stream) at the same
    quality/subsampling — full-noise content, odd dims, and 4:2:0 pad
    blocks included.  This pins every scan kind the script emits: DC
    first/refine (interleaved for color), split AC bands, EOB runs,
    ZRL-in-refinement, and buffered correction bits."""
    from clear_map_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    decode_jpeg, encode_jpeg = _codec()
    rng = np.random.RandomState(7)
    for w, h in [(8, 8), (17, 9), (32, 24), (64, 48)]:
        img = rng.randint(0, 256, size=(h, w), dtype=np.uint8).tobytes()
        for q in (50, 85, 95):
            assert (
                decode_jpeg(encode_jpeg(w, h, 1, img, quality=q))
                == decode_jpeg(encode_jpeg_progressive(w, h, 1, img, quality=q))
            ), ("gray", w, h, q)
    for sub in ("444", "420"):
        for w, h in [(16, 16), (24, 18), (19, 13), (33, 31)]:
            img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
            assert (
                decode_jpeg(
                    encode_jpeg(w, h, 3, img, quality=88, subsampling=sub)
                )
                == decode_jpeg(
                    encode_jpeg_progressive(
                        w, h, 3, img, quality=88, subsampling=sub
                    )
                )
            ), ("color", sub, w, h)
    # sparse image: long zero runs -> multi-block EOB runs + ZRL paths
    simg = np.zeros((64, 64), dtype=np.uint8)
    simg[5, 9] = 255
    simg[40, 33] = 200
    assert (
        decode_jpeg(encode_jpeg(64, 64, 1, simg.tobytes(), quality=95))
        == decode_jpeg(
            encode_jpeg_progressive(64, 64, 1, simg.tobytes(), quality=95)
        )
    )


def test_image_features_decodes_real_jpeg(spark):
    """Spark dispatch: a JPEG payload is magic-sniffed and decodes for
    real (flat image => exact pixels => deterministic checksum); a
    doctored progressive JPEG falls back to the stub instead of
    crashing the batch."""
    import zlib

    from clear_map_data_pipeline_spark.operators.jpeg import encode_jpeg
    from clear_map_data_pipeline_spark.operators.multimodal import (
        decode_stub,
        image_features,
    )

    w, h = 16, 8
    flat = bytes([77]) * (w * h)
    jpg = encode_jpeg(w, h, 1, flat, quality=90)
    prog = bytearray(jpg)
    prog[prog.find(b"\xff\xc0") + 1] = 0xC2
    prog = bytes(prog)
    df = spark.createDataFrame(
        [(1, jpg), (2, prog)], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in image_features(df).collect()}
    assert rows[1]["width"] == w and rows[1]["height"] == h
    assert rows[1]["checksum"] == zlib.adler32(flat)
    crc, sw, sh = decode_stub(prog)
    assert (rows[2]["checksum"], rows[2]["width"], rows[2]["height"]) == (
        crc,
        sw,
        sh,
    )


def test_image_resize_real_jpeg(spark):
    """Resize plumbing over a JPEG payload: decode -> nearest-neighbor
    on the true grid (exact on a flat image)."""
    from clear_map_data_pipeline_spark.operators.jpeg import encode_jpeg
    from clear_map_data_pipeline_spark.operators.multimodal import (
        image_resize,
    )

    w, h = 16, 16
    flat = bytes([200]) * (w * h)
    jpg = encode_jpeg(w, h, 1, flat, quality=90)
    df = spark.createDataFrame([(1, jpg)], "doc_id long, payload binary")
    (row,) = image_resize(df, out_w=4, out_h=4).collect()
    assert bytes(row["pixels"]) == bytes([200]) * 16


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    ch=st.sampled_from([1, 3]),
    quality=st.integers(70, 100),
    sub=st.sampled_from(["444", "420"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_property(w, h, ch, quality, sub, seed):
    """Any dims (incl. 1xN edge strips), channels, quality 70-100, and
    subsampling: encode->decode preserves dims/channels exactly, is
    deterministic, and reproduces smooth content within a
    quality-scaled error bound."""
    decode_jpeg, encode_jpeg = _codec()
    rng = np.random.default_rng(seed)
    # smooth field: random low-frequency gradient (quantization error
    # bounds only hold for content without full-spectrum noise)
    gx = rng.integers(0, 5, size=ch)
    gy = rng.integers(0, 5, size=ch)
    base = rng.integers(40, 200, size=ch)
    img = np.zeros((h, w, ch), dtype=np.uint8)
    for c in range(ch):
        yy, xx = np.mgrid[0:h, 0:w]
        img[:, :, c] = (base[c] + gx[c] * xx + gy[c] * yy) % 256
    enc = encode_jpeg(
        w, h, ch, img.tobytes(), quality=quality, subsampling=sub
    )
    assert decode_jpeg(enc) == decode_jpeg(enc)  # deterministic
    gw, gh, gch, pix = decode_jpeg(enc)
    assert (gw, gh, gch) == (w, h, ch)
    dec = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, ch).astype(int)
    err = np.abs(dec - img.astype(int))
    # modulo wraparound creates one sharp edge per channel; exclude the
    # wrap rows/cols from the smoothness bound by bounding the MEDIAN
    assert np.median(err) <= 14.0, (np.median(err), err.max())


def test_jpeg_fill_bytes_and_corrupt_payloads(spark):
    """(a) T.81-legal 0xFF fill padding before a marker must parse;
    (b) corrupt/truncated JPEG payloads fall back to the stub in the
    Spark operators instead of aborting the batch (r04 review
    findings)."""
    from clear_map_data_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from clear_map_data_pipeline_spark.operators.multimodal import (
        decode_stub,
        image_features,
    )

    w, h = 16, 8
    flat = bytes([90]) * (w * h)
    clean = encode_jpeg(w, h, 1, flat, quality=90)
    # inject two fill bytes before the SOF marker
    sof = clean.find(b"\xff\xc0")
    padded = clean[:sof] + b"\xff\xff" + clean[sof:]
    assert decode_jpeg(padded) == (w, h, 1, flat)

    garbage = b"\xff\xd8\xff" + b"\x00" * 40           # nothing parseable
    truncated = clean[: len(clean) // 2]                # mid-entropy cut
    df = spark.createDataFrame(
        [(1, clean), (2, garbage), (3, truncated)],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in image_features(df).collect()}
    assert rows[1]["width"] == w
    for bad, payload in [(2, garbage), (3, truncated)]:
        crc, sw, sh = decode_stub(payload)
        assert (rows[bad]["checksum"], rows[bad]["width"], rows[bad]["height"]) == (crc, sw, sh)


def test_jpeg_undefined_table_id_keyerror_falls_back_to_stub(spark):
    """A structurally-valid JPEG whose SOS references Huffman/quant
    table ids that were never defined raises KeyError inside
    decode_jpeg — the batch-level dispatch must stub-fall-back, not
    abort the whole Spark batch (r04 advice: KeyError was missing from
    the except tuples)."""
    import pytest

    from clear_map_data_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from clear_map_data_pipeline_spark.operators.multimodal import (
        decode_stub,
        image_features,
    )

    enc = bytearray(encode_jpeg(8, 8, 1, bytes([50]) * 64, quality=90))
    sos = enc.find(b"\xff\xda")
    assert sos != -1 and enc[sos + 4] == 1  # Ns=1, grayscale
    enc[sos + 6] = 0x33  # Td=3/Ta=3: never defined by the encoder
    bad = bytes(enc)
    with pytest.raises(KeyError):
        decode_jpeg(bad)

    df = spark.createDataFrame([(1, bad)], "doc_id long, payload binary")
    (row,) = image_features(df).collect()
    crc, sw, sh = decode_stub(bad)
    assert (row["checksum"], row["width"], row["height"]) == (crc, sw, sh)
    # and the forced-real path surfaces the error instead of hiding it
    with pytest.raises(Exception):
        image_features(df, use_real_decoder=True).collect()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    ch=st.sampled_from([1, 3]),
    quality=st.integers(70, 100),
    sub=st.sampled_from(["444", "420"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_progressive_parity_property(w, h, ch, quality, sub, seed):
    """Property form of the lossless-reordering invariant: for ANY
    dims/channels/quality/subsampling and full-spectrum noise content,
    the progressive stream decodes byte-identical to the baseline
    stream (both carry the same quantized coefficients)."""
    from clear_map_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    decode_jpeg, encode_jpeg = _codec()
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8).tobytes()
    assert decode_jpeg(
        encode_jpeg(w, h, ch, img, quality=quality, subsampling=sub)
    ) == decode_jpeg(
        encode_jpeg_progressive(
            w, h, ch, img, quality=quality, subsampling=sub
        )
    )


def test_image_features_decodes_progressive_jpeg(spark):
    """Spark dispatch: a progressive (SOF2) payload is magic-sniffed
    and decodes for REAL — same checksum as the baseline encoding of
    the same pixels (closes the r04 'second-most-common web format'
    seam: progressive no longer stub-falls-back)."""
    import zlib

    from clear_map_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )
    from clear_map_data_pipeline_spark.operators.multimodal import (
        image_features,
    )

    w, h = 16, 8
    flat = bytes([93]) * (w * h)
    prog = encode_jpeg_progressive(w, h, 1, flat, quality=90)
    df = spark.createDataFrame([(1, prog)], "doc_id long, payload binary")
    (row,) = image_features(df, use_real_decoder=True).collect()
    assert (row["width"], row["height"]) == (w, h)
    assert row["checksum"] == zlib.adler32(flat)
