"""FLAC codec (operators/flac.py) — round-trip + hand-built-stream
tests in the test_jpeg/test_webp pattern, plus the Spark dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from clear_map_data_pipeline_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _utf8_number,
    decode_flac,
    encode_flac,
)


def test_flac_roundtrip_mono_and_stereo_all_paths():
    """FLAC is lossless: encode -> decode must be sample-exact across
    verbatim and fixed-order-2+Rice subframes, 8/16-bit, multi-block
    streams, and all three stereo layouts (independent, left/side,
    mid/side — each a distinct decorrelation decode path)."""
    rng = np.random.RandomState(4)
    noise = [int(x) for x in rng.randint(-32768, 32768, 5000)]
    smooth = [int(2000 * np.sin(i / 30)) for i in range(5000)]
    for sub in ("verbatim", "fixed"):
        for sig in (noise, smooth):
            enc = encode_flac(1, 16000, 16, sig, blocksize=1024, subframe=sub)
            assert decode_flac(enc) == (1, 16000, 16, sig), sub
    small = [int(x) for x in rng.randint(-128, 128, 777)]
    assert decode_flac(encode_flac(1, 8000, 8, small, blocksize=256)) == (
        1, 8000, 8, small,
    )
    st = []
    for i in range(3000):
        left = int(3000 * np.sin(i / 25))
        st += [left, left + int(rng.randint(-100, 100))]
    for mode in ("independent", "left_side", "mid_side"):
        for sub in ("verbatim", "fixed"):
            enc = encode_flac(
                2, 48000, 16, st, blocksize=512, stereo=mode, subframe=sub
            )
            assert decode_flac(enc) == (2, 48000, 16, st), (mode, sub)
    # degenerate sizes
    assert decode_flac(encode_flac(1, 16000, 16, [5]))[3] == [5]
    assert decode_flac(encode_flac(2, 16000, 16, [1, -1, 2, -2]))[3] == [
        1, -1, 2, -2,
    ]


def _stream_head(bw: _BitWriter, rate, n_ch, bps, total, blocksize):
    """STREAMINFO + a frame header, written field-by-field."""
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    body = si.out + bytes(16)
    out.append(0x80)
    out += len(body).to_bytes(3, "big")
    out += body
    hdr = _BitWriter()
    hdr.write(0x3FFE, 14)
    hdr.write(0, 1)
    hdr.write(0, 1)
    hdr.write(7, 4)  # explicit 16-bit blocksize
    hdr.write(0, 4)
    hdr.write(n_ch - 1, 4)
    hdr.write({8: 1, 16: 4}[bps], 3)
    hdr.write(0, 1)
    hb = bytearray(hdr.out) + _utf8_number(0) + (blocksize - 1).to_bytes(2, "big")
    hb.append(_crc8(bytes(hb)))
    bw.out = bytearray(hb)
    return out


def test_flac_hand_built_lpc_rice2_escape_partitions():
    """A stream assembled field-by-field from the spec — NOT by our
    encoder — exercising decode-only paths: an LPC order-1 subframe
    (precision 4, shift 2, coefficient 3), the 5-bit Rice2 residual
    method, partition order 1, and a raw-escape partition."""
    n, bps = 8, 16
    coef, shift = 3, 2
    warmup = 1000
    res = [5, -3, 0, 7, -2, 100, -100]  # 7 residuals after 1 warmup
    bw = _BitWriter()
    head = _stream_head(bw, 16000, 1, bps, n, n)
    bw.write(0, 1)  # subframe pad
    bw.write(0b100000, 6)  # LPC order 1 (= 32 + order-1)
    bw.write(0, 1)  # no wasted bits
    bw.write(warmup, bps)
    bw.write(4 - 1, 4)  # precision 4
    bw.write(shift, 5)
    bw.write(coef, 4)
    bw.write(1, 2)  # Rice2 (5-bit params)
    bw.write(1, 4)  # partition order 1: 2 partitions (3 + 4 samples)
    bw.write(2, 5)  # partition 1: rice param 2
    for v in res[:3]:
        z = (v << 1) if v >= 0 else ((-v) << 1) - 1
        bw.unary(z >> 2)
        bw.write(z & 3, 2)
    bw.write(31, 5)  # partition 2: escape
    bw.write(16, 5)  # raw bits
    for v in res[3:]:
        bw.write(v, 16)
    bw.align()
    bw.write(0, 16)  # frame CRC (not verified by decode_flac)
    data = bytes(head) + bytes(bw.out)

    want = [warmup]
    for r in res:
        want.append(r + ((coef * want[-1]) >> shift))
    assert decode_flac(data) == (1, 16000, bps, want)


def test_flac_hand_built_constant_and_wasted_bits():
    """Constant subframe + wasted-bits path: a constant value coded at
    bps-2 with 2 wasted bits reconstructs value << 2."""
    n, bps = 6, 16
    bw = _BitWriter()
    head = _stream_head(bw, 8000, 1, bps, n, n)
    bw.write(0, 1)
    bw.write(0, 6)  # constant
    bw.write(1, 1)  # wasted-bits flag
    bw.unary(1)  # k=1 -> wasted = 2
    bw.write(-321, bps - 2)
    bw.align()
    bw.write(0, 16)
    data = bytes(head) + bytes(bw.out)
    assert decode_flac(data) == (1, 8000, bps, [-321 << 2] * n)


def test_flac_corrupt_streams_raise_value_error():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"junkjunk")
    good = encode_flac(1, 16000, 16, [1, 2, 3, 4])
    with pytest.raises(ValueError):
        decode_flac(good[:20])  # truncated inside STREAMINFO/frame


def test_audio_features_decodes_real_flac(spark):
    """Spark dispatch: a FLAC payload is magic-sniffed and decodes for
    REAL — true duration from the stream's own rate, exact peak/mean
    over the decoded PCM (lossless)."""
    from clear_map_data_pipeline_spark.operators.multimodal import (
        audio_features,
    )

    rng = np.random.RandomState(8)
    samples = [int(x) for x in rng.randint(-1000, 1000, 3200)]
    flac = encode_flac(1, 16000, 16, samples, blocksize=1024)
    df = spark.createDataFrame([(1, flac)], "doc_id long, payload binary")
    (row,) = audio_features(df).collect()
    arr = np.abs(np.asarray(samples))
    assert row["n_samples"] == 3200
    assert row["duration_s"] == round(3200 / 16000, 6)
    assert row["peak_amp"] == int(arr.max())
    assert row["mean_amp"] == round(float(arr.mean()), 4)
