"""Lossless JPEG (ITU T.81 Annex H, SOF3) — predictor + Huffman
residual coding, stdlib + numpy only.

The third real-world JPEG family member (after sequential and
progressive): DNG/raw and medical (DICOM) corpora carry SOF3 streams.
Each sample is predicted from its reconstructed neighbours by one of
the seven Annex-H predictors (selected per scan via Ss) and the
residual is coded exactly like a DC difference: an SSSS magnitude
category symbol + that many extension bits.  Decoding reverses the
prediction loop sample-by-sample — bit-exact, no DCT, no quantization,
so ``decode(encode(img)) == img`` EXACTLY, which is the test invariant
(true round-trip equality, strictly stronger than the coefficient
identity the lossy modes pin).

Scope: 8-bit precision, point transform Pt=0, all seven predictors,
single-component or equal-sampling interleaved multi-component scans,
restart intervals.  Hierarchical pyramids build on this module's
differential mode (``operators/jpeg_hier.py``); arithmetic-coded
lossless (SOF11) stays at the documented stub seam.

Reference parity note: the reference pipeline (il_analysis_git.py) has
no media operators — beyond-reference extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    _BitReader,
    _BitWriter,
    _build_huffman,
    _extend,
)

# Residual categories are coded with the Annex-K typical DC table:
# 8-bit lossless residuals span categories 0..10, inside its 0..11
# range, and its short codes for small categories are what make
# prediction pay off on smooth content (a flat table would pin every
# sample at >= 5 bits).
LOSSLESS_BITS = DC_LUMA_BITS
LOSSLESS_VALS = DC_LUMA_VALS


def _predict(ra: int, rb: int, rc: int, sel: int) -> int:
    """T.81 Table H.1 predictors 1..7 on reconstructed neighbours."""
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"invalid lossless predictor {sel}")


def _predictor_at(p, idx, base, x, y, w, sel, default):
    """Prediction per T.81 H.1.1 with restart-interval reset: a restart
    behaves exactly like the start of a scan in LOCAL geometry —
    ``local = idx - base`` — so no prediction ever references a sample
    decoded before the interval began.  First sample of the interval:
    the default 2^(P-Pt-1); remainder of the interval's first line:
    the 1-D Ra predictor; later lines: Rb at line starts, the selected
    predictor elsewhere (their Rb/Rc neighbours are one full line into
    the interval, hence post-restart).  For a mid-row restart whose
    first "line" wraps, the x == 0 corner has no in-interval
    neighbour and falls back to the default (real encoders restart on
    row boundaries, where this never fires)."""
    local = idx - base
    if local == 0:
        return default
    if local < w:  # first line of the interval: 1-D predictor
        return int(p[y, x - 1]) if x > 0 else default
    if x == 0:
        return int(p[y - 1, 0])
    if local == w:
        # the 2-D predictors' Rc neighbour (idx - w - 1) is the sample
        # just BEFORE the interval began — fall back to Ra so no
        # prediction ever crosses the restart boundary (only reachable
        # for non-row-aligned DRI; row-aligned restarts have x == 0
        # here and take the Rb branch above)
        return int(p[y, x - 1])
    return _predict(
        int(p[y, x - 1]), int(p[y - 1, x]), int(p[y - 1, x - 1]), sel
    )


def lossless_planes(
    data, pos, frame, scan, huff, pred_sel, restart, differential=False
):
    """Core lossless scan decode to per-component int planes.

    ``differential=True`` is the hierarchical-mode variant (T.81
    H.1.1 for differential frames): the prediction is ZERO everywhere
    and the decoded values are the signed difference samples
    themselves (no 16-bit wrap — the hierarchical combiner applies
    it after adding the reference).  Returns (planes, end_pos) where
    end_pos is the byte offset where the entropy segment stopped (at
    or before the next marker)."""
    w, h, comps = frame
    if any(c[1] != 1 or c[2] != 1 for c in comps):
        raise ValueError("lossless JPEG requires equal sampling factors")
    if not differential and not 1 <= pred_sel <= 7:
        raise ValueError(f"invalid lossless predictor {pred_sel}")
    ncomp = len(comps)
    planes = [np.zeros((h, w), dtype=np.int64) for _ in comps]
    tabs = [huff[(0, scan[c[0]][0])] for c in comps]
    rd = _BitReader(data, pos)
    default = 128  # 2^(P - Pt - 1) for 8-bit, Pt=0
    n_samples = w * h
    ri = restart
    base = 0  # first sample index of the current restart interval
    for idx in range(n_samples):
        y, x = divmod(idx, w)
        if ri and idx and idx % ri == 0:
            rd.align_to_restart()
            base = idx
        for ci in range(ncomp):
            p = planes[ci]
            if differential:
                pr = 0
            else:
                pr = _predictor_at(p, idx, base, x, y, w, pred_sel, default)
            t = rd.decode_huffman(tabs[ci])
            if t == 16:  # special: diff = 32768, no extension bits
                diff = 32768
            elif t > 16:  # only a corrupt DHT can produce this
                raise ValueError("corrupt lossless JPEG residual category")
            else:
                diff = _extend(rd.read_bits(t), t) if t else 0
            p[y, x] = pr + diff if differential else (pr + diff) & 0xFFFF
    return planes, rd.pos


def decode_scan_lossless(data, pos, frame, scan, huff, pred_sel, restart):
    """Decode one lossless scan covering all frame components
    (equal sampling factors, interleaved sample-per-MCU order).
    Returns (w, h, ch, pixels) in the decode_jpeg contract."""
    w, h, comps = frame
    planes, _end = lossless_planes(
        data, pos, frame, scan, huff, pred_sel, restart
    )
    ncomp = len(comps)
    out = np.stack(
        [np.clip(p, 0, 255).astype(np.uint8) for p in planes], axis=-1
    )
    if ncomp == 1:
        return w, h, 1, out[:, :, 0].tobytes()
    return w, h, ncomp, out.tobytes()


def residual_magnitude(v: int) -> tuple[int, int]:
    """SSSS category + extension-bit code for one signed residual —
    shared by the SOF3 encoder and the hierarchical frame emitter."""
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def write_residual(bw, enc_tab: dict, diff: int) -> None:
    """Emit one Huffman-coded residual (category symbol + extension
    bits) — the ONE copy of the entropy write shared by
    ``encode_jpeg_lossless`` and the hierarchical frame emitter."""
    t, code = residual_magnitude(diff)
    ln, c = enc_tab[t]
    bw.write(c, ln)
    if t:
        bw.write(code, t)


def encode_jpeg_lossless(
    w: int,
    h: int,
    ch: int,
    pixels: bytes,
    predictor: int = 4,
    restart_interval: int = 0,
) -> bytes:
    """Lossless JPEG encoder (SOF3): true round-trip companion —
    ``decode_jpeg(encode_jpeg_lossless(...))`` reproduces the input
    byte-for-byte.  ``predictor`` selects the Annex-H predictor (1..7)
    carried in the scan header's Ss field."""
    if len(pixels) != w * h * ch:
        raise ValueError("pixel buffer does not match dimensions")
    if ch not in (1, 3):
        raise ValueError("encode_jpeg_lossless supports 1 or 3 channels")
    if not 1 <= predictor <= 7:
        raise ValueError(f"invalid lossless predictor {predictor}")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, ch).astype(
        np.int64
    )

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(
            b"\xff" + bytes([marker]) + struct.pack(">H", len(body) + 2) + body
        )

    sof = struct.pack(">BHHB", 8, h, w, ch)
    for ci in range(ch):
        sof += bytes([ci + 1, 0x11, 0])  # h=v=1; Tq unused in lossless
    seg(0xC3, sof)
    seg(0xC4, bytes([0x00]) + bytes(LOSSLESS_BITS) + bytes(LOSSLESS_VALS))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ch])
    for ci in range(ch):
        sos += bytes([ci + 1, 0x00])  # DC table 0 for every component
    sos += bytes([predictor, 0, 0])  # Ss = predictor, Se = 0, Ah/Al = 0
    seg(0xDA, sos)

    enc_tab = {
        v: (ln, c)
        for (ln, c), v in _build_huffman(
            LOSSLESS_BITS, LOSSLESS_VALS
        ).items()
    }
    bw = _BitWriter()
    default = 128
    ri = restart_interval
    n_samples = w * h
    base = 0
    for idx in range(n_samples):
        y, x = divmod(idx, w)
        if ri and idx and idx % ri == 0:
            bw.flush()
            out.extend(bw.out)
            bw = _BitWriter()
            out.extend(b"\xff" + bytes([0xD0 + (idx // ri - 1) % 8]))
            base = idx
        for ci in range(ch):
            p = img[:, :, ci]
            pr = _predictor_at(p, idx, base, x, y, w, predictor, default)
            write_residual(bw, enc_tab, int(p[y, x]) - pr)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
