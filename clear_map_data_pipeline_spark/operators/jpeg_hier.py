"""Hierarchical JPEG (ITU T.81 Annex J) — the multi-frame pyramid
mode, stdlib + numpy only.

A hierarchical stream brackets several frames with DHP (the full-image
dimensions) and EXP (reference expansion) markers: the first frame is
non-differential at reduced resolution; each later frame codes the
DIFFERENCE between the source and the (optionally 2x-expanded)
reference reconstructed so far.  This module implements the LOSSLESS
pyramid — first frame SOF3, differential frames SOF7 (zero prediction,
signed difference samples per T.81 H.1.1) — so the full-resolution
reconstruction is BYTE-EXACT: ``decode(encode_hierarchical(img)) ==
img`` is the test invariant, the same strict equality contract as
``jpeg_lossless``.  The reference expansion is the Annex J.1.1.2
interpolation filter (out[2i] = in[i]; out[2i+1] = (in[i] + in[i+1]
+ 1) >> 1, edge-replicated, applied per axis).

With this module the engine decodes every T.81 Huffman coding process
— sequential, extended, progressive, lossless, hierarchical — plus
both arithmetic DCT processes (jpeg_arith.py); arithmetic-coded
lossless/hierarchical and the lossy non-JPEG codecs remain the
documented stub seam.

Reference parity note: the reference pipeline (il_analysis_git.py) has
no media operators — beyond-reference extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import _build_huffman
from .jpeg_lossless import (
    LOSSLESS_BITS,
    LOSSLESS_VALS,
    _BitWriter,
    lossless_planes,
    write_residual,
)


def expand_ref(plane: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """T.81 J.1.1.2 reference expansion: double one or both axes with
    the (a + b + 1) >> 1 interpolation filter, edge-replicated."""
    p = plane.astype(np.int64)
    if eh:
        right = np.concatenate([p[:, 1:], p[:, -1:]], axis=1)
        interp = (p + right + 1) >> 1
        out = np.empty((p.shape[0], p.shape[1] * 2), dtype=np.int64)
        out[:, 0::2] = p
        out[:, 1::2] = interp
        p = out
    if ev:
        down = np.concatenate([p[1:, :], p[-1:, :]], axis=0)
        interp = (p + down + 1) >> 1
        out = np.empty((p.shape[0] * 2, p.shape[1]), dtype=np.int64)
        out[0::2, :] = p
        out[1::2, :] = interp
        p = out
    return p


def decode_hierarchical(data: bytes, pos: int, huff=None, restart=0):
    """Decode a hierarchical stream from its DHP marker to EOI.
    ``huff``/``restart`` carry any tables-misc segments the caller
    parsed BEFORE the DHP marker (T.81 B.3 allows DHT/DRI there).
    Returns (w, h, ch, pixels) in the decode_jpeg contract."""
    if data[pos : pos + 2] != b"\xff\xde":
        raise ValueError("hierarchical decode must start at DHP")
    seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
    seg = data[pos + 4 : pos + 2 + seglen]
    prec, full_h, full_w, nc = struct.unpack(">BHHB", seg[:6])
    if prec != 8:
        raise ValueError("only 8-bit JPEG samples supported")
    if full_w == 0 or full_h == 0 or nc == 0:
        raise ValueError("invalid DHP dimensions")
    pos += 2 + seglen

    huff = dict(huff) if huff else {}
    pending_exp = (0, 0)
    refs: list[np.ndarray] | None = None
    frame = None
    differential = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        m = data[pos + 1]
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated hierarchical JPEG")
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        seg = data[pos + 4 : pos + 2 + seglen]
        if m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_huffman(bits, vals)
                p += 17 + n
        elif m == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDF:  # EXP
            pending_exp = (seg[0] >> 4, seg[0] & 0xF)
        elif m in (0xC3, 0xC7):  # lossless frame, plain / differential
            fprec, fh, fw, fnc = struct.unpack(">BHHB", seg[:6])
            if fprec != 8 or fnc != nc:
                raise ValueError("hierarchical frame header mismatch")
            comps = []
            for i in range(fnc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (fw, fh, comps)
            differential = m == 0xC7
        elif m in (0xC0, 0xC1, 0xC2, 0xC5, 0xC6, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only lossless hierarchical frames supported — stub fallback"
            )
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("hierarchical SOS before frame header")
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan[cs] = (tdta >> 4, tdta & 0xF)
            pred_sel = seg[1 + 2 * ns]
            planes, end = lossless_planes(
                data, pos + 2 + seglen, frame, scan, huff, pred_sel,
                restart, differential=differential,
            )
            fw, fh = frame[0], frame[1]
            if differential:
                if refs is None:
                    raise ValueError("differential frame without reference")
                eh, ev = pending_exp
                new_refs = []
                for ref, diff in zip(refs, planes):
                    r = expand_ref(ref, eh, ev)[:fh, :fw]
                    if r.shape != (fh, fw):
                        raise ValueError(
                            "reference smaller than differential frame"
                        )
                    new_refs.append((r + diff) & 0xFFFF)
                refs = new_refs
            else:
                refs = planes
            pending_exp = (0, 0)
            frame = None
            # resume at the next marker after the entropy segment
            pos = end
            while pos + 1 < len(data) and not (
                data[pos] == 0xFF and data[pos + 1] != 0x00
            ):
                pos += 1
            continue
        pos += 2 + seglen
    if refs is None:
        raise ValueError("hierarchical stream had no frames")
    if any(r.shape[0] < full_h or r.shape[1] < full_w for r in refs):
        raise ValueError("hierarchical frames do not cover the DHP dims")
    out = np.stack(
        [np.clip(r[:full_h, :full_w], 0, 255).astype(np.uint8) for r in refs],
        axis=-1,
    )
    if nc == 1:
        return full_w, full_h, 1, out[:, :, 0].tobytes()
    return full_w, full_h, nc, out.tobytes()


# --- encoder ----------------------------------------------------------


def _emit_lossless_frame(
    out: bytearray,
    sof_marker: int,
    planes: list[np.ndarray],
    pred_sel: int,
) -> None:
    """One hierarchical frame: SOF3/SOF7 header + SOS + entropy data.
    Non-differential frames predict per Annex H (encoder mirrors
    jpeg_lossless); differential frames code the signed samples with
    zero prediction."""
    from .jpeg_lossless import _predictor_at

    h, w = planes[0].shape
    nc = len(planes)

    def seg(marker: int, body: bytes) -> None:
        out.extend(
            b"\xff" + bytes([marker]) + struct.pack(">H", len(body) + 2) + body
        )

    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    seg(sof_marker, sof)
    seg(0xC4, bytes([0x00]) + bytes(LOSSLESS_BITS) + bytes(LOSSLESS_VALS))
    differential = sof_marker == 0xC7
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    # T.81 Table B.3: Ss carries the predictor in plain lossless scans
    # and SHALL be 0 in differential ones (prediction is zero there)
    sos += bytes([0 if differential else pred_sel, 0, 0])
    seg(0xDA, sos)

    enc_tab = {
        v: (ln, c)
        for (ln, c), v in _build_huffman(LOSSLESS_BITS, LOSSLESS_VALS).items()
    }
    bw = _BitWriter()
    for idx in range(w * h):
        y, x = divmod(idx, w)
        for p in planes:
            if differential:
                pr = 0
            else:
                pr = _predictor_at(p, idx, 0, x, y, w, pred_sel, 128)
            write_residual(bw, enc_tab, int(p[y, x]) - pr)
    bw.flush()
    out.extend(bw.out)


def encode_jpeg_hierarchical(
    w: int,
    h: int,
    ch: int,
    pixels: bytes,
    predictor: int = 4,
) -> bytes:
    """Two-stage lossless hierarchical pyramid (Annex J): a half-
    resolution SOF3 base frame, an EXP(1,1) reference expansion, and a
    full-resolution SOF7 differential frame coding the exact
    correction — so the decode reproduces the input BYTE-FOR-BYTE
    while a progressive consumer can stop after the base frame for a
    half-resolution preview (the hierarchical mode's point)."""
    if len(pixels) != w * h * ch:
        raise ValueError("pixel buffer does not match dimensions")
    if ch not in (1, 3):
        raise ValueError("encode_jpeg_hierarchical supports 1 or 3 channels")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, ch).astype(
        np.int64
    )
    hw, hh = -(-w // 2), -(-h // 2)
    # base = 2x2 mean on an edge-padded grid (any downsample is valid:
    # the differential stage corrects it exactly)
    pad = np.pad(img, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
    base = (
        pad[0::2, 0::2] + pad[1::2, 0::2] + pad[0::2, 1::2] + pad[1::2, 1::2]
        + 2
    ) >> 2

    out = bytearray(b"\xff\xd8")
    dhp = struct.pack(">BHHB", 8, h, w, ch)
    for ci in range(ch):
        dhp += bytes([ci + 1, 0x11, 0])
    out.extend(b"\xff\xde" + struct.pack(">H", len(dhp) + 2) + dhp)

    base_planes = [base[:, :, ci] for ci in range(ch)]
    _emit_lossless_frame(out, 0xC3, base_planes, predictor)

    out.extend(b"\xff\xdf" + struct.pack(">H", 3) + bytes([0x11]))  # EXP 1,1
    diffs = []
    for ci in range(ch):
        ref = expand_ref(base[:, :, ci], 1, 1)[:h, :w]
        diffs.append(img[:, :, ci] - ref)
    _emit_lossless_frame(out, 0xC7, diffs, predictor)
    out.extend(b"\xff\xd9")
    return bytes(out)
