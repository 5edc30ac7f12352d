"""Arithmetic-coded JPEG (ITU T.81 Annex D/E/F) — the QM coder and the
sequential DC/AC conditioning, stdlib + numpy only.

Closes the arithmetic-JPEG seam left by ``operators/jpeg.py`` (which
decodes Huffman baseline/extended/progressive): SOF9
(extended-sequential) AND SOF10 (progressive, Annex G successive
approximation / spectral selection) arithmetic streams now decode for
real; ``encode_jpeg_arith`` and ``encode_jpeg_arith_progressive`` are
the round-trip companions.  The
entropy layer is the T.81 QM binary arithmetic coder: the 113-state
probability-estimation table (Table D.3, plus the fixed ~0.5 state the
AC sign uses), conditional MPS/LPS interval exchange, byte stuffing
(0xFF -> 0xFF 0x00) and the carry-over/stacked-0xFF output discipline.
The JPEG layer is the Annex F statistical model: DC difference
conditioning on the previous diff's category (L/U bounds from the DAC
segment), per-index AC EOB/zero/magnitude decision trees with the Kx
band split, magnitude categories as unary exponent walks plus mantissa
bits — the same statistics-bin layout libjpeg's public implementation
uses (DC: 64 bins/table, AC: 256 bins/table).

Verification contract (same as the progressive decoder): arithmetic
entropy coding is LOSSLESS at the coefficient level, so
``encode_jpeg_arith`` output must decode byte-identical to the decode
of ``encode_jpeg`` (baseline Huffman) at identical quality/subsampling
— pinned by fixed cases and a hypothesis property — and the raw coder
is round-tripped on adversarial decision streams that force carry
propagation, stacked-0xFF output, and marker-terminated zero feeding.
No third-party arithmetic JPEG exists in this container, so the state
table's transcription from T.81 Table D.3 is validated structurally
(range/fixed-point invariants) and by self-consistency, not by
cross-decoder interop.

Reference parity note: the reference pipeline (il_analysis_git.py) has
no media operators — beyond-reference extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (
    ZIGZAG,
    _DCT,
    _planes_to_pixels,
    _prepare_components,
    _quality_tables,
    _scan_units,
)

# T.81 Table D.3: (Qe, NMPS, NLPS, SWITCH) per estimation state.  Index
# 113 is the non-adaptive ~0.5 state (self-loop transitions) used for
# AC coefficient signs.
QE_TABLE = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 110, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 112, 112, 0), (0x59EB, 112, 112, 1),
    # fixed ~0.5 bin (AC sign): self-loop, never adapts
    (0x5A1D, 113, 113, 0),
]

# Statistics-bin layout (libjpeg-compatible): per DC table 64 bins
# (contexts 0..19, magnitude-category tree X1.. at 20, mantissa bins at
# +14), per AC table 256 bins (3*(k-1) decision triples for k=1..63 =
# 0..188, high-category trees at 189/217, mantissa at +14 <= 245).
DC_BINS = 64
AC_BINS = 256
FIXED_BIN = 113  # state index of the non-adaptive sign bin


def _fresh_stats(n: int) -> bytearray:
    """A statistics area: (state index, MPS sense) byte pairs, all
    zeroed — T.81 requires init to state 0 / MPS 0."""
    return bytearray(2 * n)


class ArithEncoder:
    """T.81 Annex D QM encoder registers + byte output with carry
    resolution: 0xFF output bytes are stacked until a non-0xFF (or a
    carry) resolves them, stuffed 0x00s follow every emitted 0xFF."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer: int | None = None
        self.stacked = 0
        self.out = bytearray()

    def _emit(self, b: int) -> None:
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry propagates into the pending byte; stacked 0xFFs
            # roll over to 0x00
            if self.buffer is None:  # pragma: no cover - unreachable
                raise ValueError("arithmetic coder carry before any byte")
            self._emit(self.buffer + 1)
            for _ in range(self.stacked):
                self._emit(0x00)
            self.stacked = 0
            self.buffer = t & 0xFF
        elif t == 0xFF:
            self.stacked += 1
        else:
            if self.buffer is not None:
                self._emit(self.buffer)
            for _ in range(self.stacked):
                self._emit(0xFF)
            self.stacked = 0
            self.buffer = t
        self.c &= 0x7FFFF

    def _renorm(self) -> None:
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if self.a & 0x8000:
                break

    def encode(self, stats: bytearray, i: int, d: int) -> None:
        """Code decision ``d`` in context bin ``i`` of ``stats``."""
        off = 2 * i
        state = stats[off]
        mps = stats[off + 1]
        qe, nmps, nlps, switch = QE_TABLE[state]
        self.a -= qe
        if d == mps:
            if self.a & 0x8000:
                return  # no renorm, no estimation update
            if self.a < qe:  # conditional exchange: MPS takes the top
                self.c += self.a
                self.a = qe
            stats[off] = nmps
            self._renorm()
        else:
            if self.a < qe:  # conditional exchange: LPS keeps the bottom
                pass
            else:
                self.c += self.a
                self.a = qe
            if switch:
                stats[off + 1] = 1 - mps
            stats[off] = nlps
            self._renorm()

    def flush(self) -> bytes:
        """Terminate the interval (CLEARBITS + FINALWRITES) and return
        the stuffed byte stream."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        if self.buffer is not None:
            self._emit(self.buffer)
            self.buffer = None
        for _ in range(self.stacked):
            self._emit(0xFF)
        self.stacked = 0
        return bytes(self.out)


class ArithDecoder:
    """T.81 Annex E QM decoder: mirrors ``ArithEncoder`` exactly;
    un-stuffs 0xFF 0x00, and feeds zero bytes once a marker (0xFF
    followed by non-zero) or the end of data is reached — the marker
    itself is never consumed (``raw_pos`` stops at its 0xFF)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.raw_pos = pos
        self.marker_hit = False
        # Align to the encoder's registers: A starts at the full
        # interval 0x10000 (INITENC) and Chigh must hold the first TWO
        # code bytes, so the first comparisons replicate the encoder's
        # pre-first-renorm partition exactly.
        self.c = (self._next_byte() << 24) | (self._next_byte() << 16)
        self.ct = 0
        self.a = 0x10000

    def _next_byte(self) -> int:
        if self.marker_hit or self.raw_pos >= len(self.data):
            self.marker_hit = True
            return 0
        b = self.data[self.raw_pos]
        if b == 0xFF:
            nxt = (
                self.data[self.raw_pos + 1]
                if self.raw_pos + 1 < len(self.data)
                else 0xD9
            )
            if nxt != 0x00:
                self.marker_hit = True  # marker: zero-feed from now on
                return 0
            self.raw_pos += 2  # stuffed 0xFF
            return 0xFF
        self.raw_pos += 1
        return b

    def _bytein(self) -> None:
        self.c += self._next_byte() << 8
        self.ct = 8

    def decode(self, stats: bytearray, i: int) -> int:
        off = 2 * i
        state = stats[off]
        mps = stats[off + 1]
        qe, nmps, nlps, switch = QE_TABLE[state]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < self.a:
            if self.a & 0x8000:
                return mps
            # MPS exchange path (renorm needed)
            if self.a < qe:
                d = 1 - mps
                if switch:
                    stats[off + 1] = 1 - mps
                stats[off] = nlps
            else:
                d = mps
                stats[off] = nmps
        else:
            self.c -= self.a << 16
            if self.a < qe:
                d = mps
                stats[off] = nmps
            else:
                d = 1 - mps
                if switch:
                    stats[off + 1] = 1 - mps
                stats[off] = nlps
            self.a = qe
        # renormalize
        while True:
            if self.ct == 0:
                self._bytein()
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


# --- Annex F statistical model (sequential DC + AC) -------------------


class _ScanStats:
    """Per-scan statistics areas + conditioning state, reset at every
    restart interval exactly like the coder registers."""

    def __init__(self, comps, cond) -> None:
        self.dc_stats: dict[int, bytearray] = {}
        self.ac_stats: dict[int, bytearray] = {}
        self.fixed = _fresh_stats(1)
        self.fixed[0] = FIXED_BIN
        self.dc_context = {cid: 0 for cid, *_ in comps}
        self.last_dc = {cid: 0 for cid, *_ in comps}
        self.cond = cond

    def reset(self) -> None:
        for tbl in self.dc_stats:
            self.dc_stats[tbl] = _fresh_stats(DC_BINS)
        for tbl in self.ac_stats:
            self.ac_stats[tbl] = _fresh_stats(AC_BINS)
        self.fixed = _fresh_stats(1)
        self.fixed[0] = FIXED_BIN
        for cid in self.dc_context:
            self.dc_context[cid] = 0
            self.last_dc[cid] = 0

    def dc_area(self, tbl: int) -> bytearray:
        if tbl not in self.dc_stats:
            self.dc_stats[tbl] = _fresh_stats(DC_BINS)
        return self.dc_stats[tbl]

    def ac_area(self, tbl: int) -> bytearray:
        if tbl not in self.ac_stats:
            self.ac_stats[tbl] = _fresh_stats(AC_BINS)
        return self.ac_stats[tbl]


def _dc_bounds(cond, tbl: int) -> tuple[int, int]:
    lo, up = cond.get(("dc", tbl), (0, 1))
    return (1 << lo) >> 1, (1 << up) >> 1


def _decode_dc(dec, stats, cid, tbl, cond) -> int:
    """One DC difference (T.81 F.2.4.1 / figures F.19-F.24)."""
    area = stats.dc_area(tbl)
    st = stats.dc_context[cid]
    if dec.decode(area, st) == 0:
        stats.dc_context[cid] = 0
        return stats.last_dc[cid]
    sign = dec.decode(area, st + 1)
    st += 2 + sign
    m = dec.decode(area, st)
    if m:
        st = 20
        while dec.decode(area, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("corrupt arithmetic JPEG (DC magnitude)")
            st += 1
    low, high = _dc_bounds(cond, tbl)
    if m < low:
        stats.dc_context[cid] = 0
    elif m > high:
        stats.dc_context[cid] = 12 + sign * 4
    else:
        stats.dc_context[cid] = 4 + sign * 4
    v = m
    st += 14
    while m := m >> 1:
        if dec.decode(area, st):
            v |= m
    v += 1
    if sign:
        v = -v
    stats.last_dc[cid] += v
    return stats.last_dc[cid]


def _decode_ac(
    dec, stats, tbl, cond, coeff: np.ndarray, ss=1, se=63, al=0
) -> None:
    """AC coefficients of one block over the band [ss, se] at point
    transform Al (T.81 F.2.4.2; sequential = full band at Al=0)."""
    area = stats.ac_area(tbl)
    kx = cond.get(("ac", tbl), 5)
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(area, st):
            break  # EOB
        while dec.decode(area, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("corrupt arithmetic JPEG (AC run)")
        sign = dec.decode(stats.fixed, 0)
        st += 2
        m = dec.decode(area, st)
        if m and dec.decode(area, st):
            m <<= 1
            st = 189 if k <= kx else 217
            while dec.decode(area, st):
                m <<= 1
                if m == 0x8000:
                    raise ValueError(
                        "corrupt arithmetic JPEG (AC magnitude)"
                    )
                st += 1
        v = m
        st += 14
        while m := m >> 1:
            if dec.decode(area, st):
                v |= m
        v += 1
        if sign:
            v = -v
        coeff[ZIGZAG[k]] = v << al
        k += 1


def _next_marker_pos(data: bytes, pos: int) -> int:
    """Skip any unread entropy/flush bytes (incl. stuffed FF00 pairs)
    and return the offset of the next real marker's 0xFF."""
    while pos + 1 < len(data) and not (
        data[pos] == 0xFF and data[pos + 1] != 0x00
    ):
        pos += 1
    return pos


def _restart_decoder(data, dec) -> "ArithDecoder":
    """Locate and consume the RSTn at the decoder's current position;
    return a fresh decoder starting after it."""
    p = _next_marker_pos(data, dec.raw_pos)
    if p + 1 >= len(data) or not 0xD0 <= data[p + 1] <= 0xD7:
        raise ValueError("missing JPEG restart marker")
    return ArithDecoder(data, p + 2)


def decode_scan_arith(data, pos, frame, scan, qt, cond, restart):
    """Sequential arithmetic-coded scan (SOF9) covering all frame
    components — the arithmetic twin of ``jpeg._decode_scan``.

    ``cond``: DAC conditioning, {("dc", tbl): (L, U), ("ac", tbl): Kx};
    spec defaults L=0, U=1, Kx=5 apply when absent."""
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        cid: np.zeros((mcuy * cv * 8, mcux * ch * 8))
        for cid, ch, cv, _tq in comps
    }
    dec = ArithDecoder(data, pos)
    stats = _ScanStats(comps, cond)
    n_mcu = mcux * mcuy
    for idx in range(n_mcu):
        if restart and idx and idx % restart == 0:
            dec = _restart_decoder(data, dec)
            stats.reset()
        my, mx = divmod(idx, mcux)
        for cid, ch, cv, tq in comps:
            td, ta = scan[cid]
            q = qt[tq]
            for by in range(cv):
                for bx in range(ch):
                    coeff = np.zeros(64)
                    coeff[0] = _decode_dc(dec, stats, cid, td, cond)
                    _decode_ac(dec, stats, ta, cond, coeff)
                    block = (
                        _DCT.T @ (coeff.reshape(8, 8) * q) @ _DCT
                    ) + 128.0
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
    return _planes_to_pixels(w, h, comps, planes, hmax, vmax)


# --- encoder ----------------------------------------------------------


def _encode_dc(enc, stats, cid, tbl, cond, dc: int) -> None:
    area = stats.dc_area(tbl)
    st = stats.dc_context[cid]
    diff = dc - stats.last_dc[cid]
    stats.last_dc[cid] = dc
    if diff == 0:
        enc.encode(area, st, 0)
        stats.dc_context[cid] = 0
        return
    enc.encode(area, st, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(area, st + 1, sign)
    st += 2 + sign
    v = -diff if sign else diff
    v -= 1
    m = 0
    if v:
        enc.encode(area, st, 1)
        m = 1
        st = 20
        v2 = v
        while v2 := v2 >> 1:
            enc.encode(area, st, 1)
            m <<= 1
            st += 1
        enc.encode(area, st, 0)
    else:
        enc.encode(area, st, 0)
    low, high = _dc_bounds(cond, tbl)
    if m < low:
        stats.dc_context[cid] = 0
    elif m > high:
        stats.dc_context[cid] = 12 + sign * 4
    else:
        stats.dc_context[cid] = 4 + sign * 4
    st += 14
    while m := m >> 1:
        enc.encode(area, st, 1 if (m & v) else 0)


def _encode_ac(enc, stats, tbl, cond, zz: list[int], ss=1, se=63, al=0) -> None:
    area = stats.ac_area(tbl)
    kx = cond.get(("ac", tbl), 5)

    def pt(i: int) -> int:
        # AC point transform: divide toward zero (abs, then shift)
        v = zz[i]
        return (-v if v < 0 else v) >> al

    ke = se
    while ke >= ss and pt(ke) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(area, st, 0)  # not EOB yet
        while pt(k) == 0:
            enc.encode(area, st + 1, 0)
            st += 3
            k += 1
        enc.encode(area, st + 1, 1)
        sign = 1 if zz[k] < 0 else 0
        enc.encode(stats.fixed, 0, sign)
        v = pt(k)
        st += 2
        v -= 1
        m = 0
        if v:
            enc.encode(area, st, 1)
            m = 1
            v2 = v
            if v2 := v2 >> 1:
                enc.encode(area, st, 1)
                m <<= 1
                st = 189 if k <= kx else 217
                while v2 := v2 >> 1:
                    enc.encode(area, st, 1)
                    m <<= 1
                    st += 1
            enc.encode(area, st, 0)
        else:
            enc.encode(area, st, 0)
        st += 14
        while m := m >> 1:
            enc.encode(area, st, 1 if (m & v) else 0)
        k += 1
    if k <= se:
        st = 3 * (k - 1)
        enc.encode(area, st, 1)  # EOB


def _emit_arith_headers(seg, padded, ql, qc, ch, sof_marker, w, h) -> dict:
    """Shared front matter for both arithmetic encoders: JFIF APP0,
    quality-scaled DQT (zigzag order), the SOF segment, and a DAC
    spelling the spec-default conditioning explicitly (DC: U=1, L=0;
    AC: Kx=5) for every table id in use.  Returns the conditioning
    dict the entropy layer reads."""
    seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, tab in ([(0, ql)] if ch == 1 else [(0, ql), (1, qc)]):
        seg(
            0xDB,
            bytes([tq]) + bytes(int(tab.flat[ZIGZAG[i]]) for i in range(64)),
        )
    sof = struct.pack(">BHHB", 8, h, w, len(padded))
    for cid, chf, cvf, tq, _p in padded:
        sof += bytes([cid, (chf << 4) | cvf, tq])
    seg(sof_marker, sof)
    cond: dict = {}
    dac = b""
    for tq in sorted({p[3] for p in padded}):
        dac += bytes([(0 << 4) | tq, (1 << 4) | 0])
        dac += bytes([(1 << 4) | tq, 5])
        cond[("dc", tq)] = (0, 1)
        cond[("ac", tq)] = 5
    seg(0xCC, dac)
    return cond


def encode_jpeg_arith(
    w: int,
    h: int,
    ch: int,
    pixels: bytes,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Arithmetic-coded sequential JPEG encoder (SOF9 + DAC) — the
    round-trip companion of the arithmetic decode path.  Identical
    front end to ``jpeg.encode_jpeg`` (color transform, subsampling,
    Annex-K quality-scaled quantization, FDCT), so the two encoders
    produce the SAME coefficients and their decodes are byte-identical
    — the exactness invariant the tests pin."""
    padded, ql, qc, mcux, mcuy = _prepare_components(
        w, h, ch, pixels, quality, subsampling
    )

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(
            b"\xff" + bytes([marker]) + struct.pack(">H", len(body) + 2) + body
        )

    # SOF9: extended sequential, arithmetic entropy coding
    cond = _emit_arith_headers(seg, padded, ql, qc, ch, 0xC9, w, h)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(padded)])
    for cid, _chf, _cvf, tq, _p in padded:
        sos += bytes([cid, (tq << 4) | tq])  # conditioning id == quant id
    sos += b"\x00\x3f\x00"
    seg(0xDA, sos)

    enc = ArithEncoder()
    comps_meta = [(cid, chf, cvf, tq) for cid, chf, cvf, tq, _p in padded]
    stats = _ScanStats(comps_meta, cond)
    for idx in range(mcux * mcuy):
        if restart_interval and idx and idx % restart_interval == 0:
            out.extend(enc.flush())
            out.extend(
                b"\xff" + bytes([0xD0 + (idx // restart_interval - 1) % 8])
            )
            enc = ArithEncoder()
            stats.reset()
        my, mx = divmod(idx, mcux)
        for cid, chf, cvf, tq, plane in padded:
            q = ql if tq == 0 else qc
            for by in range(cvf):
                for bx in range(chf):
                    y0 = (my * cvf + by) * 8
                    x0 = (mx * chf + bx) * 8
                    block = plane[y0 : y0 + 8, x0 : x0 + 8]
                    coeff = np.round(
                        (_DCT @ (block - 128.0) @ _DCT.T) / q
                    ).astype(int)
                    zz = [int(coeff.flat[ZIGZAG[i]]) for i in range(64)]
                    _encode_dc(enc, stats, cid, tq, cond, zz[0])
                    _encode_ac(enc, stats, tq, cond, zz)
    out.extend(enc.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# --- progressive arithmetic (SOF10, T.81 Annex G + Annex F coder) -----


def _decode_ac_refine(dec, stats, tbl, coef, ss, se, al) -> None:
    """Successive-approximation AC refinement scan for one block
    (T.81 G.2.2 arithmetic variant): previously-nonzero coefficients
    receive a correction bit in the SP context (st+2); newly
    significant ones arrive via st+1 with a fixed-probability sign.
    Unlike Huffman refinement there are no EOB runs — one EOB decision
    per block ends it."""
    area = stats.ac_area(tbl)
    p1, m1 = 1 << al, -1 << al
    kex = se
    while kex >= ss and coef[ZIGZAG[kex]] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(area, st):
            break  # EOB
        while True:
            z = ZIGZAG[k]
            if coef[z] != 0:
                if dec.decode(area, st + 2):
                    coef[z] += m1 if coef[z] < 0 else p1
                break
            if dec.decode(area, st + 1):
                coef[z] = m1 if dec.decode(stats.fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("corrupt arithmetic JPEG (AC refine run)")
        k += 1


def _encode_ac_refine(enc, stats, tbl, zz, ss, se, al) -> None:
    area = stats.ac_area(tbl)

    def pt(i: int) -> int:
        v = zz[i]
        return (-v if v < 0 else v) >> al

    ke = se
    while ke >= ss and pt(ke) == 0:
        ke -= 1
    kex = ke
    while kex >= ss and (pt(kex) >> 1) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(area, st, 0)  # not EOB yet
        while True:
            t = pt(k)
            if t:
                if t >> 1:  # previously significant: correction bit
                    enc.encode(area, st + 2, t & 1)
                else:  # newly significant
                    enc.encode(area, st + 1, 1)
                    enc.encode(stats.fixed, 0, 1 if zz[k] < 0 else 0)
                break
            enc.encode(area, st + 1, 0)
            st += 3
            k += 1
        k += 1
    if k <= se:
        enc.encode(area, 3 * (k - 1), 1)  # EOB


def decode_progressive_scan_arith(
    data, pos, frame, scan, ss, se, ah, al, cond, restart, store
):
    """Decode one progressive arithmetic scan (SOF10) into the
    coefficient store; returns the offset of the next marker.
    Statistics areas, DC conditioning, and the coder registers are
    per-scan (and reset at every restart interval)."""
    scomps, mcus = _scan_units(frame, scan)
    dec = ArithDecoder(data, pos)
    comps_meta = [(c[0], c[1], c[2], c[3]) for c in scomps]
    stats = _ScanStats(comps_meta, cond)
    for i, unit in enumerate(mcus):
        if restart and i and i % restart == 0:
            dec = _restart_decoder(data, dec)
            stats.reset()
        for cid, by, bx in unit:
            coef = store[cid][by, bx]
            td, ta = scan[cid]
            if ss == 0:  # DC scan
                if ah == 0:
                    coef[0] = _decode_dc(dec, stats, cid, td, cond) << al
                elif dec.decode(stats.fixed, 0):
                    coef[0] |= 1 << al
            elif ah == 0:
                _decode_ac(dec, stats, ta, cond, coef, ss, se, al)
            else:
                _decode_ac_refine(dec, stats, ta, coef, ss, se, al)
    return _next_marker_pos(data, dec.raw_pos)


def encode_jpeg_arith_progressive(
    w: int,
    h: int,
    ch: int,
    pixels: bytes,
    quality: int = 90,
    subsampling: str = "444",
) -> bytes:
    """Progressive arithmetic JPEG encoder (SOF10 + DAC) — the same
    scan script as ``jpeg.encode_jpeg_progressive`` (DC first at Al=1,
    split AC bands at Al=2, two AC refinement passes, DC refinement),
    with QM-coded decisions instead of Huffman symbols.  Coefficients
    are identical to every other encoder in the family, so all four
    stream kinds decode to IDENTICAL pixels."""
    padded, ql, qc, mcux, mcuy = _prepare_components(
        w, h, ch, pixels, quality, subsampling
    )
    hmax = max(c[1] for c in padded)
    vmax = max(c[2] for c in padded)

    coefs: dict[int, np.ndarray] = {}
    dims: dict[int, tuple[int, int]] = {}
    for cid, chf, cvf, tq, plane in padded:
        q = ql if tq == 0 else qc
        nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        cf = np.round((_DCT @ (blocks - 128.0) @ _DCT.T) / q).astype(np.int64)
        coefs[cid] = cf.reshape(nby, nbx, 64)  # natural order
        compw = -(-(w * chf) // hmax)
        comph = -(-(h * cvf) // vmax)
        dims[cid] = (-(-comph // 8), -(-compw // 8))

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(
            b"\xff" + bytes([marker]) + struct.pack(">H", len(body) + 2) + body
        )

    # SOF10: progressive, arithmetic entropy coding
    cond = _emit_arith_headers(seg, padded, ql, qc, ch, 0xCA, w, h)

    all_cids = [p[0] for p in padded]
    scans: list[tuple[list[int], int, int, int, int]] = [
        (all_cids, 0, 0, 0, 1)
    ]
    for cid in all_cids:
        scans += [([cid], 1, 5, 0, 2), ([cid], 6, 63, 0, 2)]
    for cid in all_cids:
        scans += [([cid], 1, 63, 2, 1), ([cid], 1, 63, 1, 0)]
    scans.append((all_cids, 0, 0, 1, 0))

    byc = {p[0]: p for p in padded}
    for cids, ss, se, ah, al in scans:
        sos = bytes([len(cids)])
        for cid in cids:
            tq = byc[cid][3]
            sos += bytes([cid, (tq << 4) | tq])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, sos)

        enc = ArithEncoder()
        comps_meta = [
            (cid, byc[cid][1], byc[cid][2], byc[cid][3]) for cid in cids
        ]
        stats = _ScanStats(comps_meta, cond)
        if ss == 0:
            if len(cids) > 1:
                units = []
                for my in range(mcuy):
                    for mx in range(mcux):
                        for cid in cids:
                            _c, chf, cvf, _tq, _p = byc[cid]
                            for by in range(cvf):
                                for bx in range(chf):
                                    units.append(
                                        (cid, my * cvf + by, mx * chf + bx)
                                    )
            else:
                nby, nbx = dims[cids[0]]
                units = [
                    (cids[0], by, bx)
                    for by in range(nby)
                    for bx in range(nbx)
                ]
            for cid, by, bx in units:
                tq = byc[cid][3]
                dc = int(coefs[cid][by, bx, 0]) >> al
                if ah == 0:
                    _encode_dc(enc, stats, cid, tq, cond, dc)
                else:
                    enc.encode(stats.fixed, 0, dc & 1)
        else:
            cid = cids[0]
            tq = byc[cid][3]
            nby, nbx = dims[cid]
            for by in range(nby):
                for bx in range(nbx):
                    nat = coefs[cid][by, bx]
                    zz = [int(nat[ZIGZAG[i]]) for i in range(64)]
                    if ah == 0:
                        _encode_ac(enc, stats, tq, cond, zz, ss, se, al)
                    else:
                        _encode_ac_refine(enc, stats, tq, zz, ss, se, al)
        out.extend(enc.flush())
    out.extend(b"\xff\xd9")
    return bytes(out)
