"""WebP lossless (VP8L) codec — no codec libraries, stdlib only.

Closes the WebP leg of the ``decode_real`` seam (``operators/
multimodal.py`` dispatches here on the RIFF/WEBP magic): a full VP8L
decoder per the public "WebP Lossless Bitstream Specification" —
LSB-first bit reading, simple + normal (code-length-coded) canonical
prefix codes, LZ77 backward references with the 120-entry 2D distance
map, color cache, meta prefix groups, and all four transforms
(predictor, color, subtract-green, color-indexing incl. sub-byte pixel
packing) applied inverse in reverse order — plus a round-trip
companion encoder that emits real prefix-coded literal streams and can
exercise the subtract-green, palette, and predictor transform paths.

Lossy WebP (VP8 intra coding) stays at the documented stub seam, as
does inter-frame video — a deliberate r06 stop, not an oversight.
Corpus-frequency triage (public CommonCrawl MIME statistics): jpeg
~45-50% of crawled image payloads, png ~30%, gif ~10%, webp ~5-8%
(dominated by lossy VP8) — so lossy WebP is indeed the top stubbed
format.  But a conformant VP8 decoder requires RFC 6386's 1056-byte
default coefficient-probability table and its 1056-byte update-
probability twin verbatim; those constants are not reproducible in
this offline container, and a codec built on invented tables would
round-trip against its own encoder while MIScoding every real
interoperable stream — a false "real decode" claim, worse than the
honest deterministic stub.  The codec family therefore stops here;
``decode_real`` (multimodal.py) remains the seam where libwebp/PIL
plug in.

Reference parity note: the reference pipeline (il_analysis_git.py) has
no media operators — this module is beyond-reference extension surface
for multimodal training-data columns, in the same spirit as
``operators/jpeg.py``.
"""

from __future__ import annotations

import heapq
import struct

WEBP_RIFF = b"RIFF"
WEBP_TAG = b"WEBP"
VP8L_TAG = b"VP8L"
VP8L_MAGIC_BYTE = 0x2F

# code-length-code transmission order (spec 5.2.2)
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# the 120-entry 2D neighborhood distance map (spec 5.2.3)
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


class _BitReader:
    """LSB-first bit reader (VP8L convention)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def bits(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated VP8L stream")
            self.bitbuf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.bitbuf & ((1 << n) - 1)
        self.bitbuf >>= n
        self.nbits -= n
        return v

    def bit(self) -> int:
        return self.bits(1)


class _Code:
    """A canonical prefix code: either a 0-bit constant (single-symbol
    code) or a binary tree walked MSB-of-code-first (DEFLATE bit
    order over the LSB-first byte stream)."""

    __slots__ = ("const", "tree")

    def __init__(self, lengths: list[int] | None, const: int | None = None):
        self.const = const
        self.tree = None
        if const is not None:
            return
        assert lengths is not None
        # canonical assignment: increasing code within length, symbols
        # in ascending order (DEFLATE / VP8L convention)
        pairs = sorted(
            (ln, sym) for sym, ln in enumerate(lengths) if ln > 0
        )
        if not pairs:
            raise ValueError("empty VP8L prefix code")
        if len(pairs) == 1:
            self.const = pairs[0][1]
            return
        self.tree = {}
        code = 0
        prev_len = pairs[0][0]
        for ln, sym in pairs:
            code <<= ln - prev_len
            prev_len = ln
            node = self.tree
            for i in range(ln - 1, 0, -1):
                b = (code >> i) & 1
                nxt = node.get(b)
                if nxt is None:
                    nxt = {}
                    node[b] = nxt
                elif not isinstance(nxt, dict):
                    raise ValueError("overfull VP8L prefix code")
                node = nxt
            if (code & 1) in node:
                raise ValueError("overfull VP8L prefix code")
            node[code & 1] = ("leaf", sym)
            code += 1

    def read(self, br: _BitReader) -> int:
        if self.const is not None:
            return self.const
        node = self.tree
        while True:
            nxt = node.get(br.bit())
            if nxt is None:
                raise ValueError("invalid VP8L prefix code bits")
            if isinstance(nxt, tuple):
                return nxt[1]
            node = nxt


def _read_code(br: _BitReader, alphabet_size: int) -> _Code:
    """ReadHuffmanCode: the simple (1-2 symbol) or normal
    (code-length-coded) form."""
    if br.bit():  # simple
        num_symbols = br.bit() + 1
        if br.bit():  # first symbol in 8 bits
            s0 = br.bits(8)
        else:
            s0 = br.bit()
        if num_symbols == 1:
            return _Code(None, const=s0)
        s1 = br.bits(8)
        lengths = [0] * alphabet_size
        lengths[s0] = 1
        lengths[s1] = 1
        return _Code(lengths)
    # normal: code-length code first
    num_clc = 4 + br.bits(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.bits(3)
    clc = _Code(clc_lengths)
    # then the RLE-style symbol lengths
    if br.bit():  # max_symbol is transmitted
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_code_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = clc.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len != 0:
                prev_code_len = code_len
        else:
            if code_len == 16:
                repeat, fill = 3 + br.bits(2), prev_code_len
            elif code_len == 17:
                repeat, fill = 3 + br.bits(3), 0
            else:
                repeat, fill = 11 + br.bits(7), 0
            for _ in range(repeat):
                if symbol >= alphabet_size:
                    raise ValueError("VP8L code length overflow")
                lengths[symbol] = fill
                symbol += 1
    return _Code(lengths)


def _prefix_decode(br: _BitReader, code: int) -> int:
    """LZ77 length/distance prefix decoding (spec 5.2.3)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _subimage_dims(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_pixels(
    br: _BitReader, w: int, h: int, is_level0: bool
) -> list[int]:
    """The entropy-coded ARGB image core (spec 5.2): color cache bit,
    optional meta prefix image (level 0 only), prefix-code groups, then
    the literal / backref / cache-hit pixel loop.  Returns packed
    0xAARRGGBB ints, row-major."""
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("invalid VP8L color cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.bit():
        meta_bits = 2 + br.bits(3)
        mw = _subimage_dims(w, meta_bits)
        mh = _subimage_dims(h, meta_bits)
        meta = _decode_pixels(br, mw, mh, False)
        n_groups = max(((p >> 8) & 0xFFFF) for p in meta) + 1

    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_code(br, green_size),
                _read_code(br, 256),  # red
                _read_code(br, 256),  # blue
                _read_code(br, 256),  # alpha
                _read_code(br, 40),  # distance
            )
        )

    out: list[int] = []
    n = w * h
    mw = _subimage_dims(w, meta_bits) if meta is not None else 0
    while len(out) < n:
        pos = len(out)
        if meta is not None:
            x, y = pos % w, pos // w
            g = (meta[(y >> meta_bits) * mw + (x >> meta_bits)] >> 8) & 0xFFFF
        else:
            g = 0
        green_c, red_c, blue_c, alpha_c, dist_c = groups[g]
        s = green_c.read(br)
        if s < 256:  # literal
            r = red_c.read(br)
            b = blue_c.read(br)
            a = alpha_c.read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out.append(px)
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 280:  # LZ77 backward reference
            length = _prefix_decode(br, s - 256)
            dist_code = _prefix_decode(br, dist_c.read(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            if dist > len(out):
                raise ValueError("VP8L backref before image start")
            for _ in range(length):
                px = out[len(out) - dist]
                out.append(px)
                if cache is not None:
                    cache[
                        ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
                if len(out) >= n:
                    break
        else:  # color cache hit
            if cache is None:
                raise ValueError("VP8L cache hit without color cache")
            out.append(cache[s - 280])
    return out


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _add_px(base: int, pred: int) -> int:
    """Per-channel modular addition of two packed ARGB pixels."""
    return (
        (((base >> 24 & 0xFF) + (pred >> 24 & 0xFF)) & 0xFF) << 24
        | (((base >> 16 & 0xFF) + (pred >> 16 & 0xFF)) & 0xFF) << 16
        | (((base >> 8 & 0xFF) + (pred >> 8 & 0xFF)) & 0xFF) << 8
        | (((base & 0xFF) + (pred & 0xFF)) & 0xFF)
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    """The 14 VP8L spatial predictors (spec 5.4)."""
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2_px(_avg2_px(left, tr), top)
    if mode == 6:
        return _avg2_px(left, tl)
    if mode == 7:
        return _avg2_px(left, top)
    if mode == 8:
        return _avg2_px(tl, top)
    if mode == 9:
        return _avg2_px(top, tr)
    if mode == 10:
        return _avg2_px(_avg2_px(left, tl), _avg2_px(top, tr))
    if mode == 11:  # select
        p = 0
        for sh in (24, 16, 8, 0):
            pl, pt, ptl = left >> sh & 0xFF, top >> sh & 0xFF, tl >> sh & 0xFF
            p += abs(pl - ptl) - abs(pt - ptl)
        return left if p <= 0 else top
    if mode == 12:  # clamped add subtract full
        px = 0
        for sh in (24, 16, 8, 0):
            pl, pt, ptl = left >> sh & 0xFF, top >> sh & 0xFF, tl >> sh & 0xFF
            px |= _clamp(pl + pt - ptl) << sh
        return px
    if mode == 13:  # clamped add subtract half
        px = 0
        for sh in (24, 16, 8, 0):
            pl, pt, ptl = left >> sh & 0xFF, top >> sh & 0xFF, tl >> sh & 0xFF
            ave = (pl + pt) >> 1
            d = ave - ptl
            # C-style /2: truncation toward zero, not arithmetic shift
            half = d // 2 if d >= 0 else -((-d) // 2)
            px |= _clamp(ave + half) << sh
        return px
    raise ValueError(f"invalid VP8L predictor mode {mode}")


def _avg2_px(a: int, b: int) -> int:
    return (
        _avg2(a >> 24 & 0xFF, b >> 24 & 0xFF) << 24
        | _avg2(a >> 16 & 0xFF, b >> 16 & 0xFF) << 16
        | _avg2(a >> 8 & 0xFF, b >> 8 & 0xFF) << 8
        | _avg2(a & 0xFF, b & 0xFF)
    )


def _inv_predictor(pix: list[int], w: int, h: int, bits: int, sub: list[int]):
    sw = _subimage_dims(w, bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[i - 1]  # L
            elif x == 0:
                pred = pix[i - w]  # T
            else:
                mode = (sub[(y >> bits) * sw + (x >> bits)] >> 8) & 0xFF
                left = pix[i - 1]
                top = pix[i - w]
                tl = pix[i - w - 1]
                # rightmost column: TR is the leftmost pixel of the
                # CURRENT row (RFC 9649) — exactly what flat row-major
                # i-w+1 yields, no special case
                tr = pix[i - w + 1]
                pred = _predict(mode, left, top, tl, tr)
            pix[i] = _add_px(pix[i], pred)


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed-byte product >> 5 (spec 5.5)."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inv_color_transform(
    pix: list[int], w: int, h: int, bits: int, sub: list[int]
):
    sw = _subimage_dims(w, bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = sub[(y >> bits) * sw + (x >> bits)]
            g2r = cte & 0xFF  # blue channel
            g2b = (cte >> 8) & 0xFF  # green channel
            r2b = (cte >> 16) & 0xFF  # red channel
            px = pix[i]
            a = px >> 24 & 0xFF
            r = px >> 16 & 0xFF
            g = px >> 8 & 0xFF
            b = px & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            pix[i] = (a << 24) | (r << 16) | (g << 8) | b


def _inv_subtract_green(pix: list[int]):
    for i, px in enumerate(pix):
        g = px >> 8 & 0xFF
        r = ((px >> 16 & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        pix[i] = (px & 0xFF000000) | (r << 16) | (px & 0xFF00) | b


def _palette_width_bits(size: int) -> int:
    if size <= 2:
        return 3
    if size <= 4:
        return 2
    if size <= 16:
        return 1
    return 0


def decode_webp(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a lossless (VP8L) WebP.  Returns (width, height, 4,
    RGBA bytes) — alpha rides along since VP8L is natively ARGB.
    Lossy (VP8) and extended (VP8X-wrapped lossy) files raise
    NotImplementedError, keeping the stub-fallback seam."""
    if data[:4] != WEBP_RIFF or data[8:12] != WEBP_TAG:
        raise ValueError("not a WebP payload")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if tag == VP8L_TAG:
            payload = data[pos + 8 : pos + 8 + size]
            break
        if tag in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                "lossy/extended WebP (VP8/VP8X) not supported — stub fallback"
            )
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("no VP8L chunk in WebP container")
    if payload[0] != VP8L_MAGIC_BYTE:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(payload, 1)
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha-used hint
    if br.bits(3) != 0:
        raise ValueError("unsupported VP8L version")

    # transforms (level 0 only), read order recorded for reverse apply
    transforms: list[tuple] = []
    seen = set()
    dec_w = w  # color-indexing narrows the coded width
    while br.bit():
        ttype = br.bits(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            bits = 2 + br.bits(3)
            sub = _decode_pixels(
                br, _subimage_dims(dec_w, bits), _subimage_dims(h, bits), False
            )
            transforms.append(("predictor", bits, sub))
        elif ttype == 1:  # color transform
            bits = 2 + br.bits(3)
            sub = _decode_pixels(
                br, _subimage_dims(dec_w, bits), _subimage_dims(h, bits), False
            )
            transforms.append(("color", bits, sub))
        elif ttype == 2:
            transforms.append(("subtract_green",))
        else:  # color indexing
            psize = br.bits(8) + 1
            praw = _decode_pixels(br, psize, 1, False)
            # palette entries are component-wise delta-coded
            palette = []
            prev = 0
            for p in praw:
                prev = _add_px(p, prev)
                palette.append(prev)
            wbits = _palette_width_bits(psize)
            dec_w = _subimage_dims(dec_w, wbits)
            transforms.append(("palette", palette, wbits))

    pix = _decode_pixels(br, dec_w, h, True)

    for t in reversed(transforms):
        if t[0] == "palette":
            _, palette, wbits = t
            if wbits:
                bpp = 8 >> wbits
                per = 1 << wbits
                wide = []
                for y in range(h):
                    row = pix[y * dec_w : (y + 1) * dec_w]
                    for x in range(w):
                        packed = row[x // per]
                        idx = ((packed >> 8) & 0xFF) >> (
                            (x % per) * bpp
                        ) & ((1 << bpp) - 1)
                        if idx >= len(palette):
                            raise ValueError("VP8L palette index overflow")
                        wide.append(palette[idx])
                pix = wide
            else:
                out = []
                for px in pix:
                    idx = (px >> 8) & 0xFF
                    if idx >= len(palette):
                        raise ValueError("VP8L palette index overflow")
                    out.append(palette[idx])
                pix = out
            dec_w = w
        elif t[0] == "subtract_green":
            _inv_subtract_green(pix)
        elif t[0] == "predictor":
            _inv_predictor(pix, dec_w, h, t[1], t[2])
        else:
            _inv_color_transform(pix, dec_w, h, t[1], t[2])

    out = bytearray(w * h * 4)
    for i, px in enumerate(pix):
        out[4 * i] = px >> 16 & 0xFF  # R
        out[4 * i + 1] = px >> 8 & 0xFF  # G
        out[4 * i + 2] = px & 0xFF  # B
        out[4 * i + 3] = px >> 24 & 0xFF  # A
    return w, h, 4, bytes(out)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    """LSB-first bit writer (VP8L convention)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.bitbuf = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.bitbuf |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf = 0
            self.nbits = 0
        return bytes(self.out)


def _huffman_lengths(freqs: dict[int, int], maxlen: int = 15) -> dict[int, int]:
    """Code lengths from frequencies (heap Huffman), length-limited by
    frequency flooring retries — fine at test scale."""
    syms = [s for s, f in freqs.items() if f > 0]
    if not syms:
        raise ValueError("no symbols")
    if len(syms) == 1:
        return {syms[0]: 1}
    floor = 1
    while True:
        heap = [(max(freqs[s] // floor, 1), s, [s]) for s in syms]
        heapq.heapify(heap)
        depth = {s: 0 for s in syms}
        counter = max(syms) + 1
        while len(heap) > 1:
            f1, _t1, g1 = heapq.heappop(heap)
            f2, _t2, g2 = heapq.heappop(heap)
            for s in g1 + g2:
                depth[s] += 1
            heapq.heappush(heap, (f1 + f2, counter, g1 + g2))
            counter += 1
        if max(depth.values()) <= maxlen:
            return depth
        floor *= 2  # flatten the distribution and retry


def _write_code(bw: _BitWriter, lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Emit a prefix code (simple form when 1-2 symbols, else the
    normal code-length-coded form with a flat no-repeat transmission)
    and return {symbol: (code, length)} for writing payload symbols."""
    used = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
    if not used:
        raise ValueError("cannot emit empty code")
    if len(used) == 1 and used[0][0] < 256:
        s0 = used[0][0]
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        return {s0: (0, 0)}
    if (
        len(used) == 2
        and used[0][0] < 256
        and used[1][0] < 256
        and used[0][1] == 1
        and used[1][1] == 1
    ):
        s0, s1 = used[0][0], used[1][0]
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # two symbols
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        bw.write(s1, 8)
        return {s0: (0, 1), s1: (1, 1)}
    # normal form
    bw.write(0, 1)
    cl_freq: dict[int, int] = {}
    for ln in lengths:
        cl_freq[ln] = cl_freq.get(ln, 0) + 1
    cl_lengths_map = _huffman_lengths(cl_freq, maxlen=7)
    if len(cl_lengths_map) == 1:
        # a single code-length value: give it length 1 plus a dummy
        # companion so the code-length code is well-formed
        only = next(iter(cl_lengths_map))
        dummy = 0 if only != 0 else 1
        cl_lengths_map = {only: 1, dummy: 1}
    cl_lengths = [cl_lengths_map.get(v, 0) for v in range(19)]
    bw.write(15, 4)  # num_code_lengths = 19
    for v in _CLC_ORDER:
        bw.write(cl_lengths[v], 3)
    cl_codes = _canonical(cl_lengths)
    bw.write(0, 1)  # no max_symbol field: all lengths transmitted
    for ln in lengths:
        c, cl = cl_codes[ln]
        _write_msb(bw, c, cl)
    return _canonical(lengths)


def _canonical(lengths: list[int]) -> dict[int, tuple[int, int]]:
    pairs = sorted((ln, s) for s, ln in enumerate(lengths) if ln > 0)
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev = pairs[0][0]
    for ln, s in pairs:
        code <<= ln - prev
        prev = ln
        out[s] = (code, ln)
        code += 1
    return out


def _write_msb(bw: _BitWriter, code: int, length: int) -> None:
    """Prefix-code bits go MSB-first into the LSB-first stream."""
    for i in range(length - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _emit_literal_image(bw: _BitWriter, pix: list[int], is_level0: bool):
    """Emit an entropy-coded image as pure literals: no color cache, no
    meta prefix, one code group, real canonical prefix codes per
    channel, no LZ77 (the decoder's backref/cache paths are exercised
    by external streams; round-trip tests cover literals + transforms)."""
    bw.write(0, 1)  # no color cache
    if is_level0:
        bw.write(0, 1)  # no meta prefix
    chans = {
        "g": [(p >> 8) & 0xFF for p in pix],
        "r": [(p >> 16) & 0xFF for p in pix],
        "b": [p & 0xFF for p in pix],
        "a": [(p >> 24) & 0xFF for p in pix],
    }

    def lengths_for(values: list[int], size: int) -> list[int]:
        freq: dict[int, int] = {}
        for v in values:
            freq[v] = freq.get(v, 0) + 1
        lm = _huffman_lengths(freq)
        out = [0] * size
        for s, ln in lm.items():
            out[s] = ln
        return out

    green_codes = _write_code(bw, lengths_for(chans["g"], 256 + 24))
    red_codes = _write_code(bw, lengths_for(chans["r"], 256))
    blue_codes = _write_code(bw, lengths_for(chans["b"], 256))
    alpha_codes = _write_code(bw, lengths_for(chans["a"], 256))
    dist_lengths = [0] * 40
    dist_lengths[0] = 1
    _write_code(bw, dist_lengths)  # unused distance tree
    for i in range(len(pix)):
        c, ln = green_codes[chans["g"][i]]
        _write_msb(bw, c, ln)
        c, ln = red_codes[chans["r"][i]]
        _write_msb(bw, c, ln)
        c, ln = blue_codes[chans["b"][i]]
        _write_msb(bw, c, ln)
        c, ln = alpha_codes[chans["a"][i]]
        _write_msb(bw, c, ln)


def encode_webp(
    w: int,
    h: int,
    ch: int,
    pixels: bytes,
    transform: str | None = None,
    palette: list[tuple[int, int, int]] | None = None,
) -> bytes:
    """Lossless VP8L encoder — round-trip companion of ``decode_webp``
    (bit-exact: VP8L is lossless).  ``transform`` selects the coding
    path to exercise: None (plain literals), 'subtract_green',
    'predictor' (constant left-predict, mode 1), or 'palette' (pass the
    palette; pixels must be palette-expandable)."""
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions must be in 1..16384 (14-bit fields)")
    if len(pixels) != w * h * ch:
        raise ValueError("pixel buffer does not match dimensions")
    if ch not in (3, 4):
        raise ValueError("encode_webp supports 3 or 4 channels")
    pix = []
    for i in range(w * h):
        r = pixels[ch * i]
        g = pixels[ch * i + 1]
        b = pixels[ch * i + 2]
        a = pixels[ch * i + 3] if ch == 4 else 255
        pix.append((a << 24) | (r << 16) | (g << 8) | b)

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if ch == 4 else 0, 1)
    bw.write(0, 3)  # version

    enc_w = w
    if transform == "subtract_green":
        bw.write(1, 1)
        bw.write(2, 2)
        for i, px in enumerate(pix):
            g = px >> 8 & 0xFF
            r = ((px >> 16 & 0xFF) - g) & 0xFF
            b = ((px & 0xFF) - g) & 0xFF
            pix[i] = (px & 0xFF000000) | (r << 16) | (px & 0xFF00) | b
    elif transform == "predictor":
        bits = 4  # 16x16 blocks
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(bits - 2, 3)
        sw, sh = _subimage_dims(w, bits), _subimage_dims(h, bits)
        # constant mode-1 (left) subimage: mode rides the green channel
        _emit_literal_image(bw, [0xFF000100] * (sw * sh), False)
        res = list(pix)
        for y in range(h - 1, -1, -1):
            for x in range(w - 1, -1, -1):
                i = y * w + x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = pix[i - 1]
                elif x == 0:
                    pred = pix[i - w]
                else:
                    pred = pix[i - 1]  # mode 1: left
                res[i] = _sub_px(pix[i], pred)
        pix = res
    elif transform == "palette":
        if palette is None:
            raise ValueError("palette transform needs a palette")
        lut = {
            (0xFF000000 | (r << 16) | (g << 8) | b): i
            for i, (r, g, b) in enumerate(palette)
        }
        idx = []
        for px in pix:
            if px not in lut:
                raise ValueError("pixel outside palette")
            idx.append(lut[px])
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(palette) - 1, 8)
        ppix = [
            0xFF000000 | (r << 16) | (g << 8) | b for r, g, b in palette
        ]
        deltas = []
        prev = 0
        for p in ppix:
            deltas.append(_sub_px(p, prev))
            prev = p
        _emit_literal_image(bw, deltas, False)
        wbits = _palette_width_bits(len(palette))
        if wbits:
            bpp = 8 >> wbits
            per = 1 << wbits
            enc_w = _subimage_dims(w, wbits)
            packed = []
            for y in range(h):
                for px0 in range(enc_w):
                    v = 0
                    for k in range(per):
                        x = px0 * per + k
                        if x < w:
                            v |= idx[y * w + x] << (k * bpp)
                    packed.append(0xFF000000 | (v << 8))
            pix = packed
        else:
            pix = [0xFF000000 | (i << 8) for i in idx]
    elif transform is not None:
        raise ValueError(f"unknown transform {transform!r}")

    bw.write(0, 1)  # end of transforms
    _emit_literal_image(bw, pix, True)
    payload = bytes([VP8L_MAGIC_BYTE]) + bw.finish()
    if len(payload) & 1:
        chunk = VP8L_TAG + struct.pack("<I", len(payload)) + payload + b"\x00"
    else:
        chunk = VP8L_TAG + struct.pack("<I", len(payload)) + payload
    riff = WEBP_TAG + chunk
    return WEBP_RIFF + struct.pack("<I", len(riff)) + riff


def _sub_px(a: int, b: int) -> int:
    """Per-channel modular subtraction of packed ARGB pixels."""
    return (
        (((a >> 24 & 0xFF) - (b >> 24 & 0xFF)) & 0xFF) << 24
        | (((a >> 16 & 0xFF) - (b >> 16 & 0xFF)) & 0xFF) << 16
        | (((a >> 8 & 0xFF) - (b >> 8 & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
    )
