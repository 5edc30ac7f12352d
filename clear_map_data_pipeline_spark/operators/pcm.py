"""Companded / compressed PCM codecs for the WAV seam, pure stdlib:
G.711 mu-law + A-law (ITU-T G.711 segmented companding), IEEE float32
samples, and IMA/DVI ADPCM (the block-structured 4-bit format WAV
fmt 0x11 carries — step-size table of 89 entries, per-block predictor
headers, channel-interleaved 4-byte nibble groups).

``decode_wav`` (operators/multimodal.py) dispatches here by the fmt
chunk's audio-format tag, so ``audio_features``' magic-sniffed real
path covers the telephony (G.711) and speech-corpus (ADPCM) encodings
real training data carries alongside plain PCM.  Each decoder has a
round-trip encoder companion: G.711 satisfies encode(decode(c)) == c
for every code byte, ADPCM decode is bit-exact against the nibble
stream its encoder emits (verified against an independent literal
reimplementation in tests), float32 round-trips int16 grids exactly.

Reference parity: the reference pipeline has no audio surface (its
media handling is out of scope per SURVEY.md §2); this extends the
training-data multimodal columns the build brief requires.
"""

from __future__ import annotations

import struct

# ---- G.711 (segmented companding; ITU-T G.711 / the public-domain
# ---- Sun g711.c algorithm shape: segment search over seg_end) --------

_SEG_END = (0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF)
_MU_BIAS = 0x84  # 132
_MU_CLIP = 32635


def _seg_search(val: int) -> int:
    for seg, end in enumerate(_SEG_END):
        if val <= end:
            return seg
    return len(_SEG_END)


def mulaw_decode_byte(code: int) -> int:
    """One G.711 mu-law code byte -> linear 16-bit sample."""
    code = ~code & 0xFF
    t = ((code & 0x0F) << 3) + _MU_BIAS
    t <<= (code >> 4) & 0x07
    return _MU_BIAS - t if code & 0x80 else t - _MU_BIAS


def mulaw_encode_sample(s: int) -> int:
    """Linear 16-bit sample -> G.711 mu-law code byte."""
    sign = 0x80 if s < 0 else 0
    if s < 0:
        s = -s
    if s > _MU_CLIP:
        s = _MU_CLIP
    s += _MU_BIAS
    seg = _seg_search(s)
    if seg >= 8:  # pragma: no cover - clip guarantees seg < 8
        return ~sign & 0xFF
    return ~(sign | (seg << 4) | ((s >> (seg + 3)) & 0x0F)) & 0xFF


def alaw_decode_byte(code: int) -> int:
    """One G.711 A-law code byte -> linear 16-bit sample.  After the
    0x55 toggle the sign bit SET means positive (unlike mu-law)."""
    code ^= 0x55
    t = (code & 0x0F) << 4
    seg = (code >> 4) & 0x07
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if code & 0x80 else -t


def alaw_encode_sample(s: int) -> int:
    """Linear 16-bit sample -> G.711 A-law code byte."""
    if s >= 0:
        mask = 0xD5  # sign bit set (positive), pre-toggled
    else:
        mask = 0x55
        s = min(-s - 8, 32767)
    seg = _seg_search(s)
    if seg >= 8:  # pragma: no cover - int16 inputs keep seg < 8
        return 0x7F ^ mask
    aval = seg << 4
    if seg < 2:
        aval |= (s >> 4) & 0x0F
    else:
        aval |= (s >> (seg + 3)) & 0x0F
    return aval ^ mask


# ---- IMA / DVI ADPCM (WAV fmt 0x11) ----------------------------------

IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
)
IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """Advance one IMA decode step: (pred, index) x nibble -> updated."""
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + IMA_INDEX_TABLE[nibble & 7]))
    return pred, index


def ima_adpcm_decode(
    data: bytes, n_ch: int, block_align: int,
    samples_per_block: int | None = None,
) -> list[int]:
    """Decode an IMA-ADPCM WAV data chunk to interleaved 16-bit
    samples.  Per block and channel: a 4-byte header (int16 predictor
    = the block's first output sample, uint8 step index, reserved),
    then 4-byte nibble groups interleaved across channels (8 samples
    per channel per group, low nibble first).

    ``samples_per_block`` (the fmt extension's wSamplesPerBlock, when
    present) caps the decoded per-channel output of each block: real
    encoders zero-pad the nibble area of short blocks to full
    alignment, and without the cap the pad decodes as extra trailing
    samples (ADVICE r05)."""
    if n_ch < 1 or block_align < 4 * n_ch:
        raise ValueError("invalid ADPCM layout")
    out: list[int] = []
    for bstart in range(0, len(data) - (4 * n_ch) + 1, block_align):
        block = data[bstart : bstart + block_align]
        preds, idxs = [], []
        chans: list[list[int]] = []
        for c in range(n_ch):
            pred, index = struct.unpack_from("<hB", block, 4 * c)[:2]
            index = min(index, 88)
            preds.append(pred)
            idxs.append(index)
            chans.append([pred])
        pos = 4 * n_ch
        while pos + 4 * n_ch <= len(block):
            for c in range(n_ch):
                for b in block[pos + 4 * c : pos + 4 * c + 4]:
                    for nib in (b & 0x0F, b >> 4):
                        preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                        chans[c].append(preds[c])
            pos += 4 * n_ch
        n = len(chans[0])
        if samples_per_block is not None:
            n = min(n, samples_per_block)
        for i in range(n):
            for c in range(n_ch):
                out.append(chans[c][i])
    if not out:
        raise ValueError("truncated ADPCM data")
    return out


def ima_adpcm_encode(
    samples: list[int], n_ch: int = 1, samples_per_block: int = 505
) -> tuple[bytes, int]:
    """Encode interleaved 16-bit samples to IMA-ADPCM blocks; returns
    (data, block_align).  ``samples_per_block`` counts samples per
    channel per block (header sample + 8k nibble samples); the tail
    block is zero-padded to full alignment like real encoders do."""
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 1 + multiple of 8")
    if len(samples) % n_ch:
        raise ValueError("sample count not divisible by channel count")
    block_align = 4 * n_ch + ((samples_per_block - 1) // 2) * n_ch
    frames = [
        samples[i : i + n_ch] for i in range(0, len(samples), n_ch)
    ]
    out = bytearray()
    idxs = [0] * n_ch
    for bstart in range(0, len(frames), samples_per_block):
        blk = frames[bstart : bstart + samples_per_block]
        while len(blk) < samples_per_block:  # zero-pad the tail block
            blk.append([0] * n_ch)
        preds = []
        for c in range(n_ch):
            pred = blk[0][c]
            out += struct.pack("<hBx", pred, idxs[c])
            preds.append(pred)
        nibbles: list[list[int]] = [[] for _ in range(n_ch)]
        for frame in blk[1:]:
            for c in range(n_ch):
                step = IMA_STEP_TABLE[idxs[c]]
                delta = frame[c] - preds[c]
                nib = 8 if delta < 0 else 0
                if delta < 0:
                    delta = -delta
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                nibbles[c].append(nib)
        # pack: per channel 4-byte groups (8 nibbles), interleaved
        for g in range(0, len(nibbles[0]), 8):
            for c in range(n_ch):
                grp = nibbles[c][g : g + 8]
                for k in range(0, 8, 2):
                    out.append(grp[k] | (grp[k + 1] << 4))
    return bytes(out), block_align
