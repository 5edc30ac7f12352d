"""Multimodal queries (rows-only checks: the pseudo-decode checksum has
no portable SQL twin; plumbing asserts live in tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import multimodal as mm
from ..registry import register
from ..session import Tables


@register("mm_image_features")
def mm_image_features(spark, sf_dir):
    """Binary payload -> Arrow-batched feature extraction (mapInPandas);
    the decode itself is a deterministic stub (no media libs here) at
    the documented real-decoder seam."""
    t = Tables(spark, sf_dir)
    with_payload = mm.attach_binary_payload(t.documents)
    return mm.image_features(with_payload)


@register("mm_image_resize")
def mm_image_resize(spark, sf_dir):
    """Resize plumbing over binary payloads: strided-subsample stub at
    the PIL seam, fixed 8x8 output, wide input column pruned at the
    operator."""
    t = Tables(spark, sf_dir)
    with_payload = mm.attach_binary_payload(t.documents)
    resized = mm.image_resize(with_payload, out_w=8, out_h=8)
    return resized.select(
        "doc_id", "width", "height", F.length("pixels").alias("n_pixels")
    )


@register("mm_audio_features")
def mm_audio_features(spark, sf_dir):
    """Audio-as-PCM feature extraction (duration + amplitude stats),
    vectorized numpy per Arrow batch; narrow output, no shuffle."""
    t = Tables(spark, sf_dir)
    with_payload = mm.attach_binary_payload(t.documents)
    return mm.audio_features(with_payload)


@register("mm_frame_sample")
def mm_frame_sample(spark, sf_dir):
    """Row-expanding frame sampling over binary payloads (4 evenly
    spaced slices per payload), streamed out batch by batch."""
    t = Tables(spark, sf_dir)
    with_payload = mm.attach_binary_payload(t.documents)
    frames = mm.frame_sample(with_payload, n_frames=4)
    return frames.select(
        "doc_id", "frame_idx", F.length("frame_bytes").alias("frame_len")
    )
