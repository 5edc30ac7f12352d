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
