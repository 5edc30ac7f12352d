"""Multimodal plumbing: schemas, batch shapes, determinism of the stub
decode, and row expansion of frame sampling."""

from __future__ import annotations

from clear_map_data_pipeline_spark.operators import multimodal as mm
from clear_map_data_pipeline_spark.session import Tables


def test_image_features_schema_and_determinism(spark, sf_dir):
    docs = Tables(spark, sf_dir).documents
    feats = mm.image_features(mm.attach_binary_payload(docs))
    assert feats.columns == ["doc_id", "n_bytes", "checksum", "width", "height"]
    a = {r["doc_id"]: (r["checksum"], r["width"], r["height"]) for r in feats.collect()}
    b = {r["doc_id"]: (r["checksum"], r["width"], r["height"]) for r in feats.collect()}
    assert a == b and len(a) == docs.count()
    # stub decode mirrors the local function exactly
    row = docs.select("doc_id", "text").first()
    crc, w, h = mm.decode_stub(row["text"].encode("utf-8"))
    assert a[row["doc_id"]] == (crc, w, h)


def test_real_decoder_seam_raises(spark, sf_dir):
    import pytest

    docs = Tables(spark, sf_dir).documents.limit(1)
    feats = mm.image_features(
        mm.attach_binary_payload(docs), use_real_decoder=True
    )
    with pytest.raises(Exception):
        feats.collect()


def test_image_resize_fixed_output(spark, sf_dir):
    docs = Tables(spark, sf_dir).documents
    resized = mm.image_resize(mm.attach_binary_payload(docs), out_w=8, out_h=8)
    rows = resized.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert (r["width"], r["height"]) == (8, 8)
        assert 0 < len(r["pixels"]) <= 64


def test_audio_features_stats(spark, sf_dir):
    import numpy as np

    docs = Tables(spark, sf_dir).documents
    feats = mm.audio_features(mm.attach_binary_payload(docs), sample_rate=16000)
    a = {r["doc_id"]: (r["n_samples"], r["duration_s"], r["mean_amp"], r["peak_amp"])
         for r in feats.collect()}
    assert len(a) == docs.count()
    row = docs.select("doc_id", "text").first()
    arr = np.frombuffer(row["text"].encode("utf-8"), dtype=np.uint8)
    assert a[row["doc_id"]] == (
        len(arr),
        round(len(arr) / 16000, 6),
        round(float(arr.mean()), 4),
        int(arr.max()),
    )


def test_frame_sample_expansion(spark, sf_dir):
    docs = Tables(spark, sf_dir).documents
    n_docs = docs.count()
    frames = mm.frame_sample(mm.attach_binary_payload(docs), n_frames=4)
    rows = frames.collect()
    assert len(rows) == 4 * n_docs
    assert {r["frame_idx"] for r in rows} == {0, 1, 2, 3}
    assert all(len(r["frame_bytes"]) > 0 for r in rows)
