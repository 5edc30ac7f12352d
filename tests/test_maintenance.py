"""Small-files compaction (operators/maintenance.py)."""

from __future__ import annotations


def test_compact_parquet_dataset_reduces_files_preserves_rows(
    spark, sf_dir, tmp_path
):
    from clear_map_data_pipeline_spark.operators.maintenance import (
        compact_parquet_dataset,
        dataset_stats,
    )
    from clear_map_data_pipeline_spark.session import Tables

    src = str(tmp_path / "fragmented")
    events = Tables(spark, sf_dir).events
    events.repartition(32).write.parquet(src)  # the small-files mess
    before = dataset_stats(spark, src)
    assert before.n_files >= 32

    out = str(tmp_path / "compacted")
    report = compact_parquet_dataset(
        spark, src, out, target_file_bytes=64 * 1024 * 1024
    )
    assert report["files_before"] == before.n_files
    assert report["files_after"] < before.n_files
    assert report["files_after"] == report["target_files"]

    got = spark.read.parquet(out)
    assert got.count() == events.count()
    s = sorted(map(str, (tuple(r) for r in got.collect())))
    w = sorted(map(str, (tuple(r) for r in events.collect())))
    assert s == w


def test_compact_with_clustering_orders_within_files(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from clear_map_data_pipeline_spark.operators.maintenance import (
        compact_parquet_dataset,
    )
    from clear_map_data_pipeline_spark.session import Tables

    src = str(tmp_path / "src")
    Tables(spark, sf_dir).events.repartition(16).write.parquet(src)
    out = str(tmp_path / "clustered")
    compact_parquet_dataset(
        spark, src, out, target_file_bytes=1 << 40, order_by=["user_id"]
    )
    # single output file, globally sorted within it
    df = spark.read.parquet(out)
    ids = [r["user_id"] for r in df.select("user_id").collect()]
    assert ids == sorted(ids)
    # min/max pruning now works: a selective filter scans 1 row group
    assert df.filter(F.col("user_id") == ids[0]).count() >= 1
