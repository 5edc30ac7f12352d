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


def test_zorder_clusters_all_dimensions(spark, tmp_path):
    """Z-order vs lexicographic layout over two independent uniform
    columns: the x-sorted layout gives tight per-file x ranges but
    useless (~full-span) y ranges; the Z-ordered layout must tighten
    BOTH — the property that makes multi-column min/max pruning work."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from clear_map_data_pipeline_spark.operators.maintenance import (
        compact_parquet_dataset,
    )

    n = 1 << 14
    df = spark.range(n).select(
        # bit-reversal-ish scramble decorrelates x and y from row order
        (F.col("id") * 48271 % n).alias("x"),
        (F.col("id") * 16807 % n).alias("y"),
    )
    src = str(tmp_path / "grid")
    df.repartition(8).write.parquet(src)
    from clear_map_data_pipeline_spark.operators.maintenance import (
        dataset_stats,
    )

    # ~64 output files: the z-curve's per-file bbox shrinks ~sqrt(1/F),
    # so the contrast needs enough files to be unambiguous
    target = max(1, dataset_stats(spark, src).total_bytes // 64)

    def mean_fracs(path):
        fx, fy = [], []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.read_metadata(f)
            lo = {"x": None, "y": None}
            hi = {"x": None, "y": None}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name in lo:
                        st = col.statistics
                        lo[name] = st.min if lo[name] is None else min(lo[name], st.min)
                        hi[name] = st.max if hi[name] is None else max(hi[name], st.max)
            fx.append((hi["x"] - lo["x"]) / (n - 1))
            fy.append((hi["y"] - lo["y"]) / (n - 1))
        return sum(fx) / len(fx), sum(fy) / len(fy)

    lex = str(tmp_path / "lex")
    compact_parquet_dataset(
        spark, src, lex, target_file_bytes=target, order_by=["x"]
    )
    zor = str(tmp_path / "zorder")
    compact_parquet_dataset(
        spark, src, zor, target_file_bytes=target, zorder_by=["x", "y"]
    )
    lex_x, lex_y = mean_fracs(lex)
    z_x, z_y = mean_fracs(zor)
    # lexicographic: x tight, y spans nearly everything
    assert lex_x < 0.2 and lex_y > 0.8
    # z-order: BOTH dimensions substantially tighter than full span
    assert z_x < 0.5 and z_y < 0.5
    # and rows survive exactly
    got = spark.read.parquet(zor)
    assert got.count() == n
    assert got.select(F.sum("x")).first()[0] == df.select(F.sum("x")).first()[0]


def test_zorder_value_validation(spark):
    import pytest
    from pyspark.sql import functions as F

    from clear_map_data_pipeline_spark.operators.maintenance import (
        zorder_value,
    )

    df = spark.range(10).select(
        F.col("id").alias("a"), F.lit(7).alias("const")
    )
    with pytest.raises(ValueError, match="at least one"):
        zorder_value(df, [])
    with pytest.raises(ValueError, match="<= 62"):
        zorder_value(df, ["a", "const"], bits=32)
    # constant column contributes bucket 0 everywhere; key still ranks by a
    rows = zorder_value(df, ["a", "const"], bits=8).collect()
    by_a = sorted((r["a"], r["_z"]) for r in rows)
    zs = [z for _, z in by_a]
    assert zs == sorted(zs)  # monotone in the only varying column

    # r02 ADVICE: unorderable / degenerate inputs must raise, not
    # silently cluster nothing
    sdf = df.withColumn("s", F.lit("text"))
    with pytest.raises(ValueError, match="unorderable type"):
        zorder_value(sdf, ["a", "s"])
    with pytest.raises(ValueError, match="not in df"):
        zorder_value(df, ["missing"])
    with pytest.raises(ValueError, match="already exists"):
        zorder_value(df.withColumn("_z", F.lit(1)), ["a"])
    nulls = df.withColumn("n", F.lit(None).cast("double"))
    with pytest.raises(ValueError, match="entirely NULL"):
        zorder_value(nulls, ["a", "n"])
    # date columns are orderable via day-number
    dated = df.select(
        "a", F.date_add(F.lit("2024-01-01").cast("date"), F.col("a").cast("int")).alias("d")
    )
    drows = sorted(
        (r["a"], r["_z"]) for r in zorder_value(dated, ["d"], bits=8).collect()
    )
    dzs = [z for _, z in drows]
    assert dzs == sorted(dzs)


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
