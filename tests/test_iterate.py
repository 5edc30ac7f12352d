"""The shared fixpoint-loop conf context (operators/iterate.py): width
sizing, restore-on-exit (normal and exception paths), and invariance of
the two driver-materialized trainers that run under it — the property
that makes the latency tuning safe is that every per-round computation
is order-independent, so the confs must never change results."""

from __future__ import annotations

import pytest

from clear_map_data_pipeline_spark.operators.iterate import iteration_confs


def _confs(spark):
    return (
        spark.conf.get("spark.sql.shuffle.partitions"),
        spark.conf.get("spark.sql.adaptive.enabled"),
    )


def test_width_sizing_and_restore(spark):
    before = _confs(spark)
    with iteration_confs(spark, 1_500) as parts:
        assert parts == 2  # floor
        assert _confs(spark) == ("2", "false")
    assert _confs(spark) == before

    # expected width derives from the session default (min(default,
    # ceil(n/1M))) so a conftest width change can't break this spuriously
    with iteration_confs(spark, 3_200_000) as parts:
        assert parts == min(int(before[0]), 4)  # ceil(3.2M / 1M) capped
    assert _confs(spark) == before

    # never above the session default (8 in the test session)
    with iteration_confs(spark, 10**9) as parts:
        assert parts == int(before[0])
    assert _confs(spark) == before


def test_restore_on_exception(spark):
    before = _confs(spark)
    with pytest.raises(RuntimeError):
        with iteration_confs(spark, 100):
            assert _confs(spark) == ("2", "false")
            raise RuntimeError("loop blew up")
    assert _confs(spark) == before


def test_lloyd_centroids_invariant_under_session_confs(spark):
    """The fit collects at every round, so it executes under whatever
    confs the context picked; the integer-unit member sums make the
    result bit-identical at ANY width — pin that by fitting under
    deliberately perverse session confs and diffing."""
    from pyspark.sql import functions as F

    from clear_map_data_pipeline_spark.operators.similarity import (
        lloyd_centroids,
    )

    u = 9.223372036854776e18
    vec = (
        "transform(sequence(1, 8), i -> cast(xxhash64(concat("
        f"cast(vec_id as string), ':', cast(i as string))) as double) / {u})"
    )
    emb = spark.range(60).select(
        F.col("id").alias("vec_id"), F.expr(vec).alias("embedding")
    )

    def fit():
        rows = lloyd_centroids(emb, k_clusters=4, max_iter=2).collect()
        return sorted((r["cid"], tuple(r["_c"])) for r in rows)

    base = fit()
    before = _confs(spark)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        assert fit() == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before[0])
        spark.conf.set("spark.sql.adaptive.enabled", before[1])
    # and the session confs the fit itself flipped are restored
    assert _confs(spark) == before
