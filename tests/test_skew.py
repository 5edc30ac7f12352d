"""Skew toolkit (operators/skew.py).  salted_join and
salted_distinct_count are oracle-verified through their registered
queries (j_skew_salted_join, a_distinct_count_skewsafe — oracle = the
plain formulation); salted_topk_per_group is verified here the same
way: row-identical to the single-window top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from clear_map_data_pipeline_spark.operators.skew import (
    salted_distinct_count,
    salted_topk_per_group,
)
from clear_map_data_pipeline_spark.session import Tables


def _plain_topk(df, key, order_by, k):
    w = Window.partitionBy(key).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def test_salted_topk_matches_plain_on_fixture(spark, sf_dir):
    orders = Tables(spark, sf_dir).orders
    order_by = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    got = salted_topk_per_group(orders, "o_custkey", order_by, k=3, salt=8)
    want = _plain_topk(orders, "o_custkey", order_by, 3)
    assert sorted(map(str, map(tuple, got.collect()))) == sorted(
        map(str, map(tuple, want.collect()))
    )


def test_salted_topk_hot_key(spark):
    # one key holds 90% of the rows — the case the salting exists for
    rows = [(0, i, float(i % 97)) for i in range(9000)] + [
        (j, 10000 + i, float(i % 89)) for j in range(1, 11) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "key long, id long, score double")
    order_by = [F.col("score").desc(), F.col("id")]
    got = salted_topk_per_group(df, "key", order_by, k=5, salt=16)
    want = _plain_topk(df, "key", order_by, 5)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # every key yields exactly k (all groups here have >= k rows)
    counts = {r["key"]: r["n"] for r in got.groupBy("key").agg(F.count("*").alias("n")).collect()}
    assert set(counts.values()) == {5}


def test_salted_topk_groups_smaller_than_k(spark):
    df = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 2.0), (2, 3, 3.0)],
        "key long, id long, score double",
    )
    order_by = [F.col("score").desc(), F.col("id")]
    got = salted_topk_per_group(df, "key", order_by, k=5, salt=4).collect()
    assert len(got) == 3  # nothing dropped, nothing duplicated


def _skewed_daily(spark, n_rows=40_000, n_ids=400, hot_share=0.10):
    """Synthesize a pipeline-shaped daily series (id, date, cases,
    new_case) where ONE id holds ``hot_share`` of all rows — the
    reference's concentration risk (il_analysis_git.py:55-58: city 0 /
    area 0 soak up the unmapped population)."""
    hot_rows = int(n_rows * hot_share)
    cold_per_id = (n_rows - hot_rows) // (n_ids - 1)
    return (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") < hot_rows, F.lit(0))
            .otherwise((F.col("id") - hot_rows) / cold_per_id + 1)
            .cast("long")
            .alias("sid"),
            F.when(F.col("id") < hot_rows, F.col("id"))
            .otherwise((F.col("id") - hot_rows) % cold_per_id)
            .cast("int")
            .alias("day_off"),
        )
        .select(
            F.col("sid").alias("id"),
            F.date_add(F.lit("2020-01-01").cast("date"), F.col("day_off")).alias(
                "date"
            ),
            # censored regime for the first 30 days of every id, so the
            # rebase CASE branch is exercised on both sides
            F.when(F.col("day_off") < 30, F.lit(0))
            .otherwise(F.col("day_off") - 29)
            .cast("long")
            .alias("cases"),
            (F.col("day_off") % 3 == 0).cast("long").alias("new_case"),
        )
    )


@pytest.mark.skew_drill
def test_pipeline_window_stage_under_hot_key(spark):
    """r03-verdict task #7: drive the pipeline's id-window stage
    (rebase_censored — the flagship operator) over a 40k-row series
    where one id holds 10% of rows.

    Asserts:
    (a) EXACTNESS on the hot id — the window semantics must not care
        about skew (literal Python recompute of the censored rebase);
    (b) the hot key's post-exchange partition carries only its own
        mass — hash partitioning bounds the straggler to the key's
        share (the irreducible floor for an ORDER-DEPENDENT window:
        a per-key cumulative sum cannot be salted without breaking the
        prefix frame).  When the hot stage is an aggregation instead,
        reach for the salted twins (salted_join / salted_topk_per_group
        / salted_distinct_count in operators/skew.py) or AQE skew-join
        splitting — those shapes commute with salting; windows do not.
    """
    from clear_map_data_pipeline_spark.operators.rebase import rebase_censored

    df = _skewed_daily(spark)
    out = rebase_censored(df, {"cases": "new_case"})
    hot = sorted(
        (r["date"], r["cases"])
        for r in out.filter(F.col("id") == 0).collect()
    )
    # literal recompute: cumsum(cases)==0 rows get cumsum(new_case)
    import datetime as dt

    base = dt.date(2020, 1, 1)
    cum_c = cum_f = 0
    want = []
    for off in range(4000):
        cases = 0 if off < 30 else off - 29
        flag = 1 if off % 3 == 0 else 0
        cum_c += cases
        cum_f += flag
        want.append((base + dt.timedelta(days=off), cases + (cum_f if cum_c == 0 else 0)))
    assert hot == sorted(want)

    # (b) partition-mass bound after the id hash-exchange at a
    # resolution where 10% IS skewed (64 > 10 partitions)
    parts = (
        df.repartition(64, "id")
        .rdd.mapPartitions(lambda it: [sum(1 for _ in it)])
        .collect()
    )
    n = sum(parts)
    hot_mass = 4000 / n
    assert max(parts) / n <= hot_mass + 0.04, (
        "straggler partition exceeds the hot key's own mass: "
        f"{max(parts) / n:.3f} vs key share {hot_mass:.3f}"
    )


@pytest.mark.skew_drill
def test_salted_distinct_count_under_hot_key(spark):
    """The aggregation shapes DO commute with salting: the two-stage
    salted distinct-count over the same hot-key fixture must equal the
    plain distinct count exactly."""
    df = _skewed_daily(spark).select(
        "id", F.col("date").cast("string").alias("v")
    )
    plain = {
        (r["id"], r["n"])
        for r in df.groupBy("id")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    salted = {
        (r["id"], r["n_distinct"])
        for r in salted_distinct_count(df, "id", "v", salt=8).collect()
    }
    assert salted == plain
