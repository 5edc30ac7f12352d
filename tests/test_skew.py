"""Skew toolkit (operators/skew.py).  salted_join and
salted_distinct_count are oracle-verified through their registered
queries (j_skew_salted_join, a_distinct_count_skewsafe — oracle = the
plain formulation); salted_topk_per_group is verified here the same
way: row-identical to the single-window top-k."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from clear_map_data_pipeline_spark.operators.skew import (
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
