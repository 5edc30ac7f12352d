"""Focused tests for the r11 scheduling-overhead helpers in session.py:
``literal_frame`` (VALUES LocalRelation dims — zero-task broadcast
builds) and ``data_proportional_partitions`` (byte-sized partition
counts replacing ``defaultParallelism`` constants)."""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from clear_map_data_pipeline_spark.session import (
    Tables,
    data_proportional_partitions,
    literal_frame,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_literal_frame_is_local_relation(spark):
    df = literal_frame(
        spark, [(1, "a", 0.5), (2, "b", 1.5)], "k int, s string, v double"
    )
    assert "LocalTableScan" in _plan(df)
    assert "Scan ExistingRDD" not in _plan(df)
    assert df.dtypes == [("k", "int"), ("s", "string"), ("v", "double")]


def test_literal_frame_matches_create_dataframe(spark):
    rows = [
        (1, "it's", -0.0),
        (2, 'back\\slash "q"', 2.0**-13),
        (None, None, None),
        (3, "plain", 1e308),
    ]
    ddl = "k int, s string, v double"
    got = sorted(map(tuple, literal_frame(spark, rows, ddl).collect()), key=repr)
    want = sorted(map(tuple, spark.createDataFrame(rows, ddl).collect()), key=repr)
    assert got == want


def test_literal_frame_double_bits_survive_roundtrip(spark):
    vals = [
        0.1,
        2.0**-13,
        1e308,
        -1.2345678901234567e-300,
        math.pi,
        2.675,
        float("inf"),
        float("-inf"),
    ]
    df = literal_frame(spark, [(v,) for v in vals], "v double")
    got = [r["v"] for r in df.collect()]
    assert [struct.pack("d", v) for v in vals] == [
        struct.pack("d", g) for g in got
    ]
    (nan,) = literal_frame(spark, [(float("nan"),)], "v double").collect()[0]
    assert math.isnan(nan)


def test_literal_frame_array_of_double(spark):
    rows = [(7, [0.25, -1.5, 2.0**-20]), (9, None)]
    df = literal_frame(spark, rows, "cid long, _c array<double>")
    got = {r["cid"]: r["_c"] for r in df.collect()}
    assert got[7] == [0.25, -1.5, 2.0**-20]
    assert got[9] is None
    assert "LocalTableScan" in _plan(df)


def test_literal_frame_empty_and_struct_type_schema(spark):
    base = spark.createDataFrame([], "k int, s string")
    df = literal_frame(spark, [], base.schema)
    assert df.count() == 0
    assert df.dtypes == [("k", "int"), ("s", "string")]
    # empty LocalRelation: no parallelized empty slices to schedule
    assert df.rdd.getNumPartitions() <= 1


def test_literal_frame_rejects_unsupported_type(spark):
    with pytest.raises(TypeError):
        literal_frame(spark, [({"a": 1},)], "m map<string,int>")


def test_data_proportional_partitions_small_input_is_one(spark, sf_dir):
    li = Tables(spark, sf_dir).lineitem
    v = li.select(F.col("l_extendedprice").alias("_v"))
    # a KB-scale projected column must not get a per-core partition count
    assert data_proportional_partitions(v) == 1


def test_data_proportional_partitions_scales_with_bytes(spark, sf_dir):
    li = Tables(spark, sf_dir).lineitem
    v = li.select(F.col("l_extendedprice").alias("_v"))
    est = int(v._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    assert data_proportional_partitions(v, target_bytes=est // 4 + 1) in (
        4,
        5,
    )
    # unusable estimate (simulated via absurd target) still bounded >= 1
    assert data_proportional_partitions(v, target_bytes=1 << 60) == 1


def test_quantile_vector_distributed_matches_builtin(spark, sf_dir):
    from clear_map_data_pipeline_spark.operators.stats import quantile_vector

    li = Tables(spark, sf_dir).lineitem
    dist = sorted(
        map(
            tuple,
            quantile_vector(
                li, "l_extendedprice", exact=True, distributed=True
            ).collect(),
        )
    )
    built = sorted(
        map(
            tuple,
            quantile_vector(
                li, "l_extendedprice", exact=True, distributed=False
            ).collect(),
        )
    )
    assert dist == built
