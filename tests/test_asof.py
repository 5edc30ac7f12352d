"""asof_join vs pandas.merge_asof — the public reference
implementation, compared row-for-row across directions, tolerances,
keys with no matches, equal-time ties, and random fixtures."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from clear_map_data_pipeline_spark.operators.asof import asof_join


def _pandas_asof(left, right, direction, tolerance):
    lp = pd.DataFrame(left, columns=["k", "t", "lv"]).sort_values("t")
    rp = pd.DataFrame(right, columns=["k", "t", "rv"]).sort_values("t")
    out = pd.merge_asof(
        lp, rp, on="t", by="k", direction=direction,
        tolerance=tolerance,
    )
    return sorted(
        (int(r.k), int(r.t), int(r.lv),
         None if pd.isna(r.rv) else int(r.rv))
        for r in out.itertuples()
    )


def _spark_asof(spark, left, right, direction, tolerance):
    ldf = spark.createDataFrame(left, "k long, t long, lv long")
    rdf = spark.createDataFrame(right, "k long, t long, rv long")
    out = asof_join(
        ldf, rdf, on="k", time="t", right_cols=["rv"],
        direction=direction, tolerance=tolerance,
    ).collect()
    return sorted(
        (r["k"], r["t"], r["lv"], r["rv"]) for r in out
    )


CASES = {
    "basic": (
        [(1, 10, 100), (1, 20, 101), (1, 5, 102), (2, 7, 103)],
        [(1, 8, 900), (1, 15, 901), (1, 20, 902), (3, 1, 903)],
    ),
    "equal_time_ties": (
        [(1, 10, 100), (1, 11, 101)],
        [(1, 10, 900), (1, 12, 901)],
    ),
    "no_match_key": (
        [(5, 10, 100)],
        [(6, 10, 900)],
    ),
}


@pytest.mark.parametrize("case", sorted(CASES))
@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 3])
def test_matches_pandas_merge_asof(spark, case, direction, tolerance):
    left, right = CASES[case]
    assert _spark_asof(spark, left, right, direction, tolerance) == (
        _pandas_asof(left, right, direction, tolerance)
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_random_fixture_matches_pandas(spark, direction):
    rng = random.Random(42 + hash(direction) % 97)
    left = [
        (rng.randint(1, 4), rng.randint(0, 50), i)
        for i in range(60)
    ]
    right = [
        (rng.randint(1, 4), rng.randint(0, 50), 1000 + i)
        for i in range(40)
    ]
    # pandas merge_asof requires unique (by, on) ordering stability on
    # the right for a deterministic answer; dedupe right keys keeping
    # the max value (what both engines then agree on deterministically)
    seen = {}
    for k, t, v in right:
        seen[(k, t)] = max(v, seen.get((k, t), -1))
    right = [(k, t, v) for (k, t), v in seen.items()]
    for tol in (None, 5):
        assert _spark_asof(spark, left, right, direction, tol) == (
            _pandas_asof(left, right, direction, tol)
        )


def test_right_cols_collision_raises(spark):
    ldf = spark.createDataFrame([(1, 1, 1)], "k long, t long, v long")
    rdf = spark.createDataFrame([(1, 1, 2)], "k long, t long, v long")
    with pytest.raises(ValueError, match="collide"):
        asof_join(ldf, rdf, on="k", time="t", right_cols=["v"])


def test_unknown_direction_raises(spark):
    ldf = spark.createDataFrame([(1, 1, 1)], "k long, t long, v long")
    with pytest.raises(ValueError, match="direction"):
        asof_join(ldf, ldf.select("k", "t"), on="k", time="t",
                  direction="sideways")
