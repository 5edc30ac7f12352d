"""Literal-expectation tests for the time-series fill operators:
date-spine gapfill with LOCF/linear interpolation, and recursive EWMA
checked against an explicit Python recurrence.
"""

from __future__ import annotations

import datetime as dt
import math


def _trunc(v, nd):
    """floor-scale truncation — the operators' engine-portable rendering
    (see operators/stats.py: ewma for why round() is not usable)."""
    scale = float(10**nd)
    return math.floor(v * scale) / scale

from clear_map_data_pipeline_spark.operators.stats import (
    ewma,
    gapfill_locf_interp,
)


def _daily(spark, rows):
    return spark.createDataFrame(rows, "id long, date date, cases long")


def test_gapfill_densifies_and_fills(spark):
    d = dt.date
    df = _daily(
        spark,
        [
            (1, d(2020, 1, 1), 10),
            (1, d(2020, 1, 4), 40),
            (1, d(2020, 1, 6), 20),
        ],
    )
    out = {
        r["date"]: r for r in gapfill_locf_interp(df, "cases").collect()
    }
    # dense spine: every day of [min, max]
    assert sorted(out) == [d(2020, 1, i) for i in range(1, 7)]
    # observed rows pass through; gaps are NULL in the original column
    assert out[d(2020, 1, 2)]["cases"] is None
    assert out[d(2020, 1, 4)]["cases"] == 40
    # LOCF carries the last observation
    assert [out[d(2020, 1, i)]["locf"] for i in range(1, 7)] == [
        10, 10, 10, 40, 40, 20,
    ]
    # linear interpolation: 10 -> 40 over 3 days, 40 -> 20 over 2 days
    assert [out[d(2020, 1, i)]["interp"] for i in range(1, 7)] == [
        10.0, 20.0, 30.0, 40.0, 30.0, 20.0,
    ]


def test_gapfill_no_gaps_is_identity_shape(spark):
    d = dt.date
    df = _daily(spark, [(5, d(2021, 3, 1), 7), (5, d(2021, 3, 2), 9)])
    rows = gapfill_locf_interp(df, "cases").collect()
    assert len(rows) == 2
    for r in rows:
        assert r["cases"] == r["locf"] == int(r["interp"])


def test_gapfill_keys_fill_independently(spark):
    d = dt.date
    df = _daily(
        spark,
        [
            (1, d(2020, 1, 1), 0),
            (1, d(2020, 1, 3), 2),
            (2, d(2020, 2, 10), 100),  # single-row key: 1-day spine
        ],
    )
    rows = gapfill_locf_interp(df, "cases").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["id"], []).append(r)
    assert len(by_key[1]) == 3 and len(by_key[2]) == 1
    (solo,) = by_key[2]
    assert solo["locf"] == 100 and solo["interp"] == 100.0


def test_ewma_matches_literal_recurrence(spark):
    vals = [10, 40, 20, 0, 5]
    d = dt.date
    df = _daily(
        spark,
        [(1, d(2020, 1, 1 + i), v) for i, v in enumerate(vals)],
    )
    alpha = 0.3
    got = [
        r["ewma"]
        for r in ewma(df, "cases", alpha).orderBy("date").collect()
    ]
    y = None
    expect = []
    for x in vals:
        y = float(x) if y is None else (1 - alpha) * y + alpha * x
        expect.append(_trunc(y, 6))
    assert got == expect


def test_ewma_partitions_by_key(spark):
    d = dt.date
    df = _daily(
        spark,
        [
            (1, d(2020, 1, 1), 10),
            (2, d(2020, 1, 1), 100),
            (1, d(2020, 1, 2), 20),
        ],
    )
    rows = {
        (r["id"], r["date"]): r["ewma"]
        for r in ewma(df, "cases", 0.5).collect()
    }
    assert rows[(2, d(2020, 1, 1))] == 100.0  # other key's seed untouched
    assert rows[(1, d(2020, 1, 2))] == 15.0


# --- property tests: Spark output vs a literal Python transcription ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# per-key sparse series: strictly-increasing day offsets with values
series_strategy = st.dictionaries(
    st.integers(min_value=1, max_value=4),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # day offset
            st.integers(min_value=0, max_value=50),  # value
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    min_size=1,
    max_size=3,
)


def _frame(spark, series):
    base = dt.date(2020, 6, 1)
    rows = [
        (k, base + dt.timedelta(days=off), v)
        for k, obs in series.items()
        for off, v in obs
    ]
    return spark.createDataFrame(rows, "id long, date date, cases long")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(series=series_strategy)
def test_gapfill_matches_literal_python(spark, series):
    got = {
        (r["id"], r["date"]): (r["cases"], r["locf"], r["interp"])
        for r in gapfill_locf_interp(_frame(spark, series), "cases").collect()
    }
    expect = {}
    base = dt.date(2020, 6, 1)
    for k, obs in series.items():
        obs = sorted(obs)
        days = {off: v for off, v in obs}
        lo, hi = obs[0][0], obs[-1][0]
        for d in range(lo, hi + 1):
            prev = max(o for o in days if o <= d)
            nxt = min(o for o in days if o >= d)
            if d in days:
                interp = float(days[d])
            else:
                f = (d - prev) / (nxt - prev)
                interp = days[prev] + (days[nxt] - days[prev]) * f
            expect[(k, base + dt.timedelta(days=d))] = (
                days.get(d),
                days[prev],
                _trunc(interp, 4),
            )
    assert got == expect


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(series=series_strategy, alpha=st.sampled_from([0.1, 0.3, 0.5, 0.9]))
def test_ewma_matches_literal_python(spark, series, alpha):
    got = {
        (r["id"], r["date"]): r["ewma"]
        for r in ewma(_frame(spark, series), "cases", alpha).collect()
    }
    expect = {}
    base = dt.date(2020, 6, 1)
    for k, obs in series.items():
        y = None
        for off, v in sorted(obs):
            y = float(v) if y is None else (1 - alpha) * y + alpha * v
            expect[(k, base + dt.timedelta(days=off))] = _trunc(y, 6)
    assert got == expect


def test_ewma_ignores_nulls(spark):
    d = dt.date
    df = spark.createDataFrame(
        [
            (1, d(2020, 1, 1), None),   # leading NULL: no observation yet
            (1, d(2020, 1, 2), 10),
            (1, d(2020, 1, 3), None),   # skipped, carries prior EWMA
            (1, d(2020, 1, 4), 20),
        ],
        "id long, date date, cases long",
    )
    rows = {
        r["date"]: r["ewma"]
        for r in ewma(df, "cases", 0.5).collect()
    }
    assert rows[d(2020, 1, 1)] is None
    assert rows[d(2020, 1, 2)] == 10.0
    assert rows[d(2020, 1, 3)] == 10.0   # NULL ignored, not poisoning
    assert rows[d(2020, 1, 4)] == 15.0


def test_ewma_linear_row_identical_to_window(spark, sf_dir):
    """The O(d) applyInPandas twin applies the same double op sequence
    as the windowed prefix fold, so it must be ROW-IDENTICAL (not just
    close) on the real fixture series, NULLs and all."""
    from clear_map_data_pipeline_spark.operators.stats import ewma_linear
    from clear_map_data_pipeline_spark.queries.windows import (
        EWMA_ALPHA,
        moh_daily,
    )
    from clear_map_data_pipeline_spark.session import Tables

    daily = moh_daily(Tables(spark, sf_dir))
    a = sorted(map(tuple, ewma(daily, "cases", EWMA_ALPHA).collect()))
    b = sorted(map(tuple, ewma_linear(daily, "cases", EWMA_ALPHA).collect()))
    assert a == b and a


def test_ewma_series_guard_trips_and_linear_path_survives(spark):
    """A single 20k-row key: the windowed fold refuses (O(d²) guard,
    pointing at the linear path); ewma_linear computes it and matches a
    literal Python recurrence at the tail."""
    import datetime as _dt

    import pytest as _pytest
    from pyspark.sql import functions as _F

    from clear_map_data_pipeline_spark.operators.stats import ewma_linear

    n = 20_000
    df = spark.range(n).select(
        _F.lit(1).alias("id"),
        _F.date_add(_F.lit(_dt.date(1970, 1, 1)), _F.col("id").cast("int")).alias(
            "date"
        ),
        (_F.col("id") % 97).alias("cases"),
    )
    with _pytest.raises(ValueError, match="ewma_linear"):
        ewma(df, "cases", 0.3).collect()
    # guard off => same engine path still works (bounded fixture only!)
    out = (
        ewma_linear(df, "cases", 0.3)
        .orderBy("date")
        .tail(1)[0]
    )
    y = None
    for i in range(n):
        x = float(i % 97)
        y = x if y is None else 0.7 * y + 0.3 * x
    assert out["ewma"] == math.floor(y * 1e6) / 1e6


def test_ewma_linear_null_skipped_nan_rejected(spark):
    """NULL is the missing-value representation (skipped, matching the
    windowed collect_list drop); a genuine NaN VALUE is rejected with a
    clear error instead of silently diverging from the windowed twin's
    NaN-poisoning (r04 review finding)."""
    import pytest as _pytest

    from clear_map_data_pipeline_spark.operators.stats import ewma_linear

    d = dt.date
    df = spark.createDataFrame(
        [(1, d(2020, 1, 1), 10.0), (1, d(2020, 1, 2), None),
         (1, d(2020, 1, 3), 20.0)],
        "id long, date date, cases double",
    )
    rows = {r["date"]: r["ewma"] for r in ewma_linear(df, "cases", 0.5).collect()}
    assert rows[d(2020, 1, 2)] == 10.0 and rows[d(2020, 1, 3)] == 15.0

    bad = spark.createDataFrame(
        [(1, d(2020, 1, 1), float("nan"))], "id long, date date, cases double"
    )
    with _pytest.raises(Exception, match="NaN"):
        ewma_linear(bad, "cases", 0.5).collect()
