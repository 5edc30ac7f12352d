"""Unit tests for the event-analytics operators: ordered funnel
semantics (the strictly-after cascade) and retention cohort math —
crafted sequences the sf fixtures don't guarantee to contain.
"""

from __future__ import annotations

import datetime as dt

from clear_map_data_pipeline_spark.operators.events import (
    funnel_user_stages,
    retention_cohorts,
)

_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(rows):
    return [
        (i, _T0 + dt.timedelta(minutes=m), u, t, 0.0, "{}")
        for i, (u, t, m) in enumerate(rows)
    ]


_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_funnel_requires_strict_order(spark):
    df = spark.createDataFrame(
        _ev(
            [
                # user 1: click BEFORE any view -> click never qualifies
                (1, "click", 0),
                (1, "view", 5),
                (1, "purchase", 10),  # needs a qualified click: stage stops at 1
                # user 2: full ordered funnel
                (2, "view", 0),
                (2, "click", 5),
                (2, "purchase", 10),
                # user 3: no view at all -> excluded entirely
                (3, "click", 0),
                (3, "purchase", 5),
            ]
        ),
        _SCHEMA,
    )
    out = {r["user_id"]: r for r in funnel_user_stages(df).collect()}
    assert set(out) == {1, 2}
    assert out[1]["stage"] == 1
    assert out[1]["t_click"] is None and out[1]["t_purchase"] is None
    assert out[2]["stage"] == 3
    assert out[2]["t_view"] < out[2]["t_click"] < out[2]["t_purchase"]


def test_funnel_takes_first_qualifying_not_first_overall(spark):
    df = spark.createDataFrame(
        _ev(
            [
                (1, "purchase", 0),  # too early - before any click
                (1, "view", 1),
                (1, "click", 2),
                (1, "purchase", 3),  # this is the one that counts
            ]
        ),
        _SCHEMA,
    )
    row = funnel_user_stages(df).collect()[0]
    assert row["stage"] == 3
    t0 = int(_T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert row["t_purchase"] == t0 + 3 * 60 * 1_000_000


def test_funnel_same_timestamp_uses_event_id_row_order(spark):
    # view and click share a timestamp; click has the later event_id, so
    # the view sits in its strictly-preceding ROWS frame and it counts.
    df = spark.createDataFrame(
        _ev([(1, "view", 0), (1, "click", 0)]),
        _SCHEMA,
    )
    row = funnel_user_stages(df).collect()[0]
    assert row["stage"] == 2


def test_retention_cohort_math(spark):
    df = spark.createDataFrame(
        _ev(
            [
                # user 1 first active Jan 1, active again day 8 (week 1)
                (1, "view", 0),
                (1, "view", 8 * 24 * 60),
                # user 2 first active Jan 1 only
                (2, "view", 0),
                # user 3 first active Jan 2, active day 16 (week 2)
                (3, "view", 24 * 60),
                (3, "view", 17 * 24 * 60),
            ]
        ),
        _SCHEMA,
    )
    out = {
        (str(r["cohort_date"]), r["period_n"]): r["active_users"]
        for r in retention_cohorts(df).collect()
    }
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 1)] == 1
    assert out[("2024-01-02", 0)] == 1
    assert out[("2024-01-02", 2)] == 1
    assert len(out) == 4


def test_funnel_plan_single_exchange(spark, sf_dir):
    from clear_map_data_pipeline_spark.session import Tables

    plan = (
        funnel_user_stages(Tables(spark, sf_dir).events)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_anomaly_zscore_spike_and_flat(spark):
    from clear_map_data_pipeline_spark.operators.events import (
        daily_anomaly_zscores,
    )

    rows = []
    eid = 0
    # type 'a': 10/day for 7 days, then a 100-event spike on day 8
    for day in range(7):
        for _ in range(10):
            rows.append((eid, _T0 + dt.timedelta(days=day), 1, "a", 0.0, "{}"))
            eid += 1
    for _ in range(100):
        rows.append((eid, _T0 + dt.timedelta(days=7), 1, "a", 0.0, "{}"))
        eid += 1
    df = spark.createDataFrame(rows, _SCHEMA)
    out = {str(r["day"]): r for r in daily_anomaly_zscores(df).collect()}
    # days 0-6: no full 7-day trailing window -> no verdict
    for day in range(7):
        key = str((_T0 + dt.timedelta(days=day)).date())
        assert out[key]["z"] is None and out[key]["is_anomaly"] == 0
    # day 7: trailing window is 7x10 with zero variance -> var==0 -> no
    # verdict either (the var>0 guard), NOT a div-by-zero or a flag
    key = str((_T0 + dt.timedelta(days=7)).date())
    assert out[key]["z"] is None and out[key]["is_anomaly"] == 0


def test_anomaly_zscore_flags_real_spike(spark):
    from clear_map_data_pipeline_spark.operators.events import (
        daily_anomaly_zscores,
    )

    rows = []
    eid = 0
    # alternating 9/11 baseline (nonzero variance), then a spike
    for day in range(7):
        for _ in range(9 if day % 2 == 0 else 11):
            rows.append((eid, _T0 + dt.timedelta(days=day), 1, "a", 0.0, "{}"))
            eid += 1
    for _ in range(50):
        rows.append((eid, _T0 + dt.timedelta(days=7), 1, "a", 0.0, "{}"))
        eid += 1
    df = spark.createDataFrame(rows, _SCHEMA)
    out = {str(r["day"]): r for r in daily_anomaly_zscores(df).collect()}
    key = str((_T0 + dt.timedelta(days=7)).date())
    assert out[key]["is_anomaly"] == 1 and out[key]["z"] > 2.0


# --- property test: funnel vs a literal per-user Python simulation ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_TYPES = ["view", "click", "purchase", "error"]

seq_strategy = st.dictionaries(
    st.integers(min_value=1, max_value=4),              # user_id
    st.lists(st.sampled_from(_TYPES), min_size=1, max_size=10),
    min_size=1,
    max_size=3,
)


def _simulate(seq):
    """Literal sequential scan: walk the user's events in order, advance
    the stage pointer when the next-needed step appears."""
    steps = ["view", "click", "purchase"]
    times = [None, None, None]
    stage = 0
    for pos, ev in enumerate(seq):
        if stage < 3 and ev == steps[stage]:
            times[stage] = pos
            stage += 1
    return times, stage


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(seq_strategy)
def test_funnel_matches_literal_simulation(spark, seqs):
    from clear_map_data_pipeline_spark.operators.events import (
        funnel_user_stages,
    )

    rows, eid = [], 0
    for u, seq in seqs.items():
        for pos, ev in enumerate(seq):
            rows.append(
                (eid, _T0 + dt.timedelta(minutes=pos), u, ev, 0.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {r["user_id"]: r for r in funnel_user_stages(df).collect()}
    t0 = int(_T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    for u, seq in seqs.items():
        times, stage = _simulate(seq)
        if times[0] is None:
            assert u not in got
            continue
        assert got[u]["stage"] == stage
        for name, t in zip(("t_view", "t_click", "t_purchase"), times):
            exp = None if t is None else t0 + t * 60 * 1_000_000
            assert got[u][name] == exp, (u, name, seq)
