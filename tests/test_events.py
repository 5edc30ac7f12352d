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
