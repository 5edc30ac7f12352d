"""Shared fixture-role mapping (FIXTURES.md §A role mapping).

``events`` plays the reference's MOH fact table: ``user_id`` is the
geography ``id``, ``to_date(ts)`` the ``date``, and censored daily
measures are derived deterministically from ``value``/``event_type`` so
the rebase/window operators exercise the reference's exact semantics
(``il_analysis_git.py:52-74``): a 'cases' measure censored to 0 below a
threshold (the ``'<15'`` sentinel analog) plus 0/1 daily "new" flags.

``customer`` plays the shape dimension: ``c_custkey`` = ``id``,
``greatest(c_acctbal, 100)`` = ``pop``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import Tables

CENSOR = 60  # daily sums below this are privacy-censored to 0 (the '<15' analog)


def moh_daily(t: Tables) -> DataFrame:
    """One row per (id, date): censored cumulative-style measures + flags."""
    e = t.events
    return (
        e.groupBy(
            F.col("user_id").alias("id"), F.to_date("ts").alias("date")
        )
        .agg(
            F.sum("value").alias("_raw"),
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "view", F.col("value"))),
                F.lit(0.0),
            ).alias("_vraw"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).cast("long").alias("new_case"),
            F.max(
                F.when(F.col("event_type") == "signup", 1).otherwise(0)
            ).cast("long").alias("new_vaccine"),
            F.count("*").alias("tests"),
        )
        .select(
            "id",
            "date",
            F.when(F.col("_raw") < CENSOR, 0)
            .otherwise(F.round("_raw"))
            .cast("long")
            .alias("cases"),
            F.when(F.col("_vraw") < CENSOR, 0)
            .otherwise(F.round("_vraw"))
            .cast("long")
            .alias("vaccine"),
            "new_case",
            "new_vaccine",
            "tests",
        )
    )


# DuckDB twin of moh_daily(); prepend to oracle SQL as a CTE body.
MOH_DAILY_SQL = f"""
daily AS (
  SELECT user_id AS id, CAST(ts AS DATE) AS date,
         CAST(CASE WHEN sum(value) < {CENSOR} THEN 0 ELSE round(sum(value)) END AS BIGINT) AS cases,
         CAST(CASE WHEN coalesce(sum(CASE WHEN event_type = 'view' THEN value END), 0.0) < {CENSOR}
              THEN 0 ELSE round(coalesce(sum(CASE WHEN event_type = 'view' THEN value END), 0.0)) END AS BIGINT) AS vaccine,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS new_case,
         CAST(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS new_vaccine,
         count(*) AS tests
  FROM events GROUP BY 1, 2
)"""


def pop_dim(t: Tables) -> DataFrame:
    """Population dimension: customer keyed by id, pop > 0 guaranteed."""
    return t.customer.select(
        F.col("c_custkey").alias("id"),
        F.greatest(F.col("c_acctbal"), F.lit(100.0)).alias("pop"),
    )


POP_DIM_SQL = """
pop AS (
  SELECT c_custkey AS id, greatest(c_acctbal, 100.0) AS pop FROM customer
)"""
