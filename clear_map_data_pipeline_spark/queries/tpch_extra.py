"""TPC-H query shapes, folded into ONE registered suite (r03): q1, q3,
q5, q6 each hash-check their full result set inside ``suite_tpch``
against the canonicalized UNION of their DuckDB twins — 4 driver-green
queries for one registry slot (the r02 layout spent 2 slots on q1/q3
and left q5/q6 tests-only).

- Q1 (pricing summary): the headline scan+agg benchmark.
- Q3 (shipping priority): selective dim -> fact-fact join -> global
  top-k via TakeOrderedAndProject.
- Q5 (local supplier volume): the six-table join with a CYCLE in the
  join graph (customer and supplier must share a nation) — the shape
  that stresses join ordering.  All four dimension sides broadcast;
  lineitem⋈orders stays the only shuffle join.
- Q6 (forecast revenue change): pure scan-filter-aggregate; every
  predicate must reach the parquet scan (the plan-audit shows
  PushedFilters) and the aggregate is a single map-side-combined pass.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import QueryDef
from ..session import Tables


def tpch_q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5: revenue by nation for orders where the customer and
    the line's supplier sit in the SAME nation of one region."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.join(
            t.orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t.supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


TPCH_Q5_SQL = """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """


def tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: one highly-selective scan, no joins — the pushdown
    benchmark."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


TPCH_Q6_SQL = """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """


EXTRA: dict[str, QueryDef] = {
    "tpch_q5_local_supplier_volume": QueryDef(
        tpch_q5_local_supplier_volume, TPCH_Q5_SQL
    ),
    "tpch_q6_forecast_revenue": QueryDef(tpch_q6_forecast_revenue, TPCH_Q6_SQL),
}


def _register_suite() -> None:
    from .core import TPCH_Q1_SQL, tpch_q1_pricing_summary
    from .joins import TPCH_Q3_SQL, tpch_q3_shipping_priority
    from .suites import SubQuery, register_suite

    register_suite(
        "suite_tpch",
        [
            SubQuery(
                "tpch_q1_pricing_summary",
                tpch_q1_pricing_summary,
                TPCH_Q1_SQL,
                [
                    ("l_returnflag", "s"),
                    ("l_linestatus", "s"),
                    ("sum_qty", "d2"),
                    ("sum_base_price", "d2"),
                    ("sum_disc_price", "d2"),
                    ("avg_qty", "d4"),
                    ("avg_price", "d2"),
                    ("count_order", "s"),
                ],
            ),
            SubQuery(
                "tpch_q3_shipping_priority",
                tpch_q3_shipping_priority,
                TPCH_Q3_SQL,
                [
                    ("l_orderkey", "s"),
                    ("revenue", "d2"),
                    ("o_orderdate", "s"),
                    ("o_orderpriority", "s"),
                ],
            ),
            SubQuery(
                "tpch_q5_local_supplier_volume",
                tpch_q5_local_supplier_volume,
                TPCH_Q5_SQL,
                [("n_name", "s"), ("revenue", "d2")],
            ),
            SubQuery(
                "tpch_q6_forecast_revenue",
                tpch_q6_forecast_revenue,
                TPCH_Q6_SQL,
                [("revenue", "d2"), ("n_items", "s")],
            ),
        ],
        doc="Folded TPC-H suite: q1 scan+agg, q3 top-k join, q5 cyclic "
        "six-table join, q6 pushdown scan — each sub-result hash-checked "
        "row-for-row inside the union (one driver slot for four shapes).",
    )


_register_suite()
