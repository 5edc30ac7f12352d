"""TPC-H query shapes, folded into ONE registered suite (r03): seven
queries hash-check their full result sets inside ``suite_tpch``
against the canonicalized UNION of their DuckDB twins — 7 driver-green
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
- Q8 (market share): the widest tree — 8 relations, two roles for
  nation; conditional-sum ratio per year.
- Q10 (returned items): quarter filter + returnflag filter + top-20.
- Q14 (promo revenue): conditional-sum percentage over one ship-month.
- Q7 (volume shipping): two-role nation join with the symmetric OR.
- Q13 (order distribution): LEFT JOIN + two-level count histogram.
- Q15 (top supplier): having-max via broadcast 1-row aggregate.
- Q17 (small-quantity revenue): correlated avg as an aggregate join,
  threshold as an exact integer-free inequality.
- Q18 (large-volume customers): fact self-agg semi filter + detail.
- Q22 (idle balances, nation-adapted): above-average filter as an
  exact inequality + anti join, per-nation totals.

Determinism policy for every monetary aggregate: sum through
DECIMAL(18,x) — double products are engine-identical, their decimal
casts are engine-identical, decimal addition is exact — so no
round(...,2) boundary can flip with summation order (bitten once at
sf0.01, see tpch_q10).

r06 closes the gap: the remaining queries (q2, q4, q9, q11, q12,
q16, q19, q20, q21) run over deterministic synthesized columns —
partsupp from lineitem's distinct (partkey, suppkey) pairs,
commit/receipt dates + shipmode + shipinstruct + container from key
arithmetic shared between the Spark builders and the oracle CTEs
(tpch_synth.py) — and live in tpch_missing.py, folded into this
suite.  All 22 TPC-H shapes now hash-check in one driver slot.
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


def tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: customers who returned items in a quarter,
    ranked by lost revenue — fact⋈fact⋈dim with a selective returnflag
    filter and a deterministic global top-20 (TakeOrderedAndProject).

    The revenue sums through DECIMAL(18,6): each line's double product
    is identical on both engines, the double->decimal cast of an
    identical double is identical, and decimal addition is exact —
    so the per-customer total is independent of summation order.  A
    plain double sum hit a .xx5 rounding boundary for one customer at
    sf0.01 (engine-order-dependent last ulp flipping round(...,2))."""
    t = Tables(spark, sf_dir)
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(
            t.lineitem.filter(F.col("l_returnflag") == "R"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(vol), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


TPCH_Q10_SQL = """
    SELECT c_custkey, c_name,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """


def tpch_q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: promotion revenue share for one ship-month — a
    conditional-sum ratio over a broadcast part join, one scan."""
    t = Tables(spark, sf_dir)
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
        )
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("promo_revenue_pct")
        )
    )


TPCH_Q14_SQL = """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4)
             AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-02-01'
    """


def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one supplier-nation's share of a region's market
    for a part type, by order year — the widest join tree in the suite
    (part, lineitem, supplier, orders, customer, nation x2, region);
    every dimension side broadcasts, lineitem⋈orders is the only
    shuffle join, and the share is a conditional-sum ratio per year."""
    t = Tables(spark, sf_dir)
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n1 = t.nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    lines = (
        t.part.filter(F.col("p_type") == "STANDARD")
        .hint("broadcast")
        .join(t.lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            F.col("c_rkey") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
    )
    return (
        lines.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(0.0)
                )
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


TPCH_Q8_SQL = """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           round(sum(CASE WHEN n2.n_name = 'NATION_2'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
    GROUP BY 1
    """


def _dec_vol() -> F.Column:
    """Exact-summation revenue term: the double product is engine-
    identical, its decimal(18,6) cast is engine-identical, and decimal
    addition is order-independent — the uniform determinism policy for
    every aggregate added in r03 (see tpch_q10's boundary story)."""
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )


_DEC_VOL_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"


def tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year — the two-role nation join with a symmetric OR predicate;
    all dimensions broadcast."""
    t = Tables(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_2") & (
        F.col("cust_nation") == "NATION_7"
    ) | (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_2")
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(_dec_vol()), 2).cast("double").alias("revenue"))
    )


TPCH_Q7_SQL = f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           CAST(round(sum({_DEC_VOL_SQL}), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2'))
    GROUP BY 1, 2, 3
    """


def tpch_q13_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape (comment filter dropped — fixtures carry no
    o_comment): the customer order-count histogram via LEFT JOIN +
    two-level aggregation; pure integer arithmetic."""
    t = Tables(spark, sf_dir)
    per_cust = (
        t.customer.join(
            t.orders, F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


TPCH_Q13_SQL = """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY 1
    )
    GROUP BY 1
    """


def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: quarter revenue per supplier, return the
    max-revenue supplier(s) — the having-max pattern as a broadcast
    join of a 1-row aggregate; decimal sums make the max and its ties
    engine-deterministic."""
    t = Tables(spark, sf_dir)
    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_dec_vol()), 2).cast("double").alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(
            F.broadcast(t.supplier),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


TPCH_Q15_SQL = f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(sum({_DEC_VOL_SQL}), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """


def tpch_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue of small-quantity orders for one brand
    — the correlated avg rewritten as a per-part aggregate join, and
    the 20%-of-average threshold as the integer-free inequality
    ``5 * l_quantity * cnt < sum(quantity)`` (both sides exact
    decimals, so the boundary cannot flip with summation order)."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.join(
        F.broadcast(t.part.filter(F.col("p_brand") == "Brand#23")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    per_part = li.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_qsum"),
        F.count("*").alias("_qcnt"),
    )
    return (
        li.join(F.broadcast(per_part), F.col("p_partkey") == F.col("_pk"))
        .filter(
            F.col("l_quantity").cast("decimal(18,2)") * 5 * F.col("_qcnt")
            < F.col("_qsum")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")) / 7.0, 2
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


TPCH_Q17_SQL = """
    WITH li AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#23'
    ),
    pp AS (
      SELECT l_partkey AS _pk,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS _qsum,
             count(*) AS _qcnt
      FROM li GROUP BY 1
    )
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly
    FROM li JOIN pp ON l_partkey = _pk
    WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * _qcnt < _qsum
    """


def tpch_q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: customers whose single orders exceed a quantity
    threshold — fact self-aggregation feeding a semi filter, then the
    detail join."""
    t = Tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey", F.col("_q").cast("double").alias("total_qty"))
    )
    return (
        big.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


TPCH_Q18_SQL = """
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty
      FROM lineitem GROUP BY 1
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           round(o_totalprice, 2) AS o_totalprice, total_qty
    FROM big
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    """


def tpch_q22_idle_balances(spark, sf_dir):
    """TPC-H Q22 shape (cntrycode adapted to nation — fixtures carry no
    c_phone): acctbal above the positive-balance average AND no orders
    at all, counted per nation.  The average threshold compares as the
    exact inequality ``acctbal * n_pos > sum_pos`` (decimal both
    sides), so summation order cannot flip membership."""
    t = Tables(spark, sf_dir)
    dec_bal = F.col("c_acctbal").cast("decimal(18,2)")
    pos = t.customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(dec_bal).alias("_s"), F.count("*").alias("_n")
    )
    return (
        t.customer.join(
            t.orders.select("o_custkey").distinct(),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .crossJoin(F.broadcast(pos))
        .filter(dec_bal * F.col("_n") > F.col("_s"))
        .groupBy(F.col("c_nationkey").cast("long").alias("nation_code"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(dec_bal), 2).cast("double").alias("totacctbal"),
        )
    )


TPCH_Q22_SQL = """
    WITH pos AS (
      SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS _s,
             count(*) AS _n
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nation_code,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * _n > _s
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY 1
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
    from .tpch_missing import missing_subqueries

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
            SubQuery(
                "tpch_q8_market_share",
                tpch_q8_market_share,
                TPCH_Q8_SQL,
                [("o_year", "s"), ("mkt_share", "d6")],
            ),
            SubQuery(
                "tpch_q10_returned_items",
                tpch_q10_returned_items,
                TPCH_Q10_SQL,
                [("c_custkey", "s"), ("c_name", "s"), ("revenue", "d2"),
                 ("n_name", "s")],
            ),
            SubQuery(
                "tpch_q14_promo_revenue",
                tpch_q14_promo_revenue,
                TPCH_Q14_SQL,
                [("promo_revenue_pct", "d4")],
            ),
            SubQuery(
                "tpch_q7_volume_shipping",
                tpch_q7_volume_shipping,
                TPCH_Q7_SQL,
                [("supp_nation", "s"), ("cust_nation", "s"),
                 ("l_year", "s"), ("revenue", "d2")],
            ),
            SubQuery(
                "tpch_q13_order_distribution",
                tpch_q13_order_distribution,
                TPCH_Q13_SQL,
                [("c_count", "s"), ("custdist", "s")],
            ),
            SubQuery(
                "tpch_q15_top_supplier",
                tpch_q15_top_supplier,
                TPCH_Q15_SQL,
                [("s_suppkey", "s"), ("s_name", "s"), ("total_revenue", "d2")],
            ),
            SubQuery(
                "tpch_q17_small_quantity_revenue",
                tpch_q17_small_quantity_revenue,
                TPCH_Q17_SQL,
                [("avg_yearly", "d2")],
            ),
            SubQuery(
                "tpch_q18_large_volume_customers",
                tpch_q18_large_volume_customers,
                TPCH_Q18_SQL,
                [("c_custkey", "s"), ("c_name", "s"), ("o_orderkey", "s"),
                 ("o_orderdate", "s"), ("o_totalprice", "d2"),
                 ("total_qty", "d2")],
            ),
            SubQuery(
                "tpch_q22_idle_balances",
                tpch_q22_idle_balances,
                TPCH_Q22_SQL,
                [("nation_code", "s"), ("numcust", "s"), ("totacctbal", "d2")],
            ),
        ]
        + missing_subqueries(),
        doc="Folded TPC-H suite, all 22 query shapes: q1 scan+agg, q3 "
        "top-k join, q5 cyclic six-table join, q6 pushdown scan, q8 "
        "eight-way market-share ratio, q10 returned-items top-k, q14 "
        "promo-revenue ratio, plus the nine synthesized-column queries "
        "of tpch_missing.py (q2/q4/q9/q11/q12/q16/q19/q20/q21) — each "
        "sub-result hash-checked row-for-row inside the union (one "
        "driver slot for twenty-two shapes).",
    )


_register_suite()
