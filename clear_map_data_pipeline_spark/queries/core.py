"""Core relational queries: projections, filters, scalar functions,
aggregations (SURVEY.md §2.2-2.4, §2.8).

Every builder is pure DataFrame API; every oracle twin is ANSI SQL for
DuckDB.  Types are pinned on both sides (DuckDB SUM(int) is HUGEINT →
always CAST to BIGINT; Spark aggregates aliased to the same names).

The simple projection/filter/aggregate queries are FOLDED into two
registered suite queries (``suite_core_clean``, ``suite_core_agg``) via
``suites.register_suite`` so the full registry fits the driver's
50-entry CORRECTNESS window (COVERAGE.md "driver cap"); each sub-query
is still hash-checked row-by-row inside its suite.  The three queries
with non-trivial plans (distributed quantiles, top-k window, TPC-H Q1)
stay registered standalone.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import bool_decode, censored_decode, clamp, derived_id
from ..operators import stats
from ..registry import register
from ..session import Tables
from .common import MOH_DAILY_SQL, moh_daily
from .suites import SubQuery, register_suite

# --- fold candidates: builder + oracle SQL kept side by side ----------

P2_SQL = """
SELECT l_orderkey AS okey, l_linenumber AS line, l_quantity AS qty,
       CAST(l_shipdate AS DATE) AS ship
FROM lineitem
"""


def p2_project_rename(spark, sf_dir):
    """P1/P2/P7 (ref :52,:54,:175): projection + positional rename.

    Column pruning reaches the parquet scan: only 4 of 11 lineitem
    columns are read (ReadSchema in explain) — the reference parses all
    CSV columns then drops 13 (SURVEY §4 X4)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey", "l_linenumber", "l_quantity", F.to_date("l_shipdate")
    ).toDF("okey", "line", "qty", "ship")


P3_SQL = """
SELECT c_custkey, CAST(c_nationkey AS BIGINT) * 10000 + c_custkey AS id
FROM customer
"""


def p3_derived_key(spark, sf_dir):
    """P3 (ref :59): composite surrogate key city*10000+area, as LONG."""
    t = Tables(spark, sf_dir)
    return t.customer.select(
        "c_custkey", derived_id(F.col("c_nationkey"), F.col("c_custkey")).alias("id")
    )


F1_SQL = """
SELECT l_orderkey, l_linenumber,
       coalesce(nullif(l_discount, 0.0), 0.0) AS discount_filled
FROM lineitem
"""


def f1_null_default_fill(spark, sf_dir):
    """F1 (ref :55,:57): null -> default fill via coalesce (na.fill)."""
    t = Tables(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(0.0)).alias(
            "discount_filled"
        ),
    )


F2_SQL = """
SELECT event_id FROM events
WHERE NOT (user_id % 10 = 0 AND value < 10)
"""


def f2_filter_conjunction(spark, sf_dir):
    """F2 (ref :58): delete rows matching a conjunctive predicate.

    The negated predicate is pushed down into the parquet scan
    (PushedFilters) — it runs before any shuffle, which also removes the
    reference's city-0 skew key before the id-shuffle (SURVEY §4)."""
    t = Tables(spark, sf_dir)
    return t.events.filter(
        ~((F.col("user_id") % 10 == 0) & (F.col("value") < 10))
    ).select("event_id")


F3_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(CASE WHEN qty_str = '<15' THEN '0' ELSE qty_str END AS BIGINT) AS qty_dec
FROM (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_quantity < 15 THEN '<15'
              ELSE CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) END AS qty_str
  FROM lineitem
)
"""


def f3_censored_decode(spark, sf_dir):
    """F3 (ref :60-65): the '<15' privacy-sentinel decode.

    The dirty string column is synthesized deterministically from
    l_quantity (the fixtures are clean), then decoded exactly as the
    engine's clean stage does: when(==sentinel, 0).otherwise(cast)."""
    t = Tables(spark, sf_dir)
    dirty = t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 15, F.lit("<15"))
        .otherwise(F.col("l_quantity").cast("long").cast("string"))
        .alias("qty_str"),
    )
    return dirty.select(
        "l_orderkey",
        "l_linenumber",
        censored_decode(F.col("qty_str")).alias("qty_dec"),
    )


F4_SQL = """
SELECT user_id,
       CAST(sum(CASE WHEN flag = 'TRUE' THEN 1 WHEN flag = 'FALSE' THEN 0 END) AS BIGINT) AS n_true
FROM (
  SELECT user_id, CASE WHEN value > 50 THEN 'TRUE' ELSE 'FALSE' END AS flag
  FROM events
) GROUP BY user_id
"""


def f4_bool_decode(spark, sf_dir):
    """F4 (ref :66-73): 'TRUE'/'FALSE' string -> 1/0 decode."""
    t = Tables(spark, sf_dir)
    dirty = t.events.select(
        "user_id",
        F.when(F.col("value") > 50, F.lit("TRUE")).otherwise(F.lit("FALSE")).alias(
            "flag"
        ),
    )
    return dirty.groupBy("user_id").agg(
        F.sum(bool_decode(F.col("flag"))).alias("n_true")
    )


F7_SQL = """
SELECT l_orderkey, l_linenumber,
       least(greatest(round(l_extendedprice / 1000, 1), 5.0), 50.0) AS clamped
FROM lineitem
"""


def f7_clamp(spark, sf_dir):
    """F7/F8 (ref :137, :143-146): scalar clamp into [lo, hi] + round."""
    t = Tables(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        clamp(F.round(F.col("l_extendedprice") / 1000, 1), 5.0, 50.0).alias("clamped"),
    )


C2_SQL = """
SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
       CAST(o_orderdate AS DATE) - 7 AS od_minus_7d,
       CAST(month(o_orderdate) AS INTEGER) AS od_month,
       CAST(day(o_orderdate) AS INTEGER) AS od_day
FROM orders
"""


def c2_date_arithmetic(spark, sf_dir):
    """C2/C3 (ref :79-81,:156,:167,:196): date arithmetic + part extraction."""
    t = Tables(spark, sf_dir)
    od = F.to_date("o_orderdate")
    return t.orders.select(
        "o_orderkey",
        od.alias("od"),
        F.date_sub(od, 7).alias("od_minus_7d"),
        F.month(od).alias("od_month"),
        F.dayofmonth(od).alias("od_day"),
    )


A3_SQL = """
SELECT c_nationkey,
       CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
       CAST(sum(CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
FROM customer GROUP BY c_nationkey
"""


def a3_grouped_conditional_counts(spark, sf_dir):
    """A3 (ref :89-93): per-group conditional counts (the case-1..4 picker)."""
    t = Tables(spark, sf_dir)
    return t.customer.groupBy("c_nationkey").agg(
        F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0)).alias("n_neg"),
        F.sum(F.when(F.col("c_acctbal") >= 0, 1).otherwise(0)).alias("n_pos"),
    )


A4_SQL = """
SELECT source, CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM documents GROUP BY source
"""


def a4_distinct_count(spark, sf_dir):
    """A4 (ref :96): exact distinct count per group (nunique)."""
    t = Tables(spark, sf_dir)
    return t.documents.groupBy("source").agg(
        F.countDistinct("lang").alias("n_langs")
    )


A6_SQL = """
SELECT c_custkey,
       round(sum(c_acctbal) OVER (PARTITION BY c_nationkey), 2) AS nation_bal
FROM customer
"""


def a6_group_sum_broadcast(spark, sf_dir):
    """A6 (ref :105): group sum broadcast back to member rows (window sum)."""
    t = Tables(spark, sf_dir)
    return t.customer.select(
        "c_custkey",
        F.round(
            F.sum("c_acctbal").over(Window.partitionBy("c_nationkey")), 2
        ).alias("nation_bal"),
    )


A7_SQL = """
SELECT c_nationkey, round(median(c_acctbal), 4) AS median_bal
FROM customer GROUP BY c_nationkey
"""


def a7_grouped_median(spark, sf_dir):
    """A7 (ref :108-109): exact grouped median (rank nullable-guarded).

    Rounded to 4 decimals: the inputs carry 2, so an even-count median
    (avg of two) has at most 3 — round(_, 4) is never at a half-way
    boundary, keeping Spark/DuckDB bit-identical."""
    t = Tables(spark, sf_dir)
    return t.customer.groupBy("c_nationkey").agg(
        F.round(F.median("c_acctbal"), 4).alias("median_bal")
    )


A8_SQL = "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"


def a8_dedup_distinct(spark, sf_dir):
    """A8 (ref :110): drop_duplicates -> DISTINCT (hash-aggregate)."""
    t = Tables(spark, sf_dir)
    return t.customer.select("c_mktsegment", "c_nationkey").dropDuplicates()


A10_SQL = "SELECT CAST(max(ts) AS DATE) AS last_date FROM events"


def a10_global_max_date(spark, sf_dir):
    """A10/O3 (ref :75,:78): sort-desc + head collapses to agg(max)."""
    t = Tables(spark, sf_dir)
    return t.events.agg(F.max(F.to_date("ts")).alias("last_date"))


A14_SQL = f"""
WITH {MOH_DAILY_SQL},
totals AS (
  SELECT date, CAST(sum(cases) AS BIGINT) AS total FROM daily GROUP BY date
)
SELECT date,
       CAST(coalesce(total - lag(total) OVER (ORDER BY date), total) AS BIGINT)
         AS daily_delta
FROM totals
"""


def a14_daily_total_delta(spark, sf_dir):
    """A14+W7 (ref :169): national daily totals, first-differenced.

    Map-side partial aggregation shrinks to <= #dates rows before the
    single-partition lag window — safe at any scale."""
    t = Tables(spark, sf_dir)
    return stats.daily_total_delta(moh_daily(t), "cases")


A15_SQL = "SELECT DISTINCT CAST(ts AS DATE) AS date FROM events"


def a15_distinct_ordered_dates(spark, sf_dir):
    """A15 (ref :167): distinct dates of a window (hash-sorted by driver)."""
    t = Tables(spark, sf_dir)
    return stats.distinct_ordered_dates(
        t.events.select(F.to_date("ts").alias("date"))
    )


# --- the two folded suites (driver-cap: COVERAGE.md) ------------------

CLEAN_SUITE = [
    SubQuery("p2_project_rename", p2_project_rename, P2_SQL,
             [("okey", "s"), ("line", "s"), ("qty", "d2"), ("ship", "s")]),
    SubQuery("p3_derived_key", p3_derived_key, P3_SQL,
             [("c_custkey", "s"), ("id", "s")]),
    SubQuery("f1_null_default_fill", f1_null_default_fill, F1_SQL,
             [("l_orderkey", "s"), ("l_linenumber", "s"),
              ("discount_filled", "d4")]),
    SubQuery("f2_filter_conjunction", f2_filter_conjunction, F2_SQL,
             [("event_id", "s")]),
    SubQuery("f3_censored_decode", f3_censored_decode, F3_SQL,
             [("l_orderkey", "s"), ("l_linenumber", "s"), ("qty_dec", "s")]),
    SubQuery("f4_bool_decode", f4_bool_decode, F4_SQL,
             [("user_id", "s"), ("n_true", "s")]),
    SubQuery("f7_clamp", f7_clamp, F7_SQL,
             [("l_orderkey", "s"), ("l_linenumber", "s"), ("clamped", "d2")]),
    SubQuery("c2_date_arithmetic", c2_date_arithmetic, C2_SQL,
             [("o_orderkey", "s"), ("od", "s"), ("od_minus_7d", "s"),
              ("od_month", "s"), ("od_day", "s")]),
]

AGG_SUITE = [
    SubQuery("a3_grouped_conditional_counts", a3_grouped_conditional_counts,
             A3_SQL, [("c_nationkey", "s"), ("n_neg", "s"), ("n_pos", "s")]),
    SubQuery("a4_distinct_count", a4_distinct_count, A4_SQL,
             [("source", "s"), ("n_langs", "s")]),
    SubQuery("a6_group_sum_broadcast", a6_group_sum_broadcast, A6_SQL,
             [("c_custkey", "s"), ("nation_bal", "d2")]),
    SubQuery("a7_grouped_median", a7_grouped_median, A7_SQL,
             [("c_nationkey", "s"), ("median_bal", "d4")]),
    SubQuery("a8_dedup_distinct", a8_dedup_distinct, A8_SQL,
             [("c_mktsegment", "s"), ("c_nationkey", "s")]),
    SubQuery("a10_global_max_date", a10_global_max_date, A10_SQL,
             [("last_date", "s")]),
    SubQuery("a14_daily_total_delta", a14_daily_total_delta, A14_SQL,
             [("date", "s"), ("daily_delta", "s")]),
    SubQuery("a15_distinct_ordered_dates", a15_distinct_ordered_dates,
             A15_SQL, [("date", "s")]),
]

register_suite(
    "suite_core_clean",
    CLEAN_SUITE,
    doc="""Folded P/F/C suite (SURVEY §2.2-2.3, §2.8): projection+rename,
    derived key, null fill, conjunctive delete, censored decode, bool
    decode, clamp, date arithmetic — each sub-query hash-checked
    row-by-row against its DuckDB twin inside the suite union.""",
)
register_suite(
    "suite_core_agg",
    AGG_SUITE,
    doc="""Folded aggregation suite (SURVEY §2.4): conditional counts,
    distinct count, window group-sum, grouped median, distinct dedup,
    global max, daily-totals delta, distinct dates.""",
)


# --- standalone (non-trivial plans) -----------------------------------

@register(
    "a13_quantile_vector",
    sql="""
    SELECT i AS q_idx, round(qs[i], 2) AS q_value
    FROM (
      SELECT quantile_cont(l_extendedprice,
        [0.05,0.1,0.15,0.2,0.25,0.3,0.35,0.4,0.45,0.5,
         0.55,0.6,0.65,0.7,0.75,0.8,0.85,0.9,0.95]) AS qs
      FROM lineitem
    ), (SELECT CAST(unnest(range(1, 20)) AS INTEGER) AS i)
    """,
)
def a13_quantile_vector(spark, sf_dir):
    """A13 (ref :168): the 19-quantile color-scale vector.

    Runs the distributed-exact path (range sort + global rank-pick,
    bounded task memory — see quantile_vector_distributed); exact
    values, oracle parity.  ``exact=False`` flips to the mergeable
    sketch when bounded error is acceptable."""
    t = Tables(spark, sf_dir)
    return stats.quantile_vector(
        t.lineitem, "l_extendedprice", exact=True, distributed=True
    )


@register(
    "o_topk_per_group",
    sql="""
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def o_topk_per_group(spark, sf_dir):
    """O-class generalization: top-k per group with deterministic
    tie-break — the scalable replacement for sort-then-slice idioms
    (ref :75,:147 global sorts).

    r05: the registered query now runs the SKEW-SAFE two-stage salted
    formulation (``operators/skew.py: salted_topk_per_group``) — local
    top-k per (key, salt-bucket), bounded global re-rank — which is
    row-identical to the single-window form (the oracle keeps the
    plain ``row_number()`` SQL), so the 100 TB hot-key path is the one
    the correctness gate hash-checks."""
    from ..operators.skew import salted_topk_per_group

    t = Tables(spark, sf_dir)
    proj = t.orders.select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    return salted_topk_per_group(
        proj,
        "c_custkey",
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    )


TPCH_Q1_SQL = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """


# registered inside suite_tpch (queries/tpch_extra.py) — one driver slot
# covers q1/q3/q5/q6 with every sub-result hash-checked
def tpch_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary — the headline scan+agg benchmark.

    Partial aggregation (map-side combine) + 2-key hash agg; the filter
    and 7-column projection push into the parquet scan."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.count("*").alias("count_order"),
    )
