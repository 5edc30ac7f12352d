"""Join-layer queries (SURVEY.md §2.6) plus the large-scale join patterns
the reference never needed (as-of join, sessionization, JSON extraction,
pivot, rollup) — all pure DataFrame ops with DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import Tables, literal_frame
from .suites import SubQuery, register_suite


@register(
    "j1_broadcast_join_revenue",
    sql="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def j1_broadcast_join_revenue(spark, sf_dir):
    """J1+P4 (ref :126-127): fact x dim equi-join chain.

    nation/customer are broadcast (dim side under the threshold);
    lineitem⋈orders is the only shuffle join.  At 100 TB the fact-fact
    join shuffles on the join key once — AQE handles skew splits."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.join(
            t.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


TPCH_Q3_SQL = """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """


# registered inside suite_tpch (queries/tpch_extra.py) — one driver slot
# covers q1/q3/q5/q6 with every sub-result hash-checked
def tpch_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> fact-fact join -> agg ->
    global top-k.  Scale shape: the segment filter prunes customer
    BEFORE the join (predicate pushdown to the scan), filtered customer
    broadcasts into orders, the orders half-date filter cuts the
    shuffle-side of lineitem⋈orders, and the global top-10 is a
    TakeOrderedAndProject (per-partition heaps + driver merge of 10
    rows), never a full sort.  Deterministic tie-break (date, orderkey)
    keeps the limit oracle-stable."""
    t = Tables(spark, sf_dir)
    cutoff = "1998-06-01"
    return (
        t.customer.filter(F.col("c_mktsegment") == "BUILDING")
        .hint("broadcast")
        .join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
        .join(
            t.lineitem.filter(
                F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(
            F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey")
        )
        .limit(10)
    )


J2_SEMI_SQL = """
SELECT c_custkey FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
"""


def j2_semi_join(spark, sf_dir):
    """J2/F5 (ref :117): restrict dim to keys present in the fact —
    left_semi join (EXISTS), never materializing fact columns."""
    t = Tables(spark, sf_dir)
    return t.customer.join(
        t.orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey")


J_ANTI_SQL = """
SELECT c_custkey FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= (SELECT max(o_orderdate) - INTERVAL 90 DAY
                          FROM orders)
)
"""


def j_anti_join(spark, sf_dir):
    """Anti-join complement of J2: customers with NO order in the 90
    days up to the dataset's max date (every customer has SOME order in
    the fixtures, so the churn framing keeps the result non-empty).
    The 1-row max-date aggregate is broadcast; the anti join never
    materializes fact columns."""
    t = Tables(spark, sf_dir)
    cutoff = t.orders.agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 90 DAYS")).alias("_cut")
    )
    recent = t.orders.join(F.broadcast(cutoff)).filter(
        F.col("o_orderdate") >= F.col("_cut")
    )
    return t.customer.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey")


@register(
    "j_asof_join",
    sql="""
    WITH e AS (SELECT event_id, user_id, CAST(ts AS DATE) AS d FROM events),
    m AS (
      SELECT e.event_id, e.user_id, e.d,
        (SELECT max(CAST(o.o_orderdate AS DATE)) FROM orders o
          WHERE o.o_custkey = e.user_id
            AND CAST(o.o_orderdate AS DATE) <= e.d) AS bd,
        (SELECT min(CAST(o.o_orderdate AS DATE)) FROM orders o
          WHERE o.o_custkey = e.user_id
            AND CAST(o.o_orderdate AS DATE) >= e.d) AS fd,
        (SELECT max(CAST(o.o_orderdate AS DATE)) FROM orders o
          WHERE o.o_custkey = e.user_id
            AND CAST(o.o_orderdate AS DATE) <= e.d
            AND e.d - CAST(o.o_orderdate AS DATE) <= 30) AS bd30
      FROM e)
    SELECT 'backward' AS direction, event_id, user_id,
           bd AS last_order_date FROM m
    UNION ALL
    SELECT 'forward' AS direction, event_id, user_id,
           fd AS last_order_date FROM m
    UNION ALL
    SELECT 'nearest' AS direction, event_id, user_id,
           CASE WHEN bd IS NULL THEN fd
                WHEN fd IS NULL THEN bd
                WHEN (fd - d) < (d - bd) THEN fd
                ELSE bd END AS last_order_date FROM m
    UNION ALL
    SELECT 'backward_tol30' AS direction, event_id, user_id,
           bd30 AS last_order_date FROM m
    """,
)
def j_asof_join(spark, sf_dir):
    """As-of join, ALL directions hash-checked (r06-verdict task #3):
    for each event, the temporally closest order date of the same user
    under each direction rule — latest at-or-before (backward),
    earliest at-or-after (forward), closer of the two with ties to
    backward (nearest) — plus a 30-day-tolerance backward case, all
    four unioned and tagged so one registered query exercises every
    branch of ``operators/asof.py: asof_join``.

    Spark has no native ASOF JOIN; the scalable pattern is union-tag +
    one window pass per direction — one shuffle on the key, no per-row
    subquery, no skew-prone range join.  Time rides as epoch-day ints
    (dates don't cast to double for the tolerance distance); the
    matched payload stays a real DATE column.  The DuckDB oracle uses
    correlated subqueries per direction for clarity; semantics
    identical (pandas.merge_asof parity is separately pinned by
    tests/test_asof.py)."""
    from ..operators.asof import asof_join

    t = Tables(spark, sf_dir)
    epoch = F.lit("1970-01-01")
    events = t.events.select(
        "event_id", "user_id",
        F.datediff(F.to_date("ts"), epoch).alias("d"),
    )
    orders = t.orders.select(
        F.col("o_custkey").alias("user_id"),
        F.datediff(F.to_date("o_orderdate"), epoch).alias("d"),
        F.to_date("o_orderdate").alias("last_order_date"),
    )
    out = None
    for tag, direction, tol in (
        ("backward", "backward", None),
        ("forward", "forward", None),
        ("nearest", "nearest", None),
        ("backward_tol30", "backward", 30.0),
    ):
        part = asof_join(
            events, orders, on="user_id", time="d",
            right_cols=["last_order_date"],
            direction=direction, tolerance=tol,
        ).select(
            F.lit(tag).alias("direction"),
            "event_id", "user_id", "last_order_date",
        )
        out = part if out is None else out.unionByName(part)
    return out


_SESSIONIZATION_SQL = """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    )
    SELECT user_id, CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id
    """


def j_sessionization(spark, sf_dir):
    """Sessionization: lag-gap > 30 min starts a new session; cumulative
    sum of the boundary flags numbers the sessions.  One shuffle on
    user_id; both windows share the same spec."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    gapped = t.events.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
                > 1800
            ),
            1,
        ).otherwise(0),
    ).withColumn("session_id", F.sum("is_new").over(wc))
    # session_id is a cumulative 1..k counter within each user (the
    # first row's boundary flag is always 1), so max == count distinct
    # — and mixing countDistinct with count(*) would plan an Expand
    # that doubles the rows feeding the aggregate for no information
    return gapped.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def ev_funnel_stages(spark, sf_dir):
    """Ordered funnel conversion (view -> click -> purchase): first
    completion time of each stage strictly after the previous stage —
    one shuffle on user_id, stacked same-spec windows (see
    operators/events.py: funnel_user_stages)."""
    from ..operators.events import funnel_user_stages

    t = Tables(spark, sf_dir)
    return funnel_user_stages(t.events, steps=FUNNEL_STEPS)


_FUNNEL_SQL = """
    WITH c1 AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN event_type = 'view' THEN ts END AS q0
      FROM events
    ),
    c2 AS (
      SELECT *, CASE WHEN event_type = 'click'
                      AND min(q0) OVER w IS NOT NULL THEN ts END AS q1
      FROM c1
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    c3 AS (
      SELECT *, CASE WHEN event_type = 'purchase'
                      AND min(q1) OVER w IS NOT NULL THEN ts END AS q2
      FROM c2
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    agg AS (
      SELECT user_id,
             epoch_us(min(q0)) AS t_view,
             epoch_us(min(q1)) AS t_click,
             epoch_us(min(q2)) AS t_purchase
      FROM c3 GROUP BY user_id
    )
    SELECT user_id, t_view, t_click, t_purchase,
           CAST(CAST(t_view IS NOT NULL AS INTEGER)
                + CAST(t_click IS NOT NULL AS INTEGER)
                + CAST(t_purchase IS NOT NULL AS INTEGER) AS INTEGER) AS stage
    FROM agg WHERE t_view IS NOT NULL
    """


def ev_retention_cohorts(spark, sf_dir):
    """Weekly retention cohorts over first-active date (see
    operators/events.py: retention_cohorts)."""
    from ..operators.events import retention_cohorts

    t = Tables(spark, sf_dir)
    return retention_cohorts(t.events, period_days=7)


_RETENTION_SQL = """
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    firsts AS (
      SELECT user_id, min(d) AS cohort_date FROM activity GROUP BY user_id
    )
    SELECT f.cohort_date,
           CAST((a.d - f.cohort_date) // 7 AS BIGINT) AS period_n,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users
    FROM activity a JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """


def ev_daily_anomaly(spark, sf_dir):
    """Daily volume anomaly z-scores per event type: trailing-7-day
    baseline excluding the scored day; mean/std from exact integer
    sums so engine and oracle agree bit-for-bit (see
    operators/events.py: daily_anomaly_zscores)."""
    from ..operators.events import daily_anomaly_zscores

    t = Tables(spark, sf_dir)
    return daily_anomaly_zscores(t.events, window=7, z_thresh=2.0)


_ANOMALY_SQL = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT day, event_type, n,
             count(n) OVER w AS k,
             sum(n) OVER w AS s,
             sum(n * n) OVER w AS ss
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT day, event_type, n,
             CASE WHEN k = 7 AND (ss - s * s / k) / (k - 1) > 0
                  THEN round((n - s / k)
                             / sqrt((ss - s * s / k) / (k - 1)), 4)
             END AS z
      FROM stats
    )
    SELECT day, event_type, n, z,
           CAST(coalesce(CAST(abs(z) > 2.0 AS INTEGER), 0) AS INTEGER)
             AS is_anomaly
    FROM scored
    """


# Folded into one registry slot (driver's 50-entry CORRECTNESS window):
# the sessionizer plus the product-analytics shapes every event
# table gets asked — ordered funnel conversion, retention cohorts, and
# daily volume-anomaly z-scores.
register_suite(
    "suite_events_analytics",
    [
        SubQuery(
            "j_sessionization",
            j_sessionization,
            _SESSIONIZATION_SQL,
            [("user_id", "s"), ("n_sessions", "s"), ("n_events", "s")],
        ),
        SubQuery(
            "ev_funnel_stages",
            ev_funnel_stages,
            _FUNNEL_SQL,
            [("user_id", "s"), ("t_view", "s"), ("t_click", "s"),
             ("t_purchase", "s"), ("stage", "s")],
        ),
        SubQuery(
            "ev_retention_cohorts",
            ev_retention_cohorts,
            _RETENTION_SQL,
            [("cohort_date", "s"), ("period_n", "s"), ("active_users", "s")],
        ),
        SubQuery(
            "ev_daily_anomaly",
            ev_daily_anomaly,
            _ANOMALY_SQL,
            [("day", "s"), ("event_type", "s"), ("n", "s"),
             ("z", "d4"), ("is_anomaly", "s")],
        ),
    ],
    doc="Event-analytics suite: gap-based sessionization + ordered "
    "funnel conversion (strictly-after cascade, one shuffle on user) + "
    "weekly retention cohorts, each oracle-checked row-for-row inside "
    "the union.",
)


_SKEW_JOIN_SQL = """
    SELECT p_type,
           round(sum(l_extendedprice), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_type
    """


def j_skew_salted_join(spark, sf_dir):
    """Skew-resistant join (operators/skew.py): the fact side is salted
    into 16 sub-keys and the dim side replicated per salt value, so a
    hot part key spreads over 16 reducers.  The oracle is the PLAIN
    join — salting must be row-identical."""
    from ..operators.skew import salted_join

    t = Tables(spark, sf_dir)
    part = t.part.withColumnRenamed("p_partkey", "l_partkey")
    joined = salted_join(t.lineitem, part, "l_partkey", salt=16)
    return joined.groupBy("p_type").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


_SKEW_DISTINCT_SQL = """
    SELECT o_custkey,
           CAST(count(DISTINCT o_orderdate) AS BIGINT) AS n_distinct
    FROM orders GROUP BY o_custkey
    """


def a_distinct_count_skewsafe(spark, sf_dir):
    """Two-stage exact distinct count (operators/skew.py): partial
    distinct within (key, hash(value) % 16) buckets, then sum — a hot
    key's distinct set never assembles in one task.  Oracle is the plain
    COUNT(DISTINCT)."""
    from ..operators.skew import salted_distinct_count

    t = Tables(spark, sf_dir)
    return salted_distinct_count(t.orders, "o_custkey", "o_orderdate")


TOPK_PER_CUST = 3

_SKEW_TOPK_SQL = f"""
    SELECT o_custkey, o_orderkey, o_total FROM (
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_total,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY round(o_totalprice, 2) DESC,
                                         o_orderkey) AS rn
      FROM orders) WHERE rn <= {TOPK_PER_CUST}
    """


def o_salted_topk_per_group(spark, sf_dir):
    """Two-stage exact top-k per group (r07, tests-only ->
    hash-checked): each customer's 3 highest-value orders via
    operators/skew.py: salted_topk_per_group — local top-k within
    (key, xxhash64-salt bucket) first, so a hot key never funnels all
    its rows through one task; the <= k*salt survivors re-rank
    globally.  Oracle is the PLAIN single-window top-k — salting must
    be row-identical."""
    from ..operators.skew import salted_topk_per_group

    t = Tables(spark, sf_dir)
    o = t.orders.select(
        "o_custkey", "o_orderkey",
        F.round("o_totalprice", 2).alias("o_total"),
    )
    return salted_topk_per_group(
        o, "o_custkey",
        [F.col("o_total").desc(), F.col("o_orderkey")],
        k=TOPK_PER_CUST,
    )


# r07: the three skew weapons fold into ONE driver slot (same oracles,
# hash-checked inside the union) — and the fold admits the previously
# tests-only salted top-k as a net-new hash-checked member.
register_suite(
    "suite_skew",
    [
        SubQuery(
            "j_skew_salted_join",
            j_skew_salted_join,
            _SKEW_JOIN_SQL,
            [("p_type", "s"), ("revenue", "d2"), ("n_items", "s")],
        ),
        SubQuery(
            "a_distinct_count_skewsafe",
            a_distinct_count_skewsafe,
            _SKEW_DISTINCT_SQL,
            [("o_custkey", "s"), ("n_distinct", "s")],
        ),
        SubQuery(
            "o_salted_topk_per_group",
            o_salted_topk_per_group,
            _SKEW_TOPK_SQL,
            [("o_custkey", "s"), ("o_orderkey", "s"), ("o_total", "d2")],
        ),
    ],
    doc="Skew-weapons suite: salted fact x replicated-dim join, "
    "two-stage exact distinct count, and two-stage exact top-k per "
    "group — every oracle is the PLAIN formulation, so each salted "
    "rewrite must be row-identical to the unsalted answer.",
)


@register(
    "c_json_extract",
    sql="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def c_json_extract(spark, sf_dir):
    """JSON extraction over events.props (SURVEY §2.8 extension surface):
    get_json_object — JVM-side Jackson parse, no Python boundary."""
    t = Tables(spark, sf_dir)
    return t.events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


O_PIVOT_SQL = """
SELECT l_returnflag,
       round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0.0), 2) AS qty_o,
       round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0.0), 2) AS qty_f
FROM lineitem GROUP BY l_returnflag
"""


def o_pivot(spark, sf_dir):
    """Pivot (wide aggregation) — explicit value list so no extra
    distinct-values job runs at scale."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 2))
        .withColumnRenamed("O", "qty_o")
        .withColumnRenamed("F", "qty_f")
    )


O_ROLLUP_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS rflag,
       coalesce(l_linestatus, 'ALL') AS lstatus,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def o_rollup(spark, sf_dir):
    """Rollup hierarchy totals (partial aggregation reused across levels)."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "sum_qty",
        )
    )


def o_intersect_custkeys(spark, sf_dir):
    """Set-op breadth (§2.7): customers appearing in BOTH the BUILDING
    segment and the 1996 order log — INTERSECT plans as a distinct +
    left-semi (one exchange per side, no row explosion)."""
    t = Tables(spark, sf_dir)
    building = t.customer.filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select(F.col("c_custkey").alias("k"))
    ordered = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("k"))
    return building.intersect(ordered)


O_INTERSECT_SQL = """
SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS k FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
"""


def o_except_custkeys(spark, sf_dir):
    """EXCEPT complement of the intersect: BUILDING customers with NO
    1996 order — distinct + left-anti under the hood."""
    t = Tables(spark, sf_dir)
    building = t.customer.filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select(F.col("c_custkey").alias("k"))
    ordered = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("k"))
    return building.subtract(ordered)  # EXCEPT DISTINCT semantics


O_EXCEPT_SQL = """
SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS k FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
"""


register_suite(
    "suite_semi_anti_join",
    [
        SubQuery("j2_semi_join", j2_semi_join, J2_SEMI_SQL,
                 [("c_custkey", "s")]),
        SubQuery("j_anti_join", j_anti_join, J_ANTI_SQL,
                 [("c_custkey", "s")]),
        SubQuery("o_intersect_custkeys", o_intersect_custkeys,
                 O_INTERSECT_SQL, [("k", "s")]),
        SubQuery("o_except_custkeys", o_except_custkeys,
                 O_EXCEPT_SQL, [("k", "s")]),
    ],
    doc="""Folded semi/anti/set-op suite (J2/F5 + churn complement +
    §2.7 INTERSECT/EXCEPT) — folded to keep the registry at the
    driver's 50-entry cap (COVERAGE.md).""",
)

register_suite(
    "suite_wide_agg",
    [
        SubQuery("o_pivot", o_pivot, O_PIVOT_SQL,
                 [("l_returnflag", "s"), ("qty_o", "d2"), ("qty_f", "d2")]),
        SubQuery("o_rollup", o_rollup, O_ROLLUP_SQL,
                 [("rflag", "s"), ("lstatus", "s"), ("sum_qty", "d2")]),
    ],
    doc="""Folded wide-aggregation suite: explicit-value-list pivot +
    rollup hierarchy totals (COVERAGE.md driver cap).""",
)


# Value tiers: (tier_id, name, lo, hi, multiplier); hi=None = unbounded.
# Both the Spark when-chain and the oracle CASE are generated from this
# one table so the range boundaries cannot drift between the two sides.
VALUE_TIERS = [
    (1, "low", 0.0, 50.0, 1.0),
    (2, "mid", 50.0, 150.0, 1.5),
    (3, "high", 150.0, 300.0, 2.0),
    (4, "top", 300.0, None, 3.0),
]


def _tier_case_sql() -> str:
    # below the first tier's lower bound -> NULL tier (matches no tier
    # under the theta semantics `value >= lo AND value < hi`)
    lo0 = VALUE_TIERS[0][2]
    whens = " ".join(
        f"WHEN value < {hi} THEN {tid}"
        for tid, _, _, hi, _ in VALUE_TIERS
        if hi is not None
    )
    last = VALUE_TIERS[-1][0]
    return f"CASE WHEN value < {lo0} THEN NULL {whens} ELSE {last} END"


@register(
    "j_range_bucket_join",
    sql=f"""
    WITH tiers(tier_id, tier_name, multiplier) AS (
      VALUES {", ".join(f"({tid}, '{name}', {mult})" for tid, name, _, _, mult in VALUE_TIERS)}
    ),
    bucketed AS (SELECT {_tier_case_sql()} AS tier_id, value FROM events)
    SELECT t.tier_name,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(b.value * t.multiplier), 2) AS weighted_value
    FROM bucketed b JOIN tiers t USING (tier_id)
    GROUP BY t.tier_name
    """,
)
def j_range_bucket_join(spark, sf_dir):
    """Range (theta) join rewritten as a broadcast equi-join: instead of
    ``events JOIN tiers ON value >= lo AND value < hi`` — which Spark
    can only execute as a BroadcastNestedLoopJoin, O(rows x tiers) with
    no codegen — each row computes its tier_id via a when-chain (the
    binary search over the boundary list, constant-folded into the scan
    stage) and then equi-joins the broadcast tier dim.  Same semantics
    for non-overlapping ranges — including below-range rows, which get
    a NULL tier_id and match no tier — and the plan stays
    BroadcastHashJoin + partial/final hash aggregate at any scale."""
    spark_tiers = literal_frame(
        spark,
        [(tid, name, mult) for tid, name, _, _, mult in VALUE_TIERS],
        "tier_id int, tier_name string, multiplier double",
    )
    t = Tables(spark, sf_dir)
    # rows below the first tier's lower bound get a NULL tier_id and
    # fall out of the inner equi-join — exactly the theta-join result
    tier_id = F.when(
        F.col("value") < VALUE_TIERS[0][2], F.lit(None).cast("int")
    )
    for tid, _, _, hi, _ in VALUE_TIERS:
        if hi is None:
            continue
        tier_id = tier_id.when(F.col("value") < hi, F.lit(tid))
    tier_id = tier_id.otherwise(F.lit(VALUE_TIERS[-1][0]))
    return (
        t.events.select(tier_id.alias("tier_id"), "value")
        .join(F.broadcast(spark_tiers), "tier_id")
        .groupBy("tier_name")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value") * F.col("multiplier")), 2).alias(
                "weighted_value"
            ),
        )
    )


# --- CDC merge/upsert --------------------------------------------------

_MERGE_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_total,
         o_orderpriority, 0 AS version, 'U' AS op
  FROM orders
),
changes AS (
  SELECT o_orderkey, o_custkey, o_total + 1000.0, o_orderpriority, 1, 'U'
  FROM base WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_total, o_orderpriority, 1, 'D'
  FROM base WHERE o_orderkey % 13 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, 123.45, 'NEW', 1, 'I'
  FROM base WHERE o_orderkey % 101 = 0
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey
                               ORDER BY version DESC, op) AS rn
  FROM (SELECT * FROM base UNION ALL SELECT * FROM changes)
)
SELECT o_orderkey, o_custkey, o_total, o_orderpriority
FROM r WHERE rn = 1 AND op <> 'D'
"""


def j_merge_upsert(spark, sf_dir):
    """CDC MERGE INTO: apply a deterministic change set (updates for
    keys % 7, deletes for % 13, inserts at key+10M for % 101; a key
    hitting both update and delete resolves to delete via the op
    tiebreak) onto orders.  One hash exchange on the merge key; see
    operators/merge.py for the bucketed/partition-pruned zero-shuffle
    variants at lakehouse scale.  r07: folded into suite_maintenance
    (queries/olap.py) — same oracle, one driver slot."""
    from ..operators.merge import merge_upsert

    t = Tables(spark, sf_dir)
    base = t.orders.select(
        "o_orderkey", "o_custkey",
        F.round("o_totalprice", 2).alias("o_total"), "o_orderpriority",
    )
    upd = (
        base.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_total", F.col("o_total") + 1000.0)
        .withColumn("version", F.lit(1)).withColumn("op", F.lit("U"))
    )
    dele = (
        base.filter(F.col("o_orderkey") % 13 == 0)
        .withColumn("version", F.lit(1)).withColumn("op", F.lit("D"))
    )
    ins = (
        base.filter(F.col("o_orderkey") % 101 == 0)
        .select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            "o_custkey",
            F.lit(123.45).alias("o_total"),
            F.lit("NEW").alias("o_orderpriority"),
        )
        .withColumn("version", F.lit(1)).withColumn("op", F.lit("I"))
    )
    changes = upd.unionByName(dele).unionByName(ins)
    return merge_upsert(base, changes, "o_orderkey")
