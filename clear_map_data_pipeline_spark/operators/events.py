"""Product-analytics operators over an event stream table
(training-data-pipeline extension surface, alongside the sessionizer in
queries/joins.py): ordered funnel conversion and retention cohorts —
the two queries every behavioral dataset gets asked first.

Scale design notes are per-operator; both shuffle once on ``user_id``
(funnel) or on small aggregates (retention) — never on raw events more
than necessary, and never through Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_user_stages(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """ORDERED funnel: for each user, the first time they completed each
    step STRICTLY AFTER completing the previous one (a click before any
    view does not count; an unordered "did all three ever" count is a
    different, weaker query).

    Returns one row per user who entered the funnel:
    (user, t_<step> epoch-micros per step [NULL once a stage is never
    reached], stage = number of consecutive stages completed).

    Scale shape: the cascade is sequential per user, but it needs NO
    per-user loop — stage i's qualification is "this event is of type
    steps[i] AND min(qualified-ts of stage i-1) over the strictly-
    preceding frame is non-null".  All windows share one
    (user, ts, tiebreak) spec, so the whole cascade is ONE hash
    exchange on user + ONE sort, with len(steps) stacked WindowExecs;
    the final groupBy(user) folds map-side.  No driver-side state, no
    UDFs — survives any user count; skew bounded by the busiest single
    user (the same bound sessionization already carries).
    """
    wprev = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    df = events
    qual_cols: list[str] = []
    for i, step in enumerate(steps):
        is_step = F.col(type_col) == step
        if i == 0:
            qual: Column = F.when(is_step, F.col(ts_col))
        else:
            prior = F.min(qual_cols[-1]).over(wprev)
            qual = F.when(is_step & prior.isNotNull(), F.col(ts_col))
        name = f"_q{i}"
        df = df.withColumn(name, qual)
        qual_cols.append(name)
    agg = df.groupBy(user_col).agg(
        *[
            F.unix_micros(F.min(c)).alias(f"t_{s}")
            for c, s in zip(qual_cols, steps)
        ]
    )
    # stage = longest prefix of non-null stage times (later stages are
    # non-null only if earlier ones are, by construction).
    stage = sum(
        (F.col(f"t_{s}").isNotNull().cast("int") for s in steps),
        F.lit(0),
    )
    return agg.withColumn("stage", stage).filter(F.col(f"t_{steps[0]}").isNotNull())


def daily_anomaly_zscores(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    window: int = 7,
    z_thresh: float = 2.0,
) -> DataFrame:
    """Volume-anomaly detection over daily event counts: each (type,
    day)'s count is z-scored against the TRAILING ``window`` days
    (excluding the day itself — the day under test must not contaminate
    its own baseline).  Days without a full trailing window get a NULL
    z (no verdict), never a fabricated one.

    Returns (day, event_type, n, z, is_anomaly int).

    Numeric determinism: mean/std derive from the frame's EXACT integer
    sum(n) and sum(n^2) — a fixed float expression over two integers —
    so engine and oracle agree bit-for-bit (a rolling stddev_samp
    aggregates floats in engine-specific order and can flip the
    rounding).  Scale shape: raw events collapse to |types x days|
    rows map-side first; the windows run over that tiny frame."""
    daily = (
        events.groupBy(
            F.to_date(ts_col).alias("day"), F.col(type_col)
        ).agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy(type_col)
        .orderBy("day")
        .rowsBetween(-window, -1)
    )
    stats = daily.select(
        "day",
        type_col,
        "n",
        F.count("n").over(w).alias("_k"),
        F.sum("n").over(w).alias("_s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("_ss"),
    )
    k, s, ss = F.col("_k"), F.col("_s"), F.col("_ss")
    mean = s / k
    var = (ss - s * s / k) / (k - 1)
    z = F.when(
        (k == window) & (var > 0),
        F.round((F.col("n") - mean) / F.sqrt(var), 4),
    )
    return stats.select(
        "day",
        type_col,
        "n",
        z.alias("z"),
        (F.abs(z) > z_thresh).cast("int").alias("is_anomaly"),
    ).withColumn("is_anomaly", F.coalesce(F.col("is_anomaly"), F.lit(0)))


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Retention matrix: cohort users by their first-ever active date,
    then count how many of each cohort were active ``period_days``-sized
    offsets later.  Returns (cohort_date, period_n, active_users).

    Scale shape: raw events collapse to DISTINCT (user, day) FIRST (the
    only pass over full data — map-side partial distinct), cohorts are
    a per-user min over that already-collapsed frame, and the final
    join keys on user with both sides hash-partitioned on user — at
    100 TB this is |users|-sized, not |events|-sized, on both inputs.
    The closing aggregate is |cohorts x offsets| rows: tiny."""
    activity = (
        events.select(F.col(user_col), F.to_date(ts_col).alias("_d")).distinct()
    )
    firsts = activity.groupBy(user_col).agg(F.min("_d").alias("cohort_date"))
    return (
        activity.join(firsts, user_col)
        .groupBy(
            "cohort_date",
            F.floor(F.datediff(F.col("_d"), F.col("cohort_date")) / period_days)
            .cast("long")
            .alias("period_n"),
        )
        .agg(F.countDistinct(user_col).alias("active_users"))
    )
