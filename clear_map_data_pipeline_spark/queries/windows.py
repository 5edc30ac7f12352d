"""Window-layer queries (SURVEY.md §2.4 A1/A11/A12, §2.5 W1-W7) — the
heart of the reference pipeline, re-expressed as window expressions over
ONE shared (id, date) window spec.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import stats
from ..operators.rebase import rebase_censored
from ..registry import register
from ..session import Tables
from .common import MOH_DAILY_SQL, POP_DIM_SQL, moh_daily, pop_dim
from .suites import SubQuery, register_suite

_REBASED_SQL = """
rebased AS (
  SELECT id, date, tests,
         cases + CASE WHEN sum(cases) OVER w = 0
                      THEN sum(new_case) OVER w ELSE 0 END AS cases,
         vaccine + CASE WHEN sum(vaccine) OVER w = 0
                        THEN sum(new_vaccine) OVER w ELSE 0 END AS vaccine
  FROM daily
  WINDOW w AS (PARTITION BY id ORDER BY date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)"""


@register(
    "w1_rebase_censored",
    sql=f"""
    WITH {MOH_DAILY_SQL},
    {_REBASED_SQL},
    {POP_DIM_SQL}
    SELECT r.id, r.date,
           CAST(r.cases AS BIGINT) AS cases_adj,
           CAST(r.vaccine AS BIGINT) AS vaccine_adj,
           CAST(coalesce(r.cases - lag(r.cases) OVER (PARTITION BY r.id ORDER BY r.date),
                         r.cases) AS BIGINT) AS delta,
           CAST(round(r.cases / p.pop * 100000) AS BIGINT) AS normalized
    FROM rebased r JOIN pop p USING (id)
    """,
)
def w1_rebase_censored(spark, sf_dir):
    """FLAGSHIP — A1/W1 + W3 + C6 + J1 (ref :22-30,:119-126,:162-166).

    Censored-series reconstruction (two conditional cumulative sums),
    daily delta, per-100k normalization, broadcast dim join.  The
    reference runs this as an O(n^2) iterrows loop per group under a
    joblib process pool; here it is one hash-shuffle on id + one sort +
    a stacked WindowExec, then a broadcast join — no Python boundary.
    """
    from ..functions import per_100k

    t = Tables(spark, sf_dir)
    daily = moh_daily(t)
    rebased = rebase_censored(
        daily, {"cases": "new_case", "vaccine": "new_vaccine"}
    )
    withdelta = stats.daily_delta(rebased, "cases")
    joined = withdelta.join(F.broadcast(pop_dim(t)), "id")
    return joined.select(
        "id",
        "date",
        F.col("cases").alias("cases_adj"),
        F.col("vaccine").alias("vaccine_adj"),
        F.col("delta").cast("long").alias("delta"),
        per_100k(F.col("cases"), F.col("pop")).alias("normalized"),
    )


@register(
    "w2_weekly_downsample",
    sql=f"""
    WITH {MOH_DAILY_SQL}
    SELECT id, date, cases FROM (
      SELECT id, date, cases,
             row_number() OVER (PARTITION BY id ORDER BY date DESC) AS rn
      FROM daily
    ) WHERE (rn - 1) % 7 = 0
    """,
)
def w2_weekly_downsample(spark, sf_dir):
    """W2 (ref :152-154): every-7th-row sampling anchored at the latest
    date.  The per-group iloc[::7] + append loop becomes one row_number
    + modulo filter."""
    t = Tables(spark, sf_dir)
    return stats.every_nth_latest_anchored(moh_daily(t), 7).select(
        "id", "date", "cases"
    )


@register(
    "w3_daily_delta",
    sql=f"""
    WITH {MOH_DAILY_SQL}
    SELECT id, date,
           CAST(coalesce(cases - lag(cases) OVER (PARTITION BY id ORDER BY date),
                         cases) AS BIGINT) AS delta
    FROM daily
    """,
)
def w3_daily_delta(spark, sf_dir):
    """W3 (ref :162-164): daily delta with first-row fallback
    (diff(periods=-1).fillna(cases) on a desc-sorted frame == lag-diff
    over asc order)."""
    t = Tables(spark, sf_dir)
    return stats.daily_delta(moh_daily(t), "cases").select(
        "id", "date", F.col("delta").cast("long").alias("delta")
    )


def w5_rolling_7d_sum(spark, sf_dir):
    """W5 (ref latent :138,:141): trailing 7-day rolling sum."""
    t = Tables(spark, sf_dir)
    return stats.rolling_sum(moh_daily(t), "cases", "cases_7d", 7).select(
        "id", "date", F.col("cases_7d").cast("long").alias("cases_7d")
    )


def w6_lag_7(spark, sf_dir):
    """W6 (ref latent :139): lag-7 with default 0 (shift(7, fill_value=0))."""
    t = Tables(spark, sf_dir)
    return stats.lag_k(moh_daily(t), "cases", "cases_lag7", 7, 0).select(
        "id", "date", F.col("cases_lag7").cast("long").alias("cases_lag7")
    )


def w_gapfill_locf(spark, sf_dir):
    """Gapfill + LOCF + linear interpolation (beyond-reference §2.5, the
    hypertable gapfill trio): densify each id's naturally-sparse daily
    series onto its [min(date), max(date)] spine, carry the last
    observation forward, and linearly interpolate across each gap.
    Spine explode + co-partitioned join + all fill windows on the one
    canonical (id, date) exchange."""
    t = Tables(spark, sf_dir)
    return stats.gapfill_locf_interp(moh_daily(t), "cases")


_W_GAPFILL_SQL = f"""
    WITH {MOH_DAILY_SQL},
    bounds AS (SELECT id, min(date) AS _d0, max(date) AS _d1
               FROM daily GROUP BY 1),
    spine AS (SELECT id, CAST(unnest(generate_series(_d0, _d1,
                                     INTERVAL 1 DAY)) AS DATE) AS date
              FROM bounds),
    j AS (SELECT s.id, s.date, d.cases AS obs
          FROM spine s LEFT JOIN daily d USING (id, date)),
    f AS (SELECT id, date, obs,
            last_value(obs IGNORE NULLS) OVER wp AS locf,
            first_value(obs IGNORE NULLS) OVER wn AS nxt,
            last_value(CASE WHEN obs IS NOT NULL THEN date END IGNORE NULLS)
              OVER wp AS pd,
            first_value(CASE WHEN obs IS NOT NULL THEN date END IGNORE NULLS)
              OVER wn AS nd
          FROM j
          WINDOW wp AS (PARTITION BY id ORDER BY date
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wn AS (PARTITION BY id ORDER BY date
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT id, date, obs AS cases, locf,
           floor((CASE WHEN obs IS NOT NULL THEN CAST(obs AS DOUBLE)
                  ELSE CAST(locf AS DOUBLE) + (nxt - locf)
                       * (date_diff('day', pd, date) * 1.0
                          / date_diff('day', pd, nd)) END) * 10000.0)
             / 10000.0 AS interp
    FROM f
    """


# pandas ewm(alpha=0.3, adjust=False) analog; shared by query + oracle.
EWMA_ALPHA = 0.3


def w_ewma(spark, sf_dir):
    """Recursive EWMA (beyond-reference §2.5): y_t = 0.7*y_{t-1} + 0.3*x_t
    per id over date order — no fixed-frame window computes a recursion,
    so each row folds its cumulative prefix list (bounded-series
    contract documented on the operator)."""
    t = Tables(spark, sf_dir)
    return stats.ewma(moh_daily(t), "cases", EWMA_ALPHA).select(
        "id", "date", "cases", "ewma"
    )


# list_filter mirrors Spark collect_list's null-dropping, so a NULL
# observation is IGNORED (skipped) on both engines instead of
# NULL-poisoning DuckDB's fold while silently vanishing from Spark's
_W_EWMA_SQL = f"""
    WITH {MOH_DAILY_SQL},
    l AS (SELECT id, date, cases,
                 list_filter(list(CAST(cases AS DOUBLE)) OVER
                   (PARTITION BY id ORDER BY date
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   x -> x IS NOT NULL) AS _pre
          FROM daily)
    SELECT id, date, cases,
           floor((CASE WHEN len(_pre) > 0 THEN list_reduce(_pre, (acc, x) ->
                  acc * CAST({1.0 - EWMA_ALPHA} AS DOUBLE)
                  + CAST({EWMA_ALPHA} AS DOUBLE) * x) END) * 1000000.0)
             / 1000000.0 AS ewma
    FROM l
    """


def w_rank_family(spark, sf_dir):
    """Ranking-window breadth (beyond-reference §2.5): ntile quartiles,
    percent_rank, cume_dist and dense_rank over the shared (id, date)
    spec — all stack on the same single exchange as every other
    per-id window."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    w = Window.partitionBy("id").orderBy("date")
    return moh_daily(t).select(
        "id",
        "date",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.dense_rank().over(w).cast("long").alias("drank"),
    )


_W_RANK_SQL = f"""
    WITH {MOH_DAILY_SQL}
    SELECT id, date,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           CAST(dense_rank() OVER w AS BIGINT) AS drank
    FROM daily
    WINDOW w AS (PARTITION BY id ORDER BY date)
    """


# Folded into one registry slot (driver's 50-entry CORRECTNESS window;
# the freed slot hosts suite_corpus_assembly) — both latent ramzor
# window primitives still hash-check row-for-row inside the union.
register_suite(
    "suite_window_latent",
    [
        SubQuery(
            "w5_rolling_7d_sum",
            w5_rolling_7d_sum,
            f"""
            WITH {MOH_DAILY_SQL}
            SELECT id, date,
                   CAST(sum(cases) OVER (PARTITION BY id ORDER BY date
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
                     AS cases_7d
            FROM daily
            """,
            [("id", "s"), ("date", "s"), ("cases_7d", "s")],
        ),
        SubQuery(
            "w6_lag_7",
            w6_lag_7,
            f"""
            WITH {MOH_DAILY_SQL}
            SELECT id, date,
                   CAST(lag(cases, 7, 0) OVER (PARTITION BY id ORDER BY date)
                        AS BIGINT) AS cases_lag7
            FROM daily
            """,
            [("id", "s"), ("date", "s"), ("cases_lag7", "s")],
        ),
        SubQuery(
            "w_rank_family",
            w_rank_family,
            _W_RANK_SQL,
            [("id", "s"), ("date", "s"), ("quartile", "s"),
             ("pct_rank", "d6"), ("cume", "d6"), ("drank", "s")],
        ),
        SubQuery(
            "w_gapfill_locf",
            w_gapfill_locf,
            _W_GAPFILL_SQL,
            [("id", "s"), ("date", "s"), ("cases", "s"), ("locf", "s"),
             ("interp", "d4")],
        ),
        SubQuery(
            "w_ewma",
            w_ewma,
            _W_EWMA_SQL,
            [("id", "s"), ("date", "s"), ("cases", "s"), ("ewma", "d6")],
        ),
    ],
    doc="Window-function suite: trailing 7-day rolling sum + lag-7 with "
    "zero default (latent ramzor, ref :138-141) + the ranking family "
    "(ntile/percent_rank/cume_dist/dense_rank) + date-spine gapfill "
    "with LOCF/linear interpolation + recursive EWMA, each "
    "oracle-checked row-for-row inside the union.",
)


@register(
    "a11_last_value_ratio",
    sql=f"""
    WITH {MOH_DAILY_SQL},
    {POP_DIM_SQL},
    latest AS (
      SELECT id, arg_max(cases, date) AS last_cases FROM daily GROUP BY id
    )
    SELECT d.id, d.date, d.cases,
           least(round(l.last_cases / p.pop * 100), 100.0) AS percent
    FROM daily d JOIN latest l USING (id) JOIN pop p USING (id)
    """,
)
def a11_last_value_ratio(spark, sf_dir):
    """A11+F7 (ref :134-137): latest-date ratio broadcast to all group
    rows, clamped to 100.  max_by over a full-partition window replaces
    the reference's per-group iloc[-1] rescan loop (O(groups*rows) ->
    one window pass)."""
    from ..functions import clamp

    t = Tables(spark, sf_dir)
    daily = moh_daily(t).join(F.broadcast(pop_dim(t)), "id")
    out = stats.last_value_ratio(daily, "cases", "pop", "percent")
    # pop is constant per id, so ratio-of-latest == latest-cases/pop.
    return out.select(
        "id", "date", "cases", clamp(F.col("percent"), hi=100.0).alias("percent")
    )


@register(
    "a12_rebase_to_period_start",
    sql=f"""
    WITH {MOH_DAILY_SQL},
    firsts AS (
      SELECT id, arg_min(cases, date) AS c0, arg_min(tests, date) AS t0
      FROM daily GROUP BY id
    )
    SELECT d.id, d.date, d.cases - f.c0 AS cases, d.tests - f.t0 AS tests
    FROM daily d JOIN firsts f USING (id)
    """,
)
def a12_rebase_to_period_start(spark, sf_dir):
    """A12 (ref :158-160): subtract each group's earliest-date value so
    every window's series starts at zero."""
    t = Tables(spark, sf_dir)
    return stats.rebase_to_period_start(moh_daily(t), ["cases", "tests"]).select(
        "id", "date", "cases", "tests"
    )


@register(
    "w_ramzor_score",
    sql=f"""
    WITH {MOH_DAILY_SQL},
    {POP_DIM_SQL},
    j AS (SELECT d.*, p.pop FROM daily d JOIN pop p USING (id)),
    r AS (
      SELECT id, date, pop,
             sum(cases) OVER w7 AS c7, sum(tests) OVER w7 AS t7
      FROM j
      WINDOW w7 AS (PARTITION BY id ORDER BY date
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    g AS (
      SELECT id, date,
             c7 / pop * 10000 AS wnc,
             lag(c7 / pop * 10000, 7, 0.0) OVER (PARTITION BY id ORDER BY date) AS prev,
             c7 / nullif(t7, 0) AS positivity
      FROM r
    )
    SELECT id, date,
           round(greatest(least(coalesce(
             2 + CASE WHEN prev <> 0 AND wnc * (wnc/prev) * (wnc/prev) > 0
                      THEN ln(wnc * (wnc/prev) * (wnc/prev)) END
               + positivity / 8,
             0.0), 10.0), 0.0), 1) AS ramzor
    FROM g
    """,
)
def w_ramzor_score(spark, sf_dir):
    """Latent ramzor traffic-light score (ref :138-146, commented out):
    2 + ln(N*G^2) + P/8 clamped to [0,10] — rolling sums, lag-7 growth,
    positivity, log, clamp, fillna in one stacked window plan."""
    t = Tables(spark, sf_dir)
    daily = moh_daily(t).join(F.broadcast(pop_dim(t)), "id")
    return stats.ramzor_score(daily).select("id", "date", "ramzor")
