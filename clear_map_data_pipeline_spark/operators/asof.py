"""As-of joins — the time-series join Spark SQL lacks natively.

``asof_join`` generalizes the union-tag + single-window pattern the
registered ``j_asof_join`` query introduced (queries/joins.py): for
every left row, the temporally closest right row per key under a
direction rule — ``backward`` (latest right time <= left time, the
trade-quote classic), ``forward`` (earliest right time >= left time),
or ``nearest`` (closer of the two, ties to backward) — optionally
bounded by a ``tolerance``.

Semantics parity target: ``pandas.merge_asof`` with its defaults
(``allow_exact_matches=True``) — the public reference implementation
the tests compare against row-for-row.

Scale shape (why this beats a range join): both inputs are tagged and
UNIONED, then ONE window pass per direction over
``partitionBy(key).orderBy(time, tag)`` carries the last/first
non-null right-side payload struct to every left row — one shuffle on
the key, no per-row subquery, no skew-prone interval join, and the
right payload travels as a struct so ANY number of right columns ride
the same window.  ``nearest`` costs the same single sort with two
frames over it.  At 100 TB: shuffle volume = |left| + |right| rows
keyed on the join key; AQE splits skewed keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    time: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join ``left`` with ``right`` on key ``on`` and time
    column ``time`` (numeric or timestamp; both sides use the same
    names).  Returns every left row plus the matched right row's
    ``right_cols`` (null when no match qualifies).

    ``direction``: 'backward' | 'forward' | 'nearest'.
    ``tolerance``: maximum |left.time - right.time| (seconds for
    timestamps, same units for numerics); matches beyond it null out.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, time)
    ]
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right_cols collide with left columns: {sorted(overlap)}"
        )

    lpay = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    rpay = F.struct(
        F.col(time).alias("_rt"), *[F.col(c) for c in right_cols]
    ).alias("_r")
    tagged = left.select(
        F.col(on).alias("_k"), F.col(time).alias("_t"),
        F.lit(1).alias("_is_left"), lpay,
        F.lit(None).cast(
            right.select(rpay).schema["_r"].dataType.simpleString()
        ).alias("_r"),
    ).unionByName(
        right.select(
            F.col(on).alias("_k"), F.col(time).alias("_t"),
            F.lit(0).alias("_is_left"),
            F.lit(None).cast(
                left.select(lpay).schema["_l"].dataType.simpleString()
            ).alias("_l"),
            rpay,
        )
    )

    # backward: right rows at equal time sort BEFORE left rows, frame
    # ends at the current row -> latest right with _rt <= _t.
    w_back = (
        Window.partitionBy("_k")
        .orderBy("_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward: left rows at equal time sort BEFORE right rows, frame
    # starts at the current row -> earliest right with _rt >= _t.
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy("_t", F.col("_is_left").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )

    def _within(match: Column) -> Column:
        if tolerance is None:
            return match
        dist = F.abs(
            F.col("_t").cast("double") - match["_rt"].cast("double")
        )
        return F.when(dist <= F.lit(float(tolerance)), match)

    if direction == "backward":
        matched = tagged.withColumn(
            "_m", _within(F.last("_r", ignorenulls=True).over(w_back))
        )
    elif direction == "forward":
        matched = tagged.withColumn(
            "_m", _within(F.first("_r", ignorenulls=True).over(w_fwd))
        )
    else:  # nearest: both candidates, pick the closer, ties backward
        b = _within(F.last("_r", ignorenulls=True).over(w_back))
        f = _within(F.first("_r", ignorenulls=True).over(w_fwd))
        t = F.col("_t").cast("double")
        matched = (
            tagged.withColumn("_mb", b)
            .withColumn("_mf", f)
            .withColumn(
                "_m",
                F.when(F.col("_mb").isNull(), F.col("_mf"))
                .when(F.col("_mf").isNull(), F.col("_mb"))
                .when(
                    F.abs(t - F.col("_mf")["_rt"].cast("double"))
                    < F.abs(t - F.col("_mb")["_rt"].cast("double")),
                    F.col("_mf"),
                )
                .otherwise(F.col("_mb")),
            )
        )

    return matched.filter(F.col("_is_left") == 1).select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[F.col("_m")[c].alias(c) for c in right_cols],
    )
