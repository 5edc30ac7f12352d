"""Censored-series reconstruction — the reference's flagship operator.

Reference (``il_analysis_git.py:22-30``, applied at ``:119-124``): per
``id`` group ordered by ``date``, wherever the cumulative sum of the
privacy-censored ``cases`` column is still 0, substitute the cumulative
count of ``new_case`` flags ("if cases < 15, at least this many").  The
reference runs an O(n²) ``iterrows`` loop per group under a joblib
process pool and flags it as its own bottleneck.

Spark-first rewrite: two conditional cumulative sums over ONE shared
window spec — O(n) per group after a single hash-shuffle on ``id``, no
Python boundary, whole-stage codegen'd ``WindowExec``.

Known reference quirk: ``il_analysis_git.py:124`` adds ``m_vaccine``
into ``cases`` (not ``vaccine``).  This module implements the evident
intent (each measure rebased by its own flag-count); pass
``replicate_reference_bug=True`` to reproduce the reference verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import prefix


def rebase_censored(
    df: DataFrame,
    measures: dict[str, str],
    key: str = "id",
    order: str = "date",
    replicate_reference_bug: bool = False,
) -> DataFrame:
    """Rebase censored cumulative measures from their daily-flag streams.

    Parameters
    ----------
    df : one row per (key, order) — cumulative measure columns + 0/1
         daily "new" flag columns.
    measures : {cumulative_col: new_flag_col}, e.g.
         {"cases": "new_case", "vaccine": "new_vaccine"}.

    For each measure m with flag f::

        m_adj = m + CASE WHEN sum(m) OVER prefix = 0
                         THEN sum(f) OVER prefix ELSE 0 END

    (ref :22-30 computes the CASE; :123-124 folds it back with ``+=``).
    The result keeps the original column names, adjusted in place.
    """
    w = prefix(key, order)
    patches = {
        m: F.when(F.sum(m).over(w) == 0, F.sum(flag).over(w)).otherwise(F.lit(0))
        for m, flag in measures.items()
    }
    if replicate_reference_bug and set(measures) >= {"cases", "vaccine"}:
        # il_analysis_git.py:123-124: both m_cases and m_vaccine are
        # added into `cases`; `vaccine` is left un-rebased.
        return df.withColumn(
            "cases", F.col("cases") + patches["cases"] + patches["vaccine"]
        )
    out = df
    for m in measures:
        out = out.withColumn(m, F.col(m) + patches[m])
    return out
