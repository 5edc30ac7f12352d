"""CDC merge/upsert: apply a change set (inserts / updates / deletes)
onto a keyed base table — the lakehouse MERGE INTO primitive every
incrementally-maintained 100 TB dataset needs.

Semantics (deterministic, SQL-expressible):
- base rows carry version 0; each change row carries a version > 0;
- per key, the highest-version row wins (ties broken by op precedence
  via the version ordering the caller supplies);
- a winning 'D' (delete) removes the key; 'I'/'U' emit the new row.

Scale shape: ONE hash exchange on the merge key shared by the window
rank (max_by would work too, but row_number keeps full-row semantics
with an explicit deterministic tiebreak).  The change set is usually
orders of magnitude smaller than the base, but the base must shuffle
to meet it — on a real lakehouse you avoid even that by bucketing BOTH
sides on the key (see tests/test_plan.py's bucketed-join assertion:
the same storage layout makes this merge exchange-free) or by
partition-pruned rewrite (only partitions containing changed keys are
rewritten; the write-audit-publish pattern in operators/maintenance.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    version_col: str = "version",
    op_col: str = "op",
    keep_version: bool = False,
) -> DataFrame:
    """Apply ``changes`` (columns: base columns + version + op in
    {'I','U','D'}) onto ``base``; returns the merged table with base's
    data columns (plus the winning per-key version when
    ``keep_version``).

    Latest version per key wins; delete wins remove the key.  If the
    base carries a ``version_col`` it is used as each base row's
    version (an incrementally-maintained table feeding its own state
    back — see streaming/merge_sink.py); otherwise base rows are
    version-0 upserts, so unchanged keys pass through.  Callers that
    re-merge onto the output across batches MUST use
    ``keep_version=True`` and publish the version, or a late
    lower-version change in a later batch would beat a higher-version
    value applied earlier (the base would have been reset to 0)."""
    cols = [c for c in base.columns if c not in (version_col, op_col)]
    base_ver = (
        F.col(version_col).cast("long")
        if version_col in base.columns
        else F.lit(0).cast("long")
    )
    b = base.select(*cols, base_ver.alias(version_col)).withColumn(
        op_col, F.lit("U")
    )
    c = changes.select(*cols, F.col(version_col).cast("long"), F.col(op_col))
    w = Window.partitionBy(key).orderBy(
        F.col(version_col).desc(), F.col(op_col)
    )
    merged = (
        b.unionByName(c)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != "D"))
    )
    return merged.select(*cols, version_col) if keep_version else merged.select(*cols)
