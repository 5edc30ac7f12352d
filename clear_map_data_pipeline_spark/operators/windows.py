"""Shared window specifications.

Every per-geography operator in the reference partitions by ``id`` and
orders by ``date`` (SURVEY.md §2.5).  Defining ALL window specs over the
same (partition, order) pair lets Spark's ``EnsureRequirements`` satisfy
a whole stack of window functions with ONE ``Exchange hashpartitioning``
+ one sort — the key physical property at 100 TB, asserted in
tests/test_plan.py.
"""

from __future__ import annotations

from pyspark.sql import Window, WindowSpec
from pyspark.sql import functions as F


def by_key_ordered(key: str = "id", order: str = "date") -> WindowSpec:
    """partitionBy(key).orderBy(order) — the engine's canonical spec."""
    return Window.partitionBy(key).orderBy(F.col(order))


def prefix(key: str = "id", order: str = "date") -> WindowSpec:
    """Cumulative frame: unbounded-preceding .. current row (W1/A1)."""
    return by_key_ordered(key, order).rowsBetween(Window.unboundedPreceding, 0)


def full_partition(key: str = "id", order: str = "date") -> WindowSpec:
    """Whole-group frame for first/last-value broadcasts (A11/A12/W4)."""
    return by_key_ordered(key, order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )


def rolling(n: int, key: str = "id", order: str = "date") -> WindowSpec:
    """Trailing n-row frame, e.g. 7-day rolling sums (W5)."""
    return by_key_ordered(key, order).rowsBetween(-(n - 1), 0)


def unpartitioned(order: str = "date") -> WindowSpec:
    """Single-partition ordered window (W7: national daily diff).

    Only legal on already-aggregated tiny frames (<= #dates rows); a
    global window on raw data would serialize onto one task.
    """
    return Window.orderBy(F.col(order))
