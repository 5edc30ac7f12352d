"""Pin registry for persisted frames inside query builders.

Some operators persist an intermediate frame the consumer's action needs
(e.g. the MinHash shingle-set frame read by three downstream stages, or
the window-export prefix shared by the cutoff aggregate and the export
scan).  The builder cannot unpersist before returning — the caller's
action still has to read the cache — so an un-released persist leaks a
cached frame per invocation in a shared session (the correctness driver
runs ~50 queries back-to-back; bench warms + times each headline).

``pin`` registers the persist; ``release_all`` drops every pin from
PREVIOUS queries and runs automatically when the next registry query is
built (registry.register wraps every builder).  At most one query's
pins are ever alive, and repeated invocation of the same query reuses
no stale cache.  Long-lived callers embedding the library can call
``release_all()`` themselves after consuming a returned frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINS: list[DataFrame] = []
_EPOCH = 0


def pin(df: DataFrame) -> DataFrame:
    """persist() + register for deferred release.  Lazy like persist:
    the cache populates at the consumer's first action."""
    df.persist()
    _PINS.append(df)
    return df


def epoch() -> int:
    """Monotone counter bumped by every ``release_all``.  Callers that
    memoize a pinned frame (e.g. a suite sharing one digest scan across
    sub-queries) key their memo on this so a released pin is never
    served from the memo as if it were still cached."""
    return _EPOCH


def release_all() -> None:
    """Unpersist every pinned frame (no-op for never-materialized ones)."""
    global _EPOCH
    _EPOCH += 1
    while _PINS:
        df = _PINS.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
