"""Scalar expression helpers for the clean stage.

Reference semantics (``/root/reference/il_analysis_git.py``):
- censored decode: ``'<15' -> 0`` then numeric cast (lines 60-65)
- boolean-string decode: ``'TRUE'/'FALSE' -> 1/0`` (lines 66-73)
- derived surrogate key ``id = city*10000 + area`` (line 59)
- scalar clamp (line 137, latent 143-146)
- per-100k normalization (lines 165-166)

All are pure Column expressions — JVM-side, whole-stage-codegen'd, no
Python boundary.  At 100 TB these run inside the scan's codegen stage at
full columnar speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def censored_decode(col: Column, sentinel: str = "<15", cast: str = "long") -> Column:
    """``'<15'`` (privacy-censored count) -> 0, else numeric cast.

    Ref: il_analysis_git.py:60-65.
    """
    return F.when(col == sentinel, F.lit(0)).otherwise(col).cast(cast)


def bool_decode(col: Column) -> Column:
    """``'TRUE'/'FALSE'`` string -> 1/0 int; anything else -> NULL.

    Ref: il_analysis_git.py:66-73.
    """
    return (
        F.when(col == "TRUE", F.lit(1)).when(col == "FALSE", F.lit(0)).cast("long")
    )


def derived_id(city: Column, area: Column) -> Column:
    """Composite surrogate key ``city*10000 + area`` as LONG (5-digit city
    codes overflow int32).  Ref: il_analysis_git.py:59.
    """
    return (city.cast("long") * 10000 + area.cast("long")).cast("long")


def clamp(col: Column, lo: float | None = None, hi: float | None = None) -> Column:
    """Clamp a column into [lo, hi].  Ref: il_analysis_git.py:137, 143-146."""
    out = col
    if hi is not None:
        out = F.least(out, F.lit(hi))
    if lo is not None:
        out = F.greatest(out, F.lit(lo))
    return out


def per_100k(value: Column, pop: Column) -> Column:
    """``round(value/pop*100000)`` as LONG.  Ref: il_analysis_git.py:165-166."""
    return F.round(value / pop * 100000).cast("long")
