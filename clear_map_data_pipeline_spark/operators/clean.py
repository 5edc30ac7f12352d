"""The clean stage: dirty MOH-shaped input -> typed fact table.

Reference (``il_analysis_git.py:52-75``): drop unused columns
(drift-tolerant), rename, null-default city/area, delete all-null rows,
derive the surrogate id, decode '<15' privacy sentinels and
'TRUE'/'FALSE' flags, cast.  One chained select — a single codegen
stage, no shuffle; at 100 TB this runs at scan speed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import bool_decode, censored_decode, derived_id

MOH_RENAME = [
    "city", "area", "date", "cases", "new_case", "tests", "vaccine", "new_vaccine",
]

MOH_DROP = [
    "accumulated_tested", "new_tested_on_date", "_id", "accumulated_recoveries",
    "new_recoveries_on_date", "accumulated_hospitalized", "new_hospitalized_on_date",
    "accumulated_deaths", "new_deaths_on_date", "town",
    "new_diagnostic_tests_on_date", "accumulated_vaccination_second_dose",
    "new_vacc_second_dose_on_date",
]


def drop_tolerant(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P1 (ref :52): drop-if-present (pandas errors='ignore')."""
    present = [c for c in cols if c in df.columns]
    return df.drop(*present) if present else df


def clean_moh(df: DataFrame) -> DataFrame:
    """Full clean stage over the raw 8-column (post-drop/rename) frame
    with every value still a string (ref :53-74):

    - date parse 'yyyy-MM-dd' (C1)
    - null city/area -> 0 (F1), drop city=0 AND area=0 rows (F2)
    - id = city*10000 + area (P3)
    - '<15' -> 0 then numeric cast for cases/tests/vaccine (F3)
    - 'TRUE'/'FALSE' -> 1/0 for new_case/new_vaccine (F4)
    """
    return (
        df.select(
            F.coalesce(F.col("city").cast("long"), F.lit(0)).alias("city"),
            F.coalesce(F.col("area").cast("long"), F.lit(0)).alias("area"),
            F.to_date("date", "yyyy-MM-dd").alias("date"),
            censored_decode(F.col("cases"), cast="long").alias("cases"),
            bool_decode(F.col("new_case")).alias("new_case"),
            censored_decode(F.col("tests"), cast="double").alias("tests"),
            censored_decode(F.col("vaccine"), cast="double").alias("vaccine"),
            bool_decode(F.col("new_vaccine")).alias("new_vaccine"),
        )
        .filter(~((F.col("city") == 0) & (F.col("area") == 0)))
        .withColumn("id", derived_id(F.col("city"), F.col("area")))
    )
