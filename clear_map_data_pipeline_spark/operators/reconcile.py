"""Area/city reconciliation — the reference's J3 (``il_analysis_git.py:84-115``).

The reference loops over ``data.groupby('city')`` doing per-group masked
rescans of the whole frame (O(cities x rows)).  Decomposed here into:

1. per-city flag aggregates over BOTH tables (one pass each),
2. a case label per city:
     case 1 — city has no area-0 rows               -> untouched
     case 2 — city has area-0 AND other areas       -> drop its area-0 rows
     case 3 — only area-0 in data, >1 area in shape -> collapse city:
              data.area=1, data.id=city*10000+1; shape rows dissolve to
              one city row (geometry union/hull handled by spatial.py)
     case 4 — only area-0 in data, 1 area in shape  -> data.area=1,
              data.id=city*10000+1
3. broadcast-join the (tiny) flag table back and rewrite with when().

The reference's ``iloc[0]+1`` idioms read the first row of a column that
is constant 0 within the affected groups, so area becomes literally 1
and id becomes city*10000+1 — encoded directly rather than positionally.
One broadcast join + one shuffle (the shape collapse groupBy); the data
side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def city_case_flags(data: DataFrame, shape: DataFrame) -> DataFrame:
    """Per-city case label (1-4).  Tiny output: one row per city."""
    dflags = data.groupBy("city").agg(
        F.sum(F.when(F.col("area") == 0, 1).otherwise(0)).alias("n_area0"),
        F.sum(F.when(F.col("area") != 0, 1).otherwise(0)).alias("n_other"),
    )
    sflags = shape.groupBy("city").agg(
        F.countDistinct("area").alias("n_shape_areas")
    )
    return dflags.join(sflags, "city", "left").select(
        "city",
        F.when(F.col("n_area0") == 0, 1)
        .when(F.col("n_other") > 0, 2)
        .when(F.coalesce(F.col("n_shape_areas"), F.lit(0)) > 1, 3)
        .otherwise(4)
        .alias("case"),
    )


def reconcile_data(data: DataFrame, flags: DataFrame) -> DataFrame:
    """Apply case 2 deletions and case 3/4 rewrites to the fact table."""
    j = data.join(F.broadcast(flags), "city", "left")
    collapse = F.col("case").isin(3, 4)
    return (
        j.filter(~((F.col("case") == 2) & (F.col("area") == 0)))
        .withColumn("area", F.when(collapse, F.lit(1)).otherwise(F.col("area")))
        .withColumn(
            "id",
            F.when(collapse, F.col("city") * 10000 + 1).otherwise(F.col("id")),
        )
        .drop("case")
    )


def reconcile_shape(
    shape: DataFrame, flags: DataFrame, dissolve_geometry=None
) -> DataFrame:
    """Collapse case-3 cities to one row (ref :97-110): area/id rewritten
    to the city-wide surrogate, pop summed, rank medianed (stays NULL
    when all ranks are NULL, matching the reference's notnull guard),
    areas_name <- city name, duplicates collapsed by aggregation.

    ``dissolve_geometry``: optional fn(DataFrame) -> DataFrame mapping
    the case-3 subset to (city, geometry) with polygons unioned — kept
    out of the relational core (SURVEY §7.4); None drops geometry.
    """
    j = shape.join(F.broadcast(flags), "city", "left")
    untouched = j.filter(
        F.coalesce(F.col("case"), F.lit(1)) != 3
    ).drop("case")
    case3 = j.filter(F.col("case") == 3)
    collapsed = (
        case3.groupBy("city")
        .agg(
            F.min("name").alias("name"),
            F.sum("pop").alias("pop"),
            F.median("rank").alias("rank"),
        )
        .withColumn("area", F.lit(1).cast("long"))
        .withColumn("id", (F.col("city") * 10000 + 1).cast("long"))
        .withColumn("areas_name", F.col("name"))
    )
    geom_cols = [c for c in shape.columns if c == "geometry"]
    if geom_cols and dissolve_geometry is not None:
        geo = dissolve_geometry(case3)
        collapsed = collapsed.join(geo, "city", "left")
    elif geom_cols:
        untouched = untouched.drop("geometry")
    out_cols = [c for c in untouched.columns]
    return untouched.select(out_cols).unionByName(
        collapsed.select(out_cols), allowMissingColumns=False
    )
