"""Sources (SURVEY §2.1 S1-S3).

- S2 local CSV: explicit all-string schema at the ingest boundary (the
  dirty columns ARE strings until the clean stage decodes them) — no
  inferSchema job, stable under upstream drift.
- S1 HTTP CSV: Spark has no HTTP source; the driver-side fetch stages
  the payload to a path and the CSV reader takes over.  (Long-term: a
  custom Python DataSource via ``spark.dataSource.register``, Spark 4.)
- S3 GeoJSON: a FeatureCollection is one JSON object -> multiLine read,
  explode features, properties to columns, geometry to WKT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.clean import MOH_RENAME

# Raw MOH CSV schema (ref il_analysis_git.py:46,:52-54): the 8 retained
# columns in file order; everything string-typed until the clean stage.
MOH_RAW_COLUMNS = [
    "town_code", "agas_code", "date", "accumulated_cases",
    "new_cases_on_date", "accumulated_diagnostic_tests",
    "accumulated_vaccination_first_dose", "new_vacc_first_dose_on_date",
]


def moh_csv_schema(extra_cols: list[str] | None = None) -> T.StructType:
    cols = MOH_RAW_COLUMNS + (extra_cols or [])
    return T.StructType([T.StructField(c, T.StringType(), True) for c in cols])


def read_moh_csv(spark: SparkSession, path: str, extra_cols: list[str] | None = None) -> DataFrame:
    """S2 (ref :46): local CSV with explicit schema; renames the 8
    retained columns to the working names (positional rename P2)."""
    raw = (
        spark.read.option("header", True)
        .schema(moh_csv_schema(extra_cols))
        .csv(path)
    )
    return raw.select(*MOH_RAW_COLUMNS).toDF(*MOH_RENAME)


def fetch_http_to_staging(url: str, staging_path: str, headers: dict | None = None) -> str:
    """S1 (ref :37-45): driver-side HTTP fetch of the CKAN dump to a
    staging path Spark can read.  Network is unavailable in this
    environment; the function is the adapter seam."""
    import urllib.request

    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req) as resp:  # pragma: no cover - no net
        payload = resp.read()
    with open(staging_path, "wb") as f:  # pragma: no cover - no net
        f.write(payload)
    return staging_path


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """S3 (ref :76): FeatureCollection -> one row per feature with
    properties.* columns and a WKT ``geometry`` column."""
    from ..operators.spatial import st_geomfromgeojson_udf

    fc = spark.read.option("multiLine", True).json(path)
    feats = fc.select(F.explode("features").alias("f"))
    props = feats.select("f.properties.*", F.to_json("f.geometry").alias("_gj"))
    return props.withColumn(
        "geometry", st_geomfromgeojson_udf()(F.col("_gj"))
    ).drop("_gj")


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines source (r06) — the interchange format training-data
    drops actually arrive in.  Explicit schema preferred (no inference
    job, stable under drift — the S2 discipline); corrupt lines land
    in ``_corrupt_record`` instead of failing the read when a schema
    is given with that column, mirroring a 100-TB crawl's reality."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (r06): the other columnar lake format Spark reads
    natively — same pushdown/pruning contract as parquet (PPD +
    ReadSchema reach the scan), so lakehouse tables written by Hive/
    Trino ingest without conversion."""
    return spark.read.orc(path)
