"""Format round-trip queries (r07): the JSONL and ORC source/sink
pairs, upgraded from tests-only to driver-hash-checked.

The oracle trick: the builders write the documents table through the
REAL sink, read it back through the REAL source, and return the
round-tripped rows — while the DuckDB twin just selects the same
columns from the parquet fixture.  Hash equality therefore proves the
write+read composition is an exact identity (JSON string escaping,
unicode, column types, ORC encoding) without DuckDB ever needing to
read the staged files.  All document columns are BIGINT/VARCHAR, so
the identity claim has no float-rendering caveats.

Corrupt-line capture, schema-drift behavior, and scan-pruning plans
for these sources remain pinned in tests/test_sources.py; this suite
adds the driver-grade end-to-end fidelity check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..session import Tables
from ..streaming.drain import _tracked_mkdtemp
from ..sources.readers import read_jsonl, read_orc
from ..sources.writers import write_jsonl, write_orc
from .suites import SubQuery, register_suite

_DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]
_DOCS_SQL = "SELECT doc_id, text, lang, source, n_chars FROM documents"
_SPEC = [(c, "s") for c in _DOC_COLS]


def io_jsonl_roundtrip(spark, sf_dir):
    """documents -> write_jsonl -> read_jsonl(explicit schema) ->
    identical rows.  Proves JSON-lines escaping round-trips every
    document byte-exactly (the interchange format training-data drops
    arrive in)."""
    docs = Tables(spark, sf_dir).documents.select(*_DOC_COLS)
    out = _tracked_mkdtemp("clearmap_io_") + "/docs_jsonl"
    write_jsonl(docs, out)
    return read_jsonl(spark, out, schema=docs.schema).select(*_DOC_COLS)


def io_orc_roundtrip(spark, sf_dir):
    """documents -> write_orc -> read_orc -> identical rows: the other
    columnar lake format, same pushdown contract as parquet."""
    docs = Tables(spark, sf_dir).documents.select(*_DOC_COLS)
    out = _tracked_mkdtemp("clearmap_io_") + "/docs_orc"
    write_orc(docs, out)
    return read_orc(spark, out).select(*_DOC_COLS)


def io_shard_export_roundtrip(spark, sf_dir):
    """documents -> write_training_shards (the write-audit-publish
    sharded training export: partitioned write, storage re-read +
    checksum audit, manifest.json commit marker) -> read back ->
    identical rows.  The full WAP path executes — a failed audit
    aborts before the marker — and the driver hash proves the
    published dataset is row-for-row the input corpus."""
    import os

    from pyspark.sql import functions as F

    from ..operators.assembly import (
        audit_training_shards,
        write_training_shards,
    )

    docs = Tables(spark, sf_dir).documents.select(*_DOC_COLS)
    sharded = docs.withColumn(
        "shard", (F.col("doc_id") % 8).cast("int")
    )
    out = _tracked_mkdtemp("clearmap_io_") + "/shards"
    write_training_shards(sharded, out)
    fsck = audit_training_shards(spark, out)
    if not fsck["ok"]:  # never return a corrupt dataset as "published"
        raise RuntimeError(f"shard audit failed: {fsck}")
    return (
        spark.read.parquet(os.path.join(out, "data")).select(*_DOC_COLS)
    )


def io_compaction_roundtrip(spark, sf_dir):
    """Small-files compaction (r07, tests-only -> hash-checked): the
    documents table is deliberately shattered into many small files,
    then compact_parquet_dataset rewrites it to ~2 target-sized,
    doc_id-clustered files — and the compacted dataset must be
    row-identical to the original (the maintenance job's one
    inviolable contract).  The builder also asserts the file count
    actually dropped, so the hash can't pass on a no-op."""
    import os

    from ..operators.maintenance import compact_parquet_dataset

    docs = Tables(spark, sf_dir).documents.select(*_DOC_COLS)
    root = _tracked_mkdtemp("clearmap_io_")
    shattered, compacted = root + "/shattered", root + "/compacted"
    docs.repartition(24).write.parquet(shattered)
    n_in = len([f for f in os.listdir(shattered) if f.endswith(".parquet")])
    total = sum(
        os.path.getsize(os.path.join(shattered, f))
        for f in os.listdir(shattered)
        if f.endswith(".parquet")
    )
    compact_parquet_dataset(
        spark, shattered, compacted,
        target_file_bytes=max(1, total // 2), order_by=["doc_id"],
    )
    n_out = len([f for f in os.listdir(compacted) if f.endswith(".parquet")])
    if not n_out < n_in:  # the compaction must actually compact
        raise RuntimeError(f"compaction was a no-op: {n_in} -> {n_out}")
    return spark.read.parquet(compacted).select(*_DOC_COLS)


def io_moh_csv_roundtrip(spark, sf_dir):
    """S2 (ref il_analysis_git.py:46): the MOH CSV source, upgraded
    from tests-only to driver-hash-checked via the write->read identity
    trick.  An MOH-shaped all-string frame (8 raw columns in file
    order, censored '<15' markers included) is staged from orders,
    written as a header CSV, and read back through the REAL
    ``read_moh_csv`` — explicit schema, no inference job, positional
    rename to the working names (P2).  The oracle replays the staging
    projection with the renamed aliases, so the hash proves the CSV
    encode + schema-pinned decode + rename is an exact identity."""
    from ..sources.readers import read_moh_csv

    out = _tracked_mkdtemp("clearmap_io_") + "/moh_csv"
    _moh_staged(spark, sf_dir).write.option("header", True).csv(out)
    return read_moh_csv(spark, out)


_MOH_CSV_SQL = """
SELECT CAST(o_orderkey % 500 AS VARCHAR) AS city,
       CAST(o_custkey % 10 AS VARCHAR) AS area,
       CAST(o_orderdate AS VARCHAR) AS date,
       CASE WHEN o_orderkey % 7 = 0 THEN '<15'
            ELSE CAST(o_orderkey % 1000 AS VARCHAR) END AS cases,
       CAST(o_orderkey % 50 AS VARCHAR) AS new_case,
       CAST(o_custkey % 2000 AS VARCHAR) AS tests,
       CAST(o_orderkey % 97 AS VARCHAR) AS vaccine,
       CAST(o_orderkey % 5 AS VARCHAR) AS new_vaccine
FROM orders
"""
_MOH_SPEC = [
    (c, "s")
    for c in (
        "city", "area", "date", "cases",
        "new_case", "tests", "vaccine", "new_vaccine",
    )
]


def _moh_staged(spark, sf_dir):
    """The MOH-shaped all-string staging frame (8 raw columns in file
    order, censored '<15' markers) both CSV members write; the oracle
    is ``_MOH_CSV_SQL``."""
    from ..sources.readers import MOH_RAW_COLUMNS

    o = Tables(spark, sf_dir).orders
    return o.select(
        (F.col("o_orderkey") % 500).cast("string").alias("town_code"),
        (F.col("o_custkey") % 10).cast("string").alias("agas_code"),
        F.col("o_orderdate").cast("string").alias("date"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("<15"))
        .otherwise((F.col("o_orderkey") % 1000).cast("string"))
        .alias("accumulated_cases"),
        (F.col("o_orderkey") % 50).cast("string").alias(
            "new_cases_on_date"
        ),
        (F.col("o_custkey") % 2000).cast("string").alias(
            "accumulated_diagnostic_tests"
        ),
        (F.col("o_orderkey") % 97).cast("string").alias(
            "accumulated_vaccination_first_dose"
        ),
        (F.col("o_orderkey") % 5).cast("string").alias(
            "new_vacc_first_dose_on_date"
        ),
    ).select(*MOH_RAW_COLUMNS)


def io_moh_datasource_roundtrip(spark, sf_dir):
    """S1's strategic path (ref il_analysis_git.py:37-45), hash-checked
    modulo the network hop: the custom SPLITTABLE Spark 4 Python
    DataSource (sources/moh_datasource.py) reads the staged dump
    through its REAL code path — ``partitions()`` carves byte ranges,
    each task seeks to the next line boundary and CSV-parses its range
    — against a single-file CSV assembled exactly like a downloaded
    dump (the url= option is the same seam with a fetch in front,
    gated on requests; tests cover it against a fake).  numpartitions=8
    forces genuine range splitting, so the boundary-seek logic is
    inside the driver hash, not just the unit tests."""
    import os

    from ..operators.clean import MOH_RENAME
    from ..sources.readers import MOH_RAW_COLUMNS
    from ..sources.moh_datasource import register_moh_source

    staged = _moh_staged(spark, sf_dir)
    outdir = _tracked_mkdtemp("clearmap_io_") + "/moh_parts"
    staged.write.option("header", False).csv(outdir)
    # assemble the single-file dump a real download would be: header
    # line + byte-concat of the part files (driver-side file I/O, no
    # row materialization)
    dump = os.path.join(os.path.dirname(outdir), "moh_dump.csv")
    with open(dump, "wb") as out:
        out.write((",".join(MOH_RAW_COLUMNS) + "\n").encode())
        for part in sorted(os.listdir(outdir)):
            if part.startswith("part-"):
                with open(os.path.join(outdir, part), "rb") as f:
                    out.write(f.read())
    register_moh_source(spark)
    raw = (
        spark.read.format("moh_csv")
        .option("path", dump)
        .option("numpartitions", 8)
        .load()
    )
    return raw.select(*MOH_RAW_COLUMNS).toDF(*MOH_RENAME)


def _squares(spark, sf_dir):
    from .spatial import _nation_squares

    return _nation_squares(spark, sf_dir).select("n_nationkey", "geometry")


def io_geojson_polygons_roundtrip(spark, sf_dir):
    """S4 (ref :173-175) write->read identity: the per-nation unit
    squares go through the REAL polygon sink (``write_geojson``: WKT ->
    GeoJSON FeatureCollection, ordered single-file collect) and come
    back through the REAL source (``read_geojson``: multiLine JSON,
    feature explode, properties to columns, geometry to WKT).  The
    oracle reconstructs the square WKT from the nation key in pure
    SQL, so the hash proves the whole sink+source composition renders
    and parses every coordinate byte-exactly."""
    import os

    from ..sources.readers import read_geojson
    from ..sources.writers import write_geojson

    path = os.path.join(_tracked_mkdtemp("clearmap_io_"), "polys.geojson")
    write_geojson(
        _squares(spark, sf_dir), path, order_by=("n_nationkey",)
    )
    return read_geojson(spark, path).select("n_nationkey", "geometry")


_GJ_POLY_SQL = """
SELECT n_nationkey,
       printf('POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))',
              n_nationkey % 5 * 3, (n_nationkey // 5) * 3,
              n_nationkey % 5 * 3 + 1, (n_nationkey // 5) * 3,
              n_nationkey % 5 * 3 + 1, (n_nationkey // 5) * 3 + 1,
              n_nationkey % 5 * 3, (n_nationkey // 5) * 3 + 1,
              n_nationkey % 5 * 3, (n_nationkey // 5) * 3) AS geometry
FROM nation
"""


def io_geojson_lines_roundtrip(spark, sf_dir):
    """S5 (ref plans/parse.py:38, il_analysis_git.py:173-175): the
    LINE-geometry GeoJSON sink+source identity — square boundaries
    (LINESTRING WKT from the Arrow-batched st_boundary UDF) through
    ``write_geojson`` -> ``read_geojson``; the oracle is the same
    printf the geometry suite pins for sp_boundary."""
    import os

    from ..operators import spatial as sp
    from ..sources.readers import read_geojson
    from ..sources.writers import write_geojson

    lines = _squares(spark, sf_dir).select(
        "n_nationkey",
        sp.st_boundary_udf()(F.col("geometry")).alias("geometry"),
    )
    path = os.path.join(_tracked_mkdtemp("clearmap_io_"), "lines.geojson")
    write_geojson(lines, path, order_by=("n_nationkey",))
    return read_geojson(spark, path).select("n_nationkey", "geometry")


_GJ_LINE_SQL = """
SELECT n_nationkey,
       printf('LINESTRING (%d %d, %d %d, %d %d, %d %d, %d %d)',
              n_nationkey % 5 * 3, (n_nationkey // 5) * 3,
              n_nationkey % 5 * 3 + 1, (n_nationkey // 5) * 3,
              n_nationkey % 5 * 3 + 1, (n_nationkey // 5) * 3 + 1,
              n_nationkey % 5 * 3, (n_nationkey // 5) * 3 + 1,
              n_nationkey % 5 * 3, (n_nationkey // 5) * 3) AS geometry
FROM nation
"""
_GJ_SPEC = [("n_nationkey", "s"), ("geometry", "s")]


def io_geojson_source_decode(spark, sf_dir):
    """S3/C9 standalone credit (r08-verdict #3, ref il_analysis_git.py
    :76): a DECODE-ONLY check on the GeoJSON source.  The S4/S5 members
    prove write->read identity, which a compensating encoder/decoder
    bug pair could in principle still satisfy; here the staged
    FeatureCollection is hand-assembled from the nation keys with plain
    ``json.dumps`` — ``write_geojson`` and ``wkt_to_geojson`` never run
    — so the hash against the SQL-printf WKT oracle pins the decoder
    (multiLine JSON scan, feature explode, properties lift,
    ``geojson_to_wkt``) independently of the encoder.  The key collect
    is a bounded dimension scalar (25 nations)."""
    import json
    import os

    from ..sources.readers import read_geojson

    keys = sorted(
        r[0]
        for r in Tables(spark, sf_dir).nation.select("n_nationkey").collect()
    )
    feats = []
    for k in keys:
        x, y = int(k) % 5 * 3, int(k) // 5 * 3
        ring = [[x, y], [x + 1, y], [x + 1, y + 1], [x, y + 1], [x, y]]
        feats.append(
            {
                "type": "Feature",
                "properties": {"n_nationkey": int(k)},
                "geometry": {"type": "Polygon", "coordinates": [ring]},
            }
        )
    path = os.path.join(_tracked_mkdtemp("clearmap_io_"), "literal.geojson")
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    return read_geojson(spark, path).select("n_nationkey", "geometry")


def io_dates_csv_roundtrip(spark, sf_dir):
    """S6 (ref :202-213): the ragged dates/colors/sums CSV sink —
    unequal-length columns zip_longest-padded to rows — written by the
    REAL ``write_dates_array_csv`` and read back schema-pinned.  The
    lists are bounded driver scalars (distinct order months, the five
    priorities, per-month counts), so the collect is legitimate at any
    scale; the oracle rebuilds the ragged table with ranked CTEs FULL
    JOINed on row rank (pad cells surface as NULL on both engines)."""
    import os

    from pyspark.sql import types as T

    from ..sources.writers import write_dates_array_csv

    o = Tables(spark, sf_dir).orders
    month = F.date_format("o_orderdate", "yyyy-MM").alias("m")
    months = [
        r["m"] for r in o.select(month).distinct().orderBy("m").collect()
    ]
    colors = [
        r[0]
        for r in o.select("o_orderpriority")
        .distinct()
        .orderBy("o_orderpriority")
        .collect()
    ]
    sums = [
        str(r["cnt"])
        for r in o.groupBy(month)
        .agg(F.count("*").alias("cnt"))
        .orderBy("m")
        .collect()
    ]
    path = os.path.join(_tracked_mkdtemp("clearmap_io_"), "dates.csv")
    write_dates_array_csv(
        path, {"dates": months, "colors": colors, "sums": sums}
    )
    schema = T.StructType(
        [
            T.StructField(c, T.StringType(), True)
            for c in ("dates", "colors", "sums")
        ]
    )
    return spark.read.option("header", True).schema(schema).csv(path)


_DATES_CSV_SQL = """
WITH m AS (
  SELECT substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS mo,
         count(*) AS cnt
  FROM orders GROUP BY 1
),
mr AS (
  SELECT mo, CAST(cnt AS VARCHAR) AS cnt,
         row_number() OVER (ORDER BY mo) AS rn
  FROM m
),
cr AS (
  SELECT pri, row_number() OVER (ORDER BY pri) AS rn
  FROM (SELECT DISTINCT o_orderpriority AS pri FROM orders)
)
SELECT mr.mo AS dates, cr.pri AS colors, mr.cnt AS sums
FROM mr FULL JOIN cr USING (rn)
"""
_DATES_SPEC = [("dates", "s"), ("colors", "s"), ("sums", "s")]


register_suite(
    "suite_io_roundtrip",
    [
        SubQuery("io_jsonl_roundtrip", io_jsonl_roundtrip, _DOCS_SQL, _SPEC),
        SubQuery("io_orc_roundtrip", io_orc_roundtrip, _DOCS_SQL, _SPEC),
        SubQuery(
            "io_moh_csv_roundtrip",
            io_moh_csv_roundtrip,
            _MOH_CSV_SQL,
            _MOH_SPEC,
        ),
        SubQuery(
            "io_moh_datasource_roundtrip",
            io_moh_datasource_roundtrip,
            _MOH_CSV_SQL,
            _MOH_SPEC,
        ),
        SubQuery(
            "io_geojson_polygons_roundtrip",
            io_geojson_polygons_roundtrip,
            _GJ_POLY_SQL,
            _GJ_SPEC,
        ),
        SubQuery(
            "io_geojson_lines_roundtrip",
            io_geojson_lines_roundtrip,
            _GJ_LINE_SQL,
            _GJ_SPEC,
        ),
        SubQuery(
            "io_geojson_source_decode",
            io_geojson_source_decode,
            _GJ_POLY_SQL,
            _GJ_SPEC,
        ),
        SubQuery(
            "io_dates_csv_roundtrip",
            io_dates_csv_roundtrip,
            _DATES_CSV_SQL,
            _DATES_SPEC,
        ),
        SubQuery(
            "io_shard_export_roundtrip",
            io_shard_export_roundtrip,
            _DOCS_SQL,
            _SPEC,
        ),
        SubQuery(
            "io_compaction_roundtrip",
            io_compaction_roundtrip,
            _DOCS_SQL,
            _SPEC,
        ),
    ],
    doc="Source/sink/maintenance round-trip suite: JSONL write+read, "
    "ORC write+read, the MOH CSV source (S2), the polygon and line "
    "GeoJSON sink+source pairs (S4/S5), the decode-only GeoJSON "
    "source check (S3/C9 — hand-assembled FeatureCollection, no "
    "encoder in the loop), the ragged dates CSV sink "
    "(S6), the write-audit-publish sharded training export, and "
    "small-files compaction (24 shattered files -> ~2 clustered, "
    "builder-asserted) must each be an exact identity — hash-checked "
    "against SQL reconstructions of the staged inputs, so sink "
    "encoding, source decoding, the WAP publish path, and the "
    "compaction rewrite are all driver-verified end to end.",
)
