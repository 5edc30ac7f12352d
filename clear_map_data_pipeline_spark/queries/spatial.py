"""Spatial queries (SURVEY §2.9 B1-B5).  Geometry is synthesized
deterministically from the nation table (disjoint unit squares on a
grid, one per nation, grouped by region).  No SQL oracle — DuckDB's
spatial extension isn't available offline — so these are driver
rows-only checks; exact golden assertions live in tests/test_spatial.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import spatial as sp
from ..registry import register
from ..session import Tables


def _nation_squares(spark, sf_dir):
    """One disjoint unit square per nation at (3*(key%5), 3*(key//5));
    region key as the dissolve group.  Coordinates render as integers
    ("0 0", not "0.0 0.0") — the canonical `%g` form every WKT the
    geometry operators emit uses, so encode/decode round-trips are
    string-identical (r03 fix: the double-rendered input WKT made
    roundtrip_ok false for every row, invisible to a rows-only check)."""
    t = Tables(spark, sf_dir)
    n = t.nation.select(
        "n_nationkey",
        "n_regionkey",
        (F.col("n_nationkey") % 5 * 3).cast("long").alias("_x"),
        (F.expr("n_nationkey DIV 5") * 3).cast("long").alias("_y"),
    )
    wkt = F.concat(
        F.lit("POLYGON (("),
        F.col("_x"), F.lit(" "), F.col("_y"), F.lit(", "),
        F.col("_x") + 1, F.lit(" "), F.col("_y"), F.lit(", "),
        F.col("_x") + 1, F.lit(" "), F.col("_y") + 1, F.lit(", "),
        F.col("_x"), F.lit(" "), F.col("_y") + 1, F.lit(", "),
        F.col("_x"), F.lit(" "), F.col("_y"),
        F.lit("))"),
    )
    return n.select(
        "n_nationkey", F.col("n_regionkey").alias("city"), wkt.alias("geometry")
    )


def sp_dissolve_hull(spark, sf_dir):
    """B1+B2+B3 (ref :97-101): per-region dissolve of member polygons;
    multi-polygon unions collapse to their convex hull (monotone chain,
    exact).  applyInPandas grouped-map — one shuffle on the group key."""
    squares = _nation_squares(spark, sf_dir)
    return sp.dissolve(squares, key="city", geom="geometry")


def sp_boundary(spark, sf_dir):
    """B4 (ref :174): polygon -> boundary lines (Arrow-batched UDF)."""
    squares = _nation_squares(spark, sf_dir)
    return squares.select(
        "n_nationkey", sp.st_boundary_udf()(F.col("geometry")).alias("boundary_wkt")
    )


@register("sp_geometry_suite")
def sp_geometry_suite(spark, sf_dir):
    """Folded spatial suite (driver rows-only; exact goldens in
    tests/test_spatial.py): per-region dissolve-or-hull + per-polygon
    boundary, normalized to (q, key, wkt) rows."""
    dis = sp_dissolve_hull(spark, sf_dir).select(
        F.lit("sp_dissolve_hull").alias("q"),
        F.col("city").cast("string").alias("key"),
        F.col("geometry").alias("wkt"),
    )
    bnd = sp_boundary(spark, sf_dir).select(
        F.lit("sp_boundary").alias("q"),
        F.col("n_nationkey").cast("string").alias("key"),
        F.col("boundary_wkt").alias("wkt"),
    )
    return dis.unionByName(bnd)


@register(
    "sp_geojson_roundtrip",
    sql="""
    WITH n AS (
      SELECT n_nationkey,
             CAST(n_nationkey % 5 * 3 AS DOUBLE) AS x,
             CAST((n_nationkey // 5) * 3 AS DOUBLE) AS y
      FROM nation
    )
    SELECT n_nationkey,
           concat('{"type": "Polygon", "coordinates": [[[', x, ', ', y,
                  '], [', x + 1, ', ', y, '], [', x + 1, ', ', y + 1,
                  '], [', x, ', ', y + 1, '], [', x, ', ', y, ']]]}')
             AS geojson,
           true AS roundtrip_ok
    FROM n
    """,
)
def sp_geojson_roundtrip(spark, sf_dir):
    """B5 (ref :76,:173): WKT -> GeoJSON -> WKT round-trip fidelity.

    SQL-checked since r03: the squares are synthesized from nation
    keys, so the expected GeoJSON string is constructible in pure SQL
    (json.dumps renders the parsed coordinates as N.0 doubles; DuckDB's
    double-to-varchar matches) and roundtrip_ok must be TRUE — the
    hash now proves both the encoder's exact output and the decoder's
    identity, where the old rows-only check silently tolerated
    roundtrip_ok=false (caught while writing this oracle)."""
    squares = _nation_squares(spark, sf_dir)
    gj = sp.st_asgeojson_udf()(F.col("geometry"))
    back = sp.st_geomfromgeojson_udf()(gj)
    return squares.select(
        "n_nationkey",
        gj.alias("geojson"),
        (back == F.col("geometry")).alias("roundtrip_ok"),
    )
