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


def _ranked_nations(spark, sf_dir):
    """(region, 0-based rank within region by nationkey) — the layouts
    below place each nation's square as a function of its rank."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    return t.nation.select(
        "n_nationkey",
        F.col("n_regionkey").alias("city"),
        (F.row_number().over(w) - 1).alias("_k"),
    )


def _square_wkt(x: F.Column, y: F.Column) -> F.Column:
    """Unit-square WKT at (x, y), canonical rendering."""
    return F.concat(
        F.lit("POLYGON (("),
        x.cast("string"), F.lit(" "), y.cast("string"), F.lit(", "),
        (x + 1).cast("string"), F.lit(" "), y.cast("string"), F.lit(", "),
        (x + 1).cast("string"), F.lit(" "), (y + 1).cast("string"), F.lit(", "),
        x.cast("string"), F.lit(" "), (y + 1).cast("string"), F.lit(", "),
        x.cast("string"), F.lit(" "), y.cast("string"),
        F.lit("))"),
    )


def sp_dissolve_clip(spark, sf_dir):
    """B1 via REAL CLIPPING: each region's squares overlap in a strip
    (rank k at x = 0.5k), so merge_edge_adjacent bails and the
    arrangement-based polygon_union produces the exact single-polygon
    outline.  applyInPandas grouped-map — one shuffle on the group
    key."""
    n = _ranked_nations(spark, sf_dir)
    strip = n.select(
        "city",
        _square_wkt(
            F.col("_k") * F.lit(0.5), (F.col("city") * 3).cast("long")
        ).alias("geometry"),
    )
    return sp.dissolve(strip, key="city", geom="geometry")


def sp_dissolve_hull(spark, sf_dir):
    """B1+B2+B3 (ref :97-101): disjoint squares on a diagonal dissolve
    to a MultiPolygon, which the reference branch collapses to its
    convex hull (monotone chain, exact)."""
    n = _ranked_nations(spark, sf_dir)
    diag = n.select(
        "city",
        _square_wkt(
            (F.col("_k") * 3).cast("long"), (F.col("_k") * 3).cast("long")
        ).alias("geometry"),
    )
    return sp.dissolve(diag, key="city", geom="geometry")


def sp_boundary(spark, sf_dir):
    """B4 (ref :174): polygon -> boundary lines (Arrow-batched UDF)."""
    squares = _nation_squares(spark, sf_dir)
    return squares.select(
        "n_nationkey", sp.st_boundary_udf()(F.col("geometry")).alias("boundary_wkt")
    )


def sp_points_in_polygons(spark, sf_dir):
    """Grid-bucketed point-in-polygon join (r07, tests-only ->
    hash-checked): customers become quarter-grid points (exact binary
    fractions, so containment comparisons are bit-identical across
    engines), nations the usual disjoint unit squares, and the REAL
    operator runs — polygon cells via mapInPandas, cell equi-join,
    broadcast verify rejoin, exact ray-cast — while the oracle is pure
    interval arithmetic (a point is in an axis-aligned square iff both
    coordinates lie in its closed ranges; squares are 3 units apart so
    no point can match two).  Covers operators/spatial.py:
    spatial_join_points_in_polygons end to end."""
    polys = _nation_squares(spark, sf_dir).select(
        F.col("n_nationkey").cast("long").alias("poly_id"), "geometry"
    )
    t = Tables(spark, sf_dir)
    pts = t.customer.select(
        F.col("c_custkey").alias("point_id"),
        ((F.col("c_custkey") % 61) / F.lit(4.0)).alias("x"),
        ((F.expr("c_custkey DIV 61") % 53) / F.lit(4.0)).alias("y"),
    )
    return sp.spatial_join_points_in_polygons(pts, polys)


# DuckDB twin of the suite: all three layouts are deterministic
# functions of (region, member count / nation key), so the expected
# WKTs are pure SQL.  printf('%g') mirrors the operators' canonical
# coordinate rendering.
_GEOMETRY_SUITE_SQL = """
    WITH rc AS (
      SELECT n_regionkey AS r, count(*) AS cnt FROM nation GROUP BY 1
    ),
    clip AS (
      SELECT 'sp_dissolve_clip' AS q, CAST(r AS VARCHAR) AS key,
             CASE WHEN cnt = 1 THEN
               printf('POLYGON ((0 %d, 1 %d, 1 %d, 0 %d, 0 %d))',
                      r * 3, r * 3, r * 3 + 1, r * 3 + 1, r * 3)
             ELSE
               'POLYGON ((' || array_to_string(list_concat(
                 list_transform(range(0, CAST(cnt + 2 AS INTEGER)),
                   k -> printf('%g %g', k * 0.5, CAST(r * 3 AS DOUBLE))),
                 list_concat(
                   list_transform(range(CAST(cnt + 1 AS INTEGER), -1, -1),
                     k -> printf('%g %g', k * 0.5, CAST(r * 3 + 1 AS DOUBLE))),
                   [printf('%g %g', 0.0, CAST(r * 3 AS DOUBLE))])
               ), ', ') || '))'
             END AS wkt
      FROM rc
    ),
    hull AS (
      SELECT 'sp_dissolve_hull' AS q, CAST(r AS VARCHAR) AS key,
             CASE WHEN cnt = 1 THEN 'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'
             ELSE printf(
               'POLYGON ((0 0, 1 0, %d %d, %d %d, %d %d, 0 1, 0 0))',
               3 * (cnt - 1) + 1, 3 * (cnt - 1),
               3 * (cnt - 1) + 1, 3 * (cnt - 1) + 1,
               3 * (cnt - 1), 3 * (cnt - 1) + 1)
             END AS wkt
      FROM rc
    ),
    bnd AS (
      SELECT 'sp_boundary' AS q, CAST(n_nationkey AS VARCHAR) AS key,
             printf('LINESTRING (%d %d, %d %d, %d %d, %d %d, %d %d)',
                    n_nationkey % 5 * 3, (n_nationkey // 5) * 3,
                    n_nationkey % 5 * 3 + 1, (n_nationkey // 5) * 3,
                    n_nationkey % 5 * 3 + 1, (n_nationkey // 5) * 3 + 1,
                    n_nationkey % 5 * 3, (n_nationkey // 5) * 3 + 1,
                    n_nationkey % 5 * 3, (n_nationkey // 5) * 3) AS wkt
      FROM nation
    ),
    pip AS (
      SELECT 'sp_points_in_polygons' AS q,
             CAST(c_custkey AS VARCHAR) AS key,
             CAST(n_nationkey AS VARCHAR) AS wkt
      FROM customer, nation
      WHERE (c_custkey % 61) / 4.0
              >= CAST(n_nationkey % 5 * 3 AS DOUBLE)
        AND (c_custkey % 61) / 4.0
              <= CAST(n_nationkey % 5 * 3 + 1 AS DOUBLE)
        AND ((c_custkey // 61) % 53) / 4.0
              >= CAST((n_nationkey // 5) * 3 AS DOUBLE)
        AND ((c_custkey // 61) % 53) / 4.0
              <= CAST((n_nationkey // 5) * 3 + 1 AS DOUBLE)
    )
    SELECT * FROM clip
    UNION ALL SELECT * FROM hull
    UNION ALL SELECT * FROM bnd
    UNION ALL SELECT * FROM pip
    """


@register("sp_geometry_suite", sql=_GEOMETRY_SUITE_SQL)
def sp_geometry_suite(spark, sf_dir):
    """Folded spatial suite, SQL-checked since r03: the synthesized
    layouts make every expected WKT a pure function of the nation
    table, so the driver hash-verifies all four geometry paths —
    exact clipping union (overlapping strip), MultiPolygon -> convex
    hull (diagonal squares), per-polygon boundary, and (r07) the
    grid-bucketed point-in-polygon spatial join — through the
    applyInPandas/pandas-UDF machinery.  Exact goldens and property
    tests remain in tests/test_spatial*.py."""
    clip = sp_dissolve_clip(spark, sf_dir).select(
        F.lit("sp_dissolve_clip").alias("q"),
        F.col("city").cast("string").alias("key"),
        F.col("geometry").alias("wkt"),
    )
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
    pip = sp_points_in_polygons(spark, sf_dir).select(
        F.lit("sp_points_in_polygons").alias("q"),
        F.col("point_id").cast("string").alias("key"),
        F.col("poly_id").cast("string").alias("wkt"),
    )
    return clip.unionByName(dis).unionByName(bnd).unionByName(pip)


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
