"""Golden assertions for the pure-Python spatial backend (no shapely,
no Sedona in this container — exact cases only)."""

from __future__ import annotations

from clear_map_data_pipeline_spark.operators import spatial as sp

SQ1 = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
SQ2 = "POLYGON ((3 0, 4 0, 4 1, 3 1, 3 0))"


def test_parse_roundtrip():
    typ, polys = sp.parse_wkt(SQ1)
    assert typ == "POLYGON" and len(polys) == 1
    assert sp.polygon_wkt(polys[0]) == SQ1


def test_geom_type():
    assert sp.geom_type(SQ1) == "Polygon"
    mp = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((2 2, 3 2, 3 3, 2 2)))"
    assert sp.geom_type(mp) == "MultiPolygon"


def test_convex_hull_exact():
    ring = sp.convex_hull([(0, 0), (1, 0), (1, 1), (0, 1), (0.5, 0.5)])
    assert set(ring) == {(0, 0), (1, 0), (1, 1), (0, 1)}
    assert ring[0] == ring[-1]


def test_union_single_polygon_identity():
    assert sp.union_dissolve([SQ1]) == SQ1


def test_union_disjoint_hull_branch():
    # two disjoint squares -> MultiPolygon union -> convex hull of all
    # corner points: the bounding quad (0,0)-(4,0)-(4,1)-(0,1)
    out = sp.union_dissolve([SQ1, SQ2])
    typ, polys = sp.parse_wkt(out)
    assert typ == "POLYGON"
    assert set(polys[0][0]) == {(0, 0), (4, 0), (4, 1), (0, 1)}


def test_boundary():
    assert sp.boundary(SQ1) == "LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)"


def test_geojson_roundtrip():
    gj = sp.wkt_to_geojson(SQ1)
    assert sp.geojson_to_wkt(gj) == SQ1


def test_spark_dissolve(spark, sf_dir):
    from clear_map_data_pipeline_spark.queries.spatial import sp_dissolve_hull

    rows = {r["city"]: r["geometry"] for r in sp_dissolve_hull(spark, sf_dir).collect()}
    assert len(rows) >= 1
    for wkt in rows.values():
        typ, _ = sp.parse_wkt(wkt)
        assert typ in ("POLYGON", "MULTIPOLYGON")


def test_union_dissolve_touching_rectangles_single_polygon():
    """Two rectangles sharing a complete edge dissolve to ONE Polygon
    (the reference's `unary_union` non-MultiPolygon branch), not a hull
    of an assembled MultiPolygon."""
    from clear_map_data_pipeline_spark.operators.spatial import union_dissolve

    got = union_dissolve([
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
        "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))",
    ])
    assert got == "POLYGON ((0 0, 1 0, 2 0, 2 1, 1 1, 0 1, 0 0))", got


def test_union_dissolve_l_shape_stays_nonconvex():
    """Three squares in an L: the true union is non-convex — a hull
    fallback would wrongly add the diagonal closing the notch."""
    from clear_map_data_pipeline_spark.operators.spatial import union_dissolve

    got = union_dissolve([
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
        "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))",
        "POLYGON ((0 1, 1 1, 1 2, 0 2, 0 1))",
    ])
    # notch vertex (1 1) present; hull would have dropped it
    assert got == (
        "POLYGON ((0 0, 1 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 1, 0 0))"
    ), got


def test_union_dissolve_corner_touch_falls_back_to_hull():
    """Squares sharing only a corner are not edge-adjacent: the union
    stays multi-component -> reference's convex-hull branch."""
    from clear_map_data_pipeline_spark.operators.spatial import union_dissolve

    got = union_dissolve([
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
        "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))",
    ])
    assert got.startswith("POLYGON ((")
    # hull of the two squares: their outer corners, no notch vertices
    assert "2 2" in got and "0 0" in got


def test_union_dissolve_disjoint_unchanged():
    from clear_map_data_pipeline_spark.operators.spatial import union_dissolve

    got = union_dissolve([
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
        "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))",
    ])
    # disjoint -> MultiPolygon -> hull branch (unchanged behavior)
    assert got == "POLYGON ((0 0, 1 0, 6 5, 6 6, 5 6, 0 1, 0 0))", got
