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


# ---- overlapping-interior unions (real clipping, VERDICT r02 task #4)


def _norm_ring(ring):
    """Rotation/closure-normalized ring for geometric comparison."""
    r = ring[:-1] if ring[0] == ring[-1] else list(ring)
    k = r.index(min(r))
    return tuple(r[k:] + r[:k])


def test_union_dissolve_overlapping_rectangles_exact():
    """THE acceptance case: two interior-overlapping rectangles must
    dissolve to the exact 8-vertex union outline — not the hull (which
    would close both notches with diagonals)."""
    from clear_map_data_pipeline_spark.operators.spatial import (
        parse_wkt,
        union_dissolve,
    )

    got = union_dissolve([
        "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
        "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))",
    ])
    typ, polys = parse_wkt(got)
    assert typ == "POLYGON" and len(polys) == 1 and len(polys[0]) == 1
    assert _norm_ring(polys[0][0]) == _norm_ring(
        [(0, 0), (2, 0), (2, 1), (3, 1), (3, 3), (1, 3), (1, 2), (0, 2), (0, 0)]
    ), got


def test_union_dissolve_overlap_matches_shapely_if_available():
    """With shapely installed both backends must agree on the rectangle
    union; without it the pure-Python clipper is the backend under test
    (covered by the exact-outline assertions around this one)."""
    from clear_map_data_pipeline_spark.operators import spatial

    if not spatial.HAVE_SHAPELY:
        import pytest

        pytest.skip("shapely not in container — pure-Python path tested")
    from shapely import wkt as swkt

    wkts = [
        "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
        "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))",
    ]
    got = swkt.loads(spatial.union_dissolve(wkts))
    want = swkt.loads(
        "POLYGON ((0 0, 2 0, 2 1, 3 1, 3 3, 1 3, 1 2, 0 2, 0 0))"
    )
    assert got.equals(want)


def test_polygon_union_membership_equivalence():
    """Point-in-union == point-in-any-input over a dense sample grid,
    for a messy 3-polygon pile (two rects + a triangle, overlaps and a
    T-junction).  This is the semantic definition of union."""
    from clear_map_data_pipeline_spark.operators.spatial import (
        _pt_in_rings,
        polygon_union,
    )

    polys = [
        [[(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]],
        [[(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)]],
        [[(0.5, -0.5), (2.5, -0.5), (1.5, 1.5), (0.5, -0.5)]],
    ]
    u = polygon_union(polys)
    assert u is not None and len(u) == 1
    for i in range(71):
        for j in range(78):
            p = (i * 0.05 - 0.213, j * 0.05 - 0.617)
            want = any(_pt_in_rings(p, poly) != "out" for poly in polys)
            got = any(_pt_in_rings(p, poly) != "out" for poly in u)
            assert want == got, p


def test_polygon_union_stacked_identical():
    from clear_map_data_pipeline_spark.operators.spatial import polygon_union

    sq = [[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]]
    u = polygon_union([sq, sq, sq])
    assert u is not None and len(u) == 1
    assert _norm_ring(u[0][0]) == _norm_ring(sq[0])


def test_polygon_union_partial_edge_overlap():
    """Collinear partial edge sharing (the case merge_edge_adjacent
    refuses): two 2x1 rects overlapping in [1,2]x[0,1]."""
    from clear_map_data_pipeline_spark.operators.spatial import polygon_union

    u = polygon_union([
        [[(0, 0), (2, 0), (2, 1), (0, 1), (0, 0)]],
        [[(1, 0), (3, 0), (3, 1), (1, 1), (1, 0)]],
    ])
    assert u is not None and len(u) == 1
    assert _norm_ring(u[0][0]) == _norm_ring(
        [(0, 0), (1, 0), (2, 0), (3, 0), (3, 1), (2, 1), (1, 1), (0, 1)]
    )


def test_union_dissolve_tile_ring_yields_hole():
    """8 tiles around an empty middle: union is a Polygon with a hole
    (unary_union semantics), not a hull."""
    from clear_map_data_pipeline_spark.operators.spatial import (
        parse_wkt,
        union_dissolve,
    )

    tiles = [
        f"POLYGON (({i} {j}, {i+1} {j}, {i+1} {j+1}, {i} {j+1}, {i} {j}))"
        for i in range(3)
        for j in range(3)
        if (i, j) != (1, 1)
    ]
    got = union_dissolve(tiles)
    typ, polys = parse_wkt(got)
    assert typ == "POLYGON" and len(polys[0]) == 2  # outer + hole
    assert _norm_ring(polys[0][1]) == _norm_ring(
        [(1, 1), (1, 2), (2, 2), (2, 1), (1, 1)]
    ), got


def test_union_dissolve_float_crossings():
    """Non-integer crossing coordinates: both polygons must split at
    bitwise-identical points (canonical intersection computation) or
    ring stitching would fail and drop to the hull."""
    from clear_map_data_pipeline_spark.operators.spatial import (
        parse_wkt,
        union_dissolve,
    )

    got = union_dissolve([
        "POLYGON ((0.1 0.3, 2.7 0.2, 2.9 1.9, 0.2 2.1, 0.1 0.3))",
        "POLYGON ((1.3 1.1, 3.8 1.4, 3.6 3.3, 1.2 3.1, 1.3 1.1))",
    ])
    typ, polys = parse_wkt(got)
    assert typ == "POLYGON" and len(polys) == 1
    ring = polys[0][0]
    # union outline has 8 distinct vertices (4+4 minus none, plus 2
    # crossings, minus the 2 swallowed corners) — hull would have <= 7
    assert len(ring) - 1 == 8, got


# --- grid-bucketed spatial join ----------------------------------------


def test_spatial_join_matches_bruteforce(spark):
    """Grid-bucketed point-in-polygon join vs the all-pairs ray-cast
    reference on a synthesized layout: unit squares on a sparse grid
    plus one multi-cell rectangle and one polygon with a hole; points
    inside, outside, on edges, and on corners."""
    import random

    from clear_map_data_pipeline_spark.operators.spatial import (
        _pt_in_rings,
        parse_wkt,
        spatial_join_points_in_polygons,
    )

    def square(x0, y0, w=1.0, h=1.0):
        return (
            f"POLYGON (({x0} {y0}, {x0 + w} {y0}, {x0 + w} {y0 + h}, "
            f"{x0} {y0 + h}, {x0} {y0}))"
        )

    donut = (
        "POLYGON ((20 0, 26 0, 26 6, 20 6, 20 0), "
        "(22 2, 24 2, 24 4, 22 4, 22 2))"
    )
    polys = [
        (1, square(0, 0)),
        (2, square(4, 0)),
        (3, square(0, 4)),
        (4, square(8, 0, w=7.0, h=2.0)),  # spans multiple 4.0 cells
        (5, donut),
    ]
    rng = random.Random(5)
    pts = [(i, rng.uniform(-2, 30), rng.uniform(-2, 8)) for i in range(300)]
    # deliberate edge/corner/hole probes
    pts += [
        (1000, 0.0, 0.0),    # corner of poly 1
        (1001, 0.5, 0.0),    # edge of poly 1
        (1002, 23.0, 3.0),   # inside the hole of poly 5 -> out
        (1003, 21.0, 1.0),   # in the donut ring -> in poly 5
        (1004, 22.0, 3.0),   # on the hole boundary -> boundary
    ]

    pdf = spark.createDataFrame(polys, ["poly_id", "geometry"])
    tdf = spark.createDataFrame(pts, ["point_id", "x", "y"])
    got = {
        (r["point_id"], r["poly_id"])
        for r in spatial_join_points_in_polygons(tdf, pdf).collect()
    }

    want = set()
    parsed = {pid: parse_wkt(w)[1] for pid, w in polys}
    for pt_id, x, y in pts:
        for pid, pp in parsed.items():
            for rings in pp:
                if _pt_in_rings((x, y), rings) in ("in", "boundary"):
                    want.add((pt_id, pid))
                    break
    assert got == want
    assert (1000, 1) in got and (1001, 1) in got
    assert (1002, 5) not in got and (1003, 5) in got and (1004, 5) in got


def test_spatial_join_exclude_boundary(spark):
    from clear_map_data_pipeline_spark.operators.spatial import (
        spatial_join_points_in_polygons,
    )

    pdf = spark.createDataFrame(
        [(1, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")],
        ["poly_id", "geometry"],
    )
    tdf = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 0.0, 1.0)], ["point_id", "x", "y"]
    )
    got = {
        (r["point_id"], r["poly_id"])
        for r in spatial_join_points_in_polygons(
            tdf, pdf, include_boundary=False
        ).collect()
    }
    assert got == {(1, 1)}


def test_spatial_join_hot_polygon_skew(spark):
    """Hot-cell skew drill (r06-verdict task #4): ONE polygon covers
    half the point cloud, so its grid cells are the hot keys of the
    candidate equi-join.  Asserts (a) exactness vs the all-pairs
    ray-cast reference, (b) the verify join is a BROADCAST of the
    dim-sized polygon table — the fix for the body x candidates
    replication the id-keyed shuffle rejoin would pay on exactly this
    layout — and (c) the candidate ratio stays bounded by the bbox
    cover (no all-pairs blowup: candidates << |points| x |polys|)."""
    import random

    from pyspark.sql import functions as F

    from clear_map_data_pipeline_spark.operators.spatial import (
        _pt_in_rings,
        parse_wkt,
        spatial_join_points_in_polygons,
    )

    # one 16x8 monster spanning many 4.0-cells + 4 unit squares
    polys = [
        (1, "POLYGON ((0 0, 16 0, 16 8, 0 8, 0 0))"),
        (2, "POLYGON ((20 0, 21 0, 21 1, 20 1, 20 0))"),
        (3, "POLYGON ((20 4, 21 4, 21 5, 20 5, 20 4))"),
        (4, "POLYGON ((24 0, 25 0, 25 1, 24 1, 24 0))"),
        (5, "POLYGON ((24 4, 25 4, 25 5, 24 5, 24 4))"),
    ]
    rng = random.Random(7)
    # ~half the points land inside polygon 1's bbox, the rest spread
    pts = [
        (i, rng.uniform(0, 16), rng.uniform(0, 8)) for i in range(500)
    ] + [
        (1000 + i, rng.uniform(16, 30), rng.uniform(-2, 10))
        for i in range(500)
    ]
    pdf = spark.createDataFrame(polys, ["poly_id", "geometry"])
    tdf = spark.createDataFrame(pts, ["point_id", "x", "y"])

    joined = spatial_join_points_in_polygons(tdf, pdf)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # the verify rejoin must NOT fall back to a shuffle join: the only
    # shuffle-eligible join left is the cell-candidate equi-join
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1, plan

    got = {(r["point_id"], r["poly_id"]) for r in joined.collect()}
    want = set()
    parsed = {pid: parse_wkt(w)[1] for pid, w in polys}
    for pt_id, x, y in pts:
        for pid, pp in parsed.items():
            for rings in pp:
                if _pt_in_rings((x, y), rings) in ("in", "boundary"):
                    want.add((pt_id, pid))
                    break
    assert got == want
    # hot polygon really is hot: it owns ~half of all matches
    n_hot = sum(1 for _, pid in got if pid == 1)
    assert n_hot >= 400

    # candidate-ratio bound: candidates = bbox-cover hits only, far
    # below the 1000 x 5 all-pairs cross product
    from clear_map_data_pipeline_spark.operators.spatial import (
        _grid_cells_of_wkt,
    )

    cell = 4.0
    poly_cells = {
        (pid, c) for pid, w in polys for c in _grid_cells_of_wkt(w, cell)
    }
    n_cand = sum(
        1
        for pt_id, x, y in pts
        for pid, _ in polys
        if (pid, (x // cell, y // cell)) in poly_cells
    )
    assert n_cand < 1000 * 5 * 0.45, n_cand
