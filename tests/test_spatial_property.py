"""Property tests for the edge-adjacent polygon union
(operators/spatial.py merge_edge_adjacent): for ANY connected set of
disjoint grid tiles, the stitched union must be a single ring whose
shoelace area equals the tile count and whose edge set is exactly the
tiles' boundary."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _tile_wkt(x: int, y: int) -> str:
    return (
        f"POLYGON (({x} {y}, {x + 1} {y}, {x + 1} {y + 1}, "
        f"{x} {y + 1}, {x} {y}))"
    )


def _shoelace(ring) -> float:
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        s += x1 * y2 - x2 * y1
    return abs(s) / 2.0


def _connected_tiles(draw) -> set[tuple[int, int]]:
    """Grow a random connected tile set from the origin (guarantees the
    edge-adjacency precondition)."""
    n = draw(st.integers(min_value=1, max_value=12))
    tiles = {(0, 0)}
    for _ in range(n - 1):
        fx, fy = draw(st.sampled_from(sorted(tiles)))
        dx, dy = draw(st.sampled_from([(1, 0), (-1, 0), (0, 1), (0, -1)]))
        tiles.add((fx + dx, fy + dy))
    return tiles


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_union_of_connected_tiles_is_single_ring_with_exact_area(data):
    from clear_map_data_pipeline_spark.operators.spatial import (
        merge_edge_adjacent,
        parse_wkt,
    )

    tiles = _connected_tiles(data.draw)
    polys = []
    for x, y in tiles:
        _, ps = parse_wkt(_tile_wkt(x, y))
        polys.extend(ps)
    merged = merge_edge_adjacent(polys)
    if merged is None:
        # legitimate bail-out: a pinch point (two region lobes meeting
        # at a single vertex) has 2 outgoing boundary edges at that
        # vertex — outside the documented exact class
        return
    if len(merged) == 1:
        ring = merged[0]
        assert ring[0] == ring[-1]
        assert _shoelace(ring) == float(len(tiles))
    else:
        # >1 ring for a connected tile set means an interior hole
        # (e.g. a donut of tiles): outer area - hole areas == tile count
        areas = sorted((_shoelace(r) for r in merged), reverse=True)
        assert areas[0] - sum(areas[1:]) == float(len(tiles))


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_union_boundary_edges_match_tile_edge_cancellation(data):
    from clear_map_data_pipeline_spark.operators.spatial import (
        merge_edge_adjacent,
        parse_wkt,
    )

    tiles = _connected_tiles(data.draw)
    polys = []
    for x, y in tiles:
        _, ps = parse_wkt(_tile_wkt(x, y))
        polys.extend(ps)
    merged = merge_edge_adjacent(polys)
    if merged is None:
        return
    # expected boundary: tile edges not shared by two tiles
    from collections import Counter

    edges = Counter()
    for p in polys:
        pts = p[0][:-1]
        for i in range(len(pts)):
            a, b = pts[i], pts[(i + 1) % len(pts)]
            edges[frozenset((a, b))] += 1
    expected = {e for e, c in edges.items() if c == 1}
    got = set()
    for ring in merged:
        for a, b in zip(ring, ring[1:]):
            got.add(frozenset((a, b)))
    assert got == expected


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_polygon_union_membership_property(data):
    """For ANY pile of random axis-aligned rectangles (overlapping,
    nested, adjacent, disjoint): when polygon_union certifies a result,
    point-in-union == point-in-any-input on a sample grid, and total
    area (shoelace, holes negative) == inclusion-exclusion area of the
    rectangle arrangement measured on the same lattice."""
    from clear_map_data_pipeline_spark.operators.spatial import (
        _pt_in_rings,
        _signed_area,
        polygon_union,
    )

    n = data.draw(st.integers(min_value=2, max_value=4))
    rects = []
    for _ in range(n):
        x0 = data.draw(st.integers(min_value=0, max_value=6))
        y0 = data.draw(st.integers(min_value=0, max_value=6))
        w = data.draw(st.integers(min_value=1, max_value=4))
        h = data.draw(st.integers(min_value=1, max_value=4))
        rects.append(
            [[(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h), (x0, y0)]]
        )
    u = polygon_union(rects)
    if u is None:
        return  # outside the certifiable class — caller falls back
    # membership equivalence on an off-lattice grid (avoids boundaries)
    for i in range(23):
        for j in range(23):
            p = (i * 0.5 - 0.263, j * 0.5 - 0.281)
            want = any(_pt_in_rings(p, r) != "out" for r in rects)
            got = any(_pt_in_rings(p, poly) != "out" for poly in u)
            assert want == got, (p, rects)
    # area identity: sum of signed ring areas (outer +, holes -)
    got_area = sum(_signed_area(ring) for poly in u for ring in poly)
    # inclusion-exclusion via unit-cell counting (all coords integral)
    cells = {
        (cx + 0.5, cy + 0.5)
        for cx in range(-1, 12)
        for cy in range(-1, 12)
        if any(_pt_in_rings((cx + 0.5, cy + 0.5), r) == "in" for r in rects)
    }
    assert abs(got_area - len(cells)) < 1e-6, (got_area, len(cells), rects)
