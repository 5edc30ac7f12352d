"""Spatial operators (SURVEY.md §2.9 B1-B5) behind a backend interface.

Production backend: Apache Sedona (``ST_Union_Aggr``/``ST_ConvexHull``/
``ST_Boundary``/``ST_AsGeoJSON`` as Catalyst expressions).  Neither
Sedona nor shapely is in this container, so the default backend here is
pure-Python geometry inside Arrow-batched pandas UDFs:

- geometry travels as WKT strings (POLYGON / MULTIPOLYGON / LINESTRING /
  MULTILINESTRING) — a plain StringType column, never leaking into the
  relational core (SURVEY §7.4);
- convex hull: Andrew's monotone chain — exact;
- boundary, type predicate, GeoJSON encode/decode — exact;
- dissolve (B1, ref il_analysis_git.py:97-101): with shapely installed
  a true ``unary_union``; without it, edge-adjacent polygons (touching
  along complete shared edges — the grid/tile case) merge exactly into
  a single Polygon via directed edge cancellation + ring stitching
  (``merge_edge_adjacent``), and remaining multi-component unions
  assemble to a MultiPolygon.  The reference's branch "if union is
  MultiPolygon take its convex hull" then applies identically
  (hull(union) == hull(all points)); only overlapping-INTERIOR unions
  — which need real polygon clipping — still require shapely/Sedona.

At 100 TB: dissolve is a groupBy(key).applyInPandas — one shuffle on
the city key, group payloads are a city's polygons (tiny); the scalar
ops are per-row Arrow batches.
"""

import json
import re
from typing import Iterable

import pandas as pd

try:  # optional, for true unions of overlapping polygons
    from shapely import wkt as _shapely_wkt  # type: ignore
    from shapely.ops import unary_union as _shapely_union  # type: ignore

    HAVE_SHAPELY = True
except Exception:  # pragma: no cover - container has no shapely
    HAVE_SHAPELY = False

Ring = list[tuple[float, float]]

_NUM = r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"


def _parse_ring(body: str) -> Ring:
    pts = []
    for pair in body.split(","):
        x, y = pair.strip().split()[:2]
        pts.append((float(x), float(y)))
    return pts


def _rings_of(poly_body: str) -> list[Ring]:
    """'((x y, ...), (x y, ...))' -> rings."""
    return [
        _parse_ring(m.group(1))
        for m in re.finditer(r"\(([^()]+)\)", poly_body)
    ]


def parse_wkt(wkt: str) -> tuple[str, list[list[Ring]]]:
    """Parse POLYGON/MULTIPOLYGON WKT -> (type, [polygon=[rings]])."""
    s = wkt.strip()
    typ = s.split("(", 1)[0].strip().upper()
    body = s[s.index("(") :]
    if typ == "POLYGON":
        return typ, [_rings_of(body)]
    if typ == "MULTIPOLYGON":
        polys = []
        for m in re.finditer(r"\(\((?:[^()]+\)\s*,?\s*\()*[^()]+\)\)", body):
            polys.append(_rings_of(m.group(0)))
        return typ, polys
    raise ValueError(f"unsupported WKT type: {typ}")


def _fmt(v: float) -> str:
    return f"{v:g}"


def ring_wkt(r: Ring) -> str:
    return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in r) + ")"


def polygon_wkt(rings: list[Ring]) -> str:
    return "POLYGON (" + ", ".join(ring_wkt(r) for r in rings) + ")"


def multipolygon_wkt(polys: list[list[Ring]]) -> str:
    return (
        "MULTIPOLYGON ("
        + ", ".join("(" + ", ".join(ring_wkt(r) for r in p) + ")" for p in polys)
        + ")"
    )


def convex_hull(points: Iterable[tuple[float, float]]) -> Ring:
    """Andrew's monotone chain; returns a closed CCW ring."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        return list(pts) + [pts[0]] if pts else []

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    ring = lower[:-1] + upper[:-1]
    return ring + [ring[0]]


def geom_type(wkt: str) -> str:
    """B2: 'Polygon' / 'MultiPolygon' (shapely's geom_type casing)."""
    typ, _ = parse_wkt(wkt)
    return {"POLYGON": "Polygon", "MULTIPOLYGON": "MultiPolygon"}[typ]


def boundary(wkt: str) -> str:
    """B4 (ref :174): polygon -> its ring lines."""
    typ, polys = parse_wkt(wkt)
    lines = [ring_wkt(r) for p in polys for r in p]
    if len(lines) == 1:
        return "LINESTRING " + lines[0]
    return "MULTILINESTRING (" + ", ".join(lines) + ")"


def merge_edge_adjacent(polys: list[list[Ring]]) -> list[Ring] | None:
    """Union polygons that touch along COMPLETE shared edges by directed
    edge cancellation + ring stitching.

    With consistent ring winding, an edge shared by two adjacent
    polygons is traversed once as (a, b) and once as (b, a); cancelling
    opposite directed pairs leaves exactly the union's boundary, which
    is then stitched back into closed rings via the successor map.
    Exact for grid/tile-style adjacency (the shapely ``unary_union``
    result, incl. retained collinear vertices).  Returns ``None`` —
    caller falls back — when the input is outside this class: holes,
    partial edge overlap (a shared boundary split into different vertex
    runs per side), inconsistent winding, or a vertex with more than
    one outgoing boundary edge (pinch points)."""
    from collections import Counter

    edges: Counter = Counter()
    for p in polys:
        if len(p) != 1:  # holes -> fall back
            return None
        pts = p[0][:-1] if p[0][0] == p[0][-1] else p[0]
        if len(pts) < 3:
            return None
        n = len(pts)
        for i in range(n):
            edges[(pts[i], pts[(i + 1) % n])] += 1

    succ: dict[tuple[float, float], tuple[float, float]] = {}
    for (a, b), cnt in edges.items():
        survive = cnt - min(cnt, edges.get((b, a), 0))
        if survive == 0:
            continue
        if survive > 1 or a in succ:  # duplicate boundary / pinch point
            return None
        succ[a] = b

    rings: list[Ring] = []
    remaining = dict(succ)
    while remaining:
        start = min(remaining)  # deterministic ring start
        ring = [start]
        cur = remaining.pop(start)
        while cur != start:
            ring.append(cur)
            if cur not in remaining:
                return None  # open chain — inconsistent input
            cur = remaining.pop(cur)
        ring.append(start)
        rings.append(ring)
    return rings or None


def union_dissolve(wkts: list[str]) -> str:
    """B1+B3 (ref :97-101): union a city's polygons; if the union is a
    MultiPolygon, take its convex hull (exact, monotone chain);
    otherwise keep the union."""
    if HAVE_SHAPELY:
        u = _shapely_union([_shapely_wkt.loads(w) for w in wkts])
        if u.geom_type == "MultiPolygon":
            return u.convex_hull.wkt
        return u.wkt
    polys: list[list[Ring]] = []
    for w in wkts:
        _, ps = parse_wkt(w)
        polys.extend(ps)
    if len(polys) == 1:
        return polygon_wkt(polys[0])
    # edge-adjacent polygons (touching along complete shared edges)
    # merge to ONE ring -> a true single-Polygon union, matching the
    # reference's `unary_union` non-MultiPolygon branch
    merged = merge_edge_adjacent(polys)
    if merged is not None and len(merged) == 1:
        return polygon_wkt(merged)
    # still >1 component (or outside the edge-adjacency class) ->
    # MultiPolygon -> the reference's convex-hull branch.  hull(union)
    # == hull(all points), so the fallback is exact for that branch;
    # only overlapping-interior unions (needing real clipping) diverge
    # — those require shapely/Sedona.
    pts = [pt for p in polys for r in p for pt in r]
    return polygon_wkt([convex_hull(pts)])


def wkt_to_geojson(wkt: str) -> str:
    """B5 encode: WKT -> GeoJSON geometry (json string).  Handles the
    polygon family plus the boundary-line family (S5 lines export)."""
    s = wkt.strip()
    head = s.split("(", 1)[0].strip().upper()
    if head == "LINESTRING":
        ring = _parse_ring(s[s.index("(") + 1 : s.rindex(")")])
        return json.dumps(
            {"type": "LineString", "coordinates": [list(pt) for pt in ring]}
        )
    if head == "MULTILINESTRING":
        body = s[s.index("(") :]
        lines = [_parse_ring(m.group(1)) for m in re.finditer(r"\(([^()]+)\)", body)]
        return json.dumps(
            {
                "type": "MultiLineString",
                "coordinates": [[list(pt) for pt in ln] for ln in lines],
            }
        )
    typ, polys = parse_wkt(wkt)
    if typ == "POLYGON":
        return json.dumps(
            {"type": "Polygon", "coordinates": [[list(pt) for pt in r] for r in polys[0]]}
        )
    return json.dumps(
        {
            "type": "MultiPolygon",
            "coordinates": [[[list(pt) for pt in r] for r in p] for p in polys],
        }
    )


def geojson_to_wkt(gj: str) -> str:
    """B5 decode: GeoJSON geometry -> WKT."""
    g = json.loads(gj)
    if g["type"] == "Polygon":
        return polygon_wkt([[tuple(pt) for pt in r] for r in g["coordinates"]])
    if g["type"] == "MultiPolygon":
        return multipolygon_wkt(
            [[[tuple(pt) for pt in r] for r in p] for p in g["coordinates"]]
        )
    raise ValueError(g["type"])


# ---------------------------------------------------------------- Spark


def st_geomtype_udf():
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _f(s: pd.Series) -> pd.Series:
        return s.map(geom_type)

    return _f


def st_boundary_udf():
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _f(s: pd.Series) -> pd.Series:
        return s.map(boundary)

    return _f


def st_asgeojson_udf():
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _f(s: pd.Series) -> pd.Series:
        return s.map(wkt_to_geojson)

    return _f


def st_geomfromgeojson_udf():
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _f(s: pd.Series) -> pd.Series:
        return s.map(geojson_to_wkt)

    return _f


def dissolve(df, key: str = "city", geom: str = "geometry"):
    """Grouped dissolve: one (key, geometry) row per group, geometry =
    union-or-hull per the reference branch.  applyInPandas — one shuffle
    on the group key."""

    def _g(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {key: [pdf[key].iloc[0]], geom: [union_dissolve(list(pdf[geom]))]}
        )

    ktype = dict(df.dtypes)[key]
    return df.select(key, geom).groupBy(key).applyInPandas(
        _g, schema=f"{key} {ktype}, {geom} string"
    )
