"""Property tests for the GeoJSON codec pair (operators/spatial.py
wkt_to_geojson / geojson_to_wkt): encode->decode must be the identity
for ANY geometry in the supported surface (polygon + boundary-line
families), and — mirroring the decode-only registry member
io_geojson_source_decode — a GeoJSON document built WITHOUT the
encoder must decode to the expected WKT, so a compensating
encoder/decoder bug pair cannot hide behind round-trip identity."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from clear_map_data_pipeline_spark.operators import spatial as sp

# coordinates whose repr survives the %g WKT formatter exactly:
# integers and halves in a modest range (|v| < 1e4 keeps %g plain)
_coord = st.one_of(
    st.integers(min_value=-9999, max_value=9999),
    st.integers(min_value=-9999, max_value=9999).map(lambda i: i + 0.5),
)
_point = st.tuples(_coord, _coord)


def _ring(draw) -> list[tuple[float, float]]:
    pts = draw(st.lists(_point, min_size=3, max_size=8, unique=True))
    return pts + [pts[0]]  # closed


def _line(draw) -> list[tuple[float, float]]:
    return draw(st.lists(_point, min_size=2, max_size=8, unique=True))


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_polygon_family_roundtrips(data):
    rings = [_ring(data.draw) for _ in range(data.draw(st.integers(1, 3)))]
    wkt = sp.polygon_wkt(rings)
    assert sp.geojson_to_wkt(sp.wkt_to_geojson(wkt)) == wkt

    polys = [[_ring(data.draw)] for _ in range(data.draw(st.integers(1, 3)))]
    mwkt = sp.multipolygon_wkt(polys)
    assert sp.geojson_to_wkt(sp.wkt_to_geojson(mwkt)) == mwkt


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_line_family_roundtrips(data):
    ln = _line(data.draw)
    wkt = "LINESTRING " + sp.ring_wkt(ln)
    assert sp.geojson_to_wkt(sp.wkt_to_geojson(wkt)) == wkt

    lines = [_line(data.draw) for _ in range(data.draw(st.integers(1, 3)))]
    mwkt = (
        "MULTILINESTRING ("
        + ", ".join(sp.ring_wkt(x) for x in lines)
        + ")"
    )
    assert sp.geojson_to_wkt(sp.wkt_to_geojson(mwkt)) == mwkt


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_decode_only_from_hand_built_geojson(data):
    """The encoder never runs: the GeoJSON dict is assembled with plain
    json.dumps from the coordinate lists, and the decoder alone must
    produce the WKT the formatters build from the same lists."""
    ring = _ring(data.draw)
    gj = json.dumps(
        {"type": "Polygon", "coordinates": [[list(p) for p in ring]]}
    )
    assert sp.geojson_to_wkt(gj) == sp.polygon_wkt([ring])

    ln = _line(data.draw)
    gj_line = json.dumps(
        {"type": "LineString", "coordinates": [list(p) for p in ln]}
    )
    assert sp.geojson_to_wkt(gj_line) == "LINESTRING " + sp.ring_wkt(ln)
