"""Integration test for the COMPLETE reference ``parse()`` composition
(plans/parse.py): clean -> reconcile (geometry dissolve) -> rebase ->
join -> stats -> 4-window export -> 8 GeoJSON files + dates CSV, with
geometry flowing as WKT through the plan (VERDICT r01 'What's missing'
#2)."""

from __future__ import annotations

import csv
import hashlib
import json


def _sha(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def test_parse_end_to_end(spark, sf_dir, tmp_path):
    from clear_map_data_pipeline_spark.plans.parse import parse

    out1 = tmp_path / "run1"
    artifacts = parse(spark, sf_dir, str(out1))

    # --- artifact inventory: 8 GeoJSON + 1 CSV -----------------------
    windows = ("all", "wave_2", "weeks_2", "weeks_1")
    expect = {f"{w}_polygons" for w in windows} | {
        f"{w}_lines" for w in windows
    } | {"dates_csv"}
    assert set(artifacts) == expect

    # --- polygons: valid FeatureCollection, full export schema -------
    with open(artifacts["all_polygons"], encoding="utf-8") as f:
        gj = json.load(f)
    assert gj["type"] == "FeatureCollection" and gj["features"]
    feat = gj["features"][0]
    assert feat["geometry"]["type"] in ("Polygon", "MultiPolygon")
    assert set(feat["properties"]) == {
        "date", "num_cases", "tests", "id", "socio_economic_rank",
        "area_name", "percent", "p_vaccine", "delta", "normalized",
    }

    # --- lines: 2 properties + boundary line geometry (ref :175) -----
    with open(artifacts["weeks_1_lines"], encoding="utf-8") as f:
        lj = json.load(f)
    lfeat = lj["features"][0]
    assert set(lfeat["properties"]) == {"date", "num_cases"}
    assert lfeat["geometry"]["type"] in ("LineString", "MultiLineString")

    # --- dates CSV: 12 ragged columns, 19-quantile colors ------------
    with open(artifacts["dates_csv"], newline="") as f:
        rows = list(csv.reader(f))
    header = rows[0]
    assert len(header) == 12
    for w in windows:
        for suffix in ("dates", "colors", "sums"):
            assert f"{w}_{suffix}" in header
    colors_idx = header.index("all_colors")
    colors = [r[colors_idx] for r in rows[1:] if r[colors_idx]]
    assert len(colors) == 19

    # --- determinism: byte-identical on rerun ------------------------
    out2 = tmp_path / "run2"
    artifacts2 = parse(spark, sf_dir, str(out2))
    for name in artifacts:
        assert _sha(artifacts[name]) == _sha(artifacts2[name]), name


def test_parse_geometry_matches_windowless_export(spark, sf_dir):
    """The geometry-carrying pipeline must not perturb the relational
    result: dropping geometry reproduces the oracle-checked
    pipeline_export frames exactly."""
    from clear_map_data_pipeline_spark.plans.clearmap import run_pipeline
    from clear_map_data_pipeline_spark.registry import load_all

    exports = run_pipeline(spark, sf_dir, geometry=True)
    got = sorted(
        map(str, (tuple(r) for r in exports["weeks_2"].drop("geometry").collect()))
    )
    q = load_all()["pipeline_export_weeks_2"].builder(spark, sf_dir)
    want = sorted(map(str, (tuple(r) for r in q.collect())))
    assert got == want


def test_parse_case3_geometry_dissolves_to_single_polygon(spark, sf_dir):
    """Case-3 cities' touching area squares must dissolve into ONE
    Polygon (edge-adjacent union), not a MultiPolygon assembly."""
    from pyspark.sql import functions as F

    from clear_map_data_pipeline_spark.plans.clearmap import run_pipeline

    exports = run_pipeline(spark, sf_dir, geometry=True)
    # case-3 ids are city*10000+1 for the g2 cities (city = 1003 + 4u,
    # i.e. city % 4 == 3) whose users have (u DIV 4) % 2 == 1 — two
    # shape areas (synth_shape g2_case3); the city % 4 filter also
    # admits case-4 cities, whose single square is a POLYGON anyway
    case3 = exports["all"].filter(
        (F.col("id") % 10000 == 1) & ((F.col("id") / 10000).cast("long") % 4 == 3)
    )
    geoms = [r["geometry"] for r in case3.select("geometry").distinct().collect()]
    assert geoms, "no case-3 rows in fixture"
    for g in geoms:
        assert g.startswith("POLYGON"), g
