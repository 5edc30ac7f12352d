"""Pins for the driver's bench stdout contract (r09, after four rounds
of unparseable driver artifacts): engine sessions must not emit console
progress bars (they flooded the driver's captured output tail and
drowned the one-line JSON contract), and the compact line itself must
stay a single parseable line inside a ~2000-char tail window."""

from __future__ import annotations

import json


def test_engine_session_disables_console_progress(spark):
    """The r08 driver tail was 100% `[Stage N:...]` bars; get_spark
    sessions must pin the conf off so nothing competes with the bench's
    final stdout line (static core conf, read via the SparkConf)."""
    assert (
        spark.sparkContext.getConf().get("spark.ui.showConsoleProgress")
        == "false"
    )


def test_compact_line_is_single_parseable_json(capsys):
    import bench

    full = {
        "metric": "headline_queries_total_wall",
        "value": 1.23,
        "queries": {"q1": 1.23},
        "sf": 0.1,
        "noise_floor_sec": 0.1,
        "medians_on_contention": {},
    }
    bench._emit_compact(full)
    out = capsys.readouterr().out
    assert out.count("\n") == 1  # ONE line, newline-terminated
    parsed = json.loads(out)
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed, key


def test_compact_line_sheds_medians_to_fit_tail_window(capsys):
    """The 1900-char guard: an oversized medians block is dropped
    rather than letting the line outgrow the driver's tail window."""
    import bench

    full = {
        "metric": "headline_queries_total_wall",
        "value": 1.23,
        "queries": {f"q{i}": 1.0 for i in range(40)},
        "sf": 0.1,
        "noise_floor_sec": 0.1,
        "medians_on_contention": {f"pad{i}": 9.999 for i in range(200)},
    }
    bench._emit_compact(full)
    out = capsys.readouterr().out
    assert len(out.strip()) <= 1900
    parsed = json.loads(out)
    assert "medians_on_contention" not in parsed
    assert parsed["queries"]  # the evidence payload survives the shed
