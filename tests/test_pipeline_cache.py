"""run_pipeline is the multi-window entry point implementing SURVEY §4
X3: the window-invariant prefix (clean -> reconcile -> rebase -> join ->
stats) is computed ONCE and cached; the four window exports are pure
filtered lineages over it.  Assert both the cache reuse (plan-level)
and that each cached export equals the independently-built registered
query (value-level)."""

from __future__ import annotations

import contextlib
import io


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_run_pipeline_caches_shared_prefix(spark, sf_dir):
    from clear_map_data_pipeline_spark.plans.clearmap import run_pipeline
    from clear_map_data_pipeline_spark.registry import load_all

    exports = run_pipeline(spark, sf_dir)
    assert set(exports) == {"all", "wave_2", "weeks_2", "weeks_1"}

    # every window reads the prefix from the cache, not from parquet
    for w, df in exports.items():
        plan = _plan(df)
        assert "InMemoryTableScan" in plan, (w, plan)

    # cached outputs == the independently-built registered queries
    for w, df in exports.items():
        got = sorted(map(str, (tuple(r) for r in df.collect())))
        q = load_all()[f"pipeline_export_{w}"].builder(spark, sf_dir)
        want = sorted(map(str, (tuple(r) for r in q.collect())))
        assert got == want, w

    spark.catalog.clearCache()
