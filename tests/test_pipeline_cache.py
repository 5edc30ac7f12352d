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


def test_repeated_builds_do_not_accumulate_cached_frames(spark, sf_dir):
    """Persist-leak regression (round-1 ADVICE): window_export and
    minhash pin their persists via cachereg; building the NEXT registry
    query releases the previous query's pins, so N consecutive builds
    leave at most one query's pins alive."""
    from clear_map_data_pipeline_spark import cachereg
    from clear_map_data_pipeline_spark.registry import load_all

    reg = load_all()

    def persistent_rdds() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    spark.catalog.clearCache()
    cachereg.release_all()
    # earlier tests in the shared session may leave an orphaned
    # persistent RDD (re-materialized cache without a catalog entry);
    # measure MY queries' growth against that baseline
    baseline = persistent_rdds()
    counts = []
    for _ in range(3):
        for name in ("pipeline_export_weeks_1", "dd_minhash_lsh_pairs"):
            reg[name].builder(spark, sf_dir).count()
        counts.append(persistent_rdds())
    # steady state, no growth round over round (the leak assertion —
    # before cachereg, every round added one cached frame per pinning
    # query)
    assert counts[0] == counts[1] == counts[2], counts
    # bounded by the last query's own pins (+1 slack for cached-plan
    # reuse against frames cached earlier in the shared test session)
    assert counts[-1] <= baseline + 2, counts
    cachereg.release_all()
    spark.catalog.clearCache()
    assert persistent_rdds() <= baseline
