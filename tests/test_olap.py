"""OLAP grouping + KMV sketch: estimate accuracy, exact-below-k branch,
and plan shapes (single-pass rollup/pivot, heap-based sketch top-k,
curation pipeline's broadcast anti join).  Value correctness vs DuckDB
runs in test_oracle.py with every other registry entry.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clear_map_data_pipeline_spark.queries.olap import (
    KMV_K,
    kmv_distinct,
    olap_pivot_events,
    olap_rollup,
)
from clear_map_data_pipeline_spark.session import Tables


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_kmv_exact_below_k(spark, sf_dir):
    # l_suppkey has ~100 distinct values < k=256: the sketch holds all
    # of them, so the estimate must be EXACTLY the distinct count
    row = kmv_distinct(Tables(spark, sf_dir).lineitem, "l_suppkey").first()
    assert row["kmv_est"] == row["n_exact"]


def test_kmv_estimate_within_bound(spark, sf_dir):
    # expected relative error ~ 1/sqrt(k-1) ~= 6% at k=256; assert a
    # loose 3-sigma-ish 20% so the test stays robust across fixtures
    li = Tables(spark, sf_dir).lineitem
    for col in ["l_orderkey", "l_partkey"]:
        row = kmv_distinct(li, col).first()
        n, est = row["n_exact"], row["kmv_est"]
        if n < KMV_K:
            assert est == n
        else:
            assert abs(est - n) / n < 0.20, (col, n, est)


def test_kmv_synthetic_large_domain(spark):
    # 50k distinct synthetic keys — well past k, exercises the
    # estimation branch away from fixture coincidences
    df = spark.range(50_000).select(F.col("id").alias("k"))
    row = kmv_distinct(df, "k").first()
    assert row["n_exact"] == 50_000
    assert abs(row["kmv_est"] - 50_000) / 50_000 < 0.20, row


def test_kmv_topk_is_heap_not_global_sort(spark, sf_dir):
    # the k-smallest-hash selection must be TakeOrderedAndProject
    # (per-partition heaps), never a global Sort of all hashes
    plan = _plan(kmv_distinct(Tables(spark, sf_dir).lineitem, "l_orderkey"))
    assert "TakeOrderedAndProject" in plan, plan


def test_rollup_single_expand_single_exchange(spark, sf_dir):
    # rollup compiles to one Expand + one aggregation exchange — the
    # fact is read and shuffled once for all three grouping levels
    import re

    plan = _plan(olap_rollup(spark, sf_dir))
    assert "Expand" in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_rollup_levels_consistent(spark, sf_dir):
    rows = olap_rollup(spark, sf_dir).collect()
    total = [r for r in rows if r["l_returnflag"] is None
             and r["l_linestatus"] is None]
    flags = [r for r in rows if r["l_returnflag"] is not None
             and r["l_linestatus"] is None]
    leaves = [r for r in rows if r["l_linestatus"] is not None]
    assert len(total) == 1
    assert total[0]["n_rows"] == sum(r["n_rows"] for r in flags)
    assert total[0]["n_rows"] == sum(r["n_rows"] for r in leaves)


def test_pivot_single_exchange_and_no_nulls(spark, sf_dir):
    import re

    df = olap_pivot_events(spark, sf_dir)
    plan = _plan(df)
    # explicit value list => one hash-agg exchange, no extra job for
    # distinct pivot values
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    row_sum = df.select(
        F.sum(
            sum(F.col(c) for c in df.columns if c != "day")
        ).alias("s")
    ).first()["s"]
    total = Tables(spark, sf_dir).events.count()
    assert row_sum == total  # every event lands in exactly one cell


def test_curation_pipeline_shape(spark, sf_dir):
    # the flagship curation pipeline: near-dup removal must be a
    # broadcast anti join (the dup-id list, not the corpus, moves), and
    # the exact-dedup window exchange must not carry document text
    from clear_map_data_pipeline_spark.registry import load_all

    df = load_all()["pipeline_corpus_curation"].builder(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    winexch = [
        seg for seg in plan.split("(")
        if seg.startswith(tuple("0123456789")) and "Exchange" in seg
    ]
    assert winexch, plan
    # no Exchange row should list the raw text column — only digests/ids
    for seg in plan.split("Exchange hashpartitioning"):
        assert "text#" not in seg.split("\n")[0], seg.split("\n")[0]


def test_cms_one_sided_error(spark, sf_dir):
    """CountMin property: the estimate can only OVERcount (min of d
    counters each >= the true count), and the top-1 token's estimate
    is close at this sketch width."""
    from clear_map_data_pipeline_spark.queries.olap import (
        olap_cms_heavy_hitters,
    )

    rows = olap_cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["cms_est"] >= r["n_true"], (r["token"], r["n_true"], r["cms_est"])
    top = max(rows, key=lambda r: r["n_true"])
    # heavy hitters dominate their buckets: relative error small
    assert top["cms_est"] <= top["n_true"] * 1.5


def test_histogram_matches_literal_binning(spark, sf_dir):
    """Equal-width histogram vs a literal Python recount: same bounds,
    same closed-right top bin, bucket counts sum to the table size."""
    import math

    from clear_map_data_pipeline_spark.queries.olap import (
        HIST_BINS,
        olap_histogram,
    )

    got = {r["bucket"]: r["n"] for r in olap_histogram(spark, sf_dir).collect()}
    vals = [
        r["o_totalprice"]
        for r in Tables(spark, sf_dir).orders.select("o_totalprice").collect()
    ]
    lo, hi = min(vals), max(vals)
    expect: dict = {}
    for v in vals:
        b = min(math.floor((v - lo) / ((hi - lo) / HIST_BINS)), HIST_BINS - 1)
        expect[b] = expect.get(b, 0) + 1
    assert got == expect
    assert sum(got.values()) == len(vals)


def test_psi_matches_literal_computation(spark, sf_dir):
    """PSI terms vs a literal Python recomputation over the same global
    grid and snapshot split — pins the p/q/epsilon/ln semantics, not
    just engine parity (the oracle covers that)."""
    import datetime as dt
    import math

    from clear_map_data_pipeline_spark.queries.olap import (
        PSI_BINS,
        PSI_CUT,
        _PSI_EPS,
        olap_psi_drift,
    )

    got = {
        r["bucket"]: (r["n_ref"], r["n_cur"], r["psi_term"])
        for r in olap_psi_drift(spark, sf_dir).collect()
    }
    rows = (
        Tables(spark, sf_dir)
        .orders.select("o_totalprice", "o_orderdate")
        .collect()
    )
    vals = [r["o_totalprice"] for r in rows]
    lo, hi = min(vals), max(vals)
    cut = dt.datetime.fromisoformat(PSI_CUT)
    counts: dict = {}
    for r in rows:
        b = min(
            math.floor((r["o_totalprice"] - lo) / ((hi - lo) / PSI_BINS)),
            PSI_BINS - 1,
        )
        nr, nc = counts.get(b, (0, 0))
        if r["o_orderdate"] < cut:
            nr += 1
        else:
            nc += 1
        counts[b] = (nr, nc)
    tr = sum(nr for nr, _ in counts.values())
    tc = sum(nc for _, nc in counts.values())
    assert set(got) == set(counts)
    for b, (nr, nc) in counts.items():
        p = max(nr / tr, _PSI_EPS)
        q = max(nc / tc, _PSI_EPS)
        term = math.floor((p - q) * math.log(p / q) * 1e6) / 1e6
        gr, gc, gterm = got[b]
        assert (gr, gc) == (nr, nc), (b, got[b], counts[b])
        assert gterm == term, (b, gterm, term)
    # PSI terms are non-negative by construction ((p-q) and ln(p/q)
    # share a sign)
    assert all(t >= 0 for _, _, t in got.values())
