"""HyperLogLog + Bloom-prefilter sketch tests (operators/sketches.py).

The suite's oracle equivalence is covered by test_oracle.py like every
registered query; these tests pin the sketch-specific properties the
oracle can't see: HLL's error bound and mergeability, and the Bloom
filter's no-false-negative / actually-prunes behaviour.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clear_map_data_pipeline_spark.operators import sketches as sk
from clear_map_data_pipeline_spark.session import Tables


def test_hll_estimate_within_error_bound(spark, sf_dir):
    """Raw-HLL standard error is 1.04/sqrt(64) ~ 13%; assert within 4
    sigma for the dense-register columns.  (l_suppkey's tiny
    cardinality sits in the regime standard HLL hands to linear
    counting, which we deliberately omit — see hll_distinct docstring —
    so it only gets a loose sanity band.)"""
    li = Tables(spark, sf_dir).lineitem
    for col, tol in [("l_orderkey", 0.52), ("l_partkey", 0.52)]:
        row = sk.hll_distinct(li, col).collect()[0]
        assert row.n_exact > 0
        rel = abs(row.hll_est - row.n_exact) / row.n_exact
        assert rel < tol, (col, row.hll_est, row.n_exact)


def test_hll_registers_merge_by_max(spark, sf_dir):
    """The property that makes HLL the distributed distinct sketch:
    registers of a union == elementwise MAX of per-shard registers.
    Split lineitem by orderkey parity, merge, compare to the direct
    registers of the whole table."""
    li = Tables(spark, sf_dir).lineitem
    whole = {
        r.bucket: r.mj for r in sk.hll_registers(li, "l_partkey").collect()
    }
    even = sk.hll_registers(
        li.filter(F.col("l_orderkey") % 2 == 0), "l_partkey"
    )
    odd = sk.hll_registers(
        li.filter(F.col("l_orderkey") % 2 == 1), "l_partkey"
    )
    merged = {
        r.bucket: r.mj
        for r in even.unionByName(odd)
        .groupBy("bucket")
        .agg(F.max("mj").alias("mj"))
        .collect()
    }
    assert merged == whole


def test_hll_exact_on_oracle_constants(spark):
    """Registers are a pure function of hash31 — pin one tiny input so a
    refactor of the bucket/rho split can't silently shift the mapping
    shared with the SQL twin."""
    df = spark.range(0, 8).select(F.col("id").alias("k"))
    regs = {r.bucket: r.mj for r in sk.hll_registers(df, "k").collect()}
    # recompute expected from the same Python constants
    from clear_map_data_pipeline_spark.operators.text import _HASH_C1  # noqa: F401

    est = sk.hll_distinct(df, "k").collect()[0]
    assert est.n_exact == 8
    assert est.n_buckets == len(regs)
    assert est.sum_rho == sum(regs.values())
    assert all(1 <= mj <= 26 for mj in regs.values())
    assert all(0 <= b < sk.HLL_M for b in regs)


def test_bloom_no_false_negatives_and_prunes(spark, sf_dir):
    """Every true member must survive the prefilter (false negatives
    impossible), and the filter must actually drop most non-members —
    otherwise it isn't doing its 100 TB job."""
    t = Tables(spark, sf_dir)
    keys = t.customer.filter(F.col("c_custkey") % 5 == 0).select("c_custkey")
    bloom = sk.bloom_build(keys, "c_custkey")
    pruned = sk.bloom_prefilter(t.orders, "o_custkey", bloom)

    total = t.orders.count()
    true_hits = t.orders.join(
        F.broadcast(keys), F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    ).count()
    kept = pruned.count()
    assert kept >= true_hits  # no false negatives
    # all true members present in the pruned set
    missing = (
        t.orders.join(
            F.broadcast(keys),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
        .join(pruned.select("o_orderkey"), "o_orderkey", "left_anti")
        .count()
    )
    assert missing == 0
    # and the filter prunes: false-positive rate well under 50% of the
    # non-member mass (k=3, m=8192 vs ~300 keys -> fp ~ 1e-3)
    assert kept - true_hits < 0.5 * (total - true_hits)


def test_bloom_composition_equals_plain_join(spark, sf_dir):
    """Prefilter + exact semi-join == plain semi-join, row for row."""
    t = Tables(spark, sf_dir)
    keys = t.customer.filter(F.col("c_acctbal") > 0).select("c_custkey")
    bloom = sk.bloom_build(keys, "c_custkey")
    with_bloom = (
        sk.bloom_prefilter(t.orders, "o_custkey", bloom)
        .join(
            F.broadcast(keys),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
        .select("o_orderkey")
    )
    plain = t.orders.join(
        F.broadcast(keys), F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    ).select("o_orderkey")
    assert with_bloom.exceptAll(plain).count() == 0
    assert plain.exceptAll(with_bloom).count() == 0


def test_bloom_build_is_dense_word_array(spark, sf_dir):
    """The bitset materializes as exactly m/64 longs (an 8 KiB
    broadcast payload), not a sparse structure the probe side would
    have to scan."""
    t = Tables(spark, sf_dir)
    keys = t.customer.select("c_custkey").limit(10)
    row = sk.bloom_build(keys, "c_custkey").collect()[0]
    words = row["_bloom_words"]
    assert len(words) == sk.BLOOM_M // 64
    set_bits = sum(bin(w & ((1 << 64) - 1)).count("1") for w in words)
    assert 1 <= set_bits <= 10 * sk.BLOOM_K


def test_profile_table_exact_stats(spark):
    """Counts/nulls/min/max/exact-distinct on a hand-built frame with
    planted nulls and duplicates."""
    from clear_map_data_pipeline_spark.operators.sketches import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, None), (7, "a"), (9, None)],
        ["num", "cat"],
    )
    prof = {r.col_name: r for r in profile_table(df, ["num"], ["cat"]).collect()}
    n = prof["num"]
    assert (n.n_rows, n.n_nulls, n.n_distinct) == (5, 0, 4)
    assert (n.min_num, n.max_num) == (1.0, 9.0)
    c = prof["cat"]
    assert (c.n_rows, c.n_nulls, c.n_distinct) == (5, 2, 2)
    assert c.min_num is None and c.max_num is None
    # HLL estimates exist and are positive for both columns
    assert n.hll_est > 0 and c.hll_est > 0


def test_profile_table_all_null_column(spark):
    from pyspark.sql import functions as F

    from clear_map_data_pipeline_spark.operators.sketches import profile_table

    df = spark.range(4).select(
        F.col("id").alias("num"), F.lit(None).cast("string").alias("cat")
    )
    prof = {r.col_name: r for r in profile_table(df, ["num"], ["cat"]).collect()}
    c = prof["cat"]
    assert (c.n_rows, c.n_nulls, c.n_distinct) == (4, 4, 0)
    assert c.hll_est is None  # no observed keys -> no registers -> NULL


def test_hll_by_group_matches_per_group_hll_and_merges(spark, sf_dir):
    """Grouped HLL: (a) each group's row equals running the single-key
    HLL on that group's slice (same registers, same estimate); (b) the
    per-group sketch STATE merges — registers built independently on
    two disjoint halves, MAX-merged per (group, bucket) in a plain
    reaggregation, reproduce the whole-corpus register table."""
    from pyspark.sql import functions as F

    from clear_map_data_pipeline_spark.operators.sketches import (
        hll_bucket_rho,
        hll_distinct,
        hll_distinct_by_group,
    )
    from clear_map_data_pipeline_spark.session import Tables

    ev = Tables(spark, sf_dir).events.select("event_type", "user_id")
    grouped = {
        r["event_type"]: (r["n_exact"], r["hll_est"], r["n_buckets"], r["sum_rho"])
        for r in hll_distinct_by_group(ev, "event_type", "user_id").collect()
    }
    assert grouped
    for etype in grouped:
        (row,) = hll_distinct(
            ev.filter(F.col("event_type") == etype), "user_id"
        ).collect()
        assert grouped[etype] == (
            row["n_exact"], row["hll_est"], row["n_buckets"], row["sum_rho"]
        ), etype

    def regs(df):
        bucket, rho = hll_bucket_rho(F.col("user_id").cast("long"))
        return (
            df.select("event_type", bucket.alias("bucket"), rho.alias("rho"))
            .groupBy("event_type", "bucket")
            .agg(F.max("rho").alias("mj"))
        )

    half_states = [
        regs(ev.filter(F.col("user_id") % 2 == i)) for i in (0, 1)
    ]
    merged = (
        half_states[0]
        .unionByName(half_states[1])
        .groupBy("event_type", "bucket")
        .agg(F.max("mj").alias("mj"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, regs(ev).collect())
    )


def test_hll_by_group_null_keys_filtered(spark):
    """NULL keys must not build a register row (r04 advice): a group
    containing NULL keys gets the SAME registers/estimate as the same
    group without them — countDistinct semantics, and parity with
    hll_distinct's bucket IS NOT NULL guard."""
    from clear_map_data_pipeline_spark.operators.sketches import (
        hll_distinct_by_group,
    )

    clean = spark.createDataFrame(
        [("a", i) for i in range(1, 40)], "grp string, k long"
    )
    noisy = clean.unionByName(
        spark.createDataFrame(
            [("a", None), ("a", None)], "grp string, k long"
        )
    )
    (want,) = hll_distinct_by_group(clean, "grp", "k").collect()
    (got,) = hll_distinct_by_group(noisy, "grp", "k").collect()
    assert tuple(got) == tuple(want)
    assert got["n_exact"] == 39


# --- Misra-Gries heavy hitters ----------------------------------------


def _zipf_keys(spark, n_keys=4000, n_rows=60000, partitions=4):
    """Deterministic zipf-ish key stream: key k gets ~ n_rows/(k+1)/H
    occurrences — vocabulary far above the MG prune limit, a heavy
    head, and a long singleton tail."""
    import pyspark.sql.functions as F

    # row i -> key floor(c / (i+1)) style inverse-CDF on a hash-shuffled
    # index keeps it deterministic without Python-side data generation.
    return (
        spark.range(n_rows)
        .repartition(partitions)
        .select(
            F.concat(
                F.lit("k"),
                F.floor(
                    F.pow(
                        F.lit(float(n_keys)),
                        (F.pmod(F.xxhash64("id"), 10**6) / F.lit(1e6)),
                    )
                ).cast("long"),
            ).alias("token")
        )
    )


def test_mg_candidates_superset_bounded_and_prunes(spark):
    """The mergeable-summaries guarantee on data that FORCES pruning:
    every key with global count > N/(capacity+1) appears among the
    candidates, per-partition state stays bounded, and at least one
    prune actually fired (vocab >> prune limit)."""
    capacity = 30
    df = _zipf_keys(spark)
    vocab = df.distinct().count()
    assert vocab > capacity * 4, "fixture must exceed the prune limit"
    out = sk.mg_candidates(df, "token", capacity=capacity).collect()
    cands = {r["token"] for r in out if r["token"] is not None}
    n_parts = sum(1 for r in out if r["token"] is None)
    n_total = sum(r["wt"] for r in out)
    assert n_total == df.count()
    # bounded candidate volume: <= prune limit per partition
    assert len(cands) <= n_parts * capacity * 4
    assert len(cands) < vocab, "pruning must have dropped tail keys"
    truth = {
        r["token"]: r["cnt"]
        for r in df.groupBy("token").agg(
            F.count("*").alias("cnt")
        ).collect()
    }
    heavy = {k for k, c in truth.items() if c * (capacity + 1) > n_total}
    assert heavy, "fixture must contain true heavy keys"
    missed = heavy - cands
    assert not missed, f"MG guarantee violated: missed {missed}"


def test_heavy_hitters_matches_literal_recompute(spark):
    """End-to-end exactness through the prune-forced regime: the
    sketch-pruned two-pass answer equals the literal full groupBy."""
    phi_denom = 25
    df = _zipf_keys(spark, n_rows=40000)
    got = {
        (r["token"], r["freq"], r["n_total"])
        for r in sk.heavy_hitters(df, "token", phi_denom=phi_denom).collect()
    }
    n = df.count()
    want = {
        (r["token"], r["cnt"], n)
        for r in df.groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
        .where(F.col("cnt") * phi_denom > F.lit(n))
        .collect()
    }
    assert want, "fixture must produce heavy hitters"
    assert got == want


def test_heavy_hitters_ignores_null_keys(spark):
    df = spark.createDataFrame(
        [("a",)] * 8 + [("b",)] * 2 + [(None,)] * 90, ["k"]
    ).repartition(3)
    rows = sk.heavy_hitters(df, "k", phi_denom=3).collect()
    # N counts only the 10 non-null keys: 'a' (8*3 > 10) qualifies,
    # 'b' (2*3 < 10) does not, NULL never appears.
    assert [(r["k"], r["freq"], r["n_total"]) for r in rows] == [("a", 8, 10)]


def test_mg_candidates_capacity_validation(spark):
    df = spark.range(5).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError):
        sk.mg_candidates(df, "k", capacity=0)


def test_hll_overlap_estimates_and_merge_identity(spark, sf_dir):
    """Inclusion-exclusion overlap: (a) the union estimate computed
    from MAX-merged registers must EQUAL the estimate of sketching the
    concatenated corpus directly (merge identity — the property that
    makes the two scans independent at 100 TB); (b) every estimate
    lands within the 64-register error envelope of its exact truth."""
    t = Tables(spark, sf_dir)
    left = t.orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    right = t.orders.where(F.col("o_orderpriority") == "5-LOW").select(
        "o_custkey"
    )
    (row,) = sk.hll_overlap(left, right, "o_custkey").collect()
    (direct,) = sk.hll_distinct(
        left.unionByName(right), "o_custkey"
    ).collect()
    assert abs(row["est_union"] - direct["hll_est"]) < 1e-9  # merge identity
    na = left.distinct().count()
    nb = right.distinct().count()
    nu = left.unionByName(right).distinct().count()
    # 1.04/sqrt(64) = 13% standard error; allow 4 sigma per estimate
    for est, truth in [
        (row["est_left"], na),
        (row["est_right"], nb),
        (row["est_union"], nu),
    ]:
        assert abs(est - truth) / truth < 0.52, (est, truth)
    # overlap inherits the combined error of three estimates
    true_ov = na + nb - nu
    assert abs(row["est_overlap"] - true_ov) < 1.6 * max(na, nb)


def test_hll_overlap_disjoint_and_identical_corpora(spark):
    """Two fixed points: identical corpora (overlap estimate == each
    side's estimate, union registers identical) and disjoint corpora
    (union evidence strictly dominates each side's)."""
    a = spark.range(0, 4000).select(F.col("id").alias("k"))
    b = spark.range(4000, 8000).select(F.col("id").alias("k"))
    (same,) = sk.hll_overlap(a, a, "k").collect()
    assert same["est_union"] == same["est_left"] == same["est_right"]
    assert abs(same["est_overlap"] - same["est_left"]) < 1e-9
    assert same["nb_union"] == same["nb_left"]
    assert same["sr_union"] == same["sr_left"]
    (disj,) = sk.hll_overlap(a, b, "k").collect()
    assert disj["sr_union"] >= max(disj["sr_left"], disj["sr_right"])
    assert disj["est_union"] > max(disj["est_left"], disj["est_right"])


def test_heavy_hitters_on_numeric_keys(spark):
    """The API is key-type generic: a LONG key column flows through
    the Arrow pass and the verify join without casting."""
    df = spark.createDataFrame(
        [(7,)] * 9 + [(8,)] * 1, "k long"
    ).repartition(3)
    rows = sk.heavy_hitters(df, "k", phi_denom=2).collect()
    assert [(r["k"], r["freq"], r["n_total"]) for r in rows] == [(7, 9, 10)]
    assert dict(rows[0].asDict())["k"] == 7
