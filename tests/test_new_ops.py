"""Edge-case tests for keep-best dedup, stratified sampling, and the
range-bucket join — the cases the sf fixtures don't necessarily hit:
score ties, unknown strata, retry determinism, exact tier boundaries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clear_map_data_pipeline_spark.operators.dedup import (
    exact_dedup_keep_best,
    incremental_dedup,
)
from clear_map_data_pipeline_spark.operators.text import stratified_sample


def test_keep_best_tie_breaks_on_min_id(spark):
    df = spark.createDataFrame(
        [
            (7, "same text", 9),
            (3, "same text", 9),  # tie on score -> min id survives
            (5, "same text", 4),
            (1, "other", 2),
        ],
        "doc_id long, text string, n_chars long",
    )
    rows = {r["doc_id"]: r for r in exact_dedup_keep_best(df).collect()}
    assert set(rows) == {3, 1}
    assert rows[3]["group_n"] == 3
    assert rows[1]["group_n"] == 1


def test_keep_best_prefers_higher_score(spark):
    df = spark.createDataFrame(
        [(1, "t", 5), (2, "t", 50)], "doc_id long, text string, n_chars long"
    )
    (r,) = exact_dedup_keep_best(df).collect()
    assert r["doc_id"] == 2 and r["group_n"] == 2


def test_incremental_dedup_drops_seen_and_within_batch_dups(spark):
    batch = spark.createDataFrame(
        [
            (11, "already in corpus"),
            (13, "brand new"),
            (15, "brand new"),  # within-batch dup -> min id survives
            (17, "also new"),
        ],
        "doc_id long, text string",
    )
    seen = spark.createDataFrame(
        [("already in corpus",)], "text string"
    ).select(F.md5("text").alias("content_hash"))
    rows = {r["doc_id"] for r in incremental_dedup(batch, seen).collect()}
    assert rows == {13, 17}


def test_incremental_dedup_idempotent_redrain(spark):
    # draining the same batch again after the corpus absorbed the first
    # result yields nothing — the exactly-once ingest property
    batch = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    empty_seen = spark.createDataFrame([], "content_hash string")
    first = incremental_dedup(batch, empty_seen)
    assert first.count() == 2
    again = incremental_dedup(batch, first.select("content_hash"))
    assert again.count() == 0


def test_stratified_sample_unknown_stratum_dropped_and_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "xx" if i % 2 else "en") for i in range(200)],
        "doc_id long, lang string",
    )
    out1 = stratified_sample(df, {"en": 50}).collect()
    out2 = stratified_sample(df, {"en": 50}).collect()
    assert sorted(r["doc_id"] for r in out1) == sorted(
        r["doc_id"] for r in out2
    )  # retry/rerun stability
    assert all(r["lang"] == "en" for r in out1)  # default_rate=0 drops 'xx'
    assert all(r["sample_bucket"] < 50 for r in out1)
    assert 0 < len(out1) < 100  # sampled, not all/none of the 100 'en' rows


def test_stratified_sample_rate_100_keeps_all(spark):
    df = spark.createDataFrame(
        [(i, "de") for i in range(50)], "doc_id long, lang string"
    )
    assert stratified_sample(df, {"de": 100}).count() == 50


def test_range_bucket_boundaries(spark, tmp_path):
    # Boundary values land in the upper tier (lower-inclusive ranges).
    import pyspark.sql.functions as F

    from clear_map_data_pipeline_spark.queries.joins import (
        VALUE_TIERS,
        j_range_bucket_join,
    )

    events = spark.createDataFrame(
        [
            (1, 0.0, "low"),
            (2, 49.999, "low"),
            (3, 50.0, "mid"),
            (4, 150.0, "high"),
            (5, 299.999, "high"),
            (6, 300.0, "top"),
            (7, 10_000.0, "top"),
        ],
        "event_id long, value double, expect string",
    )
    sf = str(tmp_path)
    events.select("event_id", "value").withColumn(
        "ts", F.current_timestamp()
    ).withColumn("user_id", F.lit(1)).withColumn(
        "event_type", F.lit("view")
    ).withColumn("props", F.lit("{}")).write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )
    got = {
        r["tier_name"]: r["n_events"]
        for r in j_range_bucket_join(spark, sf).collect()
    }
    want = {
        t: sum(1 for r in events.collect() if r["expect"] == t)
        for t in ("low", "mid", "high", "top")
    }
    assert got == want
    assert len(VALUE_TIERS) == 4


def test_stratified_sample_rate_accuracy(spark):
    # The old LCG quantized rates to 5% steps (rate=37 kept 40%); the
    # multiply-xorshift bucket must track any requested rate closely.
    # 50k ids -> bucket-count noise well under 1%.
    from pyspark.sql import functions as F

    df = spark.range(50_000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    kept = stratified_sample(df, {"en": 37}).count()
    assert abs(kept / 50_000 - 0.37) < 0.01, f"keep-rate {kept / 50_000:.4f}"

    # and on the real documents table (500 rows at sf0.01 -> noise ~2%;
    # still cleanly distinguishes 37% from the LCG's quantized 40%)
    from clear_map_data_pipeline_spark.session import Tables

    docs = Tables(spark, "/root/testdata/sf0.01").documents
    n = docs.count()
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    kept_docs = stratified_sample(docs, dict.fromkeys(langs, 37)).count()
    assert abs(kept_docs / n - 0.37) < 0.05, f"keep-rate {kept_docs / n:.4f}"


def test_sample_bucket_reaches_all_residues(spark):
    # gcd degeneracy check: every bucket value [0,100) must be hit.
    from pyspark.sql import functions as F

    from clear_map_data_pipeline_spark.operators.text import sample_bucket

    df = spark.range(20_000).select(
        sample_bucket(F.col("id")).alias("b")
    )
    assert df.distinct().count() == 100


def test_range_bucket_below_range_matches_no_tier(spark, tmp_path):
    # theta semantics `value >= lo AND value < hi`: a negative value is
    # below the first tier's lower bound and must match NO tier.
    import pyspark.sql.functions as F

    from clear_map_data_pipeline_spark.queries.joins import j_range_bucket_join

    events = spark.createDataFrame(
        [(1, -5.0), (2, 10.0)], "event_id long, value double"
    )
    sf = str(tmp_path)
    events.withColumn("ts", F.current_timestamp()).withColumn(
        "user_id", F.lit(1)
    ).withColumn("event_type", F.lit("view")).withColumn(
        "props", F.lit("{}")
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    got = {
        r["tier_name"]: r["n_events"]
        for r in j_range_bucket_join(spark, sf).collect()
    }
    assert got == {"low": 1}  # only the 10.0 row; -5.0 matched nothing


# --- exact-substring (repeated passage) dedup --------------------------


def _passage_docs(spark):
    shared = "the quick brown fox jumps over the lazy dog today"  # 10 tokens
    return spark.createDataFrame(
        [
            (1, "alpha beta " + shared + " gamma delta"),
            (2, "one two three " + shared),
            (3, "totally unrelated words that repeat nothing from others x y z"),
            (4, "short doc"),  # < k tokens -> no shingles
        ],
        ["doc_id", "text"],
    )


def test_repeated_passages_finds_planted_span(spark):
    from clear_map_data_pipeline_spark.operators.dedup import repeated_passages

    docs = _passage_docs(spark)
    rows = repeated_passages(docs, k=10).collect()
    passages = {r.passage: r for r in rows}
    shared = "the quick brown fox jumps over the lazy dog today"
    assert shared in passages
    hit = passages[shared]
    assert hit.n_docs == 2 and hit.n_occ == 2
    # first occurrence: doc 1, tokens 'alpha beta' precede -> pos 3
    assert (hit.first_doc, hit.first_pos) == (1, 3)
    # no passage from the unrelated doc
    assert all(r.n_docs >= 2 for r in rows)


def test_repeated_passages_counts_within_doc_occurrences(spark):
    from clear_map_data_pipeline_spark.operators.dedup import repeated_passages

    span = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [(1, span + " filler " + span), (2, span)], ["doc_id", "text"]
    )
    rows = {r.passage: r for r in repeated_passages(docs, k=10).collect()}
    hit = rows[span]
    assert hit.n_docs == 2
    assert hit.n_occ == 3  # twice in doc 1, once in doc 2
    assert (hit.first_doc, hit.first_pos) == (1, 1)


def test_duplicate_span_coverage_fractions(spark):
    from clear_map_data_pipeline_spark.operators.dedup import (
        duplicate_span_coverage,
    )

    docs = _passage_docs(spark)
    cov = {r.doc_id: r for r in duplicate_span_coverage(docs, k=10).collect()}
    assert 4 not in cov  # too short to have any span
    assert cov[3].n_dup == 0 and cov[3].dup_frac == 0.0
    # doc 2: tokens = 3 + 10 = 13 -> 4 shingles; only the exact shared
    # 10-gram (pos 4) also occurs in doc 1
    assert cov[2].n_shingles == 4
    assert cov[2].n_dup == 1
    assert cov[2].dup_frac == 0.25
    # every doc's dup count bounded by its shingle count
    assert all(r.n_dup <= r.n_shingles for r in cov.values())


def test_semantic_dedup_cluster_bounded(spark):
    """SemDeDup's defining property: near-identical vectors in DIFFERENT
    clusters are NOT marked (the trade the paper makes for tractability),
    and within-cluster near-dups keep the lowest id."""
    from clear_map_data_pipeline_spark.operators.dedup import semantic_dedup

    # centroid_mod=2 -> centroids are vec_id 0 (x-axis) and... only even
    # ids: 0,2,4. Build: cluster A around +x, cluster B around +y.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # centroid A
        (2, [0.0, 1.0, 0.0, 0.0]),   # centroid B
        (4, [0.97, 0.24, 0.0, 0.0]), # centroid C (near A)
        (1, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 0, same cluster -> dup
        (3, [0.0, 0.999, 0.01, 0.0]),  # near-dup of 2, same cluster -> dup
        (5, [0.71, 0.7, 0.0, 0.0]),    # between A and B
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in semantic_dedup(df, centroid_mod=2, threshold=0.9).collect()}
    assert out[1].is_dup == 1 and out[1].cluster_id == out[0].cluster_id
    assert out[3].is_dup == 1 and out[3].cluster_id == out[2].cluster_id
    # the lowest id in each near-dup group survives
    assert out[0].is_dup == 0 and out[2].is_dup == 0
    # 0 and 4 are centroids of adjacent clusters: cosine(0,4)=0.97 > 0.9
    # but they land in different clusters -> NOT marked (cluster-bounded)
    if out[4].cluster_id != out[0].cluster_id:
        assert out[4].is_dup == 0


def test_fuzzy_match_join_cross_corpus(spark):
    from clear_map_data_pipeline_spark.operators.dedup import (
        minhash_lsh_fuzzy_join,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    probe = spark.createDataFrame(
        [
            (1, base + " tail"),          # near-dup of ref doc 10
            (2, "completely different words about spark physical plans"),
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [
            (10, base),
            (11, "reference corpus entry with its own unrelated content"),
        ],
        "doc_id long, text string",
    )
    rows = minhash_lsh_fuzzy_join(probe, ref, threshold=0.5).collect()
    pairs = {(r["left_id"], r["right_id"]): r["jaccard"] for r in rows}
    # (1, 10) and nothing else: the near-dup pair oriented
    # (probe, reference), no unrelated probe matches
    assert set(pairs) == {(1, 10)}, f"unexpected pairs {pairs}"
    assert pairs[(1, 10)] >= 0.5


def test_fuzzy_match_join_soundness_random_corpora(spark):
    """Soundness on randomized corpora: every emitted pair must be a
    TRUE near-dup (exact shingle-Jaccard >= threshold, verified in
    Python), correctly oriented probe->reference.  (LSH may MISS pairs
    — recall is the banding trade — but must never fabricate one.)"""
    import itertools
    import random

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]

    def doc():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12)))

    probe_rows = [(i, doc()) for i in range(12)]
    ref_rows = [(100 + i, doc()) for i in range(12)]
    # plant one identical cross pair (J=1 -> all bands collide, so LSH
    # finds it with certainty; band-boundary misses at lower J are the
    # recall trade, not a soundness failure) — the re-crawl case
    ref_rows[0] = (100, probe_rows[0][1])

    def shingles(text, k=3):
        toks = text.split()
        return {
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        }

    from clear_map_data_pipeline_spark.operators.dedup import (
        minhash_lsh_fuzzy_join,
    )

    probe = spark.createDataFrame(probe_rows, "doc_id long, text string")
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    got = minhash_lsh_fuzzy_join(probe, ref, threshold=0.5).collect()
    probe_sh = {i: shingles(t) for i, t in probe_rows}
    ref_sh = {i: shingles(t) for i, t in ref_rows}
    for r in got:
        assert r["left_id"] in probe_sh and r["right_id"] in ref_sh
        sa, sb = probe_sh[r["left_id"]], ref_sh[r["right_id"]]
        true_j = len(sa & sb) / len(sa | sb)
        assert round(true_j, 4) >= 0.5, (r, true_j)
        assert abs(r["jaccard"] - round(true_j, 4)) < 1e-9
    assert any(
        r["left_id"] == 0 and r["right_id"] == 100 for r in got
    ), "planted near-dup pair missed"


def test_bm25_empty_query_terms_raises(spark):
    """bm25_scores([]) must fail fast with a clear ValueError, not an
    opaque TypeError at F.floor(None * scale) (r04 advice)."""
    import pytest

    from clear_map_data_pipeline_spark.operators.text import bm25_scores

    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(df, [])

