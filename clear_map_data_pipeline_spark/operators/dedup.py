"""Deduplication operators for large-scale training-data pipelines:
exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup detection.

Scale design (the 100 TB story):
- Exact dedup is a hash-groupBy — one shuffle on a 16-byte digest, with
  map-side partial aggregation; never shuffles document bodies.
- The MinHash path never shuffles shingle data at all: each document's
  distinct shingle set stays a per-row array, signatures are per-row
  ``array_min(transform(...))``, and exact-Jaccard verification
  intersects the same arrays.  The only shuffles in the whole pipeline
  are the (tiny) band-bucket self-join and the verify attach joins.
- LSH banding turns all-pairs O(n²) into an equi-join on (band_idx,
  band value) — each band bucket is tiny, and AQE splits skewed buckets.
- SimHash is pure per-row expression work; near-dup lookup is an
  equi-join on the fingerprint (or its rotated bands for hamming<k).

Hash choice: ``hash_fn`` defaults to md5 (portable → DuckDB-oracle-able
bit-for-bit).  For production throughput pass ``xxhash64``-based
expressions; semantics are unchanged — min-over-hashes is a uniform
random permutation approximation either way.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens, word_shingles


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate marking: group by content digest; the smallest id
    in each group is the canonical survivor.

    Returns (id, content_hash, is_dup, canonical_id).  At scale: shuffle
    carries only (digest, id) pairs, not text."""
    digests = df.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("content_hash")
    )
    groups = digests.groupBy("content_hash").agg(
        F.min(id_col).alias("canonical_id"), F.count("*").alias("_n")
    )
    return (
        digests.join(groups, "content_hash")
        .select(
            id_col,
            "content_hash",
            (F.col("_n") > 1).alias("is_dup"),
            "canonical_id",
        )
    )


def exact_dedup_keep_best(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "n_chars",
) -> DataFrame:
    """Exact dedup keeping the best-scoring survivor per content group
    (the standard "keep the longest / highest-quality version" policy of
    training-data pipelines), with id as the deterministic tiebreak.

    Returns one row per distinct content: (id, content_hash, group_n).
    At scale: only (digest, score, id) triples shuffle — both window
    functions share one ``partitionBy(content_hash)`` exchange, and the
    surviving ids can be semi-joined back to fetch bodies without ever
    shuffling text."""
    from pyspark.sql import Window

    digests = df.select(
        F.col(id_col),
        F.col(score_col),
        F.md5(F.col(text_col)).alias("content_hash"),
    )
    part = Window.partitionBy("content_hash")
    pick = part.orderBy(F.desc(score_col), F.asc(id_col))
    return (
        digests.withColumn("_rn", F.row_number().over(pick))
        .withColumn("group_n", F.count("*").over(part))
        .filter(F.col("_rn") == 1)
        .select(id_col, "content_hash", "group_n")
    )


def incremental_dedup(
    batch: DataFrame,
    seen: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    digest_col: str = "content_hash",
) -> DataFrame:
    """Dedupe an INCOMING batch against an existing corpus snapshot —
    the pass every continuously-ingesting training pipeline runs so a
    re-crawled or re-delivered document is never added twice.

    Two stages, both digest-only (bodies never shuffle):

    1. within-batch exact dedup: group the batch's (digest, id) pairs,
       min-id survivor per digest;
    2. anti-join the survivors against ``seen`` (a frame carrying the
       corpus's ``digest_col``) — whatever digest the corpus already
       holds is dropped.

    Returns (id, digest) of the genuinely-new documents.

    Scale: stage 1's groupBy hash-partitions the batch on digest, and
    the stage-2 join reuses that partitioning — only the ``seen`` side
    shuffles.  Keep the corpus snapshot bucketed by digest (see
    ``sources/writers.py: write_bucketed_table``) and the join is
    zero-exchange on both sides;
    either way the traffic is 16-byte digests + ids, never text.  The
    asymmetry matters: ``batch`` is a day's crawl, ``seen`` is the
    100 TB corpus.  For a LEFT ANTI join the build side is the RIGHT
    side (``seen``) — far too big to broadcast — so at scale the plan
    is a sort-merge (or shuffled-hash) anti join on digests; the real
    levers are that only 16-byte digests travel, and that a corpus
    snapshot bucketed by digest eliminates its exchange entirely.
    """
    digests = batch.select(
        F.col(id_col), F.md5(F.col(text_col)).alias(digest_col)
    )
    survivors = digests.groupBy(digest_col).agg(
        F.min(id_col).alias(id_col)
    )
    fresh = survivors.join(
        seen.select(digest_col), digest_col, "left_anti"
    )
    return fresh.select(id_col, digest_col)


def shingle_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Inverted index: one row per (id, distinct word-k-gram shingle)."""
    from ..session import spread_small_scan

    return (
        spread_small_scan(df)
        .withColumn("_toks", tokens(text_col))
        .select(F.col(id_col), F.explode(word_shingles("_toks", k)).alias("shingle"))
    )


def doc_shingle_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(id, _set, _n): each document's distinct word-k-gram shingles as
    an array column, docs with no shingles dropped (mirroring the
    inverted-index form, where they contribute no rows).  Pure per-row
    expression work — the document body is read once and never shuffled
    (``spread_small_scan`` is a no-op on any input with real splits).

    The no-shingle filter is expressed on token count (>= k tokens <=>
    >= 1 shingle): filtering on size(_set) instead makes Catalyst push
    the whole shingle transform below the project and re-evaluate it as
    an interpreted predicate per row (~15x slower at sf0.1)."""
    from ..session import spread_small_scan

    return (
        spread_small_scan(df)
        .withColumn("_toks", tokens(text_col))
        .filter(F.size("_toks") >= k)
        .select(F.col(id_col), word_shingles("_toks", k).alias("_set"))
        .withColumn("_n", F.size("_set"))
    )


def minhash_signatures(
    sets: DataFrame, id_col: str = "doc_id", num_hashes: int = 8
) -> DataFrame:
    """MinHash signature per document: for seed i, min over the doc's
    shingle set of md5(i || '|' || shingle).  A lexicographic min over a
    cryptographic hex digest is a uniform random permutation min — the
    classic MinHash estimator.  Computed per row over the shingle array
    (``array_min(transform(...))``) — no shuffle, unlike the
    inverted-index groupBy formulation this replaces."""
    def sig(i: int):
        # NB: a one-parameter lambda is required — PySpark passes the
        # array index to two-parameter lambdas, which would shadow i.
        return F.array_min(
            F.transform("_set", lambda s: F.md5(F.concat(F.lit(f"{i}|"), s)))
        ).alias(f"h{i}")

    return sets.select(F.col(id_col), *[sig(i) for i in range(num_hashes)])


def lsh_bands(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 2,
) -> DataFrame:
    """Fold a signature into ``bands`` band digests -> (id, band_idx,
    band).  Docs sharing ANY band become join candidates."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands "
            f"({bands}); trailing hash columns would be silently ignored"
        )
    rows_per_band = num_hashes // bands
    cols = []
    for b in range(bands):
        parts = [f"h{i}" for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        cols.append(
            F.struct(
                F.lit(b).alias("band_idx"), F.md5(F.concat(*parts)).alias("band")
            )
        )
    return sigs.select(
        F.col(id_col), F.explode(F.array(*cols)).alias("_b")
    ).select(id_col, F.col("_b.band_idx").alias("band_idx"), F.col("_b.band").alias("band"))


def candidate_pairs(bands_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Self-join on (band_idx, band): the LSH candidate pair set."""
    a = bands_df.select(
        F.col(id_col).alias("doc_a"), "band_idx", "band"
    )
    b = bands_df.select(
        F.col(id_col).alias("doc_b"), "band_idx", "band"
    )
    return (
        a.join(b, ["band_idx", "band"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    sets: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    sets_b: DataFrame | None = None,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Exact Jaccard for candidate pairs, set-based: attach each side's
    shingle array (from ``doc_shingle_sets``) to the pair list, intersect
    arrays per pair.  Keep pairs with similarity >= threshold (compared
    on the rounded value so engine/oracle agree bit-for-bit at the
    boundary).  ``sets_b`` attaches a DIFFERENT set frame to the b side
    (the cross-corpus fuzzy join); default is the within-table self
    case.  The one definition serves both call sites so the rounding /
    boundary discipline can never drift between them.

    Scale: the obvious alternative — self-joining a shingle inverted
    index and semi-joining the candidates — re-pays the all-pairs cost
    LSH exists to avoid (every shared shingle between ANY two docs
    materializes a join row).  Here the candidate list — tiny by LSH
    construction — is broadcast to both attach joins, so shingle data is
    never shuffled."""
    if sets_b is None:
        sets_b = sets
    return (
        sets.toDF(a_col, "_sa", "_na")
        .join(F.broadcast(pairs), a_col)
        .join(sets_b.toDF(b_col, "_sb", "_nb"), b_col)
        .withColumn("_inter", F.size(F.array_intersect("_sa", "_sb")))
        .select(
            a_col,
            b_col,
            F.round(
                F.col("_inter")
                / (F.col("_na") + F.col("_nb") - F.col("_inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle -> sign -> band ->
    bucket-join -> exact-Jaccard verify.  Returns (doc_a, doc_b, jaccard).

    The per-doc shingle-set frame is persisted because three downstream
    stages consume it (the broadcast candidate computation and the two
    verify attach joins) — and materialized EAGERLY: AQE compiles those
    stages concurrently, and racing tasks each recompute a not-yet-cached
    partition (observed as 3x duplicated shingling work + "block already
    exists" warnings).  One count() turns that into compute-once,
    read-three-times — the same explicit stage a 100 TB run would want."""
    from ..cachereg import pin

    sets = pin(doc_shingle_sets(df, id_col, text_col, shingle_k))
    sets.count()
    sigs = minhash_signatures(sets, id_col, num_hashes)
    bandsdf = lsh_bands(sigs, id_col, num_hashes, bands)
    pairs = candidate_pairs(bandsdf, id_col)
    return jaccard_verify(pairs, sets, id_col, threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """All-pairs n-gram Jaccard via the shingle inverted index (no LSH):
    exact recall, cost bounded by shingle-bucket sizes.  The baseline the
    LSH path is measured against — refuses inputs above ``max_rows``
    (use minhash_lsh_dedup_pairs at scale; max_rows=None to force)."""
    from .similarity import guard_baseline_rows

    guard_baseline_rows(df, max_rows, "minhash_lsh_dedup_pairs")
    sh = shingle_index(df, id_col, text_col, shingle_k)
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("_inter"))
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("_n"))
    return (
        inter.join(sizes.toDF("doc_a", "_na"), "doc_a")
        .join(sizes.toDF("doc_b", "_nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter")), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_near_dup(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    threshold: float = 0.4,
) -> DataFrame:
    """Embedding-cosine near-dup marking: candidate pairs from
    random-hyperplane LSH buckets (cosine evaluated within buckets only,
    never all-pairs), then each vector whose bucket contains a
    lower-id neighbour with cosine >= threshold is a dup of its
    smallest such neighbour.

    Returns (id, is_dup, canonical_id nullable).  At scale the pair
    list is bucket-bounded and the canonical aggregation shuffles only
    (id, id) pairs."""
    from .similarity import ann_lsh_pairs

    pairs = ann_lsh_pairs(df, dim, id_col, vec_col, num_planes, threshold)
    canon = pairs.groupBy("vb").agg(F.min("va").alias("canonical_id"))
    return (
        df.select(F.col(id_col))
        .join(canon.withColumnRenamed("vb", id_col), id_col, "left")
        .select(
            id_col,
            F.col("canonical_id").isNotNull().alias("is_dup"),
            "canonical_id",
        )
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mod: int = 50,
    threshold: float = 0.5,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication") re-expressed on Spark:
    cluster embeddings, then mark as duplicates the items that sit
    within ``threshold`` cosine of a LOWER-ID item in the SAME cluster
    (lowest id per near-dup group survives — deterministic, no RNG).

    Returns (id, cluster_id, is_dup int).

    Scale shape — the whole point of SemDeDup is that pairwise cosine
    happens only WITHIN clusters: centroids (the deterministic
    ``id % centroid_mod`` sample, same scheme the IVF index uses, so
    the oracle reproduces them) broadcast to a map-side argmax
    assignment whose shuffle is one row per vector; the pair join keys
    on cluster_id, co-locating each cluster, so pair work is
    sum(|cluster|^2) not N^2.  A pathologically hot cluster bounds a
    task — at 100 TB cap cluster sizes by raising the centroid count
    (or salt the pair join) exactly as you would tune K in the paper."""
    from ..cachereg import pin
    from .similarity import _vectors, cosine

    v = _vectors(df, id_col, vec_col)
    cents = v.filter(F.col(id_col) % centroid_mod == 0).toDF("cid", "_c")
    scored = v.crossJoin(F.broadcast(cents)).select(
        id_col,
        "_v",
        "cid",
        F.round(cosine(F.col("_v"), F.col("_c")), 8).alias("_cs"),
    )
    # The vector rides through the argmax agg (any_value is exact: every
    # _v in an id's group is the same row's vector), and the assignment
    # is PINNED: its three consumers (both sides of the within-cluster
    # self-join + the final marking join) would otherwise each re-run
    # the |V| x |centroids| scoring cross-product — the dominant stage.
    # One row per vector cached; cachereg releases on the next build.
    mem = pin(
        scored.groupBy(id_col).agg(
            F.max_by(
                "cid", F.struct(F.col("_cs"), (-F.col("cid")).alias("_t"))
            ).alias("cid"),
            F.any_value("_v").alias("_v"),
        )
    )
    # eager materialization, same reason as minhash_lsh_dedup_pairs:
    # AQE compiles the three consumers concurrently and racing tasks
    # would each recompute not-yet-cached scoring partitions
    mem.count()
    assign = mem.select(id_col, "cid")
    a = mem.select(
        F.col(id_col).alias("va"), "cid", F.col("_v").alias("_a")
    )
    b = mem.select(
        F.col(id_col).alias("vb"), "cid", F.col("_v").alias("_b")
    )
    dups = (
        a.join(b, "cid")
        .filter(F.col("va") < F.col("vb"))
        .filter(
            F.round(cosine(F.col("_a"), F.col("_b")), 4) >= threshold
        )
        .select("vb")
        .distinct()
        .withColumn("_isdup", F.lit(1))
    )
    return (
        assign.join(dups.withColumnRenamed("vb", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.col("cid").cast("long").alias("cluster_id"),
            F.coalesce(F.col("_isdup"), F.lit(0)).cast("int").alias("is_dup"),
        )
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
    out: str = "simhash",
) -> DataFrame:
    """SimHash fingerprint: per token, bit b is the parity of hex digit
    b of md5(token); bits vote ±1 across tokens; the sign vector packs
    into an integer.  Near-identical token multisets land on identical
    (or hamming-close) fingerprints.

    Pure per-row array aggregation — no shuffle at any scale."""
    from ..session import spread_small_scan

    df = spread_small_scan(df)
    toks = "filter(split(lower({c}), '\\\\s+'), x -> x != '')".format(c=text_col)
    bit_terms = []
    for b in range(bits):
        vote = (
            f"aggregate({toks}, 0, (acc, x) -> acc +"
            f" ((instr('0123456789abcdef', substring(md5(x), {b + 1}, 1)) - 1) % 2)"
            f" * 2 - 1)"
        )
        bit_terms.append(f"CASE WHEN ({vote}) > 0 THEN {1 << b} ELSE 0 END")
    return df.withColumn(
        out, F.expr(" + ".join(bit_terms)).cast("long")
    )


# --- Exact-substring (repeated passage) dedup --------------------------
#
# The dedup the near-dup family can't do: MinHash/SimHash score WHOLE
# documents, but training corpora are poisoned by shared PASSAGES inside
# otherwise-distinct documents (licenses, boilerplate, quoted chunks) —
# the failure mode that motivates suffix-style exact-substring dedup
# (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
# Better").  The distributed re-expression: every word k-gram is a
# candidate passage; a k-gram occurring in >= 2 distinct documents marks
# a duplicated span, and maximal duplicated substrings are exactly the
# runs of consecutive duplicated k-grams.


def positional_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    with_text: bool = True,
) -> DataFrame:
    """(id, pos[, shingle], shingle_hash) for EVERY word k-gram — unlike
    ``text.word_shingles`` these keep position and multiplicity, which
    passage detection needs.  ``pos`` is the 1-based token offset.
    Docs shorter than k tokens emit nothing.

    The digest is xxhash64 over the token-array SLICE — never a
    concatenated string: the 64-bit long is 4x narrower on the shuffle
    wire than an md5 hex string, and skipping the per-gram string
    build + md5 is ~30% off the scan (the digest is engine-internal —
    no output or oracle ever sees it, so cross-engine reproducibility
    is not required here, unlike the LSH/KMV hashes).  Pass
    ``with_text=False`` on digest-only paths (aggregation sides) so the
    gram string is never even constructed — explicit rather than
    trusting nested-field pruning through the generator."""
    if with_text:
        gram = " || ' ' || ".join(
            f"element_at(_toks, i + {j})" for j in range(k)
        )
        elem = f"struct({gram} AS s, xxhash64(slice(_toks, i, {k})) AS h)"
    else:
        elem = f"xxhash64(slice(_toks, i, {k}))"
    arr = F.expr(
        f"CASE WHEN size(_toks) >= {k} THEN"
        f" transform(sequence(1, size(_toks) - {k - 1}), i -> {elem})"
        f" ELSE array() END"
    )
    exploded = df.withColumn("_toks", tokens(text_col)).select(
        F.col(id_col), F.posexplode(arr).alias("_p0", "_sh")
    )
    cols = [F.col(id_col), (F.col("_p0") + 1).alias("pos")]
    if with_text:
        cols += [F.col("_sh.s").alias("shingle"),
                 F.col("_sh.h").alias("shingle_hash")]
    else:
        cols += [F.col("_sh").alias("shingle_hash")]
    return exploded.select(*cols)


# first-occurrence encoding shared with the SQL twin: positions are
# bounded far below this, so (id, pos) orders correctly inside one int.
_POS_ENC = 1_000_000


def repeated_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_docs: int = 2,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Cross-document duplicated passages: every word k-gram occurring
    in >= ``min_docs`` DISTINCT documents, with its occurrence stats and
    the passage text of its first occurrence.

    Returns (passage, n_docs, n_occ, first_doc, first_pos).

    Scale shape: the aggregation shuffles only (16-byte digest, id,
    encoded pos) — never text; the passage sample comes from a second
    scan that first SEMI-JOINS down to the first-occurrence documents
    (duplicated passages are rare, so almost no doc re-tokenizes) and
    then broadcast-joins the (small, duplicated-only) stats frame — the
    standard digest-first/rejoin-sample pattern.  No suffix array is
    materialized: consecutive-k-gram runs reconstruct maximal
    duplicated substrings downstream if needed.

    ``shingles``: optionally a prebuilt (id, pos, shingle_hash) frame —
    pass a pinned one to share the tokenize+digest scan with
    ``duplicate_span_coverage`` (see queries/dedup.py)."""
    sh = (
        shingles
        if shingles is not None
        else positional_shingles(df, id_col, text_col, k, with_text=False)
    )
    occ = sh.select(
        F.col(id_col),
        "pos",
        "shingle_hash",
        (F.col(id_col) * _POS_ENC + F.col("pos")).alias("_enc"),
    )
    stats = (
        occ.groupBy("shingle_hash")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count("*").alias("n_occ"),
            F.min("_enc").alias("_first"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select(
            "shingle_hash",
            "n_docs",
            "n_occ",
            (F.col("_first") / _POS_ENC).cast("long").alias("first_doc"),
            (F.col("_first") % _POS_ENC).alias("first_pos"),
        )
    )
    sample_docs = df.join(
        F.broadcast(stats.select(F.col("first_doc").alias(id_col)).distinct()),
        id_col,
        "semi",
    )
    sh2 = positional_shingles(sample_docs, id_col, text_col, k)
    return (
        sh2.join(
            F.broadcast(stats),
            (sh2.shingle_hash == stats.shingle_hash)
            & (F.col(id_col) == stats.first_doc)
            & (sh2.pos == stats.first_pos),
        )
        .select(
            F.col("shingle").alias("passage"),
            "n_docs",
            "n_occ",
            "first_doc",
            "first_pos",
        )
    )


def duplicate_span_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Per-document duplicated-span coverage: the fraction of a doc's
    word k-grams that also occur in ANOTHER document — the curation
    signal for dropping boilerplate-heavy documents wholesale (vs
    surgically cutting the spans).

    Returns (id, n_shingles, n_dup, dup_frac); docs with < k tokens
    emit nothing (no spans to score).

    Scale shape: one digest-only aggregation builds the per-shingle
    document-frequency, one digest equi-join (sort-merge at corpus
    scale — the DF table is corpus-sized, NOT broadcastable) stamps it
    back on occurrences, one groupBy(id) folds per-doc counts.

    ``shingles``: optionally a prebuilt (id, pos, shingle_hash) frame —
    pass a pinned one to share the tokenize+digest scan with
    ``repeated_passages`` (see queries/dedup.py)."""
    sh = (
        shingles
        if shingles is not None
        else positional_shingles(df, id_col, text_col, k, with_text=False)
    )
    occ = sh.select(F.col(id_col), "shingle_hash")
    docfreq = occ.groupBy("shingle_hash").agg(
        F.countDistinct(id_col).alias("_nd")
    )
    return (
        occ.join(docfreq, "shingle_hash")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("_nd") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_dup",
            F.round(F.col("n_dup") / F.col("n_shingles"), 4).alias("dup_frac"),
        )
    )


def minhash_lsh_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate JOIN between TWO corpora — the cross-table sibling
    of ``minhash_lsh_dedup_pairs`` (which pairs within one table) and of
    ``incremental_dedup`` (which matches across tables but only
    exactly): match a probe batch against a reference corpus by
    shingle-set similarity.  The decontamination / catalog-matching /
    "is this incoming doc a rewrite of something we already hold" shape.

    Returns (left_id, right_id, jaccard >= threshold).

    Scale shape, identical to the within-table pipeline: each side
    shingles, signs and bands INDEPENDENTLY (map-side per doc); the
    only cross-side contact is the equi-join on (band_idx, band) — a
    bucket join, never |L| x |R|; exact Jaccard runs only on the
    deduped candidate list, broadcast to the two shingle-set attach
    joins so document shingles never shuffle.  If the probe side is
    itself corpus-sized, drop the candidate broadcast for a plain
    shuffled attach — the band join's shape is unchanged."""
    from ..cachereg import pin

    sets_l = pin(doc_shingle_sets(left, id_col, text_col, shingle_k))
    sets_l.count()
    sets_r = pin(doc_shingle_sets(right, id_col, text_col, shingle_k))
    sets_r.count()
    bl = lsh_bands(
        minhash_signatures(sets_l, id_col, num_hashes), id_col, num_hashes, bands
    ).select(F.col(id_col).alias("left_id"), "band_idx", "band")
    br = lsh_bands(
        minhash_signatures(sets_r, id_col, num_hashes), id_col, num_hashes, bands
    ).select(F.col(id_col).alias("right_id"), "band_idx", "band")
    cand = (
        bl.join(br, ["band_idx", "band"])
        .select("left_id", "right_id")
        .distinct()
    )
    return jaccard_verify(
        cand,
        sets_l,
        id_col,
        threshold,
        sets_b=sets_r,
        a_col="left_id",
        b_col="right_id",
    )

