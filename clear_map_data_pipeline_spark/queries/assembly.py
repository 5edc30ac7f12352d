"""Corpus-assembly queries: sequence packing + temperature-based domain
mixing over the documents table — the pass that turns a cleaned,
deduplicated corpus into the actual training-data layout.

Oracle SQL is generated from the same constants (hash, budget, alpha)
as the Spark side so the two cannot drift.  Folded into one registry
slot (driver's 50-entry CORRECTNESS window); each sub-query's full
result set still hash-checks inside the suite union.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import assembly as asm
from ..operators import text as tx
from ..session import Tables
from .suites import SubQuery, register_suite
from .text import _TOKS

PACK_BUDGET = 512  # tokens per training sequence
PACK_SHARDS = 16  # independent token streams (100k+ at corpus scale)
MIX_ALPHA = 0.5  # temperature exponent (XLM-R uses ~0.3-0.7)
MIX_TARGET = 0.3  # overall corpus fraction to keep
SHUFFLE_SEED = 17  # deterministic corpus-shuffle permutation seed


def asm_pack_sequences(spark, sf_dir):
    """Concat-and-chunk packing of the documents table: deterministic
    id-hash shard -> per-shard token cumsum -> 512-token chunk id +
    offset.  One shuffle on shard, all-integer assignment (see
    operators/assembly.py)."""
    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", tx.token_count().alias("n_tokens"))
    return asm.pack_sequences(
        docs, budget=PACK_BUDGET, n_shards=PACK_SHARDS
    )


_PACK_SQL = f"""
    WITH tok AS (
      SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             ({tx.hash31_sql("doc_id")} % {PACK_SHARDS}) AS shard
      FROM documents
    ),
    cum AS (
      SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM tok
    )
    SELECT doc_id, shard,
           (c - n_tokens) // {PACK_BUDGET} AS seq_id,
           (c - n_tokens) % {PACK_BUDGET} AS seq_offset,
           n_tokens
    FROM cum
    """


def asm_temperature_mix(spark, sf_dir):
    """Temperature mixing over languages: keep ~MIX_TARGET of the corpus
    with per-language shares flattened by alpha=0.5 (rare languages keep
    a larger fraction of their rows).  |langs|-row aggregate broadcast
    back; corpus side is map-only (see operators/assembly.py)."""
    t = Tables(spark, sf_dir)
    return asm.temperature_mix(
        t.documents, alpha=MIX_ALPHA, target_frac=MIX_TARGET
    )


_MIX_SQL = f"""
    WITH counts AS (
      SELECT lang AS dom, CAST(count(*) AS DOUBLE) AS n
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT sum(n) AS nn, sum(pow(n, {MIX_ALPHA})) AS s FROM counts
    ),
    rates AS (
      SELECT dom,
             least(100, CAST(round(100.0 * {MIX_TARGET} * pow(n, {MIX_ALPHA})
                   / s * nn / n) AS BIGINT)) AS rate_pct
      FROM counts, tot
    )
    SELECT d.doc_id, d.lang, r.rate_pct,
           ({tx.hash31_sql("d.doc_id")} % 100) AS sample_bucket
    FROM documents d JOIN rates r ON d.lang = r.dom
    WHERE ({tx.hash31_sql("d.doc_id")} % 100) < r.rate_pct
    """


CHUNK_SIZE = 128  # tokens per chunk
CHUNK_OVERLAP = 32  # boundary context shared between neighbours


def asm_chunk_documents(spark, sf_dir):
    """Overlapping-window chunking of the documents table: 128-token
    chunks every 96 tokens — map-only, zero shuffle (see
    operators/assembly.py: chunk_documents)."""
    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", tx.token_count().alias("n_tokens"))
    return asm.chunk_documents(
        docs, chunk_size=CHUNK_SIZE, overlap=CHUNK_OVERLAP
    )


_CHUNK_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP
_CHUNK_SQL = f"""
    WITH tok AS (
      SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, chunk_idx,
           chunk_idx * {_CHUNK_STRIDE} AS chunk_start,
           least({CHUNK_SIZE},
                 n_tokens - chunk_idx * {_CHUNK_STRIDE}) AS chunk_len
    FROM (
      SELECT doc_id, n_tokens,
             unnest(range(0, ((n_tokens - 1) // {_CHUNK_STRIDE}) + 1))
               AS chunk_idx
      FROM tok WHERE n_tokens > 0
    )
    """


def asm_global_shuffle_index(spark, sf_dir):
    """Deterministic corpus shuffle: 0-based global rank under
    ``ORDER BY md5(seed || doc_id), doc_id`` built from range partitions
    + broadcast prefix-sum offsets — never an unpartitioned
    ``row_number`` window (see operators/assembly.py)."""
    t = Tables(spark, sf_dir)
    return asm.global_shuffle_index(t.documents, seed=SHUFFLE_SEED)


_SHUFFLE_SQL = f"""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
                  ORDER BY md5('{SHUFFLE_SEED}|' || CAST(doc_id AS VARCHAR)),
                           doc_id) - 1 AS BIGINT) AS global_index
    FROM documents
    """


WSAMPLE_K = 50


def asm_weighted_sample(spark, sf_dir):
    """Exact-k weighted sample without replacement (Efraimidis–Spirakis
    A-ES, derandomized via hash31): the 50 docs with the smallest
    -ln(u)/n_chars keys — selection proportional to document length;
    map-only keys + TakeOrderedAndProject (see operators/assembly.py:
    weighted_sample)."""
    from ..operators.assembly import weighted_sample

    t = Tables(spark, sf_dir)
    return weighted_sample(t.documents, WSAMPLE_K, "n_chars")


def _wsample_sql() -> str:
    h = tx.hash31_sql("doc_id")
    key = (
        f"-ln((({h}) + 1) / 2147483648.0) / CAST(n_chars AS DOUBLE)"
    )
    return f"""
    SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
           floor(({key}) * 1000000000.0) / 1000000000.0 AS es_key
    FROM documents
    WHERE n_chars > 0
    ORDER BY es_key, doc_id
    LIMIT {WSAMPLE_K}
    """


# exactly-k per stratum, weight-proportional — drops fr/es on purpose
# (strata absent from the dict are dropped, and the oracle must agree)
EXACT_K = {"en": 40, "de": 15, "zh": 25}


def asm_stratified_exact_k(spark, sf_dir):
    """Exactly-k-per-stratum sampling (r07, tests-only ->
    hash-checked): 40 en / 15 de / 25 zh documents, selection
    weight-proportional to n_chars via per-stratum A-ES keys
    (operators/assembly.py: stratified_exact_k); fr/es are absent from
    the k-dict and must be dropped.  One shuffle on the stratum for
    the ranking window; the oracle replays the hash31-derived key and
    the per-stratum row_number in SQL."""
    from ..operators.assembly import stratified_exact_k

    t = Tables(spark, sf_dir)
    return stratified_exact_k(
        t.documents, EXACT_K, strata_col="lang", weight_col="n_chars"
    ).select("doc_id", "lang")


def _exact_k_sql() -> str:
    h = tx.hash31_sql("doc_id")
    key = f"-ln((({h}) + 1) / 2147483648.0) / CAST(n_chars AS DOUBLE)"
    # same floor-1e9 truncation as the operator's _skey (and as
    # _wsample_sql) so a 1-ulp ln() divergence between JVM and libm
    # can't flip a rank-k boundary pair between engines
    tkey = f"floor(({key}) * 1000000000.0) / 1000000000.0"
    keep = " OR ".join(
        f"(lang = '{s}' AND rn <= {k})" for s, k in EXACT_K.items()
    )
    return f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY ({tkey}), doc_id) AS rn
      FROM documents WHERE n_chars > 0
    ) WHERE {keep}
    """


register_suite(
    "suite_corpus_assembly",
    [
        SubQuery(
            "asm_pack_sequences",
            asm_pack_sequences,
            _PACK_SQL,
            [("doc_id", "s"), ("shard", "s"), ("seq_id", "s"),
             ("seq_offset", "s"), ("n_tokens", "s")],
        ),
        SubQuery(
            "asm_temperature_mix",
            asm_temperature_mix,
            _MIX_SQL,
            [("doc_id", "s"), ("lang", "s"), ("rate_pct", "s"),
             ("sample_bucket", "s")],
        ),
        SubQuery(
            "asm_global_shuffle_index",
            asm_global_shuffle_index,
            _SHUFFLE_SQL,
            [("doc_id", "s"), ("global_index", "s")],
        ),
        SubQuery(
            "asm_chunk_documents",
            asm_chunk_documents,
            _CHUNK_SQL,
            [("doc_id", "s"), ("chunk_idx", "s"), ("chunk_start", "s"),
             ("chunk_len", "s")],
        ),
        SubQuery(
            "asm_weighted_sample",
            asm_weighted_sample,
            _wsample_sql(),
            [("doc_id", "s"), ("weight", "d4"), ("es_key", "d9")],
        ),
        SubQuery(
            "asm_stratified_exact_k",
            asm_stratified_exact_k,
            _exact_k_sql(),
            [("doc_id", "s"), ("lang", "s")],
        ),
    ],
    doc="""Corpus-assembly suite: concat-and-chunk sequence packing
    (all-integer, one shard shuffle) + temperature-based domain mixing
    (broadcast rates, map-only corpus pass) + deterministic global
    shuffle index (range sort + offset arithmetic, no single-partition
    window) + overlapping-window document chunking (map-only) +
    exact-k weighted sampling without replacement (A-ES keys, r04) +
    exactly-k-per-stratum weighted sampling (r07) — each hash-checked
    row-for-row against its DuckDB twin inside the suite union.""",
)
