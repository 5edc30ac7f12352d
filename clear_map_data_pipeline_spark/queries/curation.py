"""End-to-end training-corpus curation pipeline — the flagship
composition of the LLM-data operators: quality filter -> exact dedup
(min-id survivor) -> near-dup removal (MinHash-LSH verified pairs) ->
deterministic language mixing.  One registered query, fully
SQL-expressible, so the driver hash-checks the WHOLE pipeline output,
not just its stages.

Scale shape (the reason each stage is built the way it is):

- quality + token stats are per-row JVM expressions fused into the scan
  (zero shuffles; the quality filter prunes before anything wide);
- exact dedup is ONE window exchange keyed on the content digest, and
  only compact columns (id, lang, quality, n_tokens, digest) ride it —
  document bodies never shuffle;
- the near-dup id list comes from the LSH pair pipeline (bucketed,
  never all-pairs); the removal is a broadcast ANTI join — at 100 TB
  the duplicate-id list is orders of magnitude smaller than the corpus;
- mixing is the map-only multiply-xorshift bucket filter (retry-stable,
  no rand()).

Net: one narrow pre-aggregation scan, one compact window shuffle, one
broadcast anti join — the minimum wide work the semantics allow.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import dedup as dd
from ..operators import text as tx
from ..registry import register
from ..session import Tables
from .dedup import _minhash_ctes
from .text import _TOKS, MIX_RATES, QUALITY_SQL_EXPR, _mix_rate_sql

QUALITY_MIN = 0.5


def _curation_sql() -> str:
    bucket = tx.sample_bucket_sql("doc_id")
    return f"""
    WITH {_minhash_ctes()},
    q AS (
      SELECT doc_id, lang, text,
             {QUALITY_SQL_EXPR} AS quality,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    kept AS (SELECT * FROM q WHERE quality >= {QUALITY_MIN}),
    surv AS (
      SELECT doc_id, lang, quality, n_tokens
      FROM (SELECT doc_id, lang, quality, n_tokens,
                   min(doc_id) OVER (PARTITION BY md5(text)) AS _min
            FROM kept)
      WHERE doc_id = _min
    )
    SELECT doc_id, lang, quality, n_tokens,
           {bucket} AS sample_bucket
    FROM surv
    WHERE doc_id NOT IN (SELECT doc_b FROM verified)
      AND {bucket} < {_mix_rate_sql()}
    """


@register("pipeline_corpus_curation", sql=_curation_sql())
def pipeline_corpus_curation(spark, sf_dir):
    """Corpus curation end-to-end: quality >= 0.5, exact-dedup min-id
    survivors, drop docs with a lower-id LSH-verified near-dup, then
    MIX_RATES language mixing.  Output: one row per surviving document
    with its curation metadata."""
    t = Tables(spark, sf_dir)
    docs = t.documents

    scored = tx.quality_score(docs).select(
        "doc_id", "lang", "text", "quality",
        tx.token_count().alias("n_tokens"),
    )
    kept = scored.filter(F.col("quality") >= QUALITY_MIN)

    # exact dedup via ONE window exchange over compact columns only —
    # text is reduced to its digest before the shuffle
    compact = kept.select(
        "doc_id", "lang", "quality", "n_tokens",
        F.md5("text").alias("content_hash"),
    )
    w = Window.partitionBy("content_hash")
    surv = (
        compact.withColumn("_min", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_min"))
        .drop("_min", "content_hash")
    )

    # near-dup removal: every doc_b of a verified pair has a lower-id
    # twin -> drop it.  The id list is tiny relative to the corpus:
    # broadcast anti join, zero corpus-side shuffle.
    dup_ids = (
        dd.minhash_lsh_dedup_pairs(docs)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    clean = surv.join(F.broadcast(dup_ids), "doc_id", "left_anti")

    mixed = tx.stratified_sample(clean, MIX_RATES)
    return mixed.select(
        "doc_id", "lang", "quality", "n_tokens", "sample_bucket"
    )
