"""Text-analysis queries over the documents table (training-data-pipeline
extension surface): token stats, language ID, quality scoring,
fingerprinting.  Oracle SQL is generated from the same constants so the
two sides can't drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import text as tx
from ..registry import register
from ..session import Tables

# --- DuckDB expression fragments mirroring operators/text.py ----------

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"


def _duck_stop_ratio(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in tx.STOPWORDS[lang])
    return (
        f"CASE WHEN len({_TOKS}) > 0 THEN"
        f" CAST(len(list_filter({_TOKS}, x -> list_contains([{words}], x))) AS DOUBLE)"
        f" / len({_TOKS}) ELSE 0.0 END"
    )


@register(
    "tx_token_stats",
    sql=f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '{tx.BPE_ISH_PATTERN}', 0)) AS BIGINT)
             AS n_bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_calc
    FROM documents
    """,
)
def tx_token_stats(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish regex pre-tokens.
    Per-row JVM expressions; zero shuffles."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        tx.token_count().alias("n_tokens"),
        tx.bpe_ish_token_count().alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars_calc"),
    )


def _lang_id_sql() -> str:
    ratios = {lang: _duck_stop_ratio(lang) for lang in tx.STOPWORDS}
    best = "greatest(" + ", ".join(f"r_{lang}" for lang in tx.STOPWORDS) + ")"
    whens = " ".join(
        f"WHEN r_{lang} > 0 AND r_{lang} = {best} THEN '{lang}'"
        for lang in tx.STOPWORDS
    )
    inner = ",\n".join(f"{expr} AS r_{lang}" for lang, expr in ratios.items())
    return f"""
    SELECT doc_id, CASE {whens} ELSE 'und' END AS lang_pred
    FROM (SELECT doc_id, {inner} FROM documents)
    """


@register("tx_lang_id", sql=_lang_id_sql())
def tx_lang_id(spark, sf_dir):
    """Language ID via stopword-ratio argmax (tie-break by language
    order, 'und' when nothing matches)."""
    t = Tables(spark, sf_dir)
    return tx.lang_id(t.documents).select("doc_id", "lang_pred")


_PUNCT_RATIO = (
    "CASE WHEN length(text) > 0 THEN"
    " CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)"
    " / length(text) ELSE 0.0 END"
)


@register(
    "tx_quality_score",
    sql=f"""
    SELECT doc_id,
           round(least(CAST(len({_TOKS}) AS DOUBLE) / 100, 1.0) * 0.4
                 + (1.0 - {_PUNCT_RATIO}) * 0.3
                 + least({_duck_stop_ratio("en")} * 5, 1.0) * 0.3, 3) AS quality
    FROM documents
    """,
)
def tx_quality_score(spark, sf_dir):
    """Composite quality score: content length, punctuation density,
    natural-language-ness — the classic pretraining quality filter."""
    t = Tables(spark, sf_dir)
    return tx.quality_score(t.documents).select("doc_id", "quality")


@register(
    "tx_fingerprint",
    sql="""
    SELECT doc_id,
           list_min(list_transform(
             CASE WHEN length(text) >= 8
                  THEN list_transform(range(1, length(text) - 6),
                                      i -> substr(text, i, 8))
                  ELSE [] END,
             s -> md5(s))) AS fp
    FROM documents
    """,
)
def tx_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint: min-md5 over char 8-grams."""
    t = Tables(spark, sf_dir)
    return tx.fingerprint(t.documents).select("doc_id", "fp")


# Dataset-mixing rates: downsample dominant English, keep rarer langs.
MIX_RATES = {"en": 20, "zh": 50, "es": 60, "de": 70, "fr": 80}


def _mix_rate_sql() -> str:
    cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in MIX_RATES.items())
    return f"CASE lang {cases} ELSE 0 END"


@register(
    "tx_stratified_sample",
    sql=f"""
    SELECT doc_id, lang,
           {tx.sample_bucket_sql("doc_id")} AS sample_bucket
    FROM documents
    WHERE {tx.sample_bucket_sql("doc_id")} < {_mix_rate_sql()}
    """,
)
def tx_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling for dataset mixing: keep
    MIX_RATES percent per language via a multiply-xorshift id bucket
    (see operators/text.py sample_bucket for why not an LCG).
    Map-only, retry-stable, zero shuffles; SQL generated from the same
    rates dict + hash constants so the two sides cannot drift."""
    t = Tables(spark, sf_dir)
    return tx.stratified_sample(t.documents, MIX_RATES).select(
        "doc_id", "lang", "sample_bucket"
    )
