"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All hot-path expressions are JVM-side higher-order functions (transform/
filter/aggregate over arrays) — no Python UDFs, so at 100 TB these run
inside whole-stage codegen at scan speed with zero shuffles (everything
is per-row).  Portable primitives only (md5, instr, substring, split),
so every operator has an exact DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small multilingual stopword sets for the ratio-based language heuristic.
STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "en"],
}


def tokens(col: str = "text") -> Column:
    """Lowercased whitespace tokens, empties dropped."""
    return F.expr(f"filter(split(lower({col}), '\\\\s+'), x -> x != '')")


def token_count(col: str = "text") -> Column:
    """Whitespace token count as LONG."""
    return F.size(tokens(col)).cast("long")


# BPE-ish pre-tokenizer: letter runs | single digits | single punctuation.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


def bpe_ish_token_count(col: str = "text") -> Column:
    """Count of BPE-style pre-tokens (regexp_extract_all, JVM-side).

    Spark SQL string literals process backslash escapes (DuckDB's don't),
    so the shared pattern is re-escaped here."""
    pat = BPE_ISH_PATTERN.replace("\\", "\\\\")
    return F.size(F.expr(f"regexp_extract_all({col}, '{pat}', 0)")).cast("long")


def stopword_ratio(col: str = "text", lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang`` (0 if no tokens)."""
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    hits = F.size(
        F.expr(
            f"filter(filter(split(lower({col}), '\\\\s+'), x -> x != ''),"
            f" x -> array_contains(array({words}), x))"
        )
    )
    n = F.size(tokens(col))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def lang_id(df: DataFrame, col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword ratios,
    ties broken by the fixed language order, 'und' when all ratios are 0.

    A production system would use char-n-gram profiles; the ratio
    heuristic keeps the operator fully declarative + oracle-checkable.
    """
    ratios = {lang: stopword_ratio(col, lang) for lang in STOPWORDS}
    best = F.greatest(*ratios.values())
    expr = F.lit("und")
    # reversed() so earlier languages win ties via later when() precedence
    for lang in reversed(list(STOPWORDS)):
        expr = F.when((ratios[lang] > 0) & (ratios[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return df.withColumn(out, expr)


def punct_ratio(col: str = "text") -> Column:
    """Fraction of characters that are common punctuation."""
    stripped = F.expr(f"regexp_replace({col}, '[.,!?;:]', '')")
    n = F.length(col)
    return F.when(
        n > 0, (n - F.length(stripped)).cast("double") / n
    ).otherwise(F.lit(0.0))


def quality_score(df: DataFrame, col: str = "text", out: str = "quality") -> DataFrame:
    """Composite [0,1] document-quality score:

    0.4 * min(n_tokens/100, 1)            (enough content)
    + 0.3 * (1 - punct_ratio)             (not symbol soup)
    + 0.3 * min(5 * stopword_ratio, 1)    (natural-language-ness)

    rounded to 3 decimals.  Pure per-row expressions — no shuffle.
    """
    n_tok = F.size(tokens(col))
    score = (
        F.least(n_tok.cast("double") / 100, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - punct_ratio(col)) * 0.3
        + F.least(stopword_ratio(col, "en") * 5, F.lit(1.0)) * 0.3
    )
    return df.withColumn(out, F.round(score, 3))


def char_shingles(col: str = "text", k: int = 8) -> Column:
    """All character k-grams (empty array for short docs)."""
    return F.expr(
        f"CASE WHEN length({col}) >= {k} THEN"
        f" transform(sequence(1, length({col}) - {k - 1}),"
        f" i -> substring({col}, i, {k}))"
        f" ELSE array() END"
    )


def word_shingles(tokens_col: str, k: int = 3) -> Column:
    """Distinct word k-gram shingles (space-joined) over a materialized
    tokens array column; empty array for short docs.  Materialize tokens
    first (``withColumn("_toks", tokens())``) so the split isn't
    recomputed per shingle."""
    gram = " || ' ' || ".join(f"element_at({tokens_col}, i + {j})" for j in range(k))
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= {k} THEN"
        f" array_distinct(transform(sequence(1, size({tokens_col}) - {k - 1}),"
        f" i -> {gram}))"
        f" ELSE array() END"
    )


def fingerprint(df: DataFrame, col: str = "text", out: str = "fp", k: int = 8) -> DataFrame:
    """Rolling-hash document fingerprint: the minimum md5 over all
    character k-gram shingles (winnowing with a single global window).
    Identical-content documents get identical fingerprints regardless of
    surrounding metadata; near-identical ones collide with probability
    rising in their overlap."""
    return df.withColumn(
        out,
        F.array_min(F.transform(char_shingles(col, k), lambda s: F.md5(s))),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, int],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the dataset-mixing primitive
    (downsample over-represented languages/sources to target
    proportions).  ``rates`` maps stratum value -> percent kept [0,100].

    A row survives iff ``lcg(id) % 100 < rate(stratum)`` where ``lcg``
    is a fixed linear-congruential scramble of the id.  Deterministic
    (reruns and retried tasks keep identical rows — no ``rand()``
    nondeterminism under task retry), map-only (the when-chain is a
    per-row JVM expression; zero shuffles, filter reaches the scan), and
    exactly reproducible in ANSI SQL for the oracle.  At 100 TB scale
    swap the LCG for ``xxhash64(id)`` — same shape, overflow-safe for
    ids beyond ~2^33 (the multiply here stays in int64 below that).
    """
    bucket = (F.col(id_col) * F.lit(1103515245) + F.lit(12345)) % 100
    rate = None
    for value, pct in rates.items():
        branch = F.when(F.col(strata_col) == value, F.lit(pct))
        rate = branch if rate is None else rate.when(
            F.col(strata_col) == value, F.lit(pct)
        )
    rate = (rate.otherwise(F.lit(default_rate))
            if rate is not None else F.lit(default_rate))
    return df.withColumn("sample_bucket", bucket.cast("long")).filter(
        F.col("sample_bucket") < rate
    )
