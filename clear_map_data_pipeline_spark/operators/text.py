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


def tokens_sql(col: str = "text") -> str:
    """THE whitespace tokenizer, as a Spark SQL expression string —
    the single definition every operator composes (tokens() below,
    dedup.duplicated_spans' window builder, ...), so a tokenization
    change cannot silently fracture the family."""
    return f"filter(split(lower({col}), '\\\\s+'), x -> x != '')"


def tokens(col: str = "text") -> Column:
    """Lowercased whitespace tokens, empties dropped."""
    return F.expr(tokens_sql(col))


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


def vocabulary(
    df: DataFrame, col: str = "text", top_n: int = 100
) -> DataFrame:
    """Corpus vocabulary: the ``top_n`` most frequent whitespace tokens
    as (token, n), ordered by count desc with the token itself as the
    deterministic tie-break — the counting pass tokenizer training
    (BPE/unigram seeding, stopword discovery) starts from.

    Scale: ``explode`` multiplies rows but the aggregation is map-side
    partial, so the shuffle carries (token, partial_count) pairs — the
    hot stopword tokens combine before they move.  The final ``ORDER BY
    n LIMIT top_n`` plans as TakeOrderedAndProject: per-partition local
    top-n merged on one task of ``top_n`` rows, never a global sort."""
    return (
        df.select(F.explode(tokens(col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(top_n)
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 3,
) -> DataFrame:
    """Per-document top-``top_n`` terms by TF-IDF — the classic
    keyword/relevance scoring a corpus pipeline uses for topic tagging
    and quality filtering.  tfidf = tf * ln(N / df), rounded to 4
    decimals BEFORE ranking so the rank tie-break (token asc) is
    engine-stable.

    Scale shape: explode -> (doc, token) counts with map-side combine;
    document frequencies aggregate the already-distinct (doc, token)
    pairs, so the df pass shuffles vocabulary-sized data; the corpus
    row count N rides in as a broadcast 1-row aggregate; the tf⋈df
    join keys on token (AQE picks broadcast when the vocabulary fits,
    shuffled-hash otherwise); ranking windows per doc_id.  No
    driver-side loops, no UDFs."""
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = df.agg(F.count("*").cast("double").alias("_n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("_n") / F.col("df")), 4),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(id_col, "token", "tfidf", F.col("rank").cast("int").alias("rank"))
    )


def classifier_weights(dim: int = 64, seed: str = "w") -> list[float]:
    """Deterministic stand-in weight vector for the hashed linear
    classifier: w_j in [-1, 1) derived from md5(seed|j), rounded to 6
    decimals so the literal parses to the identical double on every
    engine.  A real deployment passes fasttext/logreg-trained weights
    instead — the plumbing (hashing, broadcast-literal weights,
    JVM-side scoring) is what this operator exercises."""
    import hashlib

    return [
        round(
            int(hashlib.md5(f"{seed}{j}".encode()).hexdigest()[:8], 16)
            / 2**32
            * 2
            - 1,
            6,
        )
        for j in range(dim)
    ]


def _bucket_expr(tok: str, dim: int) -> str:
    """Token -> [0, dim) feature bucket from the first two md5 hex
    digits (256 raw buckets folded by modulo) — mirrored digit-for-digit
    by the DuckDB twin in queries/text.py."""
    d1 = f"(instr('0123456789abcdef', substring(md5({tok}), 1, 1)) - 1)"
    d2 = f"(instr('0123456789abcdef', substring(md5({tok}), 2, 1)) - 1)"
    return f"(({d1} * 16 + {d2}) % {dim})"


def linear_quality_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    bias: float = 0.0,
    weights: list[float] | None = None,
    out: str = "clf_score",
) -> DataFrame:
    """fastText-style hashed linear quality classifier — the scoring
    shape of the CCNet / LLaMA "quality filter" stage: hash each token
    into ``dim`` feature buckets, dot the bucket counts with a weight
    vector, squash through a sigmoid.

    Scale shape: the weight vector is a LITERAL array baked into the
    expression (at real scale: broadcast), so scoring is a pure per-row
    JVM expression over the token array — zero shuffles, zero Python,
    embarrassingly parallel over any corpus size.  Score rounds to 4
    decimals (both engines compute the identical literal arithmetic)."""
    w = weights if weights is not None else classifier_weights(dim)
    wlit = ", ".join(f"{x}D" for x in w)
    b = _bucket_expr("t", dim)
    score = (
        f"CASE WHEN size(_toks) > 0 THEN "
        f"round(1.0 / (1.0 + exp(-({bias}D + "
        f"aggregate(_toks, 0.0D, (acc, t) -> acc + element_at(array({wlit}), {b} + 1))"
        f" / size(_toks)))), 4) "
        f"ELSE round(1.0 / (1.0 + exp(-({bias}D))), 4) END"
    )
    return (
        df.withColumn("_toks", tokens(text_col))
        .withColumn(out, F.expr(score))
        .drop("_toks")
    )


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


def _ratio_over_toks(toks_col: str, lang: str) -> Column:
    """Stopword ratio over a MATERIALIZED token-array column.  The
    argmax chain references each ratio several times (condition +
    greatest + equality); computing them over one stored array instead
    of re-splitting the text per reference is ~2.7x faster at sf0.1
    (codegen does not CSE the repeated splits across the when-chain)."""
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    hits = F.size(
        F.expr(f"filter({toks_col}, x -> array_contains(array({words}), x))")
    )
    n = F.size(toks_col)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def lang_id(df: DataFrame, col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword ratios,
    ties broken by the fixed language order, 'und' when all ratios are 0.

    A production system would use char-n-gram profiles; the ratio
    heuristic keeps the operator fully declarative + oracle-checkable.
    Tokens are materialized once (`_ratio_over_toks`)."""
    d = df.withColumn("_lid_toks", tokens(col))
    ratios = {lang: _ratio_over_toks("_lid_toks", lang) for lang in STOPWORDS}
    best = F.greatest(*ratios.values())
    expr = F.lit("und")
    # reversed() so earlier languages win ties via later when() precedence
    for lang in reversed(list(STOPWORDS)):
        expr = F.when((ratios[lang] > 0) & (ratios[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return d.withColumn(out, expr).drop("_lid_toks")


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

    rounded to 3 decimals.  Pure per-row expressions — no shuffle;
    tokens materialized once (see _ratio_over_toks).
    """
    d = df.withColumn("_q_toks", tokens(col))
    n_tok = F.size("_q_toks")
    score = (
        F.least(n_tok.cast("double") / 100, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - punct_ratio(col)) * 0.3
        + F.least(_ratio_over_toks("_q_toks", "en") * 5, F.lit(1.0)) * 0.3
    )
    return d.withColumn(out, F.round(score, 3)).drop("_q_toks")


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


# Multiply-xorshift scramble constants (Knuth / xxhash-style odd
# multipliers).  The first reduction folds arbitrary nonnegative int64
# ids below 2^31 so both multiplies stay inside int64 (max product
# ~5.7e18 < 2^63-1) — portable to any engine with 64-bit integer
# arithmetic, xor, and right-shift; no overflow, no engine-specific
# hash function.
_HASH_P = 2147483647  # 2^31 - 1 (fold modulus)
_HASH_M = 2147483648  # 2^31 (mix modulus)
_HASH_C1 = 2654435761  # Knuth multiplicative constant
_HASH_C2 = 1597334677


def hash31(id_col: Column) -> Column:
    """Full 31-bit multiply-xorshift scramble of a NONNEGATIVE integer
    id — the shared deterministic-hash primitive behind sampling
    (``sample_bucket``) and the KMV distinct sketch (queries/olap.py).
    INJECTIVE on [0, 2^31-1): the fold is the identity there and each
    round (odd-multiplier mod 2^31, xorshift) is invertible — so
    distinct inputs keep distinct hashes, which KMV's order statistics
    require."""
    x0 = id_col % _HASH_P
    x1 = (x0 * _HASH_C1) % _HASH_M
    x2 = x1.bitwiseXOR(F.shiftright(x1, 15))
    x3 = (x2 * _HASH_C2) % _HASH_M
    return x3.bitwiseXOR(F.shiftright(x3, 13))


def hash31_sql(id_expr: str) -> str:
    """The identical scramble as DuckDB SQL text, generated from the
    same constants so engine and oracle cannot drift."""
    x0 = f"(({id_expr}) % {_HASH_P})"
    x1 = f"(({x0} * {_HASH_C1}) % {_HASH_M})"
    x2 = f"xor({x1}, ({x1} >> 15))"
    x3 = f"(({x2} * {_HASH_C2}) % {_HASH_M})"
    return f"xor({x3}, ({x3} >> 13))"


def sample_bucket(id_col: Column) -> Column:
    """[0,100) bucket from the shared multiply-xorshift scramble.
    Replaces the earlier LCG ``(id*1103515245+12345)%100``, which
    degenerates: 1103515245 ≡ 45 (mod 100) with gcd(45,100)=5, so its
    buckets were only ever multiples of 5 (rates silently quantized to
    5% steps).  The mix avalanches the low bits, so every bucket in
    [0,100) is reachable and realized keep-rates track requested rates
    to well under 1% (asserted in tests/test_text_ops.py)."""
    return hash31(id_col) % 100


def sample_bucket_sql(id_expr: str) -> str:
    """DuckDB twin of ``sample_bucket``."""
    return f"({hash31_sql(id_expr)} % 100)"


# --- pretraining-corpus filters (C4/Gopher/RefinedWeb-style) ----------

# Portable regexes (Java regex + RE2-safe: no lookarounds/backrefs).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
URL_RE = "https?://[A-Za-z0-9.-]+(/[A-Za-z0-9./_-]*)?"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"


def redact_pii(col: str = "text") -> Column:
    """PII scrub: emails and IPv4 literals replaced by sentinel tokens —
    the standard pretraining redaction pass.  Two JVM regexp_replace
    calls, per-row, zero shuffle; patterns shared with the oracle SQL
    (DuckDB needs the 'g' flag for replace-all; Spark replaces all by
    default)."""
    scrubbed = F.regexp_replace(F.col(col), EMAIL_RE, EMAIL_TOKEN)
    return F.regexp_replace(scrubbed, IPV4_RE, IP_TOKEN)


def repetition_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """Gopher-style repetition/shape signals per document:

    - ``dup_token_frac``: 1 - distinct/total tokens (boilerplate and
      looped generations score high);
    - ``mean_token_len``: symbol soup and CJK-as-bytes score far from
      prose's ~4-6;
    - ``symbol_ratio``: non-alphanumeric, non-space chars / all chars.

    All per-row higher-order functions over ONE materialized token
    array (no re-splitting per metric — SNIPPETS HOF pitfall)."""
    toks = tokens(col)
    out = df.withColumn("_toks", toks)
    n = F.size("_toks")
    dup = F.when(
        n > 0,
        F.lit(1.0) - F.size(F.array_distinct("_toks")).cast("double") / n,
    ).otherwise(F.lit(0.0))
    mean_len = F.when(
        n > 0,
        F.aggregate(
            F.col("_toks"), F.lit(0.0), lambda acc, t: acc + F.length(t)
        )
        / n,
    ).otherwise(F.lit(0.0))
    stripped = F.regexp_replace(F.col(col), "[A-Za-z0-9\\s]", "")
    sym = F.when(
        F.length(col) > 0,
        F.length(stripped).cast("double") / F.length(col),
    ).otherwise(F.lit(0.0))
    return out.select(
        *df.columns,
        F.round(dup, 4).alias("dup_token_frac"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(sym, 4).alias("symbol_ratio"),
    )


def url_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """URL extraction per document: count + distinct lowercased domains
    (the dedup key for per-domain corpus budgets).  regexp_extract_all
    + transform — JVM-side, zero shuffle."""
    urls = F.expr(f"regexp_extract_all({col}, '{URL_RE}', 0)")  # no
    # backslashes in URL_RE, so no SQL-literal re-escaping needed
    domains = F.array_distinct(
        F.transform(
            urls,
            lambda u: F.lower(
                F.regexp_replace(u, "^https?://([^/]+).*$", "$1")
            ),
        )
    )
    return df.select(
        *df.columns,
        F.size(urls).cast("long").alias("n_urls"),
        F.size(domains).cast("long").alias("n_domains"),
        F.array_min(domains).alias("first_domain"),
    )


def contamination_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Benchmark-contamination detection: corpus documents sharing ANY
    word k-gram with a benchmark/eval document (the decontamination
    pass every training corpus needs).  Returns the distinct
    contaminated corpus ids.

    Scale: the benchmark side is tiny (eval sets are thousands of
    docs) — its distinct shingle set broadcasts, so the corpus-side
    semi join is map-side: zero shuffle of corpus shingles, one
    aggregation for the distinct output ids."""
    def shingled(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col(id_col), tokens(text_col).alias("_toks"))
            .filter(F.size("_toks") >= k)
            .select(
                id_col,
                F.explode(word_shingles("_toks", k)).alias("shingle"),
            )
        )

    bench_sh = shingled(benchmark).select("shingle").distinct()
    return (
        shingled(corpus)
        .join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select(id_col)
        .distinct()
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

    A row survives iff ``sample_bucket(id) < rate(stratum)``.
    Deterministic (reruns and retried tasks keep identical rows — no
    ``rand()`` nondeterminism under task retry), map-only (the
    when-chain is a per-row JVM expression; zero shuffles, filter
    reaches the scan), and exactly reproducible in ANSI SQL for the
    oracle.  Ids must be nonnegative (true for all fixture and
    lakehouse surrogate keys; `%` is not pmod on negatives).
    """
    bucket = sample_bucket(F.col(id_col))
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


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    ndigits: int = 4,
) -> DataFrame:
    """Okapi BM25 relevance of every document to a fixed query-term set
    — the retrieval scorer a curation pipeline uses for query-targeted
    subset selection (select-by-relevance-to-a-topic), beyond-reference
    §2.8 extension surface next to TF-IDF.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·dl/avgdl))
    with the Lucene/ES non-negative idf ln(1 + (N − df + 0.5)/(df + 0.5)).

    Scale shape: tokenization and per-term tf are JVM expressions over
    each doc's own token array (no explode, no per-term shuffle); the
    corpus stats — N, Σdl (exact integer sum, so avgdl is the same
    double on every engine and partition order), and per-term document
    frequencies — reduce to ONE map-side-combined aggregate broadcast
    back as a 1-row frame.  Scoring is map-only: the whole operator is
    one tiny agg + one broadcast crossJoin regardless of corpus size.
    Rendering: floor-scale truncation (engine-parity rule)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    for t in query_terms:
        if not t.isalnum():
            raise ValueError(f"query term {t!r} must be alphanumeric")
    base = df.select(
        id_col, tokens(text_col).alias("_toks")
    ).withColumn("_dl", F.size("_toks").cast("long"))
    aggs = [
        F.count("*").cast("double").alias("_n"),
        F.sum("_dl").cast("double").alias("_sumdl"),
    ]
    for i, t in enumerate(query_terms):
        aggs.append(
            F.sum(F.array_contains("_toks", t).cast("long"))
            .cast("double")
            .alias(f"_df{i}")
        )
    stats = base.agg(*aggs)
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for i, t in enumerate(query_terms):
        tf = F.expr(f"cast(size(filter(_toks, x -> x = '{t}')) as double)")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5))
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b)
            + F.lit(b) * (F.col("_dl").cast("double") * F.col("_n") / F.col("_sumdl"))
        )
        term = idf * tf * F.lit(k1 + 1.0) / denom
        score = term if score is None else score + term
    scale = float(10**ndigits)
    return scored.select(
        id_col,
        (F.floor(score * F.lit(scale)) / F.lit(scale)).alias("bm25"),
    )


def unigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ndigits: int = 6,
) -> DataFrame:
    """Per-document mean token surprisal -mean ln p(token) against the
    CORPUS unigram distribution — the LM-based quality signal (the
    CCNet/KenLM shape at unigram order): low = templated/common-token
    text, high = rare-token soup; curation pipelines cut both tails.
    Docs with zero tokens have no distribution to score and are absent
    from the output.

    Determinism contract: per-TYPE surprisals are truncated to 1e-9
    integer units once (in the vocabulary frame), and each doc sums
    those LONGS — an order-free exact sum, so the result is identical
    under any partitioning and any engine (the scaled-integer
    discipline the Lloyd trainer and streaming EWMA use).

    Scale shape: explode -> token-count agg (map-side combined) ->
    1-row total broadcast onto the vocabulary -> token-key equi-join
    back to the exploded stream -> per-doc agg.  The vocabulary frame
    stays DISTRIBUTED (token-hash partitioned join, no broadcast
    assumption — web-scale vocabularies don't fit an executor)."""
    toks = df.select(id_col, F.explode(tokens(text_col)).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count("*").cast("long").alias("cnt"))
    tot = freq.agg(F.sum("cnt").cast("double").alias("tt"))
    s = freq.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.floor(
            -F.log(F.col("cnt").cast("double") / F.col("tt")) * F.lit(1e9)
        )
        .cast("long")
        .alias("s9"),
    )
    scale = float(10**ndigits)
    return (
        toks.join(s, "tok")
        .groupBy(id_col)
        .agg(
            (
                F.floor(
                    (F.sum("s9").cast("double") / F.lit(1e9))
                    / F.count("*").cast("double")
                    * F.lit(scale)
                )
                / F.lit(scale)
            ).alias("surprisal")
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 3,
) -> DataFrame:
    """Collocation mining: adjacent-bigram PMI over the corpus — the
    phrase-detection pass (word2vec-style phrase merging, stopword-pair
    screening) a training-data pipeline runs before tokenizer training.

    PMI(w1, w2) = ln( p(w1 w2) / (p(w1) p(w2)) ) with p from corpus
    counts: bigram mass M = all adjacent pairs, unigram mass N = all
    tokens.  Output per surviving pair (count >= ``min_count``): the
    exact integer counts plus ``pmi_e6`` = floor(PMI * 1e6) — the
    ln is evaluated once per pair on exact-integer-derived doubles in
    a fixed expression shape (the surprisal/PageRank floor-scale
    recipe), so the rendering is engine-stable.

    Scale shape: two explode->groupBy counting passes (map-side
    partial combine — stopword pairs merge before they shuffle), corpus
    masses broadcast as 1-row frames, then two equi-joins of the
    bigram table against the unigram table on the token key (AQE
    broadcasts the unigram side when the vocabulary fits).  Nothing is
    ever per-document quadratic; ``min_count`` prunes the long tail
    before the joins."""
    toks = F.expr(
        f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')"
    )
    t = df.select(toks.alias("t"))
    bigrams = t.select(
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, greatest(size(t) - 1, 0)), "
                "slice(t, 2, greatest(size(t) - 1, 0)), "
                "(a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    pair_counts = bigrams.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("n_pair")
    )
    uni = (
        t.select(F.explode(F.col("t")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("n_w"))
    )
    m_tot = pair_counts.agg(
        F.sum("n_pair").cast("double").alias("m")
    )
    n_tot = uni.agg(F.sum("n_w").cast("double").alias("n"))
    return (
        pair_counts.where(F.col("n_pair") >= min_count)
        .join(
            uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1")),
            "w1",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2")),
            "w2",
        )
        .crossJoin(F.broadcast(m_tot))
        .crossJoin(F.broadcast(n_tot))
        .select(
            "w1",
            "w2",
            "n_pair",
            "n_w1",
            "n_w2",
            F.floor(
                F.log(
                    (F.col("n_pair").cast("double") / F.col("m"))
                    / (
                        (F.col("n_w1").cast("double") / F.col("n"))
                        * (F.col("n_w2").cast("double") / F.col("n"))
                    )
                )
                * F.lit(1e6)
            )
            .cast("long")
            .alias("pmi_e6"),
        )
    )


def pmi_collocations_sql(
    docs_filter: str = "TRUE", min_count: int = 3
) -> str:
    """DuckDB twin of ``pmi_collocations`` — identical tokenization,
    counting, and ln expression shape."""
    toks = (
        "list_filter(string_split_regex(lower(text), '\\s+'), "
        "x -> x <> '')"
    )
    return f"""
    WITH tl AS (
      SELECT {toks} AS t FROM documents WHERE {docs_filter}
    ),
    bg AS (
      SELECT p[1] AS w1, p[2] AS w2
      FROM (SELECT unnest(list_zip(t[1:-2], t[2:])) AS p FROM tl)
    ),
    pair_counts AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
      FROM bg GROUP BY 1, 2
    ),
    uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n_w
      FROM (SELECT unnest(t) AS w FROM tl) GROUP BY 1
    ),
    mt AS (SELECT CAST(sum(n_pair) AS DOUBLE) AS m FROM pair_counts),
    nt AS (SELECT CAST(sum(n_w) AS DOUBLE) AS n FROM uni)
    SELECT p.w1, p.w2, p.n_pair, u1.n_w AS n_w1, u2.n_w AS n_w2,
           CAST(floor(
             ln((CAST(p.n_pair AS DOUBLE) / m)
                / ((CAST(u1.n_w AS DOUBLE) / n)
                   * (CAST(u2.n_w AS DOUBLE) / n))) * 1000000.0
           ) AS BIGINT) AS pmi_e6
    FROM pair_counts p
    JOIN uni u1 ON p.w1 = u1.w
    JOIN uni u2 ON p.w2 = u2.w
    CROSS JOIN mt CROSS JOIN nt
    WHERE p.n_pair >= {min_count}
    """


def doc_lexical_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document lexical-diversity signals a curation pipeline cuts
    on: type-token ratio (templated/repetitive text scores low) and
    character-distribution Shannon entropy (natural log; base64 blobs
    and key-mash score high, natural prose sits in a narrow band).

    Determinism discipline (the surprisal/PMI recipe, taken further —
    NO float column leaves this operator):

    - ``ttr_e6``: floor(n_types * 10^6 / n_tokens) via pure integer
      division — exact on any engine;
    - ``char_entropy_e9``: each character's -p ln p term is truncated
      ONCE to 1e-9 integer units from exact integer counts, and the
      per-doc result is a LONG sum of those terms — order-free exact.

    Scale shape: token stats are per-row array expressions (map-only);
    the entropy pass explodes characters into a (doc, char) count agg
    whose shuffle is bounded by alphabet size per doc (map-side
    combine), then one per-doc agg — two exchanges total, both keyed
    on doc_id so AQE coalesces them."""
    toks = tokens(text_col)
    base = df.select(
        id_col,
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_types"),
    ).where(F.col("n_tokens") > 0)
    # codepoint-safe character split: split(text, '') yields UTF-16
    # code units (an astral char becomes two surrogates) while the
    # DuckDB twin's string_split(text, '') yields codepoints — Java
    # regex '.' matches one CODE POINT, so regexp_extract_all keeps
    # both engines' entropy terms identical on non-BMP text (ADVICE r05)
    chars = (
        df.select(
            id_col,
            F.explode(
                F.expr(f"regexp_extract_all({text_col}, '(?s).', 0)")
            ).alias("ch"),
        )
        .groupBy(id_col, "ch")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    tot = chars.groupBy(id_col).agg(F.sum("cnt").cast("long").alias("n_ch"))
    ent = (
        chars.join(tot, id_col)
        .select(
            id_col,
            F.floor(
                -F.log(F.col("cnt").cast("double") / F.col("n_ch"))
                * (F.col("cnt").cast("double") / F.col("n_ch"))
                * F.lit(1e9)
            )
            .cast("long")
            .alias("e9"),
        )
        .groupBy(id_col)
        .agg(F.sum("e9").cast("long").alias("char_entropy_e9"))
    )
    return base.join(ent, id_col).select(
        id_col,
        "n_tokens",
        F.expr("n_types * 1000000 div n_tokens").alias("ttr_e6"),
        "char_entropy_e9",
    )


def doc_lexical_stats_sql(table: str = "documents") -> str:
    """DuckDB twin of ``doc_lexical_stats`` — identical tokenization,
    integer division, and per-character floor-scaled entropy terms."""
    toks = (
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
    )
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(len({toks}) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct({toks})) AS BIGINT) AS n_types
  FROM {table}
  WHERE len({toks}) > 0
),
chars AS (
  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM {table})
  GROUP BY 1, 2
),
tot AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_ch FROM chars GROUP BY 1
),
ent AS (
  SELECT c.doc_id,
         CAST(sum(CAST(floor(
           -ln(CAST(cnt AS DOUBLE) / n_ch)
           * (CAST(cnt AS DOUBLE) / n_ch) * 1e9) AS BIGINT)) AS BIGINT)
           AS char_entropy_e9
  FROM chars c JOIN tot t ON c.doc_id = t.doc_id
  GROUP BY 1
)
SELECT b.doc_id, b.n_tokens,
       CAST(b.n_types * 1000000 // b.n_tokens AS BIGINT) AS ttr_e6,
       e.char_entropy_e9
FROM base b JOIN ent e ON b.doc_id = e.doc_id
"""


def bigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.9,
    ndigits: int = 6,
) -> DataFrame:
    """Per-document mean ADJACENT-BIGRAM surprisal against an
    interpolated corpus LM — the order-2 upgrade of
    ``unigram_surprisal`` (the CCNet/KenLM quality-scoring shape one
    order up): p(w2 | w1) = lam * n(w1 w2) / n(w1 ·) + (1 - lam) *
    n(w2) / N, with n(w1 ·) the corpus bigram-prefix mass of w1 (so
    the conditional is a true distribution over observed successors)
    and the unigram term the backoff for rare continuations.  Docs
    with fewer than 2 tokens have no bigram to score and are absent.

    Determinism contract (the surprisal/PMI recipe): each distinct
    PAIR's -ln p is computed once from exact integer counts in a fixed
    expression shape and truncated to 1e-9 integer units; per-doc sums
    are LONG sums of those units — order-free exact, so Spark and the
    DuckDB twin agree bit-for-bit at any scale/partitioning.

    Scale shape: two explode->count passes (map-side combined), corpus
    mass broadcast as a 1-row frame, pair-table joins on token keys
    (AQE broadcasts when they fit), then one equi-join of the doc
    bigram stream against the scored pair table and a per-doc agg."""
    toks = tokens(text_col)
    t = df.select(id_col, toks.alias("t"))
    bigrams = t.select(
        id_col,
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, greatest(size(t) - 1, 0)), "
                "slice(t, 2, greatest(size(t) - 1, 0)), "
                "(a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("bg"),
    ).select(id_col, "bg.w1", "bg.w2")
    pair = bigrams.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("n_pair")
    )
    prefix = pair.groupBy("w1").agg(
        F.sum("n_pair").cast("long").alias("n_prefix")
    )
    uni = t.select(F.explode(F.col("t")).alias("w")).groupBy("w").agg(
        F.count("*").cast("long").alias("n_w")
    )
    n_tot = uni.agg(F.sum("n_w").cast("double").alias("nn"))
    scored = (
        pair.join(prefix, "w1")
        .join(uni.select(F.col("w").alias("w2"), "n_w"), "w2")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "w1",
            "w2",
            F.floor(
                -F.log(
                    F.lit(lam)
                    * (F.col("n_pair").cast("double") / F.col("n_prefix"))
                    + F.lit(1.0 - lam)
                    * (F.col("n_w").cast("double") / F.col("nn"))
                )
                * F.lit(1e9)
            )
            .cast("long")
            .alias("s9"),
        )
    )
    scale = float(10**ndigits)
    return (
        bigrams.join(scored, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            (
                F.floor(
                    (F.sum("s9").cast("double") / F.lit(1e9))
                    / F.count("*").cast("double")
                    * F.lit(scale)
                )
                / F.lit(scale)
            ).alias("bigram_surprisal")
        )
    )


def bigram_surprisal_sql(
    table: str = "documents", lam: float = 0.9, ndigits: int = 6
) -> str:
    """DuckDB twin of ``bigram_surprisal`` — identical tokenization,
    counting, interpolation literals, and floor-scale shapes."""
    toks = (
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
    )
    scale = float(10**ndigits)
    return f"""
WITH t AS (SELECT doc_id, {toks} AS t FROM {table}),
bg AS (
  SELECT doc_id, p[1] AS w1, p[2] AS w2
  FROM (SELECT doc_id, unnest(list_zip(t[1:-2], t[2:])) AS p FROM t)
),
pair AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair FROM bg GROUP BY 1, 2
),
prefix AS (
  SELECT w1, CAST(sum(n_pair) AS BIGINT) AS n_prefix FROM pair GROUP BY 1
),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n_w
  FROM (SELECT unnest(t) AS w FROM t) GROUP BY 1
),
nt AS (SELECT CAST(sum(n_w) AS DOUBLE) AS nn FROM uni),
scored AS (
  SELECT p.w1, p.w2,
         CAST(floor(-ln(
             {lam!r} * (CAST(p.n_pair AS DOUBLE) / f.n_prefix)
             + {1.0 - lam!r} * (CAST(u.n_w AS DOUBLE) / nt.nn)
         ) * 1e9) AS BIGINT) AS s9
  FROM pair p
  JOIN prefix f ON p.w1 = f.w1
  JOIN uni u ON p.w2 = u.w
  CROSS JOIN nt
)
SELECT b.doc_id,
       floor((CAST(sum(s.s9) AS DOUBLE) / 1e9)
             / CAST(count(*) AS DOUBLE) * {scale!r}) / {scale!r}
         AS bigram_surprisal
FROM bg b JOIN scored s ON b.w1 = s.w1 AND b.w2 = s.w2
GROUP BY 1
"""
