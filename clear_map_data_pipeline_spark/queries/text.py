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
from .suites import SubQuery, register_suite

# --- DuckDB expression fragments mirroring operators/text.py ----------

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"


def _duck_stop_ratio(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in tx.STOPWORDS[lang])
    return (
        f"CASE WHEN len({_TOKS}) > 0 THEN"
        f" CAST(len(list_filter({_TOKS}, x -> list_contains([{words}], x))) AS DOUBLE)"
        f" / len({_TOKS}) ELSE 0.0 END"
    )


_TOKEN_STATS_SQL = f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '{tx.BPE_ISH_PATTERN}', 0)) AS BIGINT)
             AS n_bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_calc
    FROM documents
    """


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


# The composite-quality expression as DuckDB SQL — shared by the
# standalone query below and the corpus-curation pipeline's oracle
# (queries/curation.py) so the two cannot drift.
QUALITY_SQL_EXPR = (
    f"round(least(CAST(len({_TOKS}) AS DOUBLE) / 100, 1.0) * 0.4"
    f" + (1.0 - {_PUNCT_RATIO}) * 0.3"
    f" + least({_duck_stop_ratio('en')} * 5, 1.0) * 0.3, 3)"
)


def tx_quality_score(spark, sf_dir):
    """Composite quality score: content length, punctuation density,
    natural-language-ness — the classic pretraining quality filter."""
    t = Tables(spark, sf_dir)
    return tx.quality_score(t.documents).select("doc_id", "quality")


CLF_DIM = 64


def tx_linear_classifier(spark, sf_dir):
    """Hashed linear quality classifier (fastText-shape): md5-bucketed
    token features dotted with literal weights, sigmoid-squashed — pure
    per-row JVM expression, zero shuffles (see operators/text.py:
    linear_quality_score)."""
    t = Tables(spark, sf_dir)
    return tx.linear_quality_score(t.documents, dim=CLF_DIM).select(
        "doc_id", "clf_score"
    )


def _linear_clf_sql() -> str:
    w = tx.classifier_weights(CLF_DIM)
    wlist = "[" + ", ".join(str(x) for x in w) + "]"
    d1 = "(instr('0123456789abcdef', substr(md5(x), 1, 1)) - 1)"
    d2 = "(instr('0123456789abcdef', substr(md5(x), 2, 1)) - 1)"
    bucket = f"(({d1} * 16 + {d2}) % {CLF_DIM})"
    mean = (
        f"list_sum(list_transform({_TOKS}, x -> ({wlist})[{bucket} + 1]))"
        f" / len({_TOKS})"
    )
    return f"""
    SELECT doc_id,
           CASE WHEN len({_TOKS}) > 0
                THEN round(1.0 / (1.0 + exp(-(0.0 + {mean}))), 4)
                ELSE round(1.0 / (1.0 + exp(-0.0)), 4) END AS clf_score
    FROM documents
    """


def tx_quality_percentile_filter(spark, sf_dir):
    """Percentile-CALIBRATED quality filter: keep documents at or above
    the corpus's own 25th-percentile quality score — the data-driven
    cutoff real curation pipelines use instead of a magic constant.
    One 1-row exact-percentile aggregate broadcasts onto the scored
    scan; the percentile interpolation is the same ``1+(n-1)*q`` form
    a13 already proves cross-engine (Spark ``percentile`` == DuckDB
    ``quantile_cont``), and both sides round to 3 so the boundary
    cannot flip."""
    t = Tables(spark, sf_dir)
    scores = tx.quality_score(t.documents).select("doc_id", "quality")
    cut = scores.agg(
        F.round(F.percentile("quality", 0.25), 3).alias("cutoff")
    )
    return (
        scores.crossJoin(F.broadcast(cut))
        .filter(F.col("quality") >= F.col("cutoff"))
        .select("doc_id", "quality", "cutoff")
    )


_QUALITY_PCTL_SQL = f"""
    WITH s AS (SELECT doc_id, {QUALITY_SQL_EXPR} AS quality FROM documents),
    c AS (SELECT round(quantile_cont(quality, 0.25), 3) AS cutoff FROM s)
    SELECT doc_id, quality, cutoff FROM s CROSS JOIN c
    WHERE quality >= cutoff
    """


BM25_TERMS = ["query", "stream", "window", "sort"]
BM25_K1, BM25_B = 1.2, 0.75


def tx_bm25(spark, sf_dir):
    """Okapi BM25 relevance of every document to a fixed query-term set
    (Lucene-style non-negative idf) — retrieval-targeted curation
    scoring; map-only after one broadcast stats aggregate (see
    operators/text.py: bm25_scores)."""
    t = Tables(spark, sf_dir)
    return tx.bm25_scores(t.documents, BM25_TERMS, k1=BM25_K1, b=BM25_B)


def _bm25_sql() -> str:
    """Mirror of bm25_scores: identical literal constants and float op
    association order, floor-scale truncated at 4."""
    dfs = ", ".join(
        "CAST(sum(CASE WHEN list_contains(toks, '%s') THEN 1 ELSE 0 END) "
        "AS DOUBLE) AS df%d" % (t, i)
        for i, t in enumerate(BM25_TERMS)
    )
    terms = []
    for i, t in enumerate(BM25_TERMS):
        tf = f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE)"
        idf = f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
        denom = (
            f"({tf} + {BM25_K1} * ({1.0 - BM25_B!r} + {BM25_B} * "
            f"(CAST(dl AS DOUBLE) * n / sumdl)))"
        )
        terms.append(f"{idf} * {tf} * {BM25_K1 + 1.0!r} / {denom}")
    score = " + ".join(terms)
    return f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS toks,
                         len({_TOKS}) AS dl FROM documents),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                     CAST(sum(dl) AS DOUBLE) AS sumdl, {dfs} FROM base)
    SELECT doc_id, floor(({score}) * 10000.0) / 10000.0 AS bm25
    FROM base CROSS JOIN stats
    """


def tx_sentences_udtf(spark, sf_dir):
    """Sentence-segmentation UDTF via a SQL lateral join (r08,
    tests-only -> hash-checked; the last extension row without an
    oracle).  The fixture documents carry zero sentence terminators
    (judge-verified 0/500 docs with [.!?]), so the query SYNTHESIZES
    three-sentence text per doc — 'Alpha {id}. Beta {lang}! Gamma {k}'
    — identically visible to both engines, then runs the real
    lateral-join UDTF (functions/udtfs.py: SentencesOf).  Exercises
    mixed terminators, tail-without-terminator emission, and character
    offsets; abbreviation/initial handling stays pinned in
    tests/test_udtfs.py (the synthesized text is abbreviation-free by
    construction).  The oracle computes the expected spans from the
    fragment lengths in pure SQL."""
    from ..functions.udtfs import register_sentences_udtf

    register_sentences_udtf(spark)  # useArrow pinned inside
    Tables(spark, sf_dir).documents.createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id,
               s.sentence_idx AS sent_idx,
               s.start AS sent_start,
               s.`end` AS sent_end,
               s.sentence
        FROM (SELECT doc_id,
                     concat('Alpha ', CAST(doc_id AS STRING), '. ',
                            'Beta ', lang, '! ',
                            'Gamma ', CAST(n_chars % 7 AS STRING))
                       AS text
              FROM _docs_udtf) d,
        LATERAL sentences_of(d.text) s
        """
    )


_SENTENCES_SQL = """
WITH d AS (
  SELECT doc_id,
         'Alpha ' || CAST(doc_id AS VARCHAR) || '.' AS a,
         'Beta ' || lang || '!' AS b,
         'Gamma ' || CAST(n_chars % 7 AS VARCHAR) AS c
  FROM documents
)
SELECT doc_id, 0 AS sent_idx, 0 AS sent_start,
       length(a) AS sent_end, a AS sentence FROM d
UNION ALL
SELECT doc_id, 1, length(a) + 1, length(a) + 1 + length(b), b FROM d
UNION ALL
SELECT doc_id, 2, length(a) + length(b) + 2,
       length(a) + length(b) + 2 + length(c), c FROM d
"""
_SENTENCES_SPEC = [
    ("doc_id", "s"), ("sent_idx", "s"), ("sent_start", "s"),
    ("sent_end", "s"), ("sentence", "s"),
]


# Folded into one registry slot (driver's 50-entry CORRECTNESS window) —
# all full result sets still hash-check inside the suite union.
register_suite(
    "suite_text_quality",
    [
        SubQuery(
            "tx_sentences_udtf",
            tx_sentences_udtf,
            _SENTENCES_SQL,
            _SENTENCES_SPEC,
        ),
        SubQuery(
            "tx_lang_id",
            tx_lang_id,
            _lang_id_sql(),
            [("doc_id", "s"), ("lang_pred", "s")],
        ),
        SubQuery(
            "tx_quality_score",
            tx_quality_score,
            f"SELECT doc_id, {QUALITY_SQL_EXPR} AS quality FROM documents",
            [("doc_id", "s"), ("quality", "d3")],
        ),
        SubQuery(
            "tx_linear_classifier",
            tx_linear_classifier,
            _linear_clf_sql(),
            [("doc_id", "s"), ("clf_score", "d4")],
        ),
        SubQuery(
            "tx_quality_percentile_filter",
            tx_quality_percentile_filter,
            _QUALITY_PCTL_SQL,
            [("doc_id", "s"), ("quality", "d3"), ("cutoff", "d3")],
        ),
        SubQuery(
            "tx_bm25",
            tx_bm25,
            _bm25_sql(),
            [("doc_id", "s"), ("bm25", "d4")],
        ),
    ],
    doc="Text-quality suite: stopword-argmax language ID + composite "
    "heuristic quality scoring + hashed linear classifier scoring "
    "(fastText shape, literal weights) + the percentile-calibrated "
    "quality filter (data-driven cutoff) + Okapi-BM25 retrieval "
    "scoring against a fixed query (r04), each oracle-checked "
    "row-for-row inside the union.",
)


_FINGERPRINT_SQL = """
    SELECT doc_id,
           list_min(list_transform(
             CASE WHEN length(text) >= 8
                  THEN list_transform(range(1, length(text) - 6),
                                      i -> substr(text, i, 8))
                  ELSE [] END,
             s -> md5(s))) AS fp
    FROM documents
    """


def tx_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint: min-md5 over char 8-grams."""
    t = Tables(spark, sf_dir)
    return tx.fingerprint(t.documents).select("doc_id", "fp")


VOCAB_TOP_N = 100


def tx_vocabulary(spark, sf_dir):
    """Corpus vocabulary: top-N tokens by count (token tie-break) —
    explode + map-side-partial count + TakeOrdered, never a global
    sort (see operators/text.py: vocabulary)."""
    t = Tables(spark, sf_dir)
    return tx.vocabulary(t.documents, top_n=VOCAB_TOP_N)


_VOCAB_SQL = f"""
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest({_TOKS}) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT {VOCAB_TOP_N}
    """


TFIDF_TOP_N = 3


def tx_tfidf_topterms(spark, sf_dir):
    """Per-doc top-3 terms by TF-IDF (tf * ln(N/df), rounded before
    ranking; token asc tie-break) — see operators/text.py:
    tfidf_top_terms for the scale shape."""
    t = Tables(spark, sf_dir)
    return tx.tfidf_top_terms(t.documents, top_n=TFIDF_TOP_N)


_TFIDF_SQL = f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS _n FROM documents),
    scored AS (
      SELECT doc_id, token, round(tf * ln(_n / df), 4) AS tfidf
      FROM tf JOIN dfreq USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tfidf, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY tfidf DESC, token) AS rn FROM scored)
    WHERE rn <= {TFIDF_TOP_N}
    """


def tx_unigram_surprisal(spark, sf_dir):
    """Per-doc mean token surprisal vs the corpus unigram distribution
    (LM-quality signal; order-free scaled-integer sums — see
    operators/text.py: unigram_surprisal)."""
    t = Tables(spark, sf_dir)
    return tx.unigram_surprisal(t.documents)


_SURPRISAL_SQL = f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
             FROM toks GROUP BY tok),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tt FROM freq),
    s AS (SELECT tok, CAST(floor(-ln(CAST(cnt AS DOUBLE) / tt)
                    * 1000000000.0) AS BIGINT) AS s9
          FROM freq CROSS JOIN tot)
    SELECT doc_id,
           floor((CAST(sum(s9) AS DOUBLE) / 1000000000.0)
                 / CAST(count(*) AS DOUBLE) * 1000000.0)
             / 1000000.0 AS surprisal
    FROM toks JOIN s USING (tok)
    GROUP BY doc_id
    """


def tx_pmi_collocations(spark, sf_dir):
    """Collocation mining (r05): adjacent-bigram PMI over the corpus —
    word2vec-style phrase detection.  Two map-side-combined counting
    passes, broadcast corpus masses, unigram-table equi-joins; exact
    integer counts beside the floor-scaled ln score (operators/text.py:
    pmi_collocations)."""
    t = Tables(spark, sf_dir)
    return tx.pmi_collocations(t.documents, min_count=5)


def _pmi_sql() -> str:
    return tx.pmi_collocations_sql(min_count=5)


def tx_lexical_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc type-token ratio + character-entropy curation signals —
    every output column an exact integer (scaled-integer discipline;
    see operators/text.py: doc_lexical_stats)."""
    t = Tables(spark, sf_dir)
    return tx.doc_lexical_stats(t.documents)


_LEXICAL_SQL = tx.doc_lexical_stats_sql("documents")


def tx_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-2 LM quality score: per-doc mean adjacent-bigram surprisal
    against the interpolated corpus bigram model (see operators/text.py:
    bigram_surprisal)."""
    t = Tables(spark, sf_dir)
    return tx.bigram_surprisal(t.documents)


_BIGRAM_SURPRISAL_SQL = tx.bigram_surprisal_sql("documents")


# BPE apply (r07, tests-only -> hash-checked): a FIXED public-style
# merge list — the oracle checks the operator's APPLY path (vocab-
# bounded mapInPandas over distinct words + order-preserving
# reassembly), not training, so the list is a constant shared by both
# engines.  Includes symbol-chained merges (t+h, th+e) and END_MARK
# merges to exercise multi-round composition.
APPLY_MERGES = [
    ("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"), ("i", "n"),
    ("in", "g"), ("ing", "</w>"), ("e", "</w>"), ("d", "</w>"),
    ("s", "</w>"), ("e", "r"), ("er", "</w>"), ("o", "r"), ("o", "n"),
]


def tx_bpe_apply(spark, sf_dir):
    """Distributed BPE tokenization (apply half): segment every
    document with the fixed APPLY_MERGES list via operators/bpe.py:
    bpe_apply — the merge loop runs once per DISTINCT word (Arrow-
    batched), documents reassemble by position join.  Subwords render
    space-joined so the driver hash covers the full segmentation, not
    just counts."""
    from ..operators.bpe import bpe_apply

    t = Tables(spark, sf_dir)
    out = bpe_apply(t.documents, [(a, b, 0) for a, b in APPLY_MERGES])
    return out.select(
        "doc_id", "n_tokens", "n_subwords",
        F.array_join("subwords", " ").alias("subwords"),
    )


def _bpe_apply_sql() -> str:
    """DuckDB twin of the one-scan-per-merge BPE segmenter via the
    DOUBLE-SEPARATOR chained-replace encoding: a word renders as
    SS sym SS sym SS (S = chr(31), never in the corpus), each merge is
    ONE replace of 'S first SS second S' -> 'S firstsecond S' —
    consuming a single S from each boundary keeps the invariant, so
    leftmost-nonoverlapping replace is EXACTLY the operator's
    left-to-right scan (verified on 3k adversarial words incl. aaaa
    chains before registration).  Segmentation runs once per DISTINCT
    word, mirroring the operator's vocab-bounded shape."""
    s1 = "chr(31)"
    s2 = f"repeat(chr(31), 2)"
    expr = (
        f"{s2} || array_to_string(list_concat("
        f"list_transform(range(1, length(word) + 1), i -> word[i]), "
        f"['</w>']), {s2}) || {s2}"
    )
    for first, second in APPLY_MERGES:
        pat = f"{s1} || '{first}' || {s2} || '{second}' || {s1}"
        rep = f"{s1} || '{first}{second}' || {s1}"
        expr = f"replace({expr}, {pat}, {rep})"
    return f"""
    WITH d AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    dw AS (
      SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
             i -> struct_pack(pos := i, word := toks[i]))) AS pw
      FROM d
    ),
    dw2 AS (SELECT doc_id, pw.pos AS pos, pw.word AS word FROM dw),
    words AS (SELECT DISTINCT word FROM dw2),
    segl AS (
      SELECT word,
             list_filter(string_split({expr}, chr(31)), x -> x <> '')
               AS subs
      FROM words
    ),
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(len(subs)) AS BIGINT) AS n_subwords,
             array_to_string(flatten(list(subs ORDER BY pos)), ' ')
               AS subwords
      FROM dw2 JOIN segl USING (word) GROUP BY doc_id
    )
    SELECT doc_id,
           coalesce(n_tokens, 0) AS n_tokens,
           coalesce(n_subwords, 0) AS n_subwords,
           coalesce(subwords, '') AS subwords
    FROM (SELECT doc_id FROM documents) dd LEFT JOIN per_doc USING (doc_id)
    """


# Folded into one registry slot (driver's 50-entry CORRECTNESS window) —
# all full result sets still hash-check inside the suite union.
register_suite(
    "suite_token_fingerprint",
    [
        SubQuery(
            "tx_token_stats",
            tx_token_stats,
            _TOKEN_STATS_SQL,
            [("doc_id", "s"), ("n_tokens", "s"), ("n_bpe_tokens", "s"),
             ("n_chars_calc", "s")],
        ),
        SubQuery(
            "tx_fingerprint",
            tx_fingerprint,
            _FINGERPRINT_SQL,
            [("doc_id", "s"), ("fp", "s")],
        ),
        SubQuery(
            "tx_vocabulary",
            tx_vocabulary,
            _VOCAB_SQL,
            [("token", "s"), ("n", "s")],
        ),
        SubQuery(
            "tx_tfidf_topterms",
            tx_tfidf_topterms,
            _TFIDF_SQL,
            [("doc_id", "s"), ("token", "s"), ("tfidf", "d4"), ("rank", "s")],
        ),
        SubQuery(
            "tx_unigram_surprisal",
            tx_unigram_surprisal,
            _SURPRISAL_SQL,
            [("doc_id", "s"), ("surprisal", "d6")],
        ),
        SubQuery(
            "tx_bigram_surprisal",
            tx_bigram_surprisal,
            _BIGRAM_SURPRISAL_SQL,
            [("doc_id", "s"), ("bigram_surprisal", "d6")],
        ),
        SubQuery(
            "tx_lexical_stats",
            tx_lexical_stats,
            _LEXICAL_SQL,
            [("doc_id", "s"), ("n_tokens", "s"), ("ttr_e6", "s"),
             ("char_entropy_e9", "s")],
        ),
        SubQuery(
            "tx_pmi_collocations",
            tx_pmi_collocations,
            _pmi_sql(),
            [("w1", "s"), ("w2", "s"), ("n_pair", "s"),
             ("n_w1", "s"), ("n_w2", "s"), ("pmi_e6", "s")],
        ),
        SubQuery(
            "tx_bpe_apply",
            tx_bpe_apply,
            _bpe_apply_sql(),
            [("doc_id", "s"), ("n_tokens", "s"), ("n_subwords", "s"),
             ("subwords", "s")],
        ),
    ],
    doc="Token-accounting suite: whitespace/BPE-ish token counts + "
    "rolling-hash document fingerprints + top-N corpus vocabulary + "
    "per-doc TF-IDF top terms + unigram-LM mean surprisal (r04) + "
    "adjacent-bigram PMI collocations + interpolated-bigram LM "
    "surprisal + TTR/char-entropy lexical "
    "diversity (r05) + full BPE-apply segmentation over a fixed merge "
    "list (r07, double-separator chained-replace oracle), each "
    "oracle-checked row-for-row inside the union.",
)


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


# --- corpus-filter suite (C4/Gopher/RefinedWeb-style passes) ----------
# The fixtures' documents are clean, so each sub-query deterministically
# injects the artifact it scrubs/detects (PII strings, URLs, a shared
# contamination snippet) — the same construction f3 uses for '<15'.

_PII_DIRTY = """
SELECT doc_id, text || ' contact user' || doc_id
       || '@example.com from 10.0.0.' || (doc_id % 256) AS text
FROM documents
"""

_PII_SQL = f"""
SELECT doc_id,
       md5(regexp_replace(regexp_replace(text,
           '{tx.EMAIL_RE}', '{tx.EMAIL_TOKEN}', 'g'),
           '{tx.IPV4_RE}', '{tx.IP_TOKEN}', 'g')) AS redacted_md5
FROM ({_PII_DIRTY})
"""


def tx2_redact_pii(spark, sf_dir):
    """PII redaction: emails + IPv4 -> sentinel tokens (md5 of the
    scrubbed text keeps the payload compact)."""
    t = Tables(spark, sf_dir)
    dirty = t.documents.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id"),
            F.lit("@example.com from 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
        ).alias("text"),
    )
    return dirty.select(
        "doc_id", F.md5(tx.redact_pii("text")).alias("redacted_md5")
    )


_REP_SQL = f"""
SELECT doc_id,
       CASE WHEN len(t) > 0
            THEN round(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 4)
            ELSE 0.0 END AS dup_token_frac,
       CASE WHEN len(t) > 0
            THEN round(list_sum(list_transform(t, x -> length(x)))
                       / CAST(len(t) AS DOUBLE), 4)
            ELSE 0.0 END AS mean_token_len,
       CASE WHEN length(text) > 0
            THEN round(CAST(length(regexp_replace(text,
                 '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text), 4)
            ELSE 0.0 END AS symbol_ratio
FROM (SELECT doc_id, text, {_TOKS} AS t FROM documents)
"""


def tx2_repetition(spark, sf_dir):
    """Gopher-style repetition/shape stats: duplicate-token fraction,
    mean token length, symbol ratio."""
    t = Tables(spark, sf_dir)
    return tx.repetition_stats(t.documents).select(
        "doc_id", "dup_token_frac", "mean_token_len", "symbol_ratio"
    )


_URL_DIRTY = """
SELECT doc_id, text || ' see https://Site' || (doc_id % 50)
       || '.example.org/page and http://mirror' || (doc_id % 7)
       || '.example.net' AS text
FROM documents
"""

_URL_SQL = f"""
SELECT doc_id, CAST(len(urls) AS BIGINT) AS n_urls,
       CAST(len(doms) AS BIGINT) AS n_domains,
       list_min(doms) AS first_domain
FROM (
  SELECT doc_id, urls,
         list_distinct(list_transform(urls,
           u -> lower(regexp_replace(u, '^https?://([^/]+).*$', '\\1')))) AS doms
  FROM (SELECT doc_id, regexp_extract_all(text, '{tx.URL_RE}', 0) AS urls
        FROM ({_URL_DIRTY}))
)
"""


def tx2_url_stats(spark, sf_dir):
    """URL extraction + per-domain stats (the key for per-domain corpus
    budgets)."""
    t = Tables(spark, sf_dir)
    dirty = t.documents.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://Site"), (F.col("doc_id") % 50),
            F.lit(".example.org/page and http://mirror"),
            (F.col("doc_id") % 7), F.lit(".example.net"),
        ).alias("text"),
    )
    return tx.url_stats(dirty).select(
        "doc_id", "n_urls", "n_domains", "first_domain"
    )


_CONTAM_SNIPPET = "alpha beta gamma delta"

_CONTAM_SQL = f"""
WITH dirty AS (
  SELECT doc_id, CASE WHEN doc_id % 5 = 0
                      THEN text || ' {_CONTAM_SNIPPET}' ELSE text END AS text
  FROM documents
),
tok AS (SELECT doc_id, {_TOKS} AS t FROM dirty),
sh AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
  FROM tok WHERE len(t) >= 3
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
SELECT DISTINCT doc_id FROM sh
WHERE doc_id % 97 <> 0 AND shingle IN (SELECT shingle FROM bench)
"""


def tx2_contamination(spark, sf_dir):
    """Benchmark-contamination detection: corpus docs sharing any
    3-word shingle with the benchmark split (doc_id % 97 == 0); the
    benchmark shingle set is broadcast (decontamination at 100 TB is a
    map-side semi join)."""
    t = Tables(spark, sf_dir)
    dirty = t.documents.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(f" {_CONTAM_SNIPPET}")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    corpus = dirty.filter(F.col("doc_id") % 97 != 0)
    benchmark = dirty.filter(F.col("doc_id") % 97 == 0)
    return tx.contamination_ids(corpus, benchmark, k=3)


register_suite(
    "suite_text_filters",
    [
        SubQuery("tx2_redact_pii", tx2_redact_pii, _PII_SQL,
                 [("doc_id", "s"), ("redacted_md5", "s")]),
        SubQuery("tx2_repetition", tx2_repetition, _REP_SQL,
                 [("doc_id", "s"), ("dup_token_frac", "d4"),
                  ("mean_token_len", "d4"), ("symbol_ratio", "d4")]),
        SubQuery("tx2_url_stats", tx2_url_stats, _URL_SQL,
                 [("doc_id", "s"), ("n_urls", "s"), ("n_domains", "s"),
                  ("first_domain", "s")]),
        SubQuery("tx2_contamination", tx2_contamination, _CONTAM_SQL,
                 [("doc_id", "s")]),
    ],
    doc="""Folded pretraining-corpus filter suite: PII redaction,
    Gopher-style repetition stats, URL/domain extraction, and
    benchmark-contamination detection — each hash-checked row-by-row
    against its DuckDB twin inside the suite union.""",
)
