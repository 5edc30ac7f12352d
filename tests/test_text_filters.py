"""Unit tests for the pretraining-corpus filter operators
(operators/text.py: redact_pii, repetition_stats, url_stats,
contamination_ids)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_redact_pii_scrubs_emails_and_ips(spark):
    from clear_map_data_pipeline_spark.operators.text import redact_pii

    df = _docs(spark, [
        (1, "mail me at jane.doe+x@sub.example.co.uk or 192.168.1.254 ok"),
        (2, "no pii here, just 3.14 and v2.0"),
    ])
    got = {r["doc_id"]: r["red"] for r in df.select(
        "doc_id", redact_pii("text").alias("red")).collect()}
    assert got[1] == "mail me at <EMAIL> or <IP> ok"
    # version strings / decimals are NOT 4-octet IPs — untouched
    assert got[2] == "no pii here, just 3.14 and v2.0"


def test_repetition_stats_values(spark):
    from clear_map_data_pipeline_spark.operators.text import repetition_stats

    df = _docs(spark, [
        (1, "spam spam spam spam"),     # 4 tokens, 1 distinct
        (2, "all fresh words here!!"),  # no repeats, 2 symbols / 22 chars
        (3, ""),
    ])
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["dup_token_frac"] == 0.75
    assert got[1]["mean_token_len"] == 4.0
    assert got[2]["dup_token_frac"] == 0.0
    assert got[2]["symbol_ratio"] == round(2 / 22, 4)
    assert got[3]["dup_token_frac"] == 0.0 and got[3]["symbol_ratio"] == 0.0


def test_url_stats_extracts_and_dedups_domains(spark):
    from clear_map_data_pipeline_spark.operators.text import url_stats

    df = _docs(spark, [
        (1, "see https://A.example.org/x and http://a.example.org plus "
            "https://other.net/p_q"),
        (2, "no links"),
    ])
    got = {r["doc_id"]: r for r in url_stats(df).collect()}
    assert got[1]["n_urls"] == 3
    assert got[1]["n_domains"] == 2  # case-insensitive dedup
    assert got[1]["first_domain"] == "a.example.org"
    assert got[2]["n_urls"] == 0 and got[2]["first_domain"] is None


def test_vocabulary_counts_and_plan(spark):
    import contextlib
    import io

    from clear_map_data_pipeline_spark.operators.text import vocabulary

    df = _docs(
        spark,
        [
            (1, "a b a c"),
            (2, "a b B"),  # lowercased: b twice here
            (3, "zz"),
        ],
    )
    rows = [(r["token"], r["n"]) for r in vocabulary(df, top_n=3).collect()]
    assert rows == [("a", 3), ("b", 3), ("c", 1)]  # count desc, token tiebreak
    # the top-n must plan as TakeOrdered, not a global sort exchange
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        vocabulary(df, top_n=3).explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_contamination_ids_shingle_overlap(spark):
    from clear_map_data_pipeline_spark.operators.text import (
        contamination_ids,
    )

    corpus = _docs(spark, [
        (1, "the quick brown fox jumps over"),   # shares 3-gram w/ bench
        (2, "completely unrelated document text"),
        (3, "quick brown fox appears here too"),  # shares 'quick brown fox'
        (4, "short"),                             # < k tokens
    ])
    bench = _docs(spark, [(100, "watch the quick brown fox run")])
    got = sorted(r["doc_id"] for r in contamination_ids(corpus, bench).collect())
    assert got == [1, 3]


def test_linear_classifier_scores(spark):
    from clear_map_data_pipeline_spark.operators.text import (
        classifier_weights,
        linear_quality_score,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.clf_score for r in linear_quality_score(df).collect()}
    # empty/whitespace docs score exactly sigmoid(bias)=0.5, no NULL/NaN
    assert out[2] == 0.5 and out[3] == 0.5
    assert 0.0 < out[1] < 1.0
    # deterministic weights: same call, same vector
    assert classifier_weights(8) == classifier_weights(8)
    assert all(-1.0 <= w < 1.0 for w in classifier_weights(64))


def test_pmi_collocations_hand_computed(spark):
    """Tiny corpus with a planted collocation: counts and the
    floor-scaled ln score recomputed literally."""
    import math

    from clear_map_data_pipeline_spark.operators.text import (
        pmi_collocations,
    )

    docs = [
        (1, "new york is big new york is old"),
        (2, "big new york"),
        (3, "x"),      # single token: no bigrams
        (4, ""),       # empty: no tokens at all
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {
        (r["w1"], r["w2"]): r
        for r in pmi_collocations(df, min_count=2).collect()
    }
    # bigram masses: doc1 has 7, doc2 has 2 -> M = 9; tokens N = 12
    # pairs with count >= 2: (new, york) x3, (york, is) x2, (big, new) x2
    assert set(rows) == {("new", "york"), ("york", "is"), ("big", "new")}
    bn = rows[("big", "new")]
    assert (bn["n_pair"], bn["n_w1"], bn["n_w2"]) == (2, 2, 3)
    want = math.floor(math.log((2 / 9) / ((2 / 12) * (3 / 12))) * 1e6)
    assert bn["pmi_e6"] == want
    ny = rows[("new", "york")]
    assert (ny["n_pair"], ny["n_w1"], ny["n_w2"]) == (3, 3, 3)
    want = math.floor(math.log((3 / 9) / ((3 / 12) * (3 / 12))) * 1e6)
    assert ny["pmi_e6"] == want
    yi = rows[("york", "is")]
    assert (yi["n_pair"], yi["n_w1"], yi["n_w2"]) == (2, 3, 2)
    want = math.floor(math.log((2 / 9) / ((3 / 12) * (2 / 12))) * 1e6)
    assert yi["pmi_e6"] == want


def test_doc_lexical_stats_hand_computed(spark):
    """TTR + char entropy on a hand-computable doc: 'a a b' has 3
    tokens / 2 types (ttr_e6 = 666666 by integer floor division) and
    char distribution {a:2, ' ':2, b:1} over 5 chars whose entropy
    terms are floor-scaled per character exactly as the operator
    defines them; empty docs are absent."""
    import math

    from clear_map_data_pipeline_spark.operators.text import (
        doc_lexical_stats,
    )

    df = spark.createDataFrame(
        [(1, "a a b"), (2, ""), (3, "xyz")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in doc_lexical_stats(df).collect()}
    assert 2 not in rows  # zero tokens -> absent
    r1 = rows[1]
    assert r1["n_tokens"] == 3
    assert r1["ttr_e6"] == 666666
    want = 2 * math.floor(-math.log(2 / 5) * (2 / 5) * 1e9) + math.floor(
        -math.log(1 / 5) * (1 / 5) * 1e9
    )
    assert r1["char_entropy_e9"] == want
    # all-distinct doc: ttr exactly 1, uniform 1/3 entropy terms
    r3 = rows[3]
    assert r3["ttr_e6"] == 1000000
    assert r3["char_entropy_e9"] == 3 * math.floor(
        -math.log(1 / 3) * (1 / 3) * 1e9
    )


def test_bigram_surprisal_matches_python_replay(spark):
    """The interpolated-bigram score on a hand-checkable corpus must
    equal a pure-Python replay of the exact formula (same counts, same
    interpolation literals, same floor-scale truncations), and
    templated repetition must score LESS SURPRISING than a rare
    continuation."""
    import math

    from clear_map_data_pipeline_spark.operators.text import (
        bigram_surprisal,
    )

    corpus = [
        (1, "a b a b a b"),
        (2, "a b a c"),
        (3, "x"),          # < 2 tokens: absent from output
        (4, "c a b b"),
    ]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["bigram_surprisal"]
        for r in bigram_surprisal(df).collect()
    }
    assert 3 not in got

    # python replay
    docs = {i: t.split() for i, t in corpus}
    pair, prefix, uni, n_tot = {}, {}, {}, 0
    for t in docs.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
            n_tot += 1
        for a, b in zip(t, t[1:]):
            pair[(a, b)] = pair.get((a, b), 0) + 1
            prefix[a] = prefix.get(a, 0) + 1
    lam = 0.9
    s9 = {
        k: math.floor(
            -math.log(
                lam * (c / prefix[k[0]]) + (1 - lam) * (uni[k[1]] / n_tot)
            )
            * 1e9
        )
        for k, c in pair.items()
    }
    for i, t in docs.items():
        bgs = list(zip(t, t[1:]))
        if not bgs:
            continue
        want = math.floor(
            (sum(s9[b] for b in bgs) / 1e9) / len(bgs) * 1e6
        ) / 1e6
        assert got[i] == want, (i, got[i], want)
    # doc 1 is pure template (a b)^3; doc 2 ends in the rare 'a c'
    assert got[1] < got[2]
