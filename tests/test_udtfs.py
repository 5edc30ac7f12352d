"""Sentence-segmentation UDTF: the Spark 4 lateral-join surface, with
the splitting logic pinned by pure-Python cases and the distributed
path pinned against the shared reference on the fixture corpus."""

from __future__ import annotations

import pytest

from clear_map_data_pipeline_spark.functions.udtfs import (
    register_sentences_udtf,
    split_sentences,
)


@pytest.mark.parametrize(
    "text,want",
    [
        ("One. Two. Three.", ["One.", "Two.", "Three."]),
        ("Dr. Smith went home. He slept.",
         ["Dr. Smith went home.", "He slept."]),
        ("J. R. Tolkien wrote much. Then rested.",
         ["J. R. Tolkien wrote much.", "Then rested."]),
        ("Really?! Yes. ", ["Really?!", "Yes."]),
        ("no terminator at all", ["no terminator at all"]),
        ("", []),
        ("E.g. this stays together. Next one.",
         ["E.g. this stays together.", "Next one."]),
    ],
)
def test_split_sentences_cases(text, want):
    assert [s for _i, _a, _b, s in split_sentences(text)] == want


def test_split_sentences_offsets_cover_text():
    text = "Alpha beta. Gamma delta! Epsilon."
    spans = split_sentences(text)
    for idx, start, end, sent in spans:
        assert text[start:end].strip() == sent
    assert [i for i, *_ in spans] == list(range(len(spans)))


def test_udtf_lateral_join_matches_reference(spark, sf_dir):
    from clear_map_data_pipeline_spark.session import Tables

    register_sentences_udtf(spark)
    docs = Tables(spark, sf_dir).documents
    docs.createOrReplaceTempView("_udtf_docs")
    got = {
        (r["doc_id"], r["sentence_idx"]): r["sentence"]
        for r in spark.sql(
            "SELECT d.doc_id, s.* FROM _udtf_docs d, "
            "LATERAL sentences_of(d.text) s"
        ).collect()
    }
    want = {}
    for r in docs.select("doc_id", "text").collect():
        for idx, _a, _b, sent in split_sentences(r["text"]):
            want[(r["doc_id"], idx)] = sent
    assert got == want and len(got) > 0
