"""Python UDTFs — the Spark 4 table-function extensibility surface
(SURVEY §2.10 notes the reference has none; this is the engine's
supported escape hatch for row-expanding user logic, the lateral-join
sibling of the ``applyInPandas`` grouped escape hatch).

The engine's philosophy stands: hot paths are built-in expressions
(the token-window chunker in operators/assembly.py is zero-UDF).  A
UDTF earns its place where the expansion logic is genuinely
imperative — here, sentence segmentation with abbreviation handling,
which regex-split expressions get wrong.

Usage::

    from clear_map_data_pipeline_spark.functions.udtfs import (
        register_sentences_udtf,
    )
    register_sentences_udtf(spark)
    spark.sql(
        "SELECT d.doc_id, s.* FROM documents d, "
        "LATERAL sentences_of(d.text) s"
    )
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

#: terminators that do NOT end a sentence when they follow these
_ABBREVIATIONS = {
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "vs", "etc",
    "e.g", "i.e", "fig", "no", "vol", "dept", "inc", "ltd", "co",
}

_BOUNDARY = re.compile(r"([.!?]+)(\s+|$)")


def split_sentences(text: str) -> list[tuple[int, int, int, str]]:
    """(sentence_idx, start, end, sentence) spans over ``text`` —
    pure-Python reference shared by the UDTF and its tests.  A
    terminator run ends a sentence unless the preceding token is a
    known abbreviation or a single capital initial ('J.')."""
    spans = []
    start = 0
    for m in _BOUNDARY.finditer(text):
        end = m.end(1)
        prev = text[start : m.start(1)].rstrip()
        last_word = prev.rsplit(None, 1)[-1].lower() if prev else ""
        last_word = last_word.lstrip("(\"'")
        if m.group(1) == "." and (
            last_word in _ABBREVIATIONS
            or (len(last_word) == 1 and last_word.isalpha())
        ):
            continue  # abbreviation / initial: not a boundary
        sent = text[start:end].strip()
        if sent:
            spans.append((len(spans), start, end, sent))
        start = m.end()
    tail = text[start:].strip()
    if tail:
        spans.append((len(spans), start, len(text), tail))
    return spans


class SentencesOf:
    """Row-expanding sentence segmentation: one output row per
    sentence of the input text, with character offsets."""

    def eval(self, text: str):  # noqa: D102 - UDTF contract
        if text is None:
            return
        for row in split_sentences(text):
            yield row


def register_sentences_udtf(spark, name: str = "sentences_of") -> None:
    """Register the UDTF for SQL lateral joins under ``name``.

    The udtf() wrapper is built HERE, not as a module-level decorator,
    with ``useArrow=True`` pinned: PySpark resolves the Arrow-vs-
    pickled eval mode at WRAPPER-CREATION time (``_create_py_udtf``
    reads the conf once, against whatever session happens to exist),
    so a module-level decorator imported before the session is
    configured — e.g. at pytest collection — bakes in the
    row-at-a-time BatchEvalPythonUDTF path forever (r08: the
    registry-wide plan lint caught exactly this under full-suite
    ordering).  Explicit useArrow sidesteps the ambient-conf read;
    PySpark still falls back gracefully if pyarrow is absent."""
    spark.udtf.register(
        name,
        udtf(
            SentencesOf,
            returnType="sentence_idx int, start int, end int, "
            "sentence string",
            useArrow=True,
        ),
    )
