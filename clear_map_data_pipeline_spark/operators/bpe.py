"""Distributed BPE tokenizer training — the merge-learning pass that
follows the counting pass (``operators/text.py: vocabulary``).

Classic byte-pair-encoding training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — public
algorithm): start from characters, repeatedly merge the most frequent
adjacent symbol pair, weighted by word frequency.  The determinism
contract makes the merge sequence engine- and partitioning-exact:
counts are exact longs and ties break lexicographically on
(first, second), so two runs (or a literal single-process replay)
produce the IDENTICAL merge list.

Scale design — the property that makes this trainable on a 100 TB
corpus: after the ONE corpus-wide counting pass, every round operates
on the DISTINCT-WORD table (|vocab| rows, each carrying its corpus
count), never the corpus itself.  Per round: one explode over adjacent
pairs of each word's CURRENT symbol array (map-side combined groupBy
pair), one 1-row top-pair pick (TakeOrderedAndProject — no global
sort), and one Arrow-batched ``mapInPandas`` rewrite of the symbol
arrays (the merge is per-word local).  Web-scale vocabularies are
millions of rows where the corpus is trillions — the iteration cost is
independent of corpus size.  The word table is re-pinned per round and
``localCheckpoint`` truncates the growing lineage every few merges
(the connected-components discipline, operators/graph.py).

Verification: tests replay the exact algorithm single-process in pure
Python on the same word counts and assert the merge sequences and
final segmentations are IDENTICAL; a repartition-invariance test pins
the order-freeness claim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

END_MARK = "</w>"  # end-of-word sentinel, per the public BPE recipe
_CHECKPOINT_EVERY = 6


def word_counts(df: DataFrame, col: str = "text") -> DataFrame:
    """The one corpus-wide pass: distinct whitespace words with exact
    corpus counts — everything after this is vocab-bounded."""
    return (
        df.select(F.explode(tokens(col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(word, cnt, syms): characters plus the end-of-word sentinel."""
    return words.select(
        "word",
        "cnt",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END_MARK))
        ).alias("syms"),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the current symbol arrays, weighted by
    word count — map-side combined, vocab-bounded."""
    pairs = syms.select(
        "cnt",
        F.explode(
            F.expr(
                "zip_with(slice(syms, 1, greatest(size(syms) - 1, 0)), "
                "slice(syms, 2, greatest(size(syms) - 1, 0)), "
                "(a, b) -> struct(a AS first, b AS second))"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.first", "p.second").agg(
        F.sum("cnt").alias("n")
    )


def _merge_pair_in_words(syms: DataFrame, first: str, second: str) -> DataFrame:
    """Replace every adjacent (first, second) occurrence with the
    merged symbol — Arrow-batched, per-word local, left-to-right
    non-overlapping exactly like the reference algorithm."""
    import pandas as pd  # noqa: PLC0415 - executor-side

    merged = first + second

    def run(batches):
        for pdf in batches:
            out = []
            for s in pdf["syms"]:
                s = list(s)
                res = []
                i = 0
                n = len(s)
                while i < n:
                    if i + 1 < n and s[i] == first and s[i + 1] == second:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                out.append(res)
            yield pd.DataFrame(
                {"word": pdf["word"], "cnt": pdf["cnt"], "syms": out}
            )

    return syms.mapInPandas(run, schema="word string, cnt long, syms array<string>")


def train_bpe(
    df: DataFrame,
    n_merges: int,
    col: str = "text",
    min_pair_count: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges from a corpus.

    Returns (merges, final_words): ``merges`` is the ordered list of
    (first, second, count) — THE tokenizer artifact — and
    ``final_words`` the word table with post-merge segmentations
    (word, cnt, syms).  Training stops early when no pair reaches
    ``min_pair_count``.

    Driver-side loop, one round per merge: the merge decision is a
    1-row collect (the only driver data movement); everything else
    stays distributed and vocab-bounded."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    from ..cachereg import pin

    words = pin(_initial_symbols(word_counts(df, col)))
    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.col("n").desc(), F.col("first"), F.col("second"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_count:
            break
        first, second, n = top[0]["first"], top[0]["second"], top[0]["n"]
        merges.append((first, second, int(n)))
        nxt = _merge_pair_in_words(words, first, second)
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            nxt = nxt.localCheckpoint(eager=True)
        prev = words
        words = pin(nxt)
        # materialize the new round eagerly, then drop the previous
        # round's cache — storage stays O(1) in rounds, not O(n_merges)
        words.count()
        prev.unpersist()
    return merges, words


def bpe_segment(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Apply a learned merge list to one word (driver-side reference
    implementation, also the test replay oracle's application step)."""
    syms = list(word) + [END_MARK]
    for first, second, _n in merges:
        res = []
        i = 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and syms[i] == first
                and syms[i + 1] == second
            ):
                res.append(first + second)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return syms
