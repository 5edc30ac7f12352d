"""Similarity-search queries over the embeddings table: brute-force
cosine (exact baseline) and random-hyperplane LSH (the scale path).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import similarity as sim
from ..registry import register
from ..session import Tables

DIM = 64

_DOT_AB = (
    "list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))"
)
_NORM = "sqrt(list_sum(list_transform(range(1, 65), i -> {v}.e[i] * {v}.e[i])))"
_COS = f"round({_DOT_AB} / ({_NORM.format(v='a')} * {_NORM.format(v='b')}), 4)"

_V_CTE = """
v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings)"""


@register(
    "sim_cosine_threshold_pairs",
    sql=f"""
    WITH {_V_CTE}
    SELECT a.vec_id AS va, b.vec_id AS vb, {_COS} AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE {_COS} >= 0.35
    """,
)
def sim_cosine_threshold_pairs(spark, sf_dir):
    """Brute-force all-pairs cosine >= 0.35 — the exact-recall baseline.
    Threshold compared on the 4-decimal rounded value so engine and
    oracle agree at the boundary."""
    t = Tables(spark, sf_dir)
    return sim.cosine_pairs(t.embeddings, threshold=0.35)


@register(
    "sim_cosine_topk",
    sql=f"""
    WITH {_V_CTE},
    q AS (SELECT * FROM v WHERE vec_id % 100 = 0),
    scored AS (
      SELECT a.vec_id AS va, b.vec_id AS vb, {_COS} AS cos_sim
      FROM q a JOIN v b ON a.vec_id <> b.vec_id
    )
    SELECT va, vb, cos_sim, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY va
                    ORDER BY cos_sim DESC, vb) AS rn FROM scored)
    WHERE rn <= 5
    """,
)
def sim_cosine_topk(spark, sf_dir):
    """Top-5 nearest neighbours (cosine) for each query vector
    (vec_id % 100 == 0); query side broadcast, rank on the rounded score
    with deterministic id tie-break."""
    t = Tables(spark, sf_dir)
    queries = t.embeddings.filter(F.col("vec_id") % 100 == 0)
    return sim.cosine_topk(t.embeddings, queries, k=5)


def _ann_sql() -> str:
    terms = []
    for j in range(8):
        plane = sim.hyperplane(j, DIM)
        lit = "[" + ", ".join(f"CAST({s} AS DOUBLE)" for s in plane) + "]"
        d = f"list_sum(list_transform(range(1, 65), i -> e[i] * ({lit})[i]))"
        terms.append(f"CASE WHEN ({d}) > 0 THEN {1 << j} ELSE 0 END")
    bucket = " + ".join(terms)
    return f"""
    WITH {_V_CTE},
    vb AS (SELECT vec_id, e, CAST({bucket} AS BIGINT) AS bucket FROM v)
    SELECT a.vec_id AS va, b.vec_id AS vb, {_COS} AS cos_sim
    FROM vb a JOIN vb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_COS} >= 0.2
    """


@register("sim_ann_lsh_pairs", sql=_ann_sql())
def sim_ann_lsh_pairs(spark, sf_dir):
    """Approximate NN pairs: random-hyperplane LSH bucketing (8 planes,
    deterministic md5-derived signs), exact cosine only within buckets.
    ~2^8 candidate reduction; the 100 TB path."""
    t = Tables(spark, sf_dir)
    return sim.ann_lsh_pairs(t.embeddings, DIM, threshold=0.2)
