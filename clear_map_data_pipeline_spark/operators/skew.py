"""Skew-handling utilities — the pre-hoc tools for hot keys.

AQE's skew-join splitting (enabled in session.py) is the runtime
defense, but it only helps sort-merge joins and only after a stage
materializes.  These operators handle the cases AQE can't:

- ``salted_join``: spread a hot join key over ``salt`` sub-keys by
  salting the big side and replicating the small side once per salt
  value.  Output is row-identical to the plain join for every key;
  the hot key's rows land on ``salt`` reducers instead of one.
- ``salted_distinct_count``: exact per-key COUNT(DISTINCT v) in two
  stages — (key, hash(v) % salt) partial distinct, then sum — so a key
  with millions of distinct values never assembles them in one task.
- ``salted_topk_per_group``: exact top-k per key in two window stages —
  per-(key, salt) local top-k, then global top-k over the <= k*salt
  survivors — so a hot key's rows never sort in one task.

All are pure compositions of built-in expressions (no UDF, no RDD).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``key`` with salt-spreading.

    The big side gets a per-row salt in [0, salt); the small side is
    replicated once per salt value (explode of a literal array — NOT a
    shuffle; it multiplies the small side only).  Joining on
    (key, salt) then yields exactly the plain join's rows while fanning
    each key across ``salt`` partitions.

    The salt uses xxhash64 over the whole row (via struct(*)), so it is
    cheap, deterministic per row content, and uniform.  Use when one key
    dominates (power-law ids, null-ish sentinel keys) and the join feeds
    same-key downstream work that AQE's post-hoc split can't fix."""
    big_salted = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in big.columns])), F.lit(salt)),
    )
    replicas = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_salted.join(replicas, [key, "_salt"], how).drop("_salt")


def salted_topk_per_group(
    df: DataFrame,
    key: str,
    order_by: list,
    k: int,
    salt: int = 16,
) -> DataFrame:
    """Exact top-k rows per ``key`` (ordered by ``order_by`` Columns,
    which must be a deterministic total order — include an id
    tie-break), skew-safe.

    The plain formulation — one ``row_number() OVER (PARTITION BY
    key)`` — funnels EVERY row of a key through one task; a hot key
    (power-law domain, sentinel id) stalls the stage.  Here stage 1
    computes a local top-k within (key, salt-bucket): each bucket
    holds ~1/salt of the hot key's rows, and any row outside its
    bucket's top-k cannot be in the key's global top-k (the global
    top-k's members each rank <= k within their own bucket).  Stage 2
    re-ranks the <= k*salt survivors per key — a bounded set, so the
    second window is safe no matter how hot the key was.

    Salt comes from xxhash64 over the whole row: deterministic under
    retry, uniform, no ``rand()``."""
    from pyspark.sql import Window

    salted = df.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.struct(*[F.col(c) for c in df.columns])),
            F.lit(salt),
        ),
    )
    w_local = Window.partitionBy(key, "_salt").orderBy(*order_by)
    survivors = (
        salted.withColumn("_rn", F.row_number().over(w_local))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w_global = Window.partitionBy(key).orderBy(*order_by)
    return (
        survivors.withColumn("_rn", F.row_number().over(w_global))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def salted_distinct_count(
    df: DataFrame, key: str, value: str, salt: int = 16, out: str = "n_distinct"
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, skew-safe.

    Stage 1 groups by (key, hash(value) % salt) and counts distinct
    within each bucket — map-side combinable, and a hot key's distinct
    set is split across ``salt`` tasks.  Stage 2 sums the bucket counts:
    exact because the hash bucketing partitions the value space, so no
    value is counted in two buckets."""
    bucketed = df.withColumn(
        "_vsalt", F.pmod(F.xxhash64(F.col(value)), F.lit(salt))
    )
    partial = bucketed.groupBy(key, "_vsalt").agg(
        F.countDistinct(value).alias("_nd")
    )
    return partial.groupBy(key).agg(F.sum("_nd").cast("long").alias(out))
