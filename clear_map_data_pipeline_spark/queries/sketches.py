"""Sketch suite: deterministic HyperLogLog distinct counts and a
Bloom-prefiltered join — one registry slot, both sub-queries fully
oracle-checked.

The HLL oracle reproduces the registers themselves (shared hash31
scramble + exact power-of-two register sums), so the hash match
certifies sketch construction.  The Bloom sub-query's oracle is the
PLAIN join: the prefilter is a pure pruning optimization whose result
must be bit-identical to not having it — which is exactly what the
hash check proves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketches as sk
from ..operators import text as tx
from ..session import Tables
from .suites import SubQuery, register_suite

# --- HLL over the lineitem key columns --------------------------------

# Same columns as the sibling KMV sketch (queries/olap.py) so the two
# estimators' errors are directly comparable in one fixture:
# l_suppkey's ~100 distincts land every register in the high-rank
# regime; l_orderkey/l_partkey exercise the dense-register regime.
HLL_COLS = ["l_orderkey", "l_partkey", "l_suppkey"]


def sk_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL(64 registers) distinct estimates for three lineitem keys,
    next to exact counts and exact-integer register evidence — all
    three sketches (and the exact counts) from ONE lineitem scan."""
    t = Tables(spark, sf_dir)
    return sk.hll_distinct_many(t.lineitem, HLL_COLS)


_HLL_SQL = "\nUNION ALL\n".join(
    sk.hll_distinct_sql("lineitem", c) for c in HLL_COLS
)


# --- Bloom-prefiltered join -------------------------------------------

BLOOM_REGION = "EUROPE"


def sk_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority for customers of one region, computed
    as Bloom-prefilter -> exact semi-join -> aggregate.

    The build side is region ⋈ nation ⋈ customer (all broadcast-sized
    dims); its custkeys feed an 8 KiB Bloom bitset that is broadcast
    onto orders, so ~4/5 of the fact rows die map-side before the join
    shuffle.  The exact LEFT SEMI join then removes Bloom false
    positives, which is why the oracle can be the plain 4-table join:
    the prefilter must not change a single row.  Revenue sums through
    DECIMAL(18,6) (exact addition — order-independent), then rounds.

    At 100 TB: the dims broadcast, the fingerprint broadcasts, and the
    only shuffle is the post-prune aggregate — the fact table is read
    once and never exchanged at full width."""
    t = Tables(spark, sf_dir)
    region_nations = t.nation.join(
        F.broadcast(t.region.filter(F.col("r_name") == BLOOM_REGION)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    custkeys = t.customer.join(
        F.broadcast(region_nations),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey")
    bloom = sk.bloom_build(custkeys, "c_custkey")
    pruned = sk.bloom_prefilter(t.orders, "o_custkey", bloom)
    survivors = pruned.join(
        F.broadcast(custkeys),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_semi",
    )
    return survivors.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2
        )
        .cast("double")
        .alias("revenue"),
    )


_BLOOM_SQL = f"""
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{BLOOM_REGION}'
GROUP BY 1
"""


# --- One-scan table profile -------------------------------------------

# 'lang_nn' plants real NULLs (the majority class nulled out) so the
# profile's null-accounting path is driver-hash-checked, not just
# unit-tested; documents itself ships null-free.
_PROFILE_INT = ["doc_id", "n_chars"]
_PROFILE_STR = ["text", "lang", "source", "lang_nn"]
_PROFILE_VIEW = "(SELECT *, nullif(lang, 'en') AS lang_nn FROM documents)"


def sk_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile of documents in ONE scan: rows, nulls,
    exact distincts, HLL estimate, numeric min/max (see
    operators/sketches.py: profile_table)."""
    t = Tables(spark, sf_dir)
    docs = t.documents.withColumn(
        "lang_nn", F.expr("nullif(lang, 'en')")
    )
    return sk.profile_table(docs, _PROFILE_INT, _PROFILE_STR)


_PROFILE_SQL = sk.profile_table_sql(_PROFILE_VIEW, _PROFILE_INT, _PROFILE_STR)


def sk_hll_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HLL distinct users — the mergeable-sketch GROUP BY
    (sketch state shuffles <= 64 rows per group per map partition where
    exact countDistinct shuffles every key; see operators/sketches.py:
    hll_distinct_by_group)."""
    t = Tables(spark, sf_dir)
    return sk.hll_distinct_by_group(t.events, "event_type", "user_id")


_HLL_GROUP_SQL = sk.hll_distinct_by_group_sql(
    "events", "event_type", "user_id"
)


# --- Misra-Gries exact heavy hitters ----------------------------------

# phi = 1/30 sits just above the fixture's near-uniform token share
# (31-token vocabulary, ~3.2% each), so only genuinely-frequent tokens
# clear it — a dozen-odd rows at every sf, never empty, never "all".
_HH_PHI_DENOM = 30
_HH_TOKS_VIEW = (
    "(SELECT unnest(list_filter(string_split_regex(lower(text), "
    "'\\s+'), x -> x <> '')) AS token FROM documents)"
)


def sk_heavy_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phi-heavy-hitter tokens (phi = 1/30) over documents.text:
    per-partition Misra-Gries candidates (bounded state, <= capacity
    rows shuffled per partition regardless of vocabulary) + a
    broadcast-semi-join exact verify pass.  The oracle is the plain
    GROUP BY/HAVING over the full token stream — the hash match IS the
    Misra-Gries coverage guarantee under test (see
    operators/sketches.py: heavy_hitters)."""
    t = Tables(spark, sf_dir)
    toks = t.documents.select(F.explode(tx.tokens("text")).alias("token"))
    return sk.heavy_hitters(toks, "token", phi_denom=_HH_PHI_DENOM)


_HH_SQL = sk.heavy_hitters_sql(_HH_TOKS_VIEW, "token", _HH_PHI_DENOM)


# --- HLL cross-corpus overlap ------------------------------------------

_OV_LEFT = "(SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')"
_OV_RIGHT = "(SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')"


def sk_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer overlap between the URGENT and LOW order snapshots by
    HLL register algebra: two one-scan sketches, a 128-row MAX merge,
    inclusion-exclusion — the pre-dedup planning signal (see
    operators/sketches.py: hll_overlap)."""
    t = Tables(spark, sf_dir)
    left = t.orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    right = t.orders.where(F.col("o_orderpriority") == "5-LOW").select(
        "o_custkey"
    )
    return sk.hll_overlap(left, right, "o_custkey")


_OV_SQL = sk.hll_overlap_sql(_OV_LEFT, _OV_RIGHT, "o_custkey")


register_suite(
    "suite_sketches",
    [
        SubQuery(
            "sk_hll_distinct",
            sk_hll_distinct,
            _HLL_SQL,
            [
                ("key_col", "s"),
                ("n_exact", "s"),
                ("hll_est", "d2"),
                ("n_buckets", "s"),
                ("sum_rho", "s"),
            ],
        ),
        SubQuery(
            "sk_bloom_pruned_join",
            sk_bloom_pruned_join,
            _BLOOM_SQL,
            [("o_orderpriority", "s"), ("n_orders", "s"), ("revenue", "d2")],
        ),
        SubQuery(
            "sk_hll_users_by_type",
            sk_hll_users_by_type,
            _HLL_GROUP_SQL,
            [
                ("event_type", "s"),
                ("n_exact", "s"),
                ("hll_est", "d2"),
                ("n_buckets", "s"),
                ("sum_rho", "s"),
            ],
        ),
        SubQuery(
            "sk_heavy_tokens",
            sk_heavy_tokens,
            _HH_SQL,
            [("token", "s"), ("freq", "s"), ("n_total", "s")],
        ),
        SubQuery(
            "sk_hll_overlap",
            sk_hll_overlap,
            _OV_SQL,
            [
                ("est_left", "d2"), ("est_right", "d2"),
                ("est_union", "d2"), ("est_overlap", "d2"),
                ("nb_left", "s"), ("sr_left", "s"),
                ("nb_right", "s"), ("sr_right", "s"),
                ("nb_union", "s"), ("sr_union", "s"),
            ],
        ),
        SubQuery(
            "sk_profile_documents",
            sk_profile_documents,
            _PROFILE_SQL,
            [
                ("col_name", "s"),
                ("n_rows", "s"),
                ("n_nulls", "s"),
                ("n_distinct", "s"),
                ("hll_est", "d2"),
                ("min_num", "d2"),
                ("max_num", "d2"),
            ],
        ),
    ],
    doc="Sketch suite: deterministic 64-register HyperLogLog distinct "
    "estimates (registers reproduced by the oracle — construction-level "
    "check) and a Bloom-runtime-filter join whose oracle is the plain "
    "join (the prefilter provably changes nothing).",
)
