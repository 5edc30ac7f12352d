"""Shared execution-tuning context for driver-materialized fixpoint
loops (graph algorithms, Lloyd's k-means, BPE training rounds).

These loops collect a bounded scalar/frame at every round, so their
per-round cost on modest live data is per-shuffle-stage driver latency
— AQE re-plan barriers and stage scheduling at the session's full
shuffle width — not data volume.  ``iteration_confs`` flips the two
session confs that dominate that latency for the duration of the loop
and restores them on exit.  Measured on gr_scc at sf0.1 (r08): ~35%
wall cut; results are unaffected because every caller's per-round
computation is order-independent by construction (exact integer sums,
min/max fixpoints).

NOT CONCURRENCY-SAFE: the context mutates SparkSession-GLOBAL confs
(``spark.sql.shuffle.partitions``, ``spark.sql.adaptive.enabled``), so
any query planned on the same session while a loop holds the context
silently runs narrow with AQE off — correct, but mis-tuned.  The
engine's execution model is one registered query at a time per session
(the driver harness, bench.py, and pytest are all serial); embedders
running concurrent queries on a shared session must not use the
operators that take this context (gr_scc, lloyd_centroids) while other
work is in flight, or should give them their own session.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def iteration_confs(spark, n_rows: int):
    """Latency-aware session confs for a fixpoint loop over a
    MATERIALIZED frame of ``n_rows`` rows.  Inside the block: AQE off
    (its per-stage re-plan barrier roughly doubles tiny iterative
    stages and buys nothing a fixed narrow width doesn't) and shuffle
    width at ~1M-row partitions — never above the session default, so
    a 100 TB input keeps its full width.  Both confs restore on exit,
    exception or not.  Yields the chosen width for explicit
    repartition() calls."""
    default_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    default_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    parts = min(default_parts, max(2, -(-n_rows // 1_000_000)))
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        yield parts
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", default_aqe)
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(default_parts)
        )
