"""Distributed connected components over an edge list — the step that
turns near-duplicate PAIRS into duplicate CLUSTERS (pick one survivor
per component), the piece every large-scale dedup pipeline needs after
LSH candidate verification.

Algorithm: the alternating large-star / small-star method of Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
MapReduce and Beyond" (ACM SoCC 2014).  Each round is two
groupBy-min + join passes over the edge list; the edge set converges to
a disjoint union of stars whose centers are the component minima in
O(log² n) rounds (O(log n) observed in practice).  Compare naive
min-label propagation, which needs O(diameter) rounds — on a 100 TB
pair list with chain-shaped components that difference is the job.

Scale design:
- Edges are kept canonically oriented (src > dst), deduplicated each
  round, and only (long, long) pairs ever shuffle.
- Every round is one groupBy(src).min + one equi-join — both plain
  shuffles AQE can coalesce; no driver-side adjacency structure, no
  collect() of anything but a 2-value convergence fingerprint.
- Lineage is truncated each round (localCheckpoint in local mode);
  production clusters should ``spark.sparkContext.setCheckpointDir``
  on durable storage and flip ``use_reliable_checkpoint=True`` —
  without truncation the plan doubles per iteration and the DAG
  scheduler, not the data, becomes the bottleneck.

Reference parity note: the reference pipeline has no graph operator —
this extends the engine for training-data curation (dedup clusters),
per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _canonical(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Orient every edge larger->smaller, drop self-loops, dedup."""
    return (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("src"),
            F.least(F.col(src), F.col(dst)).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbour of u to
    m = min(N(u) ∪ {u}).  Input/output oriented larger->smaller."""
    bidir = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = bidir.groupBy("src").agg(
        F.least(F.min("dst"), F.col("src")).alias("_m")
    )
    return (
        bidir.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbour of u (and u itself) to
    m = min of those neighbours.  Input oriented larger->smaller, so
    N⁻(u) is exactly u's dst set; output stays oriented."""
    mins = edges.groupBy("src").agg(F.min("dst").alias("_m"))
    spokes = (
        edges.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
    )
    hubs = mins.select("src", F.col("_m").alias("dst"))
    return (
        spokes.union(hubs)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 30,
    use_reliable_checkpoint: bool = False,
    stats: dict | None = None,
) -> DataFrame:
    """Label every node of the undirected graph with its component's
    minimum node id.  Returns (node, component) for every distinct
    endpoint in ``edges``.

    Convergence is detected by a 2-scalar fingerprint of the canonical
    edge set — (count, sum of per-edge xxhash64) — identical fingerprints
    on consecutive rounds mean an identical edge set (the set is exactly
    the star edges at the fixpoint).  Raises after ``max_iterations``
    rounds without convergence (log²-bounded; 30 covers graphs far past
    any realistic pair-list size).  Pass a dict as ``stats`` to receive
    ``{"rounds": n}`` — the scale-demo observable (rounds grow
    O(log diameter), the claim behind the 100 TB story)."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )

    cur = _canonical(edges, src, dst)
    if use_reliable_checkpoint:
        cur = cur.checkpoint(eager=True)
        n_cur = cur.count()
    else:
        # the canonical-edge count rides the checkpoint job as an
        # Observation instead of a second count action (r10)
        obs0 = Observation()
        cur = cur.observe(obs0, F.count(F.lit(1)).alias("n")).localCheckpoint(
            eager=True
        )
        n_cur = obs0.get["n"]
    # Latency-aware rounds (r08, the gr_scc engine): narrow shuffles +
    # AQE off inside the star loop — per-round cost on a modest pair
    # list is per-stage driver latency, not data; a 100 TB pair list
    # keeps the session width.  The convergence fingerprint rides each
    # round's materialization job as Observation metrics in the local-
    # checkpoint mode (reliable checkpoints materialize through an RDD
    # action that bypasses the SQL listener, so that mode keeps the
    # separate aggregate job).
    prev_fp = None
    with _iteration_confs(cur.sparkSession, n_cur):
        for _round in range(max_iterations):
            nxt = _small_star(_large_star(cur))
            if use_reliable_checkpoint:
                nxt = nxt.checkpoint(eager=True)
                fp_row = nxt.agg(
                    F.count("*").alias("n"),
                    F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
                ).collect()[0]
            else:
                obs = Observation()
                nxt = nxt.observe(
                    obs,
                    F.count(F.lit(1)).alias("n"),
                    # bit_xor (not sum): overflow-free under ANSI mode,
                    # and the edge set is distinct so xor-cancellation
                    # can't collide two different sets of equal count
                    # except by 64-bit chance
                    F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
                ).localCheckpoint(eager=True)
                fp_row = obs.get
            fp = (fp_row["n"], fp_row["h"])
            if prev_fp == fp:
                cur = nxt
                if stats is not None:
                    stats["rounds"] = _round + 1
                break
            prev_fp = fp
            cur = nxt
        else:
            raise RuntimeError(
                f"connected_components did not converge in "
                f"{max_iterations} rounds"
            )

    # Fixpoint edge set = stars: every non-minimum node has exactly one
    # edge, pointing at its component minimum.
    labels = cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    return (
        nodes.join(labels, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


def minhash_lsh_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 2,
    threshold: float = 0.5,
    stats: dict | None = None,
) -> DataFrame:
    """Near-duplicate CLUSTERS: MinHash-LSH verified pairs -> connected
    components -> (doc_id, cluster_id = component min doc_id), one row
    per document that has at least one verified near-duplicate.

    The verified pair list is materialized once (localCheckpoint) before
    the iterative clustering so the shingle/LSH pipeline runs exactly
    once, not once per star-contraction round.  ``stats`` (optional
    dict) receives the CC round count plus the verified pair count."""
    from .dedup import minhash_lsh_dedup_pairs

    pairs = minhash_lsh_dedup_pairs(
        df, id_col, text_col, shingle_k, num_hashes, bands, threshold
    ).select("doc_a", "doc_b").localCheckpoint(eager=True)
    if stats is not None:
        stats["n_pairs"] = pairs.count()
    cc = connected_components(pairs, "doc_a", "doc_b", stats=stats)
    return cc.select(
        F.col("node").alias(id_col), F.col("component").alias("cluster_id")
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    ndigits: int = 9,
    directed: bool = False,
) -> DataFrame:
    """Deterministic PageRank — the iterative graph algorithm beyond
    connected components: importance scoring of entities in an
    interaction graph (suppliers by the parts that flow through them,
    documents by citation, users by interaction).

    ``directed=False`` (default) expects an UNDIRECTED edge list (both
    directions present; src-set == dst-set) and VERIFIES that contract
    with a one-time aggregate over the pinned edge frame, raising
    ``ValueError`` on violation — a directed list fed to the undirected
    fast path would otherwise silently shrink the rank frame each
    round (nodes with no in-edges vanish), diverging from the SQL twin
    (r04 verdict finding #2).  ``directed=True`` handles an arbitrary
    edge list: the node set is src ∪ dst and each round LEFT-rejoins
    the inbox onto it (coalesce 0 for nodes with no in-edges) — the
    exact shape of the oracle's LEFT JOIN.  Nodes without out-edges
    leak their mass (no dangling-node redistribution), matching the
    twin.

    r'(v) = (1-d)/N + d * Σ_{u->v} r(u)/deg(u), ``iterations`` fixed
    rounds from the uniform start — no convergence collect, so the
    lineage is bounded and the whole computation is one lazy plan.

    Determinism contract (the engine's order-free float discipline):
    each contribution r(u)/deg(u) is truncated ONCE to 1e-12 integer
    units and the per-node inbox is summed as LONGS — exact under any
    partitioning and on any engine — then the damped update applies
    the same literal constants on both sides.  The oracle replays the
    rounds as an unrolled CTE chain (the Lloyd-trainer pattern).

    Scale shape: degrees are one map-side-combined aggregate computed
    once; per round ONE (ranks ⋈ edges on src) equi-join + ONE dst
    aggregation — the standard message-passing round, shuffle volume =
    |edges| longs; the edge+degree frame is pinned (cachereg) since
    every round re-reads it.  N is collected once (by the job that
    validates the undirected contract / counts the node set) and the
    (1-d)/N floor inlines as a literal — the identical IEEE double the
    oracle's SQL division yields, with no per-round broadcast join.
    """
    from ..cachereg import pin

    # edges has THREE consumers (degrees, the per-round join, the node
    # set) and typically carries a distinct() upstream — pin it so the
    # dedup shuffle runs once, not per consumer
    edges = pin(edges)
    if directed:
        nodes = pin(
            edges.select(F.col(src).alias("node"))
            .unionByName(edges.select(F.col(dst).alias("node")))
            .distinct()
        )
        n = nodes.count()
    else:
        # one-time contract check: every node must appear on BOTH edge
        # sides (src-set == dst-set).  ONE aggregate job over the
        # pinned frame returns the violation count AND N together, and
        # doubles as the cache-materializing action — the check costs
        # no job the algorithm wasn't already paying for the node set.
        nodes = pin(
            edges.select(
                F.col(src).alias("node"),
                F.lit(1).alias("_s"),
                F.lit(0).alias("_d"),
            )
            .unionByName(
                edges.select(
                    F.col(dst).alias("node"),
                    F.lit(0).alias("_s"),
                    F.lit(1).alias("_d"),
                )
            )
            .groupBy("node")
            .agg(F.max("_s").alias("_s"), F.max("_d").alias("_d"))
        )
        chk = nodes.agg(
            F.count("*").alias("n"),
            F.sum(
                ((F.col("_s") == 0) | (F.col("_d") == 0)).cast("long")
            ).alias("bad"),
        ).collect()[0]
        if chk["bad"]:
            raise ValueError(
                f"pagerank(directed=False) requires an undirected edge "
                f"list (both directions present), but {chk['bad']} "
                f"node(s) appear on only one side; pass directed=True "
                f"for an arbitrary edge list"
            )
        nodes = nodes.select("node")
        n = chk["n"]
    if n == 0:  # empty edge list: empty (node, rank) frame, no 1/0
        return nodes.select(
            "node", F.lit(None).cast("double").alias("rank")
        )
    deg = edges.groupBy(src).agg(F.count("*").alias("_deg"))
    edges_deg = pin(edges.join(deg, src))
    # N is known (collected by the contract check / node count), so the
    # per-round (1-d)/N floor inlines as a literal — same IEEE double
    # the oracle's SQL division produces — instead of a broadcast
    # 1-row crossJoin per round
    ranks = nodes.select("node", F.lit(1.0 / float(n)).alias("rank"))
    base, d = 1.0 - damping, float(damping)
    floor_lit = F.lit(base / float(n))
    for _ in range(iterations):
        contrib = edges_deg.join(
            ranks.withColumnRenamed("node", src), src
        ).select(
            F.col(dst).alias("node"),
            F.floor(
                F.col("rank") / F.col("_deg").cast("double") * F.lit(1e12)
            )
            .cast("long")
            .alias("_c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        # undirected contract (checked above): every node appears as a
        # dst, so the inbox aggregation already carries the full node
        # set — no rejoin needed.  Directed mode LEFT-rejoins onto the
        # node set so in-edge-less nodes keep their (1-d)/N floor,
        # matching the oracle's LEFT JOIN + coalesce.
        # (r09 negative result, measured: replacing this rejoin with a
        # pinned constant floor-rank frame unioned into ranks — valid,
        # since no-inbox nodes' rank is exactly floor from round 1 on —
        # took the member from 2.6 to 4.3 s at sf0.1: the union makes
        # next round's ranks side a two-branch plan AQE can no longer
        # broadcast cheaply, and the anti-join adds a stage.  The
        # LEFT rejoin with AQE's runtime broadcast is the right shape.)
        if directed:
            sums = nodes.join(sums, "node", "left").select(
                "node", F.coalesce(F.col("_s"), F.lit(0)).alias("_s")
            )
        ranks = sums.select(
            "node",
            (
                floor_lit
                + F.lit(d) * (F.col("_s").cast("double") / F.lit(1e12))
            ).alias("rank"),
        )
    scale = float(10**ndigits)
    return ranks.select(
        "node", (F.floor(F.col("rank") * F.lit(scale)) / F.lit(scale)).alias("rank")
    )


def pagerank_sql(
    edges_cte: str,
    iterations: int = 3,
    damping: float = 0.85,
    ndigits: int = 9,
    directed: bool = False,
) -> str:
    """DuckDB twin of ``pagerank``: the same rounds unrolled as a CTE
    chain, generated from the SAME Python constants (``repr`` of the
    identical doubles — e.g. 1-0.85 is 0.15000000000000002 on both
    sides) so engine and oracle cannot drift.  ``edges_cte`` must
    define ``e(src, dst)``; with ``directed=False`` both directions
    must be present (node set = distinct src, the engine's undirected
    contract), with ``directed=True`` the node set is src ∪ dst —
    mirroring the engine's ``directed=True`` LEFT-rejoin mode."""
    base, d = 1.0 - damping, float(damping)
    scale = float(10**ndigits)
    nodes_cte = (
        "SELECT src AS node FROM e UNION SELECT dst FROM e"
        if directed
        else "SELECT DISTINCT src AS node FROM e"
    )
    parts = [
        f"""{edges_cte},
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
    nodes AS ({nodes_cte}),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nn)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""c{i} AS (
      SELECT e.dst AS node,
             sum(CAST(floor(r.rank / CAST(d.deg AS DOUBLE)
                            * 1000000000000.0) AS BIGINT)) AS s
      FROM e JOIN deg d ON e.src = d.src JOIN r{i - 1} r ON e.src = r.node
      GROUP BY 1
    ),
    r{i} AS (
      SELECT nodes.node,
             {base!r} / n + {d!r}
               * (CAST(coalesce(c{i}.s, 0) AS DOUBLE) / 1000000000000.0)
               AS rank
      FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node CROSS JOIN nn
    )"""
        )
    body = ",\n    ".join(parts)
    return f"""
    WITH {body}
    SELECT node, floor(rank * {scale!r}) / {scale!r} AS rank
    FROM r{iterations}
    """


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact per-node triangle counts via DEGREE-ORDERED ORIENTATION —
    the shape that survives power-law graphs at 100 TB (Suri &
    Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW 2011).

    Each undirected edge is oriented from its lower-(degree, id)
    endpoint to its higher one, which caps every node's out-degree at
    O(sqrt(m)); wedges are then a self-join of the oriented list on the
    source (so a degree-10^7 hub generates no quadratic wedge blowup —
    its edges all point INTO it), and a triangle is a wedge whose
    (v, w) closure exists in the same oriented list.  Total wedge count
    is bounded by m^{3/2} regardless of skew; the naive
    neighbour-pair-per-vertex join is Theta(sum deg^2), which one hot
    vertex turns into the job.

    Input may contain duplicates, self-loops, or both orientations —
    all normalized away.  Output: (node, n_triangles) for EVERY node of
    the graph, zeros included."""
    e = _canonical(edges, src, dst).select(
        F.col("dst").alias("a"), F.col("src").alias("b")
    )  # canonical (a, b) = (min, max)
    # Degree = one explode pass over the canonical edge list; the
    # two-branch union planned e's dedup shuffle TWICE (same
    # union-subplan rule as the vertex-credit reshape below; r09,
    # another ~0.6 s off the sf0.1 member)
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    # orient toward the higher (degree, id); carry both endpoints' rank
    er = (
        e.join(deg.withColumnsRenamed({"node": "a", "d": "da"}), "a")
        .join(deg.withColumnsRenamed({"node": "b", "d": "db"}), "b")
    )
    a_lower = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = er.select(
        F.when(a_lower, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_lower, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_lower, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    v_lower = (F.col("o1.dv") < F.col("o2.dv")) | (
        (F.col("o1.dv") == F.col("o2.dv")) & (F.col("o1.v") < F.col("o2.v"))
    )
    # wedge (v, w) around apex u, v rank-below w -> the closing edge,
    # if present, is oriented exactly v -> w
    wedges = o1.join(o2, F.col("o1.u") == F.col("o2.u")).where(v_lower).select(
        F.col("o1.u").alias("apex"),
        F.col("o1.v").alias("v"),
        F.col("o2.v").alias("w"),
    )
    tris = wedges.join(
        oriented.select(F.col("u").alias("v"), F.col("v").alias("w")),
        ["v", "w"],
    )
    # Each triangle credits all three of its vertices.  explode(array)
    # does that in ONE pass over tris; the previous 3-branch union
    # planned the whole wedge-join subtree once per branch (union
    # branches don't share subplans — 188 parquet scans in one plan)
    # and cost 2.2 s vs 1.6 s at sf0.1 (r09).  Pinning the shared
    # frames instead was measured SLOWER (2.0 s): the cache
    # materialization barriers cost more than AQE's runtime stage
    # reuse saves — same verdict as the PageRank union experiment.
    counts = (
        tris.select(F.explode(F.array("apex", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return deg.join(counts, "node", "left").select(
        "node",
        F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
    )


def triangle_sql(edges_cte: str) -> str:
    """DuckDB twin of ``triangle_count``: exact enumeration over the
    canonical (a < b) edge list — each triangle appears exactly once as
    (x < y < z) via the three-way join, then every corner is credited.
    ``edges_cte`` must define ``e(src, dst)`` (any orientation/dupes —
    normalized here the same way the operator does)."""
    return f"""
    WITH {edges_cte},
    ec AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM e WHERE src <> dst
    ),
    deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT a AS node FROM ec UNION ALL SELECT b FROM ec
      ) GROUP BY node
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM ec e1
      JOIN ec e2 ON e2.a = e1.b
      JOIN ec e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    corners AS (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    ),
    cnt AS (SELECT node, count(*) AS n FROM corners GROUP BY node)
    SELECT deg.node, CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_triangles
    FROM deg LEFT JOIN cnt ON deg.node = cnt.node
    """


def scc_sql(edges_cte: str) -> str:
    """DuckDB twin of ``strongly_connected_components``: full transitive
    closure via a recursive CTE, then component(v) = min over the nodes
    mutually reachable with v (v itself when its SCC is a singleton) —
    exactly the min-id label the coloring loop assigns.  ``edges_cte``
    must define ``e(src, dst)``; self-loops and duplicates are
    normalized here the same way the operator does.  O(n * reach) rows
    — an sf0.01-scale oracle, not a scale path (that's the operator's
    job)."""
    return f"""
    WITH RECURSIVE {edges_cte},
    en AS MATERIALIZED (SELECT DISTINCT src, dst FROM e WHERE src <> dst),
    vertices AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    reach AS (
      SELECT src AS a, dst AS b FROM en
      UNION
      SELECT r.a, en.dst FROM reach r JOIN en ON en.src = r.b
    ),
    mutual AS (
      SELECT r1.a AS node, r1.b AS other
      FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
    )
    SELECT v.node, least(v.node, coalesce(min(m.other), v.node)) AS component
    FROM vertices v LEFT JOIN mutual m ON m.node = v.node
    GROUP BY v.node
    """


def k_core_sql(edges_cte: str, k: int, peels: int = 8) -> str:
    """DuckDB twin of ``k_core``: the peeling loop unrolled to a fixed
    ``peels`` rounds of (degree -> keep -> induced subgraph) CTEs.
    Rounds past the true fixpoint are no-ops, so any ``peels`` >= the
    operator's measured round count yields the identical node set —
    and if it ever were too small, the driver hash (Spark = true
    fixpoint vs oracle = truncated peel) flips rather than passing
    silently.  ``edges_cte`` must define ``e(src, dst)``.  Every CTE
    in the chain is MATERIALIZED: each level references its
    predecessor multiple times, and DuckDB's default CTE inlining
    would multiply the base scan exponentially in the peel depth."""
    ctes = [
        "e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS s, "
        "greatest(src, dst) AS d FROM e WHERE src <> dst)"
    ]
    for i in range(peels):
        ctes.append(
            f"""n{i + 1} AS MATERIALIZED (
      SELECT node FROM (
        SELECT node, count(*) AS deg FROM (
          SELECT s AS node FROM e{i} UNION ALL SELECT d FROM e{i})
        GROUP BY node)
      WHERE deg >= {k})"""
        )
        ctes.append(
            f"e{i + 1} AS MATERIALIZED (SELECT e{i}.* FROM e{i} "
            f"JOIN n{i + 1} a ON a.node = e{i}.s "
            f"JOIN n{i + 1} b ON b.node = e{i}.d)"
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {edges_cte},
    {body}
    SELECT node FROM n{peels}
    """


# Shared with the Lloyd-trainer and BPE loops (operators/iterate.py);
# the graph loops were where the regime was first measured.
from .iterate import iteration_confs as _iteration_confs  # noqa: E402


#: Broadcast budget for the iterative loops' small sides (r10-verdict
#: task #5: a BYTE budget, not a row count — rows are a proxy that
#: mis-sizes once row width varies).  32 MB built relations are cheap
#: to collect and ship on any driver/executor sizing; loops past the
#: budget keep full shuffle joins (the 100 TB regime).
_BROADCAST_BUDGET_BYTES = 32 << 20


def _fits_broadcast(n_rows: int, row_bytes: int = 20) -> bool:
    """Conservative byte-estimate broadcast guard: ``n_rows`` of
    ``row_bytes`` each against the single budget above.  The loop
    frames are two longs (frontier/colors: 16 data bytes + Tungsten
    row overhead ~= 20) or one long (k-core keep set: 16)."""
    return n_rows * row_bytes <= _BROADCAST_BUDGET_BYTES


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 40,
    stats: dict | None = None,
) -> DataFrame:
    """Strongly connected components of a DIRECTED graph — the directed
    counterpart of ``connected_components`` (which treats edges as
    undirected and would merge a DAG into one blob).  Returns
    (node, component) with component = the minimum node id of the SCC.

    Algorithm: coloring SCC (Orzan 2004 / Slota et al. 2014, public).
    Per outer round over the unsettled subgraph:

    1. FORWARD max-color propagation to fixpoint: color(v) = max id of
       any vertex that reaches v — semi-naive (messages flow only from
       vertices whose color rose last iteration; max is monotone and
       idempotent, so delta propagation reaches the same fixpoint);
    2. every vertex whose color == its own id is a ROOT, and an SCC is
       exactly {v : color(v) == id(root) and v reaches root}.  Any
       v->root path lies entirely inside root's color class (every
       vertex on it is mutually reachable with the root), so the
       BACKWARD settle BFS runs on a once-per-round SAME-COLOR edge
       subset, frontier-only, anti-joined against the settled set so
       unions stay disjoint (no distinct over the accumulated set);
    3. settled vertices (and their edges) drop out; repeat.  The
       min-id relabel of each color class is deferred to ONE global
       pass after the outer loop (classes from different rounds are
       disjoint — a class id is a live node id, and settled nodes
       leave the graph).

    Latency engineering (r08, measured at sf0.1: 38k edges, 17k nodes,
    16 fixpoint iterations): iteration cost is per-shuffle-stage
    driver latency, not data volume, so the loop (a) runs with AQE
    disabled — AQE's per-stage re-plan barrier roughly doubles tiny
    iterative stages and buys nothing the fixed 2-partition width
    doesn't already give; (b) narrows the shuffle width to ~1M-edge
    partitions, never above the session default, so a 100 TB graph
    keeps its full width and AQE choice is restored on exit either
    way; (c) pre-partitions the edge set by its join key so the
    per-iteration join reuses the checkpointed partitioning instead of
    re-exchanging the edges every step; (d) every convergence /
    frontier / live count rides its materialization job as an
    Observation metric — one Spark job per iteration and per shrink,
    no separate count actions; (e) an acyclic-remainder shortcut: a
    first forward iteration that raises no color proves the live
    subgraph is a DAG, so all remaining nodes settle as singleton
    components with no backward/shrink round; (f) per-round settled
    checkpoints are replaced by a parts list unioned once before the
    global relabel.  A fused two-hops-per-job variant was measured
    SLOWER (deeper plans cost more than the job they save) and
    rejected.

    Scale notes, stated honestly: each propagation runs O(diameter)
    iterations of one equi-join + one max-aggregation (shuffle payload
    bounded by |edges| longs and shrinking with the frontier, lineage
    truncated per step), and the OUTER loop settles every SCC whose
    color class it rooted — low-diameter web/citation graphs (the
    regime GraphX's SCC targets) finish in a few rounds, while an
    adversarially id-ordered chain of singleton SCCs degrades toward
    O(n) rounds; ``max_rounds`` bounds the damage and raises rather
    than spinning.  Self-loops are fine; parallel edges are deduped."""
    spark = edges.sparkSession
    # ONE materialization of the caller's (possibly expensive) edge
    # plan; the normalized edge set and the vertex set both derive
    # from it without recomputing the upstream.  The row count rides
    # the checkpoint job as an Observation (r10: every count that used
    # to be its own action now folds into a job the loop was already
    # paying — per-round cost here is driver job latency, not data).
    obs_raw = Observation()
    raw = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .observe(obs_raw, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_raw = obs_raw.get["n"]
    settled_parts: list[DataFrame] = []
    rounds = 0
    with _iteration_confs(spark, n_raw) as parts:
        e = (
            raw.where(F.col("s") != F.col("d"))
            .distinct()
            .repartition(parts, "s")
            .localCheckpoint(eager=True)
        )
        obs_nodes = Observation()
        nodes_all = (
            raw.select(F.col("s").alias("node"))
            .union(raw.select(F.col("d").alias("node")))
            .distinct()
            .observe(obs_nodes, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        live_nodes = nodes_all
        n_live = obs_nodes.get["n"]
        for _round in range(max_rounds):
            if n_live == 0:
                break
            rounds += 1
            # 1. forward max-color propagation to fixpoint.  The
            # changed-count AND the root count (color == id, the
            # backward phase's seed size) ride each materialization
            # job as Observation metrics — one Spark job per
            # iteration, no separate count actions.  colors is a
            # narrow projection of live_nodes (round 0: the
            # checkpointed vertex set; later rounds: the LAZY
            # anti-join shrink, which this round's first forward job
            # materializes), so it needs no checkpoint job of its own
            # (r10; the lazy shrink is r11).
            colors = live_nodes.select(
                "node", F.col("node").alias("color")
            )
            frontier = colors
            n_frontier = n_live
            first_iter = True
            n_roots = 0
            while True:
                if first_iter:
                    # identity frontier (color(v) == v for every live
                    # node, and e is already the live subgraph): the
                    # frontier join is a no-op — max over src ids
                    # directly (r10: drops the join + broadcast build
                    # from each round's first iteration)
                    msgs = e.groupBy(F.col("d").alias("node")).agg(
                        F.max("s").alias("_in")
                    )
                else:
                    fsel = frontier.select(
                        F.col("node").alias("s"), F.col("color").alias("c")
                    )
                    # frontier-broadcast BFS: the frontier's exact size
                    # is already known from the Observation, so a small
                    # frontier ships map-side and the edge table is
                    # never re-exchanged; large frontiers (the 100 TB
                    # regime) keep the shuffle join
                    if _fits_broadcast(n_frontier):
                        fsel = F.broadcast(fsel)
                    msgs = (
                        e.join(fsel, "s")
                        .groupBy(F.col("d").alias("node"))
                        .agg(F.max("c").alias("_in"))
                    )
                obs = Observation()
                nxt = (
                    colors.join(msgs, "node", "left")
                    .select(
                        "node",
                        F.greatest(
                            "color", F.coalesce("_in", F.col("color"))
                        ).alias("color"),
                        F.col("color").alias("_old"),
                    )
                    .observe(
                        obs,
                        F.count(
                            F.when(F.col("color") != F.col("_old"), 1)
                        ).alias("chg"),
                        F.count(
                            F.when(F.col("color") == F.col("node"), 1)
                        ).alias("roots"),
                    )
                    .localCheckpoint(eager=True)
                )
                row = obs.get
                changed = row["chg"]
                colors = nxt.select("node", "color")
                if changed == 0:
                    # at the fixpoint this job's root count IS the
                    # backward seed size — the separate seed
                    # materialization job is gone (r10)
                    n_roots = row["roots"]
                    break
                frontier = nxt.where(
                    F.col("color") != F.col("_old")
                ).select("node", "color")
                n_frontier = changed
                first_iter = False
            # colors is now a projection of the last forward job's
            # checkpoint; rebinding live_nodes to it truncates the
            # lazy shrink lineage carried into this round (r11: the
            # per-round live-shrink materialization job is gone — the
            # anti-join rides the first forward job instead)
            live_nodes = colors.select("node")
            if first_iter:
                # Acyclic-remainder shortcut: if the very first
                # iteration raised no color, no edge points to a
                # lower id, so the live subgraph is a DAG — every
                # remaining SCC is a singleton.  Settle them all and
                # skip the backward/shrink machinery entirely.
                settled_parts.append(
                    live_nodes.select(
                        "node", F.col("node").alias("component")
                    )
                )
                break
            # 2. backward settle on the same-color edge subset
            # (computed ONCE per round, pre-partitioned by its join
            # key).  A settled vertex's component is its color,
            # carried on the frontier; new settles are disjoint from
            # the accumulated set by the anti join, so unions need no
            # distinct, and the row count again rides the
            # materialization as an Observation.
            cs = colors.select(
                F.col("node").alias("s"), F.col("color").alias("cs")
            )
            cd = colors.select(
                F.col("node").alias("d"), F.col("color").alias("cd")
            )
            if _fits_broadcast(n_live):
                cs, cd = F.broadcast(cs), F.broadcast(cd)
            er = (
                e.join(cs, "s")
                .join(cd, "d")
                .where(F.col("cs") == F.col("cd"))
                .select("s", "d")
                .repartition(parts, "d")
                .localCheckpoint(eager=True)
            )
            # the seed is a narrow filter over the last forward job's
            # checkpointed frame, and its size was observed by that
            # job — no materialization job needed (r10)
            scc = colors.where(F.col("node") == F.col("color")).select(
                "node", F.col("color").alias("component")
            )
            n_frontier_b = n_roots
            n_settled = n_roots
            frontier_b = scc
            while True:
                # flag flows AGAINST edge direction: if d is settled
                # and (s, d) is a same-class edge, s reaches the root
                # through d
                fbsel = frontier_b.select(
                    F.col("node").alias("d"), "component"
                )
                if _fits_broadcast(n_frontier_b):
                    fbsel = F.broadcast(fbsel)
                obs = Observation()
                new = (
                    er.join(fbsel, "d")
                    .select(F.col("s").alias("node"), "component")
                    .distinct()
                    .join(scc.select("node"), "node", "left_anti")
                    .observe(obs, F.count(F.lit(1)).alias("n"))
                    .localCheckpoint(eager=True)
                )
                n_frontier_b = obs.get["n"]
                if n_frontier_b == 0:
                    break
                n_settled += n_frontier_b
                scc = scc.unionByName(new)
                frontier_b = new
            settled_parts.append(scc)
            # 3. shrink the live subgraph.  The settled set's size is
            # known exactly (the root seed + every disjoint backward
            # batch, each observed on its own job), so the next
            # round's live count is ARITHMETIC — n_live - n_settled —
            # and the live-shrink needs no materialization job of its
            # own: the anti-join stays lazy and rides the next
            # round's first forward job (r11, the same fold that paid
            # for the r10 graph pass; live_nodes is rebound to the
            # forward checkpoint at that round's fixpoint).
            n_live -= n_settled
            if n_live == 0:
                break
            live_nodes = live_nodes.join(
                scc.select("node"), "node", "left_anti"
            )
            e = (
                e.join(
                    scc.select(F.col("node").alias("s")), "s", "left_anti"
                )
                .join(
                    scc.select(F.col("node").alias("d")), "d", "left_anti"
                )
                .repartition(parts, "s")
                .localCheckpoint(eager=True)
            )
        else:
            raise RuntimeError(
                f"scc did not settle in {max_rounds} rounds (adversarial "
                "id-ordered chain? permute ids or raise max_rounds)"
            )
        settled = None
        if settled_parts:
            settled = settled_parts[0]
            for part in settled_parts[1:]:
                settled = settled.unionByName(part)
            # component label: min node id of the SCC (colors are
            # max-ids) — ONE global relabel instead of per-round jobs,
            # materialized under the loop confs
            labels = settled.groupBy("component").agg(
                F.min("node").alias("_lbl")
            )
            settled = (
                settled.join(labels, "component")
                .select("node", F.col("_lbl").alias("component"))
                .localCheckpoint(eager=True)
            )
    if stats is not None:
        stats["rounds"] = rounds
    if settled is None:
        return nodes_all.select(
            "node", F.col("node").alias("component")
        ).limit(0)
    return settled


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 60,
    stats: dict | None = None,
) -> DataFrame:
    """The k-core of the undirected graph: the maximal subgraph where
    every node has degree >= k — the classic link-graph quality prior
    (web-corpus curation prunes pages outside a small core: spam farms
    and orphan pages peel away, densely cross-linked content stays).

    Returns the surviving (node) frame.  Iterative peeling: drop every
    node with degree < k, recompute, repeat to fixpoint.  Each round is
    one degree aggregation + two semi joins over the shrinking edge
    list (lineage truncated per round); rounds are bounded by the peel
    depth — O(sqrt(|E|)) in theory, single digits on real graphs.
    Self-loops are ignored; parallel edges count once."""
    if k < 1:
        raise ValueError("k must be >= 1")
    obs_e = Observation()
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .where(F.col("s") != F.col("d"))
        .select(
            F.least("s", "d").alias("s"), F.greatest("s", "d").alias("d")
        )
        .distinct()
        .observe(obs_e, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    # Latency-aware peeling (r08, the gr_scc engine): narrow shuffles
    # + AQE off inside the loop.  r10 job-count pass: the per-round
    # keep-set materialization is FUSED into the edge-shrink job (keep
    # is a lazy degree filter over the checkpointed edge frame; small
    # keep sets broadcast into the semi joins), the surviving-EDGE
    # count rides that one job as an Observation, and convergence is
    # edge-set stability — peeling shrinks the edge set monotonically,
    # so equal consecutive counts mean an identical edge set, which
    # fixes the degree map and therefore the keep set (the old
    # node-count test, same fixpoint).  One Spark job per peel round
    # instead of two; the input-edge count rides the normalization
    # checkpoint the same way.
    n_edges = obs_e.get["n"]
    with _iteration_confs(e.sparkSession, n_edges):
        for _round in range(max_rounds):
            if n_edges == 0:
                # nothing left: no node has degree >= k
                if stats is not None:
                    stats["rounds"] = _round
                return e.select(F.col("s").alias("node")).limit(0)
            keep = (
                e.select(F.col("s").alias("node"))
                .unionByName(e.select(F.col("d").alias("node")))
                .groupBy("node")
                .agg(F.count("*").alias("_deg"))
                .where(F.col("_deg") >= k)
                .select("node")
            )
            # keep has at most 2*n_edges rows of one long each
            if _fits_broadcast(2 * n_edges, row_bytes=16):
                keep = F.broadcast(keep)
            obs = Observation()
            nxt = (
                e.join(
                    keep.select(F.col("node").alias("s")), "s", "left_semi"
                )
                .join(
                    keep.select(F.col("node").alias("d")), "d", "left_semi"
                )
                .observe(obs, F.count(F.lit(1)).alias("n"))
                .localCheckpoint(eager=True)
            )
            n_next = obs.get["n"]
            if stats is not None:
                stats["rounds"] = _round + 1
            if n_next == 0:
                # the peel emptied the edge set — converged (r10
                # ADVICE: deferring this to the next round's top made
                # a peel that empties exactly on round max_rounds
                # raise despite having converged); same rounds count
                # as the old next-round-top exit
                return nxt.select(F.col("s").alias("node")).limit(0)
            if n_next == n_edges:
                # edge fixpoint: no edge dropped, so every endpoint
                # already has degree >= k — the survivors are exactly
                # the distinct endpoints
                return (
                    nxt.select(F.col("s").alias("node"))
                    .unionByName(nxt.select(F.col("d").alias("node")))
                    .distinct()
                )
            e, n_edges = nxt, n_next
    raise RuntimeError(f"k_core did not stabilize in {max_rounds} rounds")
