"""Connected components (large-star/small-star) correctness:
random graphs vs a Python union-find, pathological shapes, and the
composed LSH-cluster query vs its DuckDB recursive-CTE oracle
(the latter runs in test_oracle.py with every other registry entry).
"""

from __future__ import annotations

import random

import pytest

from clear_map_data_pipeline_spark.operators.graph import (
    connected_components,
    minhash_lsh_clusters,
)


def _union_find_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min node of component
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, r), n)
    return {n: comp_min[find(n)] for n in parent}


def _spark_labels(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = connected_components(df).collect()
    return {r["node"]: r["component"] for r in rows}


def test_two_components_and_self_loop(spark):
    edges = [(1, 2), (2, 3), (10, 11), (7, 7)]
    got = _spark_labels(spark, edges)
    # self-loop-only node 7 still appears, labeled itself
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 7: 7}


def test_long_path_converges_logarithmically(spark):
    # a 64-node path is the worst case for naive min-label propagation
    # (63 rounds); the alternating algorithm must finish well inside
    # its O(log^2 n) bound — 10 rounds is generous for n=64.
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = connected_components(df, max_iterations=10).collect()
    assert {r["node"] for r in rows} == set(range(64))
    assert {r["component"] for r in rows} == {0}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    n = 120
    # sparse graph -> many nontrivial components
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(n // 2)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    assert _spark_labels(spark, edges) == _union_find_labels(edges)


def test_star_and_cycle_shapes(spark):
    star = [(100, i) for i in range(5)]  # hub larger than all spokes
    cycle = [(20, 21), (21, 22), (22, 23), (23, 20)]
    got = _spark_labels(spark, star + cycle)
    assert all(got[i] == 0 for i in [100, 0, 1, 2, 3, 4])
    assert all(got[i] == 20 for i in [20, 21, 22, 23])


def test_lsh_clusters_consistent_with_pairs(spark, sf_dir):
    """Every verified near-dup pair must land in one cluster, and every
    cluster id must be the min doc_id of its member set."""
    from clear_map_data_pipeline_spark.operators.dedup import (
        minhash_lsh_dedup_pairs,
    )
    from clear_map_data_pipeline_spark.session import Tables

    docs = Tables(spark, sf_dir).documents
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_dedup_pairs(docs).collect()
    ]
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in minhash_lsh_clusters(docs).collect()
    }
    assert labels == _union_find_labels(pairs)


def test_pagerank_matches_literal_python(spark):
    """3-round damped PageRank on a small undirected graph must equal a
    literal Python replay of the same recurrence (same truncation, same
    constants) — and be invariant under repartitioning (order-free
    scaled-integer message sums)."""
    import math

    from clear_map_data_pipeline_spark.operators.graph import pagerank

    und = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    edges_list = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(edges_list, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(edges).collect()}

    deg = {}
    for a, _b in edges_list:
        deg[a] = deg.get(a, 0) + 1
    n = len(deg)
    ranks = {v: 1.0 / n for v in deg}
    for _ in range(3):
        inbox = {v: 0 for v in deg}
        for a, b in edges_list:
            inbox[b] += math.floor(ranks[a] / float(deg[a]) * 1e12)
        ranks = {
            v: (1.0 - 0.85) / n + 0.85 * (float(inbox[v]) / 1e12)
            for v in deg
        }
    want = {v: math.floor(r * 1e9) / 1e9 for v, r in ranks.items()}
    assert got == want
    # rank mass conservation (up to truncation dust)
    assert abs(sum(got.values()) - 1.0) < 1e-6

    rep = {
        r["node"]: r["rank"]
        for r in pagerank(edges.repartition(7)).collect()
    }
    assert rep == got


def test_pagerank_directed_input_raises_without_flag(spark):
    """Feeding a directed edge list to the undirected fast path must
    raise, not silently shrink the rank frame each round (r04 verdict
    finding #2: node 4 has no out-edge / node 1 no in-edge here)."""
    import pytest

    from clear_map_data_pipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, 4)], "src long, dst long"
    )
    with pytest.raises(ValueError, match="directed=True"):
        pagerank(edges)


def test_pagerank_directed_matches_literal_python(spark):
    """directed=True on an arbitrary edge list must equal the literal
    replay over the src∪dst node set with LEFT-join semantics: nodes
    with no in-edges keep the (1-d)/N floor, nodes with no out-edges
    leak their mass (oracle LEFT JOIN + coalesce shape)."""
    import math

    from clear_map_data_pipeline_spark.operators.graph import pagerank

    edges_list = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (6, 3)]
    edges = spark.createDataFrame(edges_list, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, directed=True).collect()
    }

    nodes = sorted({a for a, _ in edges_list} | {b for _, b in edges_list})
    deg = {}
    for a, _b in edges_list:
        deg[a] = deg.get(a, 0) + 1
    n = len(nodes)
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(3):
        inbox = {v: 0 for v in nodes}
        for a, b in edges_list:
            inbox[b] += math.floor(ranks[a] / float(deg[a]) * 1e12)
        ranks = {
            v: (1.0 - 0.85) / n + 0.85 * (float(inbox[v]) / 1e12)
            for v in nodes
        }
    want = {v: math.floor(r * 1e9) / 1e9 for v, r in ranks.items()}
    assert got == want
    # node 5 (sink) and node 6 (source) are both present in the output
    assert 5 in got and 6 in got

    # undirected mode on a symmetric list still agrees with itself
    # after the contract check (regression: check must not reject a
    # valid undirected list)
    sym = edges_list + [(b, a) for a, b in edges_list]
    sdf = spark.createDataFrame(sym, "src long, dst long")
    assert pagerank(sdf).count() == n


def test_pagerank_empty_edges_returns_empty(spark):
    """An empty edge list (e.g. a filtered-out graph) must return an
    empty (node, rank) frame, not divide by zero building the plan
    (r05 self-review finding)."""
    from clear_map_data_pipeline_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty).count() == 0
    assert pagerank(empty, directed=True).count() == 0


# ---- triangle counting (r05): degree-ordered orientation


def _brute_triangles(edges_list):
    """Literal per-node triangle counts: enumerate all node triples of
    the canonical edge set (test-scale only)."""
    import itertools

    es = {
        (min(a, b), max(a, b)) for a, b in edges_list if a != b
    }
    nodes = sorted({v for e in es for v in e})
    cnt = {v: 0 for v in nodes}
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in es and (x, z) in es and (y, z) in es:
            cnt[x] += 1
            cnt[y] += 1
            cnt[z] += 1
    return cnt


def test_triangle_count_known_shapes(spark):
    from clear_map_data_pipeline_spark.operators.graph import triangle_count

    # K4: every node is in C(3,2) = 3 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(
            spark.createDataFrame(k4, "src long, dst long")
        ).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    # C5 (odd cycle, no chords) and K3,3 (bipartite): zero triangles
    c5 = [(i, (i + 1) % 5) for i in range(5)]
    got = triangle_count(spark.createDataFrame(c5, "src long, dst long"))
    assert all(r["n_triangles"] == 0 for r in got.collect())
    k33 = [(a, b) for a in range(3) for b in range(10, 13)]
    got = triangle_count(spark.createDataFrame(k33, "src long, dst long"))
    rows = got.collect()
    assert len(rows) == 6 and all(r["n_triangles"] == 0 for r in rows)


def test_triangle_count_normalizes_input(spark):
    """Duplicates, self-loops, and mixed orientations must not change
    the counts."""
    from clear_map_data_pipeline_spark.operators.graph import triangle_count

    tri = [(1, 2), (2, 3), (3, 1)]
    messy = tri + [(2, 1), (3, 2), (1, 1), (2, 3), (3, 1)]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(
            spark.createDataFrame(messy, "src long, dst long")
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_count_random_vs_brute(spark):
    """Deterministic pseudo-random graph (hash-derived, skewed toward
    low node ids so hubs exist) vs the literal triple enumeration."""
    edges = []
    for i in range(400):
        h = (i * 2654435761) & 0xFFFFFFFF
        a = h % 40
        b = (h >> 8) % ((a % 7) * 5 + 3)  # skew: low ids are hubs
        edges.append((a, b))
    from clear_map_data_pipeline_spark.operators.graph import triangle_count

    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    assert got == _brute_triangles(edges)


def test_triangle_count_total_is_three_per_triangle(spark):
    """Global invariant: sum of per-node counts = 3 x number of
    distinct triangles (each triangle credits its three corners)."""
    from pyspark.sql import functions as F

    from clear_map_data_pipeline_spark.operators.graph import triangle_count

    edges = [(a, b) for a in range(9) for b in range(a + 1, 9) if (a + b) % 3]
    df = triangle_count(spark.createDataFrame(edges, "src long, dst long"))
    total = df.agg(F.sum("n_triangles")).collect()[0][0]
    brute = _brute_triangles(edges)
    assert total == sum(brute.values())
    assert total % 3 == 0


def test_reliable_checkpoint_path_matches_and_truncates(spark, tmp_path):
    """`use_reliable_checkpoint=True` is the 100-TB configuration
    (localCheckpoint dies with an executor; reliable checkpoints live
    in the cluster FS) — run it for real: same labels as the default
    path AND the union-find reference, checkpoint files actually land
    in the configured dir, and the returned plan is truncated (a
    checkpoint scan, not 2 * rounds of nested joins)."""
    rng = random.Random(7)
    n = 80
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(n)]
    edges = [e for e in edges if e[0] != e[1]]

    ckpt = str(tmp_path / "cc_ckpt")
    # leaving the dir set is harmless for other tests: nothing else
    # calls .checkpoint(), and localCheckpoint ignores it
    spark.sparkContext.setCheckpointDir(ckpt)
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = connected_components(df, use_reliable_checkpoint=True)
    got = {r["node"]: r["component"] for r in out.collect()}

    assert got == _union_find_labels(edges)
    assert got == _spark_labels(spark, edges)  # localCheckpoint twin

    import os

    ckpt_files = [
        os.path.join(r, f) for r, _d, fs in os.walk(ckpt) for f in fs
    ]
    assert ckpt_files, "reliable checkpoint wrote nothing to the dir"

    # lineage truncation: the optimized plan of the result must hang off
    # the checkpoint scan (one join of nodes with fixpoint labels), not
    # accumulate a tree that grows with rounds.
    plan = out._jdf.queryExecution().optimizedPlan().numberedTreeString()
    assert len(plan.splitlines()) < 30, plan


def test_minhash_pairs_cross_checked_against_mllib(spark):
    """Independent-implementation cross-check: our custom MinHash+LSH
    chain vs pyspark.ml.feature.MinHashLSH's approxSimilarityJoin on a
    planted near-dup corpus.  Both pipelines candidate-generate
    differently (band buckets vs OR-amplified hash tables) but both
    VERIFY with exact Jaccard, so on the same threshold the verified
    pair sets must agree wherever both sides' candidate generation
    recalls the pair — and our chain must recall every planted pair
    MLlib finds.  Two codebases agreeing is the strongest oracle a
    non-SQL-expressible recall property gets."""
    import random

    from pyspark.ml.feature import CountVectorizer, MinHashLSH
    from pyspark.sql import functions as F

    from clear_map_data_pipeline_spark.operators.dedup import (
        doc_shingle_sets,
        minhash_lsh_dedup_pairs,
    )

    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(120)]
    base_docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(30)))
        for i in range(40)
    ]
    # planted near-dups: copy with a small tail edit -> high Jaccard
    dups = [
        (100 + i, text + " tail" + str(i))
        for i, text in [(i, t) for i, t in base_docs[:12]]
    ]
    docs = spark.createDataFrame(base_docs + dups, ["doc_id", "text"])

    ours = {
        tuple(sorted((r["doc_a"], r["doc_b"])))
        for r in minhash_lsh_dedup_pairs(docs, threshold=0.5).collect()
    }

    # MLlib pipeline over the SAME shingle sets
    sets = doc_shingle_sets(docs, k=3)
    cv = CountVectorizer(
        inputCol="_set", outputCol="features", binary=True
    ).fit(sets)
    feats = cv.transform(sets)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=7
    ).fit(feats)
    joined = mh.approxSimilarityJoin(
        feats, feats, threshold=0.5, distCol="jacc_dist"
    )
    mllib = {
        tuple(
            sorted((r["datasetA"]["doc_id"], r["datasetB"]["doc_id"]))
        )
        for r in joined.filter(
            F.col("datasetA.doc_id") < F.col("datasetB.doc_id")
        ).collect()
    }

    planted = {
        tuple(sorted((i, 100 + i))) for i, _t in base_docs[:12]
    }
    # every planted pair MLlib recalls, we must recall too
    assert planted & mllib <= ours
    # and both verified sets are exact-Jaccard-thresholded, so any
    # disagreement can only be candidate-generation recall, never a
    # false positive: pairs found by both must be identical pairs
    assert ours & mllib == mllib & ours
    # our chain recalls at least as many planted pairs as MLlib
    assert len(planted & ours) >= len(planted & mllib)
    assert len(planted & ours) >= 10  # near-all of the 12 planted


# --- strongly connected components ------------------------------------


def _tarjan_sccs(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Iterative Tarjan — the single-process reference; returns
    node -> min-id-of-SCC labels."""
    adj: dict[int, list[int]] = {}
    nodes = set()
    for a, b in edges:
        nodes.add(a)
        nodes.add(b)
        if a != b:
            adj.setdefault(a, []).append(b)
    index = {}
    low = {}
    on_stack = set()
    stack: list[int] = []
    label: dict[int, int] = {}
    counter = [0]

    def strongconnect(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj.get(v, []))):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])

    for v in sorted(nodes):
        if v not in index:
            strongconnect(v)
    return label


def _spark_sccs(spark, edges):
    from clear_map_data_pipeline_spark.operators.graph import (
        strongly_connected_components,
    )

    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in strongly_connected_components(df).collect()
    }


@pytest.mark.parametrize(
    "name,edges",
    [
        ("pure_dag", [(1, 2), (2, 3), (1, 3), (3, 4)]),
        ("one_cycle", [(1, 2), (2, 3), (3, 1), (3, 4)]),
        ("two_sccs_bridge", [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3)]),
        ("self_loops", [(5, 5), (5, 6), (6, 7), (7, 6)]),
        ("reverse_chain", [(5, 4), (4, 3), (3, 2), (2, 1)]),
        ("nested", [(1, 2), (2, 3), (3, 2), (3, 1), (3, 4), (4, 5), (5, 4)]),
    ],
)
def test_scc_shapes_match_tarjan(spark, name, edges):
    assert _spark_sccs(spark, edges) == _tarjan_sccs(edges)


@pytest.mark.parametrize("seed", [0, 1])
def test_scc_random_digraph_matches_tarjan(spark, seed):
    rng = random.Random(seed)
    n = 40
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(int(n * 1.5))
    ]
    assert _spark_sccs(spark, edges) == _tarjan_sccs(edges)


def test_scc_vs_undirected_cc_divergence(spark):
    """The case that motivates SCC: a DAG is ONE undirected component
    but all singleton SCCs."""
    edges = [(1, 2), (2, 3), (2, 4)]
    scc = _spark_sccs(spark, edges)
    assert scc == {1: 1, 2: 2, 3: 3, 4: 4}
    df = spark.createDataFrame(edges, "src long, dst long")
    cc = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert set(cc.values()) == {1}


# --- k-core ------------------------------------------------------------


def _py_k_core(edges: list[tuple[int, int]], k: int) -> set[int]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for w in adj[v]:
                    adj[w].discard(v)
                del adj[v]
                changed = True
    return set(adj)


@pytest.mark.parametrize("k", [1, 2, 3])
@pytest.mark.parametrize("seed", [0, 3])
def test_k_core_random_matches_reference(spark, k, seed):
    from clear_map_data_pipeline_spark.operators.graph import k_core

    rng = random.Random(seed)
    n = 60
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(2 * n)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"] for r in k_core(df, k).collect()}
    assert got == _py_k_core(edges, k)


def test_k_core_peels_tendrils_keeps_clique(spark):
    """A 4-clique with pendant chains: 3-core = exactly the clique —
    the spam-farm/orphan peeling story in miniature."""
    from clear_map_data_pipeline_spark.operators.graph import k_core

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tendrils = [(0, 10), (10, 11), (11, 12), (1, 20)]
    df = spark.createDataFrame(clique + tendrils, "src long, dst long")
    stats = {}
    got = {r["node"] for r in k_core(df, 3, stats=stats).collect()}
    assert got == {0, 1, 2, 3}
    assert stats["rounds"] <= 4  # peel depth, not node count


def test_k_core_validation(spark):
    from clear_map_data_pipeline_spark.operators.graph import k_core

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        k_core(df, 0)


def test_k_core_peels_to_empty(spark):
    """A path graph has no 2-core: the peel must shrink the edge set
    all the way to empty and return zero rows (the r10 fused
    keep+shrink loop's n_edges == 0 exit)."""
    from clear_map_data_pipeline_spark.operators.graph import k_core

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    assert k_core(df, 2).collect() == []


def test_fits_broadcast_is_a_byte_budget():
    """The loop broadcast guard is a byte estimate against one budget
    (r10-verdict task #5), not a raw row threshold: wider rows admit
    proportionally fewer of them."""
    from clear_map_data_pipeline_spark.operators.graph import (
        _BROADCAST_BUDGET_BYTES,
        _fits_broadcast,
    )

    limit_default = _BROADCAST_BUDGET_BYTES // 20
    assert _fits_broadcast(limit_default)
    assert not _fits_broadcast(limit_default + 1)
    # same budget, narrower rows -> more rows admitted
    assert _fits_broadcast(_BROADCAST_BUDGET_BYTES // 16, row_bytes=16)
    assert not _fits_broadcast(limit_default + 1, row_bytes=20)
    assert not _fits_broadcast(10_000, row_bytes=10_000)


def test_k_core_empty_on_final_allowed_round(spark):
    """A peel that empties the edge set EXACTLY on round max_rounds has
    converged and must return empty, not raise (r10 ADVICE: the old
    next-round-top empty check deferred the exit past the round
    budget).  Path of 5 at k=2 empties on round 2: round 1 drops the
    endpoints (4 -> 2 edges), round 2 drops everything."""
    from clear_map_data_pipeline_spark.operators.graph import k_core

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    stats = {}
    assert k_core(df, 2, max_rounds=2, stats=stats).collect() == []
    assert stats["rounds"] == 2
    # same rounds accounting as the roomy-budget run
    stats_roomy = {}
    assert k_core(df, 2, max_rounds=60, stats=stats_roomy).collect() == []
    assert stats_roomy["rounds"] == 2


def test_k_core_self_loops_only(spark):
    """Self-loops are ignored, so a loop-only input normalizes to an
    empty edge set before the first peel round (the r10 loop's
    entry-empty exit)."""
    from clear_map_data_pipeline_spark.operators.graph import k_core

    df = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    assert k_core(df, 1).collect() == []


def test_k_core_immediate_fixpoint_returns_endpoints(spark):
    """Input already equal to its k-core: the first round drops no
    edge, and the fused loop's edge-fixpoint exit must return exactly
    the distinct endpoints."""
    from clear_map_data_pipeline_spark.operators.graph import k_core

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(clique, "src long, dst long")
    stats = {}
    got = {r["node"] for r in k_core(df, 3, stats=stats).collect()}
    assert got == {0, 1, 2, 3}
    assert stats["rounds"] == 1


def _duck_edges_cte(edges):
    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    return f"e(src, dst) AS (VALUES {vals})"


@pytest.mark.parametrize("seed", [3, 17])
def test_scc_sql_twin_matches_operator_random(spark, seed):
    """The DuckDB scc_sql twin (the suite_graph oracle generator) must
    agree with the Spark operator on random digraphs — independent of
    the fixture layout the registered query uses."""
    import random

    import duckdb

    from clear_map_data_pipeline_spark.operators.graph import (
        scc_sql,
        strongly_connected_components,
    )

    rng = random.Random(seed)
    n = 40
    edges = sorted(
        {
            (rng.randrange(n), rng.randrange(n))
            for _ in range(90)
        }
    )
    # self-loops stay IN (r07 advice): a node whose only edge is a
    # self-loop must get a singleton component from BOTH engines —
    # scc_sql derives its vertex set from the raw edge list exactly
    # like the operator's nodes_all, so no pre-stripping here.
    edges.append((n, n))  # guaranteed self-loop-only node
    sdf = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r["node"], r["component"])
        for r in strongly_connected_components(sdf).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.connect()
        .execute(scc_sql(_duck_edges_cte(edges)))
        .fetchall()
    }
    assert got == want


@pytest.mark.parametrize("k,seed", [(3, 5), (4, 11)])
def test_k_core_sql_twin_matches_operator_random(spark, k, seed):
    """The unrolled-peeling k_core_sql twin must agree with the Spark
    operator's true-fixpoint peel on random graphs (8 unrolled rounds
    cover the observed 2-4 round fixpoints with margin; disagreement
    would also flip the suite hash, but this pins it at unit level)."""
    import random

    import duckdb

    from clear_map_data_pipeline_spark.operators.graph import (
        k_core,
        k_core_sql,
    )

    rng = random.Random(seed)
    n = 50
    edges = sorted(
        {(rng.randrange(n), rng.randrange(n)) for _ in range(140)}
    )
    edges = [(s, d) for s, d in edges if s != d]
    sdf = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"] for r in k_core(sdf, k=k).collect()}
    want = {
        r[0]
        for r in duckdb.connect()
        .execute(k_core_sql(_duck_edges_cte(edges), k=k, peels=8))
        .fetchall()
    }
    assert got == want
