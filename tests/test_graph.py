"""Connected-components (dup-family) operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_pulsar_remote_write_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df, "id_a", "id_b").collect()
    return {r.node: r.component for r in rows}


def test_chain_collapses_transitively(spark):
    # A-B, B-C, C-D: one family labeled by the min id, though A-D never paired
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_stay_disjoint(spark):
    got = _cc(spark, [(10, 11), (20, 21), (21, 22), (30, 31)])
    assert got == {10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 30: 30, 31: 30}


def test_edge_direction_is_irrelevant(spark):
    # higher-id first: propagation still reaches the min label
    got = _cc(spark, [(5, 1), (9, 5), (2, 9)])
    assert set(got.values()) == {1}


def test_long_path_converges_past_one_round(spark):
    # a 9-hop path needs several propagation rounds; fixpoint must still
    # label every node with the global min
    edges = [(i, i + 1) for i in range(9)]
    got = _cc(spark, edges)
    assert got == {i: 0 for i in range(10)}


def test_triangle_with_pendant(spark):
    got = _cc(spark, [(3, 4), (4, 5), (3, 5), (5, 6)])
    assert got == {3: 3, 4: 3, 5: 3, 6: 3}


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_random_graphs_match_union_find(spark):
    # a batch of adversarial-ish random graphs vs a driver-side union-find
    import random

    rng = random.Random(42)
    for trial in range(5):
        n = rng.randrange(5, 40)
        m = rng.randrange(1, 60)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        got = _cc(spark, edges)
        want = _union_find_components(edges)
        assert got == want, f"trial {trial}: {sorted(edges)}"


def test_pagerank_fixed_point_matches_reference_loop(spark):
    """Integer PageRank over a weighted triangle-plus-tail graph equals a
    plain Python fixed-point loop using the same floor/double arithmetic."""
    from prometheus_pulsar_remote_write_spark.operators.graph import (
        pagerank_fixed_point,
    )

    directed = [("a", "b", 2), ("b", "c", 1), ("c", "a", 3), ("c", "d", 1)]
    und = directed + [(v, u, w) for u, v, w in directed]
    df = spark.createDataFrame(und, "u string, v string, w long")
    got = {
        r["node"]: (r["rank_micro"], r["wdeg"])
        for r in pagerank_fixed_point(df, iters=5).collect()
    }

    import math
    from collections import defaultdict

    wdeg = defaultdict(int)
    for u, _, w in und:
        wdeg[u] += w
    rank = {n: 1_000_000 for n in wdeg}
    for _ in range(5):
        recv = defaultdict(int)
        for u, v, w in und:
            recv[v] += math.floor(rank[u] * w / wdeg[u])
        rank = {
            n: 150_000 + math.floor(85 * c / 100) for n, c in recv.items()
        }
    assert got == {n: (rank[n], wdeg[n]) for n in rank}


def test_pagerank_star_graph_hub_dominates(spark):
    """On an undirected star, the hub must out-rank every leaf, and all
    leaves tie exactly (symmetry is preserved by the integer arithmetic)."""
    from prometheus_pulsar_remote_write_spark.operators.graph import (
        pagerank_fixed_point,
    )

    leaves = [f"leaf{i}" for i in range(6)]
    directed = [("hub", leaf, 1) for leaf in leaves]
    und = directed + [(v, u, w) for u, v, w in directed]
    df = spark.createDataFrame(und, "u string, v string, w long")
    got = {r["node"]: r["rank_micro"] for r in pagerank_fixed_point(df).collect()}
    leaf_ranks = {got[leaf] for leaf in leaves}
    assert len(leaf_ranks) == 1
    assert got["hub"] > leaf_ranks.pop()
