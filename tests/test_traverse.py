"""k-hop BFS traversal: hand-computed distances on a known graph."""

from __future__ import annotations

from legal_knowledge_graph_spark.operators.traverse import k_hop_neighbors


def _graph(spark):
    #   0 -> 1 -> 2 -> 3 -> 4   and a shortcut 0 -> 3, plus 9 isolated
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3)], "src long, dst long"
    )
    sources = spark.createDataFrame([(0,)], "node long")
    return edges, sources


def test_k_hop_out_min_distances(spark):
    edges, sources = _graph(spark)
    got = {r["node"]: r["dist"] for r in k_hop_neighbors(edges, sources, 3).collect()}
    # 3 is reachable at dist 1 via the shortcut (min distance wins)
    assert got == {0: 0, 1: 1, 3: 1, 2: 2, 4: 2}


def test_k_hop_respects_k(spark):
    edges, sources = _graph(spark)
    got = {r["node"]: r["dist"] for r in k_hop_neighbors(edges, sources, 1).collect()}
    assert got == {0: 0, 1: 1, 3: 1}


def test_k_hop_direction_in_and_both(spark):
    edges, _ = _graph(spark)
    sources = spark.createDataFrame([(4,)], "node long")
    got_in = {
        r["node"]: r["dist"] for r in k_hop_neighbors(edges, sources, 2, "in").collect()
    }
    assert got_in == {4: 0, 3: 1, 2: 2, 0: 2}
    got_both = {
        r["node"]: r["dist"]
        for r in k_hop_neighbors(edges, sources, 2, "both").collect()
    }
    assert got_both == {4: 0, 3: 1, 2: 2, 0: 2}


def test_k_hop_early_stop_on_exhausted_frontier(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    sources = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["dist"] for r in k_hop_neighbors(edges, sources, 10).collect()}
    assert got == {0: 0, 1: 1}


def test_k_hop_deep_path_graph_bounded_chain(spark):
    """k=16 on a 20-node path: exercises the eager-checkpoint-every-4-
    rounds chain bound (the lineage would otherwise nest 16 lazy
    checkpoints deep) and verifies exact distances at depth."""
    n = 20
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    sources = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["dist"] for r in k_hop_neighbors(edges, sources, 16).collect()}
    assert got == {i: i for i in range(17)}
