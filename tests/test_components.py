"""Connected-components correctness (difPy O14 replacement)."""

from __future__ import annotations

import random

from sparkdedup.operators.components import connected_components


def _uf_reference(edges):
    """Tiny union-find ground truth."""
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
    return {x: find(x) for x in parent}


def _run(spark, edges):
    df = spark.createDataFrame(
        [(a, b, 0.0, "x") for a, b in edges],
        "src long, dst long, dist double, kind string")
    got = {r["file_id"]: r["cluster_id"]
           for r in connected_components(df).collect()}
    return got


def _assert_matches(spark, edges):
    got = _run(spark, edges)
    want = _uf_reference(edges)
    assert got == want


def test_chain(spark):
    _assert_matches(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])


def test_star(spark):
    _assert_matches(spark, [(10, i) for i in range(1, 8)])


def test_clique(spark):
    nodes = list(range(5))
    _assert_matches(spark, [(a, b) for a in nodes for b in nodes if a < b])


def test_two_components_and_reversed_edges(spark):
    _assert_matches(spark, [(2, 1), (3, 2), (100, 101), (102, 101)])


def test_self_loops_and_duplicates_ignored(spark):
    got = _run(spark, [(1, 1), (1, 2), (2, 1), (1, 2)])
    assert got == {1: 1, 2: 1}


def test_random_graph_vs_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(0, 400))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(300)]
    edges = [(a, b) for a, b in edges if a != b]
    _assert_matches(spark, edges)


def test_cluster_id_is_min_member(spark):
    got = _run(spark, [(7, 3), (3, 9), (20, 15)])
    assert got[7] == got[3] == got[9] == 3
    assert got[20] == got[15] == 15


def _run_forced(spark, edges, driver_max_edges):
    df = spark.createDataFrame(
        [(a, b, 0.0, "x") for a, b in edges],
        "src long, dst long, dist double, kind string")
    return {r["file_id"]: r["cluster_id"]
            for r in connected_components(
                df, driver_max_edges=driver_max_edges).collect()}


def test_driver_and_distributed_paths_agree(spark):
    """Round-6 optimization: the small-graph driver solve must emit
    exactly the distributed alternating-star result (same nodes, same
    min-id labels) — on a random graph, a chain, and a hub."""
    rng = random.Random(11)
    graphs = [
        [(rng.randrange(80), rng.randrange(80)) for _ in range(150)],
        [(i, i + 1) for i in range(40)],
        [(50, i) for i in range(30)],
    ]
    for edges in graphs:
        edges = [(a, b) for a, b in edges if a != b]
        driver = _run_forced(spark, edges, driver_max_edges=10**6)
        dist = _run_forced(spark, edges, driver_max_edges=0)
        assert driver == dist == _uf_reference(edges)


def test_driver_cap_boundary_falls_back(spark):
    """A graph one edge over the cap takes the distributed path (the
    probe reads cap+1 rows and refuses to solve on the driver) and
    still produces the union-find result."""
    edges = [(1, 2), (2, 3), (10, 11)]
    got = _run_forced(spark, edges, driver_max_edges=2)
    assert got == _uf_reference(edges)
    # exactly-at-cap stays on the driver path and agrees too
    got_at = _run_forced(spark, edges, driver_max_edges=3)
    assert got_at == _uf_reference(edges)


def test_empty_edges_driver_path(spark):
    df = spark.createDataFrame([], "src long, dst long, dist double, kind string")
    assert connected_components(df).collect() == []
    assert connected_components(df, driver_max_edges=0).collect() == []
