"""Fixed-iteration PageRank (operators/graph.py)."""

from __future__ import annotations

import pytest

from database_per_keyword_analysis_spark.operators import graph as G


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.rank for r in G.pagerank_fixed(df, **kw).collect()}


def test_pagerank_one_iteration_matches_hand_computation(spark):
    # A -> B, A -> C, B -> C; C dangling (contributes nothing — the
    # documented variant)
    got = _ranks(spark, [("A", "B"), ("A", "C"), ("B", "C")], iters=1)
    t, d = 0.15 / 3, 0.85
    assert got["A"] == pytest.approx(t, abs=1e-15)
    assert got["B"] == pytest.approx(t + d * (1 / 3 / 2), abs=1e-12)
    assert got["C"] == pytest.approx(t + d * (1 / 3 / 2 + 1 / 3), abs=1e-12)


def test_pagerank_sink_accumulates_and_is_deterministic(spark):
    # star into a hub: the hub must dominate after 3 iterations, and
    # two runs must agree bit-for-bit (DECIMAL-accumulated sums)
    edges = [(f"u{i}", "hub") for i in range(20)] + [("hub", "u0")]
    a = _ranks(spark, edges)
    b = _ranks(spark, edges)
    assert a == b
    assert max(a, key=a.get) == "hub"


def test_pagerank_rank_mass_is_bounded(spark):
    # teleport mass + damped link mass can never exceed 1 (dangling
    # nodes leak mass; they never create it)
    got = _ranks(spark, [("A", "B"), ("B", "A"), ("B", "C")])
    total = sum(got.values())
    assert 0.0 < total <= 1.0 + 1e-9


def test_label_propagation_merges_a_clique_and_ties_go_low(spark):
    # triangle {A,B,C} plus pendant D-E: after enough rounds the
    # triangle shares one label; synchronous ties resolve to the
    # smallest label so two runs are bit-identical
    edges = [("A", "B"), ("B", "C"), ("A", "C"), ("D", "E")]
    df = spark.createDataFrame(edges, "src string, dst string")
    from database_per_keyword_analysis_spark.operators import graph as G

    got = {r.node: r.label for r in G.label_propagation_fixed(df, iters=4).collect()}
    assert len({got["A"], got["B"], got["C"]}) == 1  # one community
    assert {got["D"], got["E"]} == {"D", "E"} or len({got["D"], got["E"]}) == 1
    again = {
        r.node: r.label
        for r in G.label_propagation_fixed(df, iters=4).collect()
    }
    assert got == again


def test_label_propagation_one_round_is_min_neighbor_on_ties(spark):
    # star: center X with leaves a,b,c — one round: X takes min leaf
    # label 'a' (all counts 1), every leaf takes 'X'
    edges = [("X", "a"), ("X", "b"), ("X", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    from database_per_keyword_analysis_spark.operators import graph as G

    got = {r.node: r.label for r in G.label_propagation_fixed(df, iters=1).collect()}
    assert got == {"X": "a", "a": "X", "b": "X", "c": "X"}


def test_pagerank_auto_posture_broadcasts_small_and_shuffles_large(spark):
    """Round-9 (r8 verdict item 3): broadcast_ranks=None derives the
    posture from the measured node count — broadcast under the
    threshold, shuffle past it — and both postures produce the same
    bit-exact ranks (DECIMAL-accumulated sums)."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("C", "A"), ("A", "C")],
        "src string, dst string",
    )
    auto = G.pagerank_fixed(df)  # 3 nodes << threshold -> broadcast
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # pin a tiny threshold: the auto path must pick the shuffle posture
    orig = G.GRAPH_BROADCAST_MAX_NODES
    try:
        G.GRAPH_BROADCAST_MAX_NODES = 0
        shuffled = G.pagerank_fixed(df)
    finally:
        G.GRAPH_BROADCAST_MAX_NODES = orig
    plan2 = shuffled._jdf.queryExecution().executedPlan().toString()
    # the per-iteration rate/sum joins are no longer broadcast (the
    # one-row node-count crossJoin legitimately stays broadcast)
    assert "SortMergeJoin" in plan2 or "ShuffledHashJoin" in plan2
    a = {r.node: r.rank for r in auto.collect()}
    b = {r.node: r.rank for r in shuffled.collect()}
    assert a == b  # bit-exact across postures


def test_label_propagation_auto_posture_matches_across_postures(spark):
    df = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("X", "Y")], "src string, dst string"
    )
    auto = G.label_propagation_fixed(df)
    orig = G.GRAPH_BROADCAST_MAX_NODES
    try:
        G.GRAPH_BROADCAST_MAX_NODES = 0
        shuffled = G.label_propagation_fixed(df)
    finally:
        G.GRAPH_BROADCAST_MAX_NODES = orig
    a = sorted((r.node, r.label) for r in auto.collect())
    b = sorted((r.node, r.label) for r in shuffled.collect())
    assert a == b


def test_bfs_min_hops_contracts(spark):
    """r10 BFS contracts: seeds at 0, every node at its MINIMUM
    distance even when a longer path exists, unreachable components
    absent, the max_hops bound enforced, seeds outside the graph kept
    at 0, and early exit (frontier drains before max_hops) result-
    neutral."""
    # a -> b -> c -> d plus shortcut a -> c; island x -> y
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("x", "y")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",), ("ghost",)], "node string")
    got = {
        (r.node, r.hops)
        for r in G.bfs_min_hops(edges, seeds, 2).collect()
    }
    assert got == {("a", 0), ("ghost", 0), ("b", 1), ("c", 1), ("d", 2)}
    # max_hops=1 cuts d; max_hops=10 early-exits after the graph drains
    got1 = {(r.node, r.hops) for r in G.bfs_min_hops(edges, seeds, 1).collect()}
    assert got1 == {("a", 0), ("ghost", 0), ("b", 1), ("c", 1)}
    got10 = {(r.node, r.hops) for r in G.bfs_min_hops(edges, seeds, 10).collect()}
    assert got10 == got
    # cycle safety: BFS terminates and keeps first-discovery hops
    cyc = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    s = spark.createDataFrame([("a",)], "node string")
    assert {(r.node, r.hops) for r in G.bfs_min_hops(cyc, s, 5).collect()} == {
        ("a", 0),
        ("b", 1),
    }


def test_bfs_min_hops_posture_equality(spark):
    """Auto-derived broadcast posture vs forced shuffle posture are
    result-identical (the graph-family posture contract)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    auto = sorted(
        (r.node, r.hops) for r in G.bfs_min_hops(edges, seeds, 3).collect()
    )
    forced = sorted(
        (r.node, r.hops)
        for r in G.bfs_min_hops(
            edges, seeds, 3, broadcast_frontier=False
        ).collect()
    )
    assert auto == forced


def test_triangle_listing_matches_brute_force(spark):
    """r10 triangle contracts: every triangle found exactly once as its
    id-sorted triple, on a seeded random graph vs itertools brute
    force; self-loops and duplicate/reversed edges are harmless."""
    import itertools
    import random

    rng = random.Random(7)
    nodes = list(range(20))
    edges = set()
    for _ in range(60):
        x, y = rng.sample(nodes, 2)
        edges.add((min(x, y), max(x, y)))
    rows = sorted(edges)
    # noise: reversed duplicates + a self-loop must not change anything
    noisy = rows + [(b, a) for a, b in rows[:10]] + [(3, 3)]
    df = spark.createDataFrame(noisy, "a long, b long")
    got = sorted(tuple(r) for r in G.triangle_listing(df).collect())
    brute = sorted(
        (x, y, z)
        for x, y, z in itertools.combinations(nodes, 3)
        if (x, y) in edges and (y, z) in edges and (x, z) in edges
    )
    assert got == brute
    # hub star graph (no triangles) and one closed fan
    star = [(0, i) for i in range(1, 10)] + [(1, 2)]
    sdf = spark.createDataFrame(star, "a long, b long")
    assert sorted(tuple(r) for r in G.triangle_listing(sdf).collect()) == [
        (0, 1, 2)
    ]
