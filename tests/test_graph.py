"""Connected-components: label propagation vs large-star/small-star.

The two algorithms must agree (same (node, component) set, component =
min member) on random graphs, and the star variant must handle
high-diameter graphs that exceed label propagation's round budget.
"""

from __future__ import annotations

import random

import pytest

from datafusion_delta_queries_spark.functions.graph import connected_components


def _truth(edges):
    """Union-find ground truth: node -> min member of its component."""
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


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    out = connected_components(df, **kw)
    return {(r["node"], r["component"]) for r in out.collect()}


@pytest.mark.parametrize("algorithm", ["label", "star"])
@pytest.mark.parametrize("seed", [7, 23])
def test_cc_matches_union_find_on_random_graph(spark, algorithm, seed):
    rng = random.Random(seed)
    edges = [
        (rng.randrange(60), rng.randrange(60))
        for _ in range(80)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    got = _run(spark, edges, algorithm=algorithm)
    assert got == set(_truth(edges).items())


def test_cc_star_handles_high_diameter_path(spark):
    """A 120-node path has diameter 119 — label propagation would need
    119 rounds, large-star/small-star contracts it in O(log²)."""
    edges = [(i, i + 1) for i in range(119)]
    got = _run(spark, edges, algorithm="star", max_iter=15)
    assert got == {(i, 0) for i in range(120)}


def test_cc_label_raises_instead_of_silent_nonconvergence(spark):
    edges = [(i, i + 1) for i in range(40)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _run(spark, edges, algorithm="label", max_iter=3)


def test_cc_auto_falls_back_to_star_on_high_diameter(spark):
    """A 1000-node path (diameter 999) blows label propagation's auto
    budget; the default strategy must converge via the star fallback
    with no caller intervention."""
    edges = [(i, i + 1) for i in range(999)]
    got = _run(spark, edges)  # algorithm defaults to "auto"
    assert got == {(i, 0) for i in range(1000)}


def test_cc_auto_matches_label_on_easy_graph(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    assert _run(spark, edges) == _run(spark, edges, algorithm="label")


def test_cc_releases_checkpoint_blocks(spark):
    """Superseded per-round checkpoints are released inline and the
    loop-final ones by release_checkpoints(); after both, the CC run
    leaves no extra persisted RDDs behind."""
    from datafusion_delta_queries_spark.functions import graph

    def persisted_rdds():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    graph.release_checkpoints()  # drop leftovers from earlier tests
    before = persisted_rdds()
    edges = [(i, i + 1) for i in range(10)] + [(100, 101)]
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    out = connected_components(df, algorithm="label")
    out.collect()
    released = graph.release_checkpoints()
    assert released >= 1  # at least the final labels checkpoint was live
    assert persisted_rdds() <= before


@pytest.mark.parametrize("algorithm", ["label", "star"])
def test_cc_self_loops_yield_singleton_components(spark, algorithm):
    """Shared contract: every node incident to an edge — including a
    node whose ONLY edges are self-loops — appears in the output as its
    own component. (The star variant used to drop such nodes.)"""
    edges = [(1, 2), (3, 3), (1, 1)]  # 3 is loop-only; 1 has a real edge too
    got = _run(spark, edges, algorithm=algorithm)
    assert got == {(1, 1), (2, 1), (3, 3)}


def test_cc_agree_on_clique_and_chain_mix(spark):
    edges = (
        [(a, b) for a in range(5) for b in range(a + 1, 5)]  # clique 0-4
        + [(10, 11), (11, 12), (12, 13)]  # chain
        + [(20, 21)]  # pair
    )
    label = _run(spark, edges, algorithm="label")
    star = _run(spark, edges, algorithm="star")
    assert label == star == set(_truth(edges).items())
