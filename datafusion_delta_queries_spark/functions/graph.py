"""Distributed graph primitives for dedup-cluster formation.

Pair-level dedup (MinHash/Jaccard/cosine) emits *edges*; a training
pipeline needs *clusters* — one canonical document per group of mutual
near-duplicates — which is connected components over the dup graph.

The implementation is minimum-label propagation: every node starts
labeled with itself; each round, each node takes the min label among
itself and its neighbors; fixpoint = components labeled by their
minimum member. Each round is one join + one partial-aggregated
groupBy (both on the node key), and the round count is bounded by the
component diameter — near-dup graphs are overwhelmingly tiny cliques
and chains, so this converges in a handful of rounds. At larger
diameters, switch to the large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond"),
which contracts in O(log²) rounds; the driver-side loop below only
reads a 1-row convergence aggregate per round, never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Components of the undirected graph → (node, component) rows.

    ``component`` is the minimum node id in the component. Covers every
    node incident to at least one edge. Deterministic: min is
    order-insensitive.
    """
    sym = edges.selectExpr(f"{src} AS a", f"{dst} AS b").unionByName(
        edges.selectExpr(f"{dst} AS a", f"{src} AS b")
    )
    sym = sym.repartition("a").localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            labels.join(sym, labels["node"] == sym["a"])
            .select(F.col("b").alias("node"), "component")
            .unionByName(labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # One-row convergence probe (aggregate, not a data collect):
        # labels are monotonically non-increasing, so the sum strictly
        # drops until fixpoint.
        changed = (
            neighbor_min.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        # Checkpoint breaks the growing lineage chain (iterative plans
        # otherwise re-derive every prior round each action).
        labels = neighbor_min.localCheckpoint(eager=True)
        if changed == 0:
            break
    return labels
