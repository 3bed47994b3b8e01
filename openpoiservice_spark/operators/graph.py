"""Distributed connected components — the shared clustering core of the
dedup pipelines (text near-dup graph, embedding near-dup graph).

One primitive: iterative min-label propagation.  Each round every node takes
the minimum of its own label and its neighbours' labels — one equi-join
(edges x labels) plus one groupBy min, the standard DataFrame CC recipe.
Convergence is checked (a changed-label count per round) and bounded by the
graph diameter; near-dup graphs are shallow (clusters of copies), so a
handful of rounds suffices.  Every round's result is `localCheckpoint()`ed:
without it the lazy plan accumulates one nested join per round and the
final action replays the whole cascade — the classic lineage blowup of
iterative DataFrame algorithms.

At extreme scale/diameter switch the loop body to large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond" — same join
primitives, O(log n) rounds); the call surface here stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(nodes: DataFrame, edges: DataFrame,
                         node_col: str = "id",
                         src: str = "src", dst: str = "dst",
                         max_iter: int = 25) -> DataFrame:
    """Label every node with the SMALLEST node id reachable from it.

    nodes: one row per node (`node_col`); isolated nodes label themselves.
    edges: undirected edge list (`src`, `dst`) — symmetrized here.
    Returns (node_col, component)."""
    sym = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .union(edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d")))
    ).localCheckpoint()
    labels = nodes.select(
        F.col(node_col), F.col(node_col).alias("component")).localCheckpoint()
    for _ in range(max_iter):
        prop = (
            sym.join(labels, sym["_s"] == labels[node_col])
            .select(F.col("_d").alias(node_col), "component")
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy(node_col).agg(F.min("component").alias("component"))
        ).localCheckpoint()
        changed = (
            new_labels.join(
                labels.withColumnRenamed("component", "_old"), node_col)
            .filter(F.col("component") != F.col("_old")).count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
