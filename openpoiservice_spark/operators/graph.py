"""Distributed connected components — the shared clustering core of the
dedup pipelines (text near-dup graph, embedding near-dup graph).

Two interchangeable loop bodies behind one signature:
  * `algorithm="label"` (default) — iterative min-label propagation: each
    round every node takes the minimum of its own label and its
    neighbours' labels — one equi-join (edges x labels) plus one groupBy
    min, the standard DataFrame CC recipe.  Rounds ~ graph DIAMETER;
    near-dup graphs are shallow (clusters of copies), so a handful of
    rounds suffices.
  * `algorithm="two-phase"` — alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    same join/groupBy primitives, O(log n) rounds REGARDLESS of diameter —
    the escape hatch for chain-shaped graphs whose diameter exceeds any
    sane label-propagation budget.

Convergence is CHECKED, and running out of rounds is LOUD (round-5 ADVICE:
silently returning unconverged labels splits components — curation keeps
phantom survivors and component-keyed splits leak, with no signal).

Lineage control per round: `localCheckpoint()` by default (truncates the
per-round plan cascade; blocks pinned on executors), or a RELIABLE
`checkpoint()` when `checkpoint_dir` is given — on a real cluster an
executor loss makes localCheckpoint lineage unrecoverable mid-job, so any
long-running production CC should pass a durable dir (HDFS/object store)
and pay the write."""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class NotConverged(RuntimeError):
    """connected_components ran out of rounds with labels still changing —
    the returned labels would have split real components."""


def _checkpointer(df_sample: DataFrame, checkpoint_dir: str | None):
    if checkpoint_dir is None:
        return lambda df: df.localCheckpoint()
    sc = df_sample.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return lambda df: df.checkpoint()


def connected_components(nodes: DataFrame, edges: DataFrame,
                         node_col: str = "id",
                         src: str = "src", dst: str = "dst",
                         max_iter: int = 25,
                         checkpoint_dir: str | None = None,
                         algorithm: str = "label",
                         on_nonconverged: str = "raise") -> DataFrame:
    """Label every node with the SMALLEST node id reachable from it.

    nodes: one row per node (`node_col`); isolated nodes label themselves.
    edges: undirected edge list (`src`, `dst`) — symmetrized here.
    checkpoint_dir: None = localCheckpoint per round (single-job fast path);
    a path = reliable checkpoint() per round (survives executor loss).
    algorithm: "label" (rounds ~ diameter) or "two-phase" (large-star/
    small-star, rounds ~ log n — use for high-diameter graphs).
    on_nonconverged: "raise" (default — wrong labels must not flow silently
    into curation/splits) or "warn".
    Returns (node_col, component)."""
    if algorithm not in ("label", "two-phase"):
        raise ValueError("algorithm must be 'label' or 'two-phase'")
    if on_nonconverged not in ("raise", "warn"):
        raise ValueError("on_nonconverged must be 'raise' or 'warn'")
    ckpt = _checkpointer(nodes, checkpoint_dir)
    sym = ckpt(
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .union(edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d")))
    )
    if algorithm == "two-phase":
        labels = _two_phase(nodes, sym, node_col, max_iter, ckpt,
                            on_nonconverged)
    else:
        labels = _label_propagation(nodes, sym, node_col, max_iter, ckpt,
                                    on_nonconverged)
    return labels


def _nonconverged(max_iter: int, algorithm: str, on_nonconverged: str):
    msg = (f"connected_components({algorithm}) did not converge within "
           f"{max_iter} rounds — labels would split real components. "
           f"Raise max_iter, or use algorithm='two-phase' (O(log n) rounds) "
           f"for high-diameter graphs.")
    if on_nonconverged == "raise":
        raise NotConverged(msg)
    warnings.warn(msg, RuntimeWarning, stacklevel=3)


def _label_propagation(nodes: DataFrame, sym: DataFrame, node_col: str,
                       max_iter: int, ckpt, on_nonconverged: str) -> DataFrame:
    labels = ckpt(nodes.select(
        F.col(node_col), F.col(node_col).alias("component")))
    for _ in range(max_iter):
        prop = (
            sym.join(labels, sym["_s"] == labels[node_col])
            .select(F.col("_d").alias(node_col), "component")
        )
        new_labels = ckpt(
            labels.unionByName(prop)
            .groupBy(node_col).agg(F.min("component").alias("component"))
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("component", "_old"), node_col)
            .filter(F.col("component") != F.col("_old")).count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    _nonconverged(max_iter, "label", on_nonconverged)
    return labels


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u, connect every STRICTLY LARGER neighbour v to
    m = min(N(u) + {u}) — one groupBy-min + one equi-join per round.
    Neighbourhoods are undirected, so the (directed) edge set coming out of
    small-star is symmetrized first."""
    ee = e.unionByName(
        e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d")))
    mins = ee.groupBy("_s").agg(
        F.least(F.min("_d"), F.first("_s")).alias("_m"))
    return (
        ee.join(mins, "_s")
        .filter(F.col("_d") > F.col("_s"))
        .select(F.col("_d").alias("_s"), F.col("_m").alias("_d"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient each edge larger -> smaller, then for each node u connect
    every smaller-or-equal neighbour (and u itself) to the minimum."""
    o = e.select(F.greatest("_s", "_d").alias("_s"),
                 F.least("_s", "_d").alias("_d"))
    mins = o.groupBy("_s").agg(F.min("_d").alias("_m"))
    nbr = (
        o.join(mins, "_s")
        .select(F.col("_d").alias("_s"), F.col("_m").alias("_d"))
    )
    self_link = mins.select(F.col("_s"), F.col("_m").alias("_d"))
    return nbr.unionByName(self_link).filter(
        F.col("_s") != F.col("_d")).distinct()


def _two_phase(nodes: DataFrame, sym: DataFrame, node_col: str,
               max_iter: int, ckpt, on_nonconverged: str) -> DataFrame:
    """Alternate large-star / small-star until the edge set is stable —
    O(log n) rounds whatever the diameter.  At fixpoint the edges form
    stars (node -> component min); isolated nodes label themselves."""
    e = ckpt(sym.filter(F.col("_s") != F.col("_d")).distinct())
    converged = False
    for _ in range(max_iter):
        new_e = ckpt(_small_star(_large_star(e)))
        diff = (new_e.exceptAll(e).take(1) or e.exceptAll(new_e).take(1))
        e = new_e
        if not diff:
            converged = True
            break
    if not converged:
        _nonconverged(max_iter, "two-phase", on_nonconverged)
    comp = e.groupBy("_s").agg(F.min("_d").alias("component")) \
            .withColumnRenamed("_s", node_col)
    return (
        nodes.select(node_col)
        .join(comp, node_col, "left")
        .select(node_col,
                F.coalesce(F.col("component"), F.col(node_col))
                .alias("component"))
    )
