"""operators/graph.py: connected-components equivalence between the
label-propagation and large-star/small-star loop bodies, reliable
checkpoint path, and loud non-convergence (round-5 verdict item 6 + ADVICE:
silently-unconverged labels split components)."""

import random

import pytest
from pyspark.sql import functions as F  # noqa: F401

from openpoiservice_spark.operators import graph


def _cc_oracle(n_nodes, edges):
    """Driver-side union-find ground truth."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component = smallest reachable id
    best = {}
    for i in range(n_nodes):
        r = find(i)
        best[r] = min(best.get(r, i), i)
    return {i: best[find(i)] for i in range(n_nodes)}


def _run(spark, n_nodes, edges, **kw):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], ["id"])
    e = spark.createDataFrame(edges or [(0, 0)], ["src", "dst"])
    if not edges:
        e = e.filter(F.lit(False))
    out = graph.connected_components(nodes, e, **kw)
    return {r.id: r.component for r in out.collect()}


@pytest.mark.parametrize("seed", [1, 2])
def test_label_and_two_phase_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    want = _cc_oracle(n, edges)
    got_label = _run(spark, n, edges)
    got_two = _run(spark, n, edges, algorithm="two-phase")
    assert got_label == want
    assert got_two == want


def test_chain_diameter_exceeds_label_budget_two_phase_converges(spark):
    """A 12-node path graph: label propagation needs ~diameter rounds, so
    max_iter=3 must RAISE (not silently split the chain); two-phase
    converges in O(log n) rounds under the same budget."""
    n = 12
    edges = [(i, i + 1) for i in range(n - 1)]
    with pytest.raises(graph.NotConverged, match="did not converge"):
        _run(spark, n, edges, max_iter=3)
    got = _run(spark, n, edges, max_iter=5, algorithm="two-phase")
    assert got == {i: 0 for i in range(n)}


def test_nonconverged_warn_mode(spark):
    n = 12
    edges = [(i, i + 1) for i in range(n - 1)]
    with pytest.warns(RuntimeWarning, match="did not converge"):
        _run(spark, n, edges, max_iter=3, on_nonconverged="warn")


def test_reliable_checkpoint_dir_path(spark, tmp_path):
    """checkpoint_dir switches per-round lineage truncation to a RELIABLE
    checkpoint (survives executor loss on a real cluster); results are
    identical and checkpoint files land in the given dir."""
    import os

    n = 30
    rng = random.Random(7)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(25)]
    want = _cc_oracle(n, edges)
    ckdir = str(tmp_path / "ck")
    got = _run(spark, n, edges, checkpoint_dir=ckdir)
    assert got == want
    assert os.listdir(ckdir)  # reliable checkpoints were materialized
    got2 = _run(spark, n, edges, checkpoint_dir=ckdir,
                algorithm="two-phase")
    assert got2 == want


def test_isolated_nodes_label_themselves(spark):
    got = _run(spark, 5, [(0, 1)], algorithm="two-phase")
    assert got == {0: 0, 1: 0, 2: 2, 3: 3, 4: 4}
    got = _run(spark, 4, [])
    assert got == {i: i for i in range(4)}
