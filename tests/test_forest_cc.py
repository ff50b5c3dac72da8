"""Spanning-forest incremental CC: cheap-path guarantees + randomized
prefix equality.

The giant-component criterion: intra-component inserts and non-bridge
deletions must NOT run the label-propagation fixed point at all (their
cost is O(delta), not O(component)); only bridge cuts re-solve."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pathway_spark.streaming import incremental_graph as ig
from pathway_spark.streaming.differential import DIFF, DifferentialGraph
from pathway_spark.streaming.incremental_graph import (
    incremental_connected_components)


def _edges(spark, rows, diff=1):
    df = spark.createDataFrame(rows, "u long, v long")
    return df.withColumn(DIFF, F.lit(diff)) if diff != 1 else df


def _snap(df):
    return sorted((r["w"], r["label"]) for r in df.collect())


def _cc_oracle(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return sorted((w, find(w)) for w in parent)


@pytest.fixture(params=[True, False], ids=["resident", "distributed"])
def graph(spark, request):
    g = DifferentialGraph(spark, resident=request.param)
    src = g.source("e", spark.createDataFrame([], "u long, v long"))
    return g, src, incremental_connected_components(src)


def _count_solves(monkeypatch):
    """Count component re-solves on BOTH paths: the distributed
    fixed point (_cc_labels_forest) and the resident BFS
    (_cc_solve_py) — the cheap-path guarantee must hold for each."""
    calls = {"n": 0}
    orig = ig._cc_labels_forest
    orig_py = ig._cc_solve_py

    def counting_py(res_nodes, est_idx):
        calls["n"] += 1
        return orig_py(res_nodes, est_idx)

    def counting(e):
        calls["n"] += 1
        return orig(e)

    monkeypatch.setattr(ig, "_cc_labels_forest", counting)
    monkeypatch.setattr(ig, "_cc_solve_py", counting_py)
    return calls


def test_cheap_paths_skip_fixed_point(spark, graph, monkeypatch):
    g, src, out = graph
    calls = _count_solves(monkeypatch)
    (d0,) = g.step(out, e=_edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)]))
    assert calls["n"] == 1                       # priming solve only
    assert _snap(d0) == [(1, 1), (2, 1), (3, 1), (4, 1)]

    # intra-component insert: no solve, empty delta
    (d1,) = g.step(out, e=_edges(spark, [(2, 4)]))
    assert calls["n"] == 1
    assert d1.count() == 0

    # non-forest deletion (the cycle edge (1,4) cannot be the tree edge
    # reached last... delete the edge we just added): no solve, no delta
    (d2,) = g.step(out, e=_edges(spark, [(2, 4)], diff=-1))
    assert calls["n"] == 1
    assert d2.count() == 0

    # merging two components via union-find flip: still no solve
    (d3,) = g.step(out, e=_edges(spark, [(10, 11)]))
    assert calls["n"] == 1
    assert _snap(d3) == [(10, 10), (11, 10)]
    (d4,) = g.step(out, e=_edges(spark, [(4, 10)]))
    assert calls["n"] == 1
    assert sorted((r["w"], r["label"], r[DIFF]) for r in d4.collect()) == [
        (10, 1, 1), (10, 10, -1), (11, 1, 1), (11, 10, -1)]

    # bridge cut: NOW a component re-solve happens, split is exact
    (d5,) = g.step(out, e=_edges(spark, [(4, 10)], diff=-1))
    assert calls["n"] == 2
    assert sorted((r["w"], r["label"], r[DIFF]) for r in d5.collect()) == [
        (10, 1, -1), (10, 10, 1), (11, 1, -1), (11, 10, 1)]


def test_chained_merges_one_batch(spark, graph):
    g, src, out = graph
    g.step(out, e=_edges(spark, [(1, 2)]))
    g.step(out, e=_edges(spark, [(5, 6), (8, 9)]))
    # one batch chains three components: 1-2 <-> 5-6 <-> 8-9
    (d,) = g.step(out, e=_edges(spark, [(2, 5), (6, 8)]))
    assert sorted((r["w"], r["label"], r[DIFF]) for r in d.collect()) == [
        (5, 1, 1), (5, 5, -1), (6, 1, 1), (6, 5, -1),
        (8, 1, 1), (8, 8, -1), (9, 1, 1), (9, 8, -1)]


def test_self_loop_lifecycle(spark, graph):
    g, src, out = graph
    (d0,) = g.step(out, e=_edges(spark, [(7, 7)]))
    assert _snap(d0) == [(7, 7)]
    (d1,) = g.step(out, e=_edges(spark, [(7, 7)], diff=-1))
    assert sorted((r["w"], r["label"], r[DIFF]) for r in d1.collect()) == [
        (7, 7, -1)]


def test_randomized_prefix_equality_both_strategies(spark):
    for strategy in ("forest", "component"):
        rng = random.Random(13)
        g = DifferentialGraph(spark)
        src = g.source("e", spark.createDataFrame([], "u long, v long"))
        out = incremental_connected_components(src, strategy=strategy)
        live, log = [], None
        for step in range(7):
            ins = [(rng.randrange(16), rng.randrange(16))
                   for _ in range(rng.randrange(1, 4))]
            k = min(len(live), rng.randrange(0, 3))
            dels = rng.sample(live, k=k) if k else []
            for e in dels:
                live.remove(e)
            live += ins
            delta = _edges(spark, ins)
            if dels:
                delta = (delta.withColumn(DIFF, F.lit(1))
                         .unionByName(_edges(spark, dels, diff=-1)))
            (d,) = g.step(out, e=delta)
            d = d.localCheckpoint(eager=True)
            log = d if log is None else log.unionByName(d)
            got = _snap(DifferentialGraph.integrate(log))
            want = _cc_oracle(live)
            assert got == want, (
                f"{strategy} step {step}: {got} != {want}")


def test_forest_cc_durable_restore(spark, tmp_path):
    sd = str(tmp_path / "state")

    def build(g):
        src = g.source("e", spark.createDataFrame([], "u long, v long"))
        return incremental_connected_components(src)

    g = DifferentialGraph(spark, state_dir=sd)
    out = build(g)
    g.step(out, e=_edges(spark, [(1, 2), (2, 3), (3, 4)]))
    g.commit()

    g2 = DifferentialGraph(spark, state_dir=sd)
    out2 = build(g2)
    # bridge cut straight after restore: forest + trace restored
    (d,) = g2.step(out2, e=_edges(spark, [(2, 3)], diff=-1))
    assert sorted((r["w"], r["label"], r[DIFF]) for r in d.collect()) == [
        (3, 1, -1), (3, 3, 1), (4, 1, -1), (4, 3, 1)]


def test_self_loop_delete_keeps_other_edges_no_resolve(spark, graph,
                                                       monkeypatch):
    """Deleting a self-loop on a node that keeps other live edges is a
    connectivity no-op — it must NOT re-solve the node's (possibly
    giant) component; only a node's LAST edge being a self-loop
    withdraws the node, and that resolve is singleton-sized."""
    g, src, out = graph
    calls = _count_solves(monkeypatch)
    (d0,) = g.step(out, e=_edges(spark, [(1, 2), (2, 3), (2, 2)]))
    assert calls["n"] == 1                       # priming solve only
    assert _snap(d0) == [(1, 1), (2, 1), (3, 1)]

    # self-loop gone, node 2 keeps (1,2)/(2,3): no solve, no delta
    (d1,) = g.step(out, e=_edges(spark, [(2, 2)], diff=-1))
    assert calls["n"] == 1
    assert d1.count() == 0

    # a self-loop that IS the node's last edge: retraction, but the
    # resolve is over the singleton component, never component 1's
    (d2,) = g.step(out, e=_edges(spark, [(9, 9)]))
    assert _snap(d2) == [(9, 9)]
    (d3,) = g.step(out, e=_edges(spark, [(9, 9)], diff=-1))
    assert sorted((r["w"], r["label"], r[DIFF]) for r in d3.collect()) \
        == [(9, 9, -1)]

    # same-batch mix: insert an edge AND delete a kept-alive self-loop
    (d4,) = g.step(out, e=_edges(spark, [(3, 3)]))
    assert d4.count() == 0                       # 3 already labeled
    delta = (_edges(spark, [(3, 4)]).withColumn(DIFF, F.lit(1))
             .unionByName(_edges(spark, [(3, 3)], diff=-1)))
    (d5,) = g.step(out, e=delta)
    assert sorted((r["w"], r["label"], r[DIFF]) for r in d5.collect()) \
        == [(4, 1, 1)]
