"""Incremental graph algorithms (differential CC / PageRank) vs batch
recompute — prefix equality after inserts AND retractions.

The done-criterion from the round-4 review: insert+retract edges, the
integrated changelog equals a full batch recompute at every prefix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pathway_spark.streaming.differential import DifferentialGraph
from pathway_spark.streaming.incremental_graph import (
    incremental_connected_components, incremental_pagerank)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "u long, v long")


def _snap(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# batches: build two components, bridge them, then retract the bridge
# and an internal edge (component split + shrink)
BATCHES = [
    # t0: two chains 1-2-3 and 10-11
    ([(1, 2), (2, 3), (10, 11)], []),
    # t1: grow second component, add third
    ([(11, 12), (20, 21)], []),
    # t2: bridge components 1 and 10 (merge)
    ([(3, 10)], []),
    # t3: retract the bridge (split back) and edge (2,3)
    ([], [(3, 10), (2, 3)]),
    # t4: re-insert (2,3) and retract (20,21) entirely
    ([(2, 3)], [(20, 21)]),
]


def _apply(spark, g, out, ins, dels):
    parts = []
    if ins:
        parts.append(_edges(spark, ins).withColumn("_pw_diff", F.lit(1)))
    if dels:
        parts.append(_edges(spark, dels).withColumn("_pw_diff", F.lit(-1)))
    if parts:
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        (d,) = g.step(out, e=delta)
    else:
        (d,) = g.step(out)
    return d.localCheckpoint(eager=True)


def test_incremental_cc_prefix_equals_batch(spark):
    from pathway_spark.operators.iterate import connected_components
    from pathway_spark.table import ID, Table

    g = DifferentialGraph(spark)
    src = g.source("e", _edges(spark, [(0, 0)]).filter(F.lit(False)))
    out = incremental_connected_components(src)

    live: list[tuple] = []
    changelog = None
    for ins, dels in BATCHES:
        d = _apply(spark, g, out, ins, dels)
        changelog = d if changelog is None else changelog.unionByName(d)
        for e in ins:
            live.append(e)
        for e in dels:
            live.remove(e)
        got = _snap(DifferentialGraph.integrate(changelog),
                    ["w", "label"])
        want = _snap(connected_components(
            Table(_edges(spark, live)))._df.drop(ID), ["w", "label"])
        assert got == want, f"after batch ins={ins} dels={dels}"


def test_incremental_pagerank_prefix_equals_batch(spark):
    from pathway_spark.operators.iterate import pagerank_exact
    from pathway_spark.table import ID, Table

    g = DifferentialGraph(spark)
    src = g.source("e", _edges(spark, [(0, 0)]).filter(F.lit(False)))
    out = incremental_pagerank(src, steps=4)

    live: list[tuple] = []
    changelog = None
    for ins, dels in BATCHES:
        d = _apply(spark, g, out, ins, dels)
        changelog = d if changelog is None else changelog.unionByName(d)
        for e in ins:
            live.append(e)
        for e in dels:
            live.remove(e)
        got = _snap(DifferentialGraph.integrate(changelog).drop("comp"),
                    ["w", "rank"])
        want = _snap(pagerank_exact(
            Table(_edges(spark, live)), steps=4)._df.drop(ID),
            ["w", "rank"])
        assert got == want, f"after batch ins={ins} dels={dels}"


def test_incremental_cc_only_touched_components_emit(spark):
    """An edge delta in one component must not emit rows for other
    components (the affected-component rule actually prunes)."""
    g = DifferentialGraph(spark)
    src = g.source("e", _edges(spark, [(0, 0)]).filter(F.lit(False)))
    out = incremental_connected_components(src)

    (d0,) = g.step(out, e=_edges(spark, [(1, 2), (10, 11), (20, 21)])
                   .withColumn("_pw_diff", F.lit(1)))
    d0.localCheckpoint(eager=True).count()
    # touch only the 10-11 component
    (d1,) = g.step(out, e=_edges(spark, [(11, 12)])
                   .withColumn("_pw_diff", F.lit(1)))
    rows = d1.collect()
    touched_nodes = {r["w"] for r in rows}
    assert 12 in touched_nodes
    assert touched_nodes <= {10, 11, 12}, \
        f"untouched components re-emitted: {sorted(touched_nodes)}"


def test_diff_table_pagerank_and_cc_surface(spark):
    """Pathway-syntax bridge: DiffTable.pagerank / connected_components
    over a live edge stream with retractions."""
    from pathway_spark import this
    from pathway_spark.operators.iterate import pagerank_exact
    from pathway_spark.streaming.diff_table import DifferentialTableGraph
    from pathway_spark.table import ID, Table

    tpl = spark.createDataFrame([], "src long, dst long")
    g = DifferentialTableGraph(spark)
    edges = g.input("e", tpl)
    pr = edges.pagerank(this.src, this.dst, steps=3)
    cc = edges.connected_components(this.src, this.dst)

    b1 = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], tpl.schema)
    b2 = (spark.createDataFrame([(2, 3)], tpl.schema)
          .withColumn("_pw_diff", F.lit(-1)))
    d1p, d1c = (d.localCheckpoint(eager=True)
                for d in g.step([pr.node, cc.node], e=b1))
    d2p, d2c = (d.localCheckpoint(eager=True)
                for d in g.step([pr.node, cc.node], e=b2))

    live = spark.createDataFrame([(1, 2), (10, 11)], "u long, v long")
    want_pr = _snap(pagerank_exact(Table(live), steps=3)._df.drop(ID),
                    ["w", "rank"])
    got_pr = _snap(DifferentialGraph.integrate(
        d1p.unionByName(d2p)).drop("comp"), ["w", "rank"])
    assert got_pr == want_pr

    got_cc = _snap(DifferentialGraph.integrate(
        d1c.unionByName(d2c)), ["w", "label"])
    assert got_cc == [(1, 1), (2, 1), (10, 10), (11, 10)]


def test_incremental_bellman_ford_prefix_equals_batch(spark):
    from pathway_spark.streaming.incremental_graph import (
        incremental_bellman_ford)

    def wedges(rows):
        return spark.createDataFrame(rows, "u long, v long, dist double")

    g = DifferentialGraph(spark)
    src = g.source("e", wedges([]).filter(F.lit(False)))
    out = incremental_bellman_ford(src, start_vertex=1)

    batches = [
        ([(1, 2, 1.0), (2, 3, 2.0), (1, 3, 10.0), (10, 11, 1.0)], []),
        # a shortcut lowers d(3); separate component untouched
        ([(1, 3, 2.5)], []),
        # retract the shortcut: d(3) must go back up
        ([], [(1, 3, 2.5)]),
    ]
    live: list[tuple] = []
    changelog = None
    for ins, dels in batches:
        parts = []
        if ins:
            parts.append(wedges(ins).withColumn("_pw_diff", F.lit(1)))
        if dels:
            parts.append(wedges(dels).withColumn("_pw_diff", F.lit(-1)))
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        (d,) = g.step(out, e=delta)
        changelog = (d if changelog is None
                     else changelog.unionByName(d)).localCheckpoint(True)
        for e in ins:
            live.append(e)
        for e in dels:
            live.remove(e)
        got = _snap(DifferentialGraph.integrate(changelog).drop("comp"),
                    ["w", "d"])
    # final snapshot: d(2)=1, d(3)=3 (via 2), 10/11 unreachable (None)
    assert got == [(1, 0.0), (2, 1.0), (3, 3.0), (10, None), (11, None)]


def test_incremental_cc_durable_restore_takes_incremental_branch(
        spark, tmp_path):
    """A restored process must NOT re-emit the whole answer as +1 —
    the trace store's committed content primes the node."""
    sd = str(tmp_path / "state")

    def build(g):
        src = g.source("e", spark.createDataFrame([], "u long, v long"))
        return incremental_connected_components(src)

    g1 = DifferentialGraph(spark, checkpoint_every=1, state_dir=sd)
    out1 = build(g1)
    (d0,) = g1.step(out1, e=_edges(spark, [(1, 2), (10, 11)])
                    .withColumn("_pw_diff", F.lit(1)))
    d0.localCheckpoint(eager=True).count()
    g1.commit()

    g2 = DifferentialGraph(spark, checkpoint_every=1, state_dir=sd)
    out2 = build(g2)
    (d1,) = g2.step(out2, e=_edges(spark, [(11, 12)])
                    .withColumn("_pw_diff", F.lit(1)))
    rows = sorted((r["w"], r["label"], r["_pw_diff"]) for r in d1.collect())
    # only the touched component changes; nothing re-emitted for (1,2)
    assert rows == [(12, 10, 1)], rows


def test_incremental_cc_randomized_prefix_equality(spark):
    """Randomized edge stream (seeded): inserts and retractions in
    every batch; the integrated changelog must equal batch CC at every
    prefix."""
    import random

    from pathway_spark.operators.iterate import connected_components
    from pathway_spark.table import ID, Table

    rng = random.Random(7)
    g = DifferentialGraph(spark, checkpoint_every=3)
    src = g.source("e", _edges(spark, [(0, 0)]).filter(F.lit(False)))
    out = incremental_connected_components(src)

    live: list[tuple] = []
    changelog = None
    for _ in range(6):
        n_ins = rng.randint(1, 4)
        ins = [(rng.randint(0, 14), rng.randint(0, 14))
               for _ in range(n_ins)]
        ins = [(u, v) for u, v in ins if u != v]
        dels = []
        if live and rng.random() < 0.7:
            dels = [live[rng.randrange(len(live))]]
        d = _apply(spark, g, out, ins, dels)
        changelog = (d if changelog is None
                     else changelog.unionByName(d)).localCheckpoint(True)
        live.extend(ins)
        for e in dels:
            live.remove(e)
        got = _snap(DifferentialGraph.integrate(changelog), ["w", "label"])
        if live:
            want = _snap(connected_components(
                Table(_edges(spark, live)))._df.drop(ID), ["w", "label"])
        else:
            want = []
        assert got == want, f"live={live} ins={ins} dels={dels}"


def test_subscribe_differential_incremental_pagerank(spark, tmp_path):
    """End-to-end: a file-watch edge stream drives incremental
    pagerank through subscribe_differential; callbacks deliver exact
    -1/+1 rank deltas that integrate to the batch answer."""
    import time as _time

    from pathway_spark.operators.iterate import pagerank_exact
    from pathway_spark.streaming import subscribe_differential
    from pathway_spark.streaming.incremental_graph import (
        incremental_pagerank)
    from pathway_spark.table import ID, Table

    src_dir = str(tmp_path / "edges")
    import os
    os.makedirs(src_dir)
    _edges(spark, [(1, 2), (2, 3)]).write.mode("overwrite") \
        .parquet(f"{src_dir}/b0.parquet")

    stream = (spark.readStream.schema("u long, v long")
              .option("maxFilesPerTrigger", 1)
              .parquet(src_dir + "/*"))

    got: dict[tuple, int] = {}
    times_closed = []

    def on_change(row, time, is_addition):
        k = (row["w"], row["rank"])
        got[k] = got.get(k, 0) + (1 if is_addition else -1)

    q = subscribe_differential(
        stream, lambda s: incremental_pagerank(s, steps=3),
        on_change, on_time_end=lambda t: times_closed.append(t))
    try:
        q.processAllAvailable()
        _edges(spark, [(3, 4)]).write.mode("overwrite") \
            .parquet(f"{src_dir}/b1.parquet")
        deadline = _time.time() + 60
        while _time.time() < deadline:
            q.processAllAvailable()
            if len(times_closed) >= 2:
                break
            _time.sleep(0.5)
    finally:
        q.stop()

    final = sorted(k for k, n in got.items() if n > 0)
    want = sorted(
        (r["w"], r["rank"]) for r in pagerank_exact(
            Table(_edges(spark, [(1, 2), (2, 3), (3, 4)])), steps=3)
        ._df.drop(ID).collect())
    assert final == want, f"{final} != {want}"
    assert len(times_closed) >= 2
