"""Live sort / diff on the differential engine: prev/next pointers and
ordered differences stay prefix-equal to a batch window recompute over
the live multiset through inserts and retractions."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pathway_spark import this
from pathway_spark.streaming.differential import DifferentialGraph
from pathway_spark.streaming.diff_table import DifferentialTableGraph


def _rows(spark, rows):
    return spark.createDataFrame(rows, "rid long, g string, x long")


BATCHES = [
    ([(1, "a", 10), (2, "a", 30), (3, "b", 5)], []),
    ([(4, "a", 20), (5, "b", 1)], []),            # 4 lands BETWEEN 1 and 2
    ([], [(2, "a", 30)]),                          # retract an interior row
    ([(6, "a", 30), (7, "b", 50)], []),
]


def _drive(spark, out, g):
    live, log = [], None
    for ins, dels in BATCHES:
        parts = []
        if ins:
            parts.append(_rows(spark, ins).withColumn("_pw_diff", F.lit(1)))
        if dels:
            parts.append(_rows(spark, dels).withColumn("_pw_diff",
                                                       F.lit(-1)))
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        (d,) = g.step(out.node, t=delta)
        d = d.localCheckpoint(eager=True)
        log = d if log is None else log.unionByName(d)
        live.extend(ins)
        for r in dels:
            live.remove(r)
        yield live, DifferentialGraph.integrate(log)


def test_live_sort_prefix_equals_window_recompute(spark):
    g = DifferentialTableGraph(spark)
    t = g.input("t", _rows(spark, []))
    out = t.sort(this.x, this.rid, instance=this.g)
    for live, got_df in _drive(spark, out, g):
        got = sorted((r["rid"], r["g"], r["x"], r["prev"], r["next"])
                     for r in got_df.collect())
        w = W.partitionBy("g").orderBy("x", "rid")
        want = sorted((r["rid"], r["g"], r["x"], r["prev"], r["next"])
                      for r in _rows(spark, live)
                      .withColumn("prev", F.lag("rid").over(w))
                      .withColumn("next", F.lead("rid").over(w)).collect())
        assert got == want, f"live={live}"


def test_live_sort_global_instance(spark):
    g = DifferentialTableGraph(spark)
    t = g.input("t", _rows(spark, []))
    out = t.sort(this.x, this.rid)
    (d0,) = g.step(out.node, t=_rows(
        spark, [(1, "a", 10), (2, "b", 5), (3, "a", 7)]))
    got = sorted((r["rid"], r["prev"], r["next"]) for r in
                 DifferentialGraph.integrate(
                     d0.localCheckpoint(eager=True)).collect())
    # global order by x: 2(5) < 3(7) < 1(10)
    assert got == [(1, 3, None), (2, None, 3), (3, 2, 1)]
    assert "__pw_inst" not in DifferentialGraph.integrate(d0).columns


def test_live_diff_prefix_equals_window_recompute(spark):
    g = DifferentialTableGraph(spark)
    t = g.input("t", _rows(spark, []))
    out = t.diff_by(this.x, this.rid, this.x, instance=this.g)
    for live, got_df in _drive(spark, out, g):
        got = sorted((r["rid"], r["g"], r["x"], r["diff_x"])
                     for r in got_df.collect())
        w = W.partitionBy("g").orderBy("x", "rid")
        want = sorted((r["rid"], r["g"], r["x"], r["diff_x"])
                      for r in _rows(spark, live)
                      .withColumn("diff_x",
                                  F.col("x") - F.lag("x").over(w))
                      .collect())
        assert got == want, f"live={live}"


def _irows(spark, rows):
    return spark.createDataFrame(rows, "rid long, g string, ts long, v double")


def test_live_interpolate_refills_on_neighbor_change(spark):
    """A NULL gap fills from its neighbors; inserting a new non-null
    point INSIDE the gap (or retracting a boundary) changes the fill —
    prefix-equal to batch Table.interpolate on the live rows."""
    from pathway_spark.operators.sort import interpolate as batch_interp
    from pathway_spark.table import ID, Table

    g = DifferentialTableGraph(spark)
    t = g.input("t", _irows(spark, []))
    out = t.interpolate(this.ts, this.v, instance=this.g)

    batches = [
        ([(1, "a", 0, 0.0), (2, "a", 10, None), (3, "a", 20, 20.0)], []),
        ([(4, "a", 15, 30.0)], []),           # new point inside the gap
        ([], [(1, "a", 0, 0.0)]),             # retract the left boundary
        ([(5, "b", 0, None)], []),            # all-null instance
    ]
    live, log = [], None
    for ins, dels in batches:
        parts = []
        if ins:
            parts.append(_irows(spark, ins).withColumn("_pw_diff", F.lit(1)))
        if dels:
            parts.append(_irows(spark, dels).withColumn("_pw_diff",
                                                        F.lit(-1)))
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        (d,) = g.step(out.node, t=delta)
        d = d.localCheckpoint(eager=True)
        log = d if log is None else log.unionByName(d)
        live.extend(ins)
        for r in dels:
            live.remove(r)
        cols = ["rid", "g", "ts", "v"]
        got = sorted(tuple(r[c] for c in cols) for r in
                     DifferentialGraph.integrate(log).collect())
        want_df = batch_interp(Table(_irows(spark, live)), this.ts,
                               this.v, instance=this.g)._df
        want = sorted(tuple(r[c] for c in cols)
                      for r in want_df.drop(ID).collect())
        assert got == want, f"after ins={ins} dels={dels}"


def test_live_sort_randomized_prefix_equality(spark):
    """Randomized inserts + retractions over three instances: the live
    sort's integrated pointers equal a window recompute at EVERY
    prefix (mirrors the forest-CC randomized done-criterion)."""
    import random

    rng = random.Random(29)
    g = DifferentialTableGraph(spark)
    t = g.input("t", _rows(spark, []))
    out = t.sort(this.x, this.rid, instance=this.g)

    live, log, next_id = [], None, 0
    for step in range(6):
        ins = []
        for _ in range(rng.randrange(1, 4)):
            ins.append((next_id, rng.choice("abc"), rng.randrange(8)))
            next_id += 1
        k = min(len(live), rng.randrange(0, 3))
        dels = rng.sample(live, k=k) if k else []
        for r in dels:
            live.remove(r)
        live += ins
        delta = _rows(spark, ins).withColumn("_pw_diff", F.lit(1))
        if dels:
            delta = delta.unionByName(
                _rows(spark, dels).withColumn("_pw_diff", F.lit(-1)))
        (d,) = g.step(out.node, t=delta)
        d = d.localCheckpoint(eager=True)
        log = d if log is None else log.unionByName(d)
        got = sorted((r["rid"], r["g"], r["x"], r["prev"], r["next"])
                     for r in DifferentialGraph.integrate(log).collect())
        w = W.partitionBy("g").orderBy("x", "rid")
        want = sorted((r["rid"], r["g"], r["x"], r["prev"], r["next"])
                      for r in _rows(spark, live)
                      .withColumn("prev", F.lag("rid").over(w))
                      .withColumn("next", F.lead("rid").over(w)).collect())
        assert got == want, f"step {step}: live={live}"
