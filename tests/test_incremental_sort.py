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


def test_live_sort_bucketed_prefix_equality(spark):
    """Round-8 arranged live sort: the key-range-bucketed arrangement
    must stay prefix-equal to the window recompute through inserts and
    an interior retraction — including pointers that CROSS bucket
    boundaries (width 16 puts x=10/20 and x=30+ in different buckets)."""
    g = DifferentialTableGraph(spark)
    t = g.input("t", _rows(spark, []))
    out = t.sort(this.x, this.rid, instance=this.g, bucket_width=16)
    for live, got_df in _drive(spark, out, g):
        got = sorted((r["rid"], r["g"], r["x"], r["prev"], r["next"])
                     for r in got_df.collect())
        w = W.partitionBy("g").orderBy("x", "rid")
        want = sorted((r["rid"], r["g"], r["x"], r["prev"], r["next"])
                      for r in _rows(spark, live)
                      .withColumn("prev", F.lag("rid").over(w))
                      .withColumn("next", F.lead("rid").over(w)).collect())
        assert got == want, f"live={live}"


def test_live_sort_bucketed_randomized_prefix_equality(spark):
    import random

    rng = random.Random(17)
    g = DifferentialTableGraph(spark)
    t = g.input("t", _rows(spark, []))
    out = t.sort(this.x, this.rid, instance=this.g, bucket_width=8)
    live, log, rid = [], None, 0
    for step in range(6):
        ins = []
        for _ in range(rng.randint(1, 4)):
            rid += 1
            ins.append((rid, rng.choice("pq"), rng.randrange(64)))
        dels = ([live[rng.randrange(len(live))]]
                if live and rng.random() < 0.5 else [])
        parts = []
        if ins:
            parts.append(_rows(spark, ins).withColumn("_pw_diff",
                                                      F.lit(1)))
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
        got = sorted(
            (r["rid"], r["g"], r["x"], r["prev"], r["next"])
            for r in DifferentialGraph.integrate(log).collect())
        w = W.partitionBy("g").orderBy("x", "rid")
        want = sorted((r["rid"], r["g"], r["x"], r["prev"], r["next"])
                      for r in _rows(spark, live)
                      .withColumn("prev", F.lag("rid").over(w))
                      .withColumn("next", F.lead("rid").over(w)).collect())
        assert got == want, f"step {step}: live={live}"


def test_live_sort_bucketed_touched_bucket_cost(spark):
    """Per-batch work is bounded by the TOUCHED bucket, not the
    instance: after seeding 400 rows across 50 buckets, inserting one
    interior row must re-emit only rows of its own bucket (+ the
    stitched neighbor links), not the whole instance — the observable
    contract of the arranged (BTree-like) update."""
    g = DifferentialTableGraph(spark)
    t = g.input("t", _rows(spark, []))
    out = t.sort(this.x, this.rid, instance=this.g, bucket_width=8)
    seed = [(i, "a", i) for i in range(400)]     # buckets of 8 rows
    g.step(out.node, t=_rows(spark, seed))
    # steady insert into bucket floor(203/8)=25
    (d,) = g.step(out.node, t=_rows(spark, [(1000, "a", 203)])
                  .withColumn("_pw_diff", F.lit(1)))
    changed = d.localCheckpoint(eager=True)
    n = changed.count()
    # bucket 25 holds 8 rows -> re-emit <= 2*(8+1) rows (old/new pairs
    # for the bucket + the new row) plus a couple of boundary-link
    # re-emissions; the unbucketed path would re-emit ~2*400 rows
    assert n <= 40, f"delta touched {n} rows — not bucket-bounded"
    # and the emitted pointers are correct around the insert
    snap = {r["rid"]: (r["prev"], r["next"])
            for r in DifferentialGraph.integrate(changed).collect()
            if r["rid"] in (203, 1000, 204)}
    assert snap[1000] == (203, 204)
    assert snap[203][1] == 1000 and snap[204][0] == 1000
