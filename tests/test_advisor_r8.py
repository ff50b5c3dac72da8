"""Round-8 advisor regressions.

Five findings from the round-7 advisory review, each pinned here:
1. nondeterministic linear-node outputs must be lineage-cut before
   they enter downstream state (update(cut=False) trusts byte-stable
   deltas);
2. tick fusion must key its time->clock map on RAW event values, so
   fractional (double) time columns neither collide (DUPLICATED_MAP_KEY)
   nor silently merge distinct times;
3. flush() must not funnel a large KEYLESS state through one task;
4. a restored iterate node whose meta says dense-recompute but whose
   rebuild omits the guard must fail loudly, not crash later;
5. commit()'s vacuum must retain the previous committed version for
   concurrent readers (Delta-style retention of the last two).
"""

import os

import pytest
from pyspark.sql import functions as F

from pathway_spark.streaming.differential import (
    DIFF, DifferentialGraph, _StateStore,
)


def _rows(df, *cols):
    return sorted((tuple(r) for r in df.select(*cols).collect()),
                  key=lambda t: tuple((x is None, x) for x in t))


def test_nondeterministic_linear_output_checkpoints_before_state(spark):
    """A rand() column between a source and a join: the join consumes
    the linear node's delta twice (emission leg + state append with
    cut=False).  Without a shared lineage cut each rescan re-draws, so
    the batch-3 retraction scan of left state sees DIFFERENT bytes than
    the batch-2 insert scan and the outputs stop canceling."""
    g = DifferentialGraph(spark)
    left = g.source("l", spark.createDataFrame([], "k string, v long"))
    right = g.source("r", spark.createDataFrame([], "k string, w long"))
    noisy = left.with_columns(r=F.rand(seed=None))
    j = noisy.join(right, on=["k"])

    # batch 1 (wide initial load) seeds nothing noisy — compaction
    # would stabilize it regardless; the at-risk chunk arrives later
    g.step(j, l=spark.createDataFrame([("z", 0)], "k string, v long"))
    (o1,) = g.step(j, l=spark.createDataFrame([("a", 1)],
                                              "k string, v long"))
    (o2,) = g.step(j, r=spark.createDataFrame([("a", 10)],
                                              "k string, w long"))
    (o3,) = g.step(j, r=spark.createDataFrame(
        [("a", 10)], "k string, w long").withColumn(DIFF, F.lit(-1)))
    assert noisy._CKPT_OUT is True, \
        "nondeterministic linear node must flip to checkpointed output"
    full = o2.unionByName(o3.select(*o2.columns))
    snap = DifferentialGraph.integrate(full)
    assert snap.count() == 0, \
        "insert+retract through a rand() column must cancel exactly"


def test_deterministic_linear_output_stays_cheap(spark):
    """Plain selects keep the fast path: no output checkpoint."""
    g = DifferentialGraph(spark)
    src = g.source("s", spark.createDataFrame([], "k string, v long"))
    node = src.select("k", doubled=F.col("v") * 2)
    g.step(node, s=spark.createDataFrame([("a", 1)], "k string, v long"))
    assert node._CKPT_OUT is False


def test_fused_batch_fractional_double_times(spark, tmp_path):
    """Two event times sharing an integer part (1000.25 / 1000.75) in
    one fused micro-batch: the raw-value map must keep them distinct
    (the int-keyed map raised DUPLICATED_MAP_KEY) and assign ascending
    clocks exactly like the sub-step path."""
    import pathway_spark as pw
    from pathway_spark import streaming as st

    src = tmp_path / "frac"
    src.mkdir()
    (src / "seed.csv").write_text("k,v,ts\nz,0,1.0\n")
    t = pw.demo.replay_csv(
        str(src), schema=pw.schema_from_types(k=str, v=int, ts=float),
        mode="streaming", spark=spark)

    events = []
    q = st.subscribe_differential(
        t, lambda s: s.select(F.col("k"), F.col("v")),
        lambda row, time, is_addition: events.append(
            (row["k"], row["v"], time, is_addition)),
        time_column="ts")
    q.processAllAvailable()
    events.clear()
    bdf = spark.createDataFrame(
        [("a", 1, 1000.25), ("b", 2, 1000.75), ("c", 3, 1001.5)],
        "k string, v long, ts double")
    q._batch_fn(bdf, 1)
    q.stop()
    assert len(events) == 3, events
    clocks = {k: tm for k, _v, tm, _a in events}
    # 1000.25 -> 1000; 1000.75 folds forward to 1001; 1001.5 to 1002 —
    # exactly the sequential late-fold the sub-step path applies
    assert clocks["a"] < clocks["b"] < clocks["c"], events
    assert clocks == {"a": 1000, "b": 1001, "c": 1002}, events


def test_flush_large_keyless_state_writes_parallel(spark, tmp_path,
                                                   monkeypatch):
    """A keyless state above SMALL_STATE_ROWS must not coalesce(1):
    the version directory should hold multiple part files."""
    monkeypatch.setattr(_StateStore, "SMALL_STATE_ROWS", 50)
    # AQE would coalesce this test's tiny shuffle to one partition on
    # size grounds alone; disable it so file count reflects whether
    # flush() forced a coalesce(1)
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        _run_flush_parallel_check(spark, tmp_path)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def _run_flush_parallel_check(spark, tmp_path):
    tpl = spark.createDataFrame([], "v long")
    st = _StateStore(spark, tpl, path=str(tmp_path / "s"))
    delta = spark.range(500).select(F.col("id").alias("v")) \
        .repartition(8) \
        .withColumn(DIFF, F.lit(1).cast("long")) \
        .withColumn("_pw_time", F.lit(0).cast("long"))
    st.update(delta, wide=True)
    st.flush()
    vdir = tmp_path / "s" / st._ver_token
    parts = [f for f in os.listdir(vdir) if f.endswith(".parquet")]
    assert len(parts) > 1, "large keyless flush must stay parallel"
    got = spark.read.parquet(str(vdir))
    assert got.count() == 500
    # small keyless states still publish single-file versions
    st2 = _StateStore(spark, tpl, path=str(tmp_path / "s2"))
    small = spark.range(10).select(F.col("id").alias("v")) \
        .repartition(4) \
        .withColumn(DIFF, F.lit(1).cast("long")) \
        .withColumn("_pw_time", F.lit(0).cast("long"))
    st2.update(small, wide=True)
    st2.flush()
    vdir2 = tmp_path / "s2" / st2._ver_token
    parts2 = [f for f in os.listdir(vdir2) if f.endswith(".parquet")]
    assert len(parts2) == 1


def test_restored_dense_iterate_without_guard_raises(spark):
    """Meta says dense-recompute mode but the rebuild omits the guard:
    advancing must raise a clear error instead of crashing later on a
    missing _vstore (or silently seeding recompute from empty)."""
    from pathway_spark.streaming.iterate_diff import iterate_differential

    g = DifferentialGraph(spark)
    g._node_meta["it0_dense"] = 1   # what a committed predecessor left
    seeds = g.source("seeds", spark.createDataFrame([], "x long"))
    edges = g.source("edges", spark.createDataFrame([], "u long, v long"))

    def body(v, edges):
        hop = (v.select(F.col("x").alias("u")).join(edges, ["u"])
                .select(F.col("v").alias("x")))
        return v.union(hop).distinct()

    reach = iterate_differential(body, seeds, {"edges": edges})
    with pytest.raises(RuntimeError, match="dense_delta_guard"):
        g.step(reach, seeds=spark.createDataFrame([(1,)], "x long"))


def test_commit_vacuum_retains_previous_committed_version(spark, tmp_path):
    """Three commits: after commit N the version of commit N-1 must
    still be on disk (a concurrent reader may be mid-scan on it);
    commit N-2's version is reclaimed."""
    sd = str(tmp_path / "state")

    def build(g):
        src = g.source("t", spark.createDataFrame([], "k string, v long"))
        return src.reduce(["k"], total=("sum", "v"))

    g = DifferentialGraph(spark, state_dir=sd)
    node = build(g)

    def feed(i):
        g.step(node, t=spark.createDataFrame([("a", i)],
                                             "k string, v long"))
        g.commit()

    def versions():
        out = {}
        for d in sorted(os.listdir(sd)):
            if d.startswith("store_"):
                out[d] = sorted(v for v in os.listdir(f"{sd}/{d}")
                                if v.startswith("v") and v[1:].isdigit())
        return out

    feed(1)
    v1 = versions()
    feed(2)
    v2 = versions()
    for store, vs in v2.items():
        assert set(v1[store]) <= set(vs), \
            f"{store}: previous committed version must survive commit 2"
    feed(3)
    v3 = versions()
    for store, vs in v3.items():
        # commit-1 versions reclaimed, commit-2 versions retained
        assert set(v1[store]) & set(vs) == set(), \
            f"{store}: versions two commits back should be vacuumed"
        assert set(v2[store]) - set(v1[store]) <= set(vs), \
            f"{store}: the previous committed version must survive"
    # and a fresh process restores cleanly from the latest commit
    g2 = DifferentialGraph(spark, state_dir=sd)
    node2 = build(g2)
    (d,) = g2.step(node2, t=spark.createDataFrame([("a", 10)],
                                                  "k string, v long"))
    snap = _rows(d.filter(F.col(DIFF) > 0), "k", "total")
    assert snap == [("a", 16)]


def test_float_sum_accumulator_neumaier(spark):
    """Reference-parity float sum (round 8): the differential reduce
    keeps a RUNNING Neumaier-compensated (sum, compensation) per key —
    `src/engine/reduce.rs:209-256` FloatSumState — instead of
    recomputing the group.  Retraction folds with weight -1; the
    compensated total must match the exact (Fraction) sum to within
    1 ULP even when a large value transits the group, where a naive
    running sum loses the small addend entirely."""
    from fractions import Fraction
    import math

    from pathway_spark.streaming.differential import (
        DIFF, DifferentialGraph,
    )

    g = DifferentialGraph(spark)
    src = g.source("t", spark.createDataFrame([], "k string, v double"))
    node = src.reduce(["k"], total=("sum", "v"))
    cl = None
    live = []

    def step(rows, diff=1):
        nonlocal cl
        df = spark.createDataFrame(rows, "k string, v double")
        if diff != 1:
            df = df.withColumn(DIFF, F.lit(diff))
        (d,) = g.step(node, t=df)
        d = d.localCheckpoint(True)
        cl = d if cl is None else cl.unionByName(d)
        for r in rows:
            if diff == 1:
                live.append(r[1])
            else:
                live.remove(r[1])

    step([("a", 0.1), ("a", 0.2)])
    step([("a", 1e16)])          # swallows the small part in a naive sum
    step([("a", 0.3), ("a", 0.4)])
    step([("a", 1e16)], diff=-1)  # retract the big value
    assert node._strategy == "acc" and node._float_accs == {"total"}
    (got,) = DifferentialGraph.integrate(cl).collect()
    exact = float(sum(Fraction(v) for v in live))
    assert math.isclose(got["total"], exact, rel_tol=1e-15), \
        (got["total"], exact)
    # compensation actually mattered: the naive fold loses 0.1+0.2
    naive = ((0.1 + 0.2) + 1e16 + 0.3 + 0.4) - 1e16
    assert abs(naive - exact) > abs(got["total"] - exact)


def test_keyed_reduce_rowtimes_fusion_trace_equality(spark):
    """Round-8 keyed tick fusion: a multi-time batch through a keyed
    integral-accumulator reduce in ONE step(row_times=True) must emit
    the EXACT per-time -old/+new changelog sequential sub-steps emit —
    including inserts, retractions, and keys vanishing to zero."""
    import random

    from pathway_spark.streaming.differential import TIME

    rng = random.Random(5)
    tpl = spark.createDataFrame([], "k string, v long")

    def build(g):
        return (g.source("t", tpl)
                 .filter(F.col("v") != 13)
                 .reduce(["k"], n=("count",), s=("sum", "v")))

    g_sub = DifferentialGraph(spark)
    n_sub = build(g_sub)
    g_fus = DifferentialGraph(spark)
    n_fus = build(g_fus)
    assert g_fus.fusable_rowtimes()

    # prime both with an initial batch at t=0 (the wide load)
    seed = [("a", 1), ("b", 2), ("a", 3)]
    (s0,) = g_sub.step(n_sub, time=0, t=spark.createDataFrame(seed, tpl.schema))
    (f0,) = g_fus.step(n_fus, time=0, t=spark.createDataFrame(seed, tpl.schema))
    assert _rows(s0, "k", "n", "s", DIFF, TIME) == \
        _rows(f0, "k", "n", "s", DIFF, TIME)

    # a multi-time batch with inserts, retractions, a no-op pair, and a
    # key retracted to zero
    live = list(seed)
    rows = []
    for tv in range(1, 9):
        ins = [(rng.choice("abcd"), rng.randint(1, 9)) for _ in
               range(rng.randint(0, 2))]
        dels = [live[rng.randrange(len(live))]] \
            if live and rng.random() < 0.6 else []
        rows += [(k, v, 1, tv) for k, v in ins]
        rows += [(k, v, -1, tv) for k, v in dels]
        rows += [("e", 7, 1, tv), ("e", 7, -1, tv)]   # cancels in-batch
        live += ins
        for d in dels:
            live.remove(d)
    rows += [(k, v, -1, 9) for k, v in live if k == "a"]  # a -> zero

    # sub-step reference
    logs = []
    for tv in sorted({r[3] for r in rows}):
        batch = spark.createDataFrame(
            [(k, v, w) for k, v, w, t in rows if t == tv],
            "k string, v long, _pw_diff long")
        (d,) = g_sub.step(n_sub, time=tv, t=batch)
        logs.append(d.localCheckpoint(True))
    want = logs[0]
    for d in logs[1:]:
        want = want.unionByName(d)

    fused_in = spark.createDataFrame(
        rows, f"k string, v long, _pw_diff long, {TIME} long")
    (got,) = g_fus.step(n_fus, time=9, row_times=True, t=fused_in)
    assert _rows(got, "k", "n", "s", DIFF, TIME) == \
        _rows(want, "k", "n", "s", DIFF, TIME)

    # and both graphs continue correctly on a normal single-time step
    nxt = spark.createDataFrame([("b", 5)], tpl.schema)
    (s2,) = g_sub.step(n_sub, time=20, t=nxt)
    (f2,) = g_fus.step(n_fus, time=20, t=nxt)
    assert _rows(s2, "k", "n", "s", DIFF) == _rows(f2, "k", "n", "s", DIFF)


def test_rowtimes_fusion_rejects_float_and_slice_reduces(spark):
    from pathway_spark.streaming.differential import TIME

    g = DifferentialGraph(spark)
    node = g.source("t", spark.createDataFrame([], "k string, v double")) \
        .reduce(["k"], s=("sum", "v"))
    assert not g.fusable_rowtimes()   # float acc: sequential fold
    g2 = DifferentialGraph(spark)
    node2 = g2.source("t", spark.createDataFrame([], "k string, v long")) \
        .reduce(["k"], mx=("max", "v"))
    assert not g2.fusable_rowtimes()  # order statistic: slice path
    fused = spark.createDataFrame([("a", 1, 1, 1)],
                                  f"k string, v long, _pw_diff long, {TIME} long")
    with pytest.raises(ValueError, match="row_times"):
        g2.step(node2, time=1, row_times=True, t=fused)
