"""Cross-PROCESS differential recovery (reference:
`integration_tests/test_recovery.py` — kill the worker between
commits, restart, continue the stream, outputs prefix-equal).

The in-process restore tests (`test_differential.py`) already cover
the commit/restore algebra; this one proves the durable state survives
an actual process boundary: a child Python process (its own JVM /
SparkSession) runs batches 0-1, commits, runs an UNCOMMITTED batch 2,
and dies without cleanup.  A second child restores from the state dir,
replays batch 2 and runs batch 3.  The concatenated committed output
must equal an uninterrupted single-process run."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

_CHILD = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = "4"
from pathway_spark.session import get_spark
from pathway_spark.streaming.differential import DifferentialGraph
from pyspark.sql import functions as F

phase = sys.argv[1]           # "first" | "second"
sd = sys.argv[2]
out_path = sys.argv[3]

spark = get_spark("recovery-child-" + phase, cpus="4")
spark.sparkContext.setLogLevel("ERROR")
tpl = spark.createDataFrame([], "user string, amount long")

BATCHES = [
    [("a", 10), ("b", 5)],
    [("a", 2), ("c", 7)],
    [("b", 5), ("a", 1)],
    [("c", -7), ("b", 1)],
]

def build(g):
    src = g.source("t", tpl)
    return src.filter(F.col("amount") != 0).reduce(
        ["user"], total=("sum", "amount"), n=("count",))

def delta(rows):
    return spark.createDataFrame(rows, tpl.schema)

g = DifferentialGraph(spark, checkpoint_every=1, state_dir=sd)
q = build(g)
emitted = []

if phase == "first":
    for b in BATCHES[:2]:
        (d,) = g.step(q, t=delta(b))
        emitted.append(sorted(
            (r["user"], r["total"], r["n"], r["_pw_diff"], r["_pw_time"])
            for r in d.collect()))
    g.commit()
    # batch 2 runs but is NEVER committed — the crash window
    (d,) = g.step(q, t=delta(BATCHES[2]))
    d.collect()
    # die abruptly: no commit, no spark.stop()
    with open(out_path, "w") as f:
        json.dump(emitted, f)
    os._exit(0)
else:
    assert g._t == 1, f"restored clock {{g._t}} != committed 1"
    # replay the uncommitted batch 2, then batch 3
    for b in BATCHES[2:]:
        (d,) = g.step(q, t=delta(b))
        emitted.append(sorted(
            (r["user"], r["total"], r["n"], r["_pw_diff"], r["_pw_time"])
            for r in d.collect()))
    with open(out_path, "w") as f:
        json.dump(emitted, f)
    spark.stop()
"""


def test_cross_process_commit_restore(tmp_path, spark):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sd = str(tmp_path / "state")
    child = _CHILD.format(repo=repo)

    def run(phase, out_name):
        out = str(tmp_path / out_name)
        r = subprocess.run([sys.executable, "-c", child, phase, sd, out],
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, f"{phase} child failed:\n{r.stderr[-3000:]}"
        with open(out) as f:
            return json.load(f)

    first = run("first", "first.json")
    second = run("second", "second.json")
    assert len(first) == 2 and len(second) == 2

    # uninterrupted reference run in THIS process
    from pathway_spark.streaming.differential import DifferentialGraph
    from pyspark.sql import functions as F

    tpl = spark.createDataFrame([], "user string, amount long")
    BATCHES = [
        [("a", 10), ("b", 5)],
        [("a", 2), ("c", 7)],
        [("b", 5), ("a", 1)],
        [("c", -7), ("b", 1)],
    ]
    g = DifferentialGraph(spark)
    q = g.source("t", tpl).filter(F.col("amount") != 0).reduce(
        ["user"], total=("sum", "amount"), n=("count",))
    want = []
    for b in BATCHES:
        (d,) = g.step(q, t=spark.createDataFrame(b, tpl.schema))
        want.append(sorted(
            (r["user"], r["total"], r["n"], r["_pw_diff"], r["_pw_time"])
            for r in d.collect()))

    got = [[tuple(x) for x in batch] for batch in first + second]
    want = [[tuple(x) for x in batch] for batch in want]
    assert got == want, f"\ngot:  {got}\nwant: {want}"


def test_bucketed_state_probe_prunes_file_groups(spark, tmp_path):
    """Keyed stores flush as hash-bucketed parquet; after a restore, a
    delta probe pushes the touched buckets as a STATIC partition filter
    into the scan, so per-batch state reads are O(touched buckets) of
    the on-disk files, never full state (the 100 TB probe path)."""
    import glob

    from pyspark.sql import functions as F
    from pathway_spark.streaming.differential import (
        DifferentialGraph, _StateStore)

    # the bucketed layout is reserved for LARGE states (small ones
    # flush plain so serving pipelines don't pay a probe-collect job
    # per store per tick) — pin the threshold below this test's 20k
    # rows so it exercises the large-state path
    import pytest as _pytest
    mp = _pytest.MonkeyPatch()
    mp.setattr(_StateStore, "SMALL_STATE_ROWS", 1_000)

    sd = str(tmp_path / "state")
    tpl = spark.createDataFrame([], "k long, v long")

    def build(g):
        return g.source("t", tpl).reduce(
            ["k"], mx=("max", "v"), n=("count",))

    g = DifferentialGraph(spark, state_dir=sd)
    out = build(g)
    rows = [(i % 200, i) for i in range(20_000)]
    (d0,) = g.step(out, t=spark.createDataFrame(rows, tpl.schema))
    d0.localCheckpoint(eager=True).count()
    g.commit()

    # the input store's durable version must be bucket-partitioned
    store_files = glob.glob(f"{sd}/store_*/v*/__pw_bucket=*/*.parquet")
    assert store_files, "expected hash-bucketed parquet layout"
    n_total = len({f.rsplit("/", 2)[1] for f in store_files})
    assert n_total > 4, f"need multiple buckets, got {n_total}"

    # fresh graph restores from the state dir (meta loaded in __init__)
    g2 = DifferentialGraph(spark, state_dir=sd)
    out2 = build(g2)
    # the restored input store prunes a 1-key probe to its bucket
    store = g2._stores[0] if g2._stores else None
    # stores are created lazily on the first step — run it (this also
    # checks end-to-end correctness below), then probe directly
    (d1,) = g2.step(out2, t=spark.createDataFrame([(7, 10**9)], tpl.schema))
    rows1 = {(r["k"], r["mx"], r["_pw_diff"]) for r in d1.collect()}
    # key 7's max jumps to 10^9 over the RESTORED on-disk state
    assert (7, 10**9, 1) in rows1, rows1
    store = g2._stores[0]
    probe = spark.createDataFrame([(7,)], "k long")
    pruned = store.get(probe=probe, on=["k"])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the probe's bucket lands as a STATIC PartitionFilter on the scan
    # (inputFiles() ignores filters, so assert on the physical plan) —
    # one bucket read out of n_total on-disk buckets
    assert "PartitionFilters" in plan and "__pw_bucket" in plan, plan
    import re
    flt = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert re.search(r"__pw_bucket#\d+ = \d+", flt) or \
        re.search(r"__pw_bucket#\d+ IN? ?\(", flt), flt
    # the probe's key count bounds buckets read far below the total
    assert n_total > 4
    mp.undo()


def test_small_state_flushes_plain_and_get_runs_no_probe_job(spark, tmp_path):
    """Small states flush as ONE plain parquet file (no __pw_bucket):
    after a restore, get(probe=...) must run ZERO driver jobs — the
    bucketed layout's probe-id collect, paid per store per tick, was
    the round-6 advisor's restored-serving blowup (with ~20 stores it
    force-evaluated the tick's upstream plan ~20 extra times)."""
    import glob

    from pathway_spark.streaming.differential import DifferentialGraph

    sd = str(tmp_path / "state")
    tpl = spark.createDataFrame([], "k long, v long")

    def build(g):
        return g.source("t", tpl).reduce(
            ["k"], mx=("max", "v"), n=("count",))

    g = DifferentialGraph(spark, state_dir=sd)
    out = build(g)
    (d0,) = g.step(out, t=spark.createDataFrame(
        [(i % 20, i) for i in range(500)], tpl.schema))
    d0.localCheckpoint(eager=True).count()
    g.commit()
    g.restore_session_confs()
    assert not glob.glob(f"{sd}/store_*/v*/__pw_bucket=*"), \
        "small state must flush plain"

    g2 = DifferentialGraph(spark, state_dir=sd)
    out2 = build(g2)
    (d1,) = g2.step(out2, t=spark.createDataFrame([(7, 10**9)], tpl.schema))
    # plan-construction must not run probe-collect jobs: get(probe)
    # over a plain base is collect-free
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    store = g2._stores[0]
    probe = spark.createDataFrame([(7,)], "k long")
    store.get(probe=probe, on=["k"])
    after = set(spark.sparkContext.statusTracker()
                .getJobIdsForGroup(None) or [])
    assert after == before, "get(probe) ran a driver job on small state"
    rows1 = {(r["k"], r["mx"], r["_pw_diff"]) for r in d1.collect()}
    assert (7, 10**9, 1) in rows1, rows1
    g2.restore_session_confs()


def test_commit_racing_concurrent_compaction(spark, tmp_path):
    """Round-7 transactional backend: version publication is an atomic
    directory rename with optimistic number claiming, so a maintenance
    compactor republishing versions CONCURRENTLY with commits never
    corrupts the committed state — a fresh process restores exactly the
    committed snapshot and continues correctly."""
    import threading

    from pyspark.sql import functions as F
    from pathway_spark.streaming.differential import DifferentialGraph

    sd = str(tmp_path / "state")
    tpl = spark.createDataFrame([], "k long, v long")

    def build(g):
        return g.source("t", tpl).reduce(
            ["k"], mx=("max", "v"), n=("count",))

    g = DifferentialGraph(spark, state_dir=sd)
    out = build(g)
    (d0,) = g.step(out, t=spark.createDataFrame(
        [(i % 10, i) for i in range(200)], tpl.schema))
    d0.localCheckpoint(eager=True).count()
    g.commit()

    # maintenance thread republishing every store's newest version in a
    # loop while the main thread runs batches + commits
    stop = threading.Event()
    errs: list = []

    def compactor():
        while not stop.is_set():
            try:
                for st in list(g._stores):
                    st.compact_versions()
            except Exception as e:      # pragma: no cover
                errs.append(e)
                return

    th = threading.Thread(target=compactor, daemon=True)
    th.start()
    try:
        for i in range(3):
            (d,) = g.step(out, t=spark.createDataFrame(
                [(i % 10, 1000 + i)], tpl.schema))
            d.localCheckpoint(eager=True).count()
            g.commit()
    finally:
        stop.set()
        th.join(timeout=60)
    assert not errs, errs
    g.restore_session_confs()

    # fresh process-equivalent: restore from the committed meta
    g2 = DifferentialGraph(spark, state_dir=sd)
    out2 = build(g2)
    (d2,) = g2.step(out2, t=spark.createDataFrame([(3, 10**9)], tpl.schema))
    rows = {(r["k"], r["mx"], r["n"], r["_pw_diff"]) for r in d2.collect()}
    # key 3 count: 20 initial + maybe 1 from the raced batches (i==3 never
    # fed: i in 0..2 -> keys 0,1,2 got +1) + the new row
    assert (3, 10**9, 21, 1) in rows, rows
    g2.restore_session_confs()


_SYNC_CHILD = r"""
import json, os, sys
sys.path.insert(0, "__REPO__")
os.environ["SPARK_GRAFT_CPUS"] = "4"
from pathway_spark.session import get_spark
from pathway_spark.streaming.differential import DifferentialGraph
from pathway_spark.streaming.sync_group import DifferentialSyncGroup
from pyspark.sql import functions as F

phase, sd, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
spark = get_spark("sync-recovery-" + phase, cpus="4")
spark.sparkContext.setLogLevel("ERROR")

A = "k string, v long, ts long"
F1A = [("x", 1, 1), ("y", 2, 1), ("x", 3, 2)]
F1B = [("x", 10, 1), ("y", 20, 2)]
F2A = [("x", 4, 4), ("y", 5, 5), ("x", 6, 6)]
F2B = [("y", 40, 4), ("x", 50, 5), ("y", 60, 6)]

def build():
    g = DifferentialGraph(spark, checkpoint_every=1, state_dir=sd)
    a = g.source("a", spark.createDataFrame([], A))
    b = g.source("b", spark.createDataFrame([], A))
    out = a.union(b).reduce(["k"], n=("count",), s=("sum", "v"))
    grp = DifferentialSyncGroup(g, out, {"a": "ts", "b": "ts"},
                                max_difference=0)
    return g, grp

def snap(steps):
    return [[int(t)] + sorted(
        (r["k"], r["n"], r["s"], r["_pw_diff"]) for r in d.collect())
        for t, d in steps]

g, grp = build()
emitted = []

def df(rows):
    return spark.createDataFrame(rows, A)

if phase == "first":
    emitted += snap(grp.feed(a=df(F1A), b=df(F1B)))
    g.commit()
    with open(out_path, "w") as f:
        json.dump(emitted, f)          # committed prefix, durably noted
    # crash BETWEEN event-time sub-steps of the second feed: abort the
    # process after the graph applied exactly ONE of F2's sub-steps
    real_step = DifferentialGraph.step
    calls = {"n": 0}
    def crashing(self, *args, **kw):
        out = real_step(self, *args, **kw)
        calls["n"] += 1
        if calls["n"] >= 1:
            (d,) = out
            d.collect()                # the sub-step fully applied
            os._exit(0)                # die before the next sub-step
        return out
    DifferentialGraph.step = crashing
    grp.feed(a=df(F2A), b=df(F2B))
    os._exit(1)                        # unreachable
else:
    # restored process: clock is back at the COMMIT (the crashed
    # sub-step was never committed); redeliver the whole second feed
    assert g._t == 2, f"restored clock {{g._t}}"
    emitted += snap(grp.feed(a=df(F2A), b=df(F2B)))
    emitted += snap(grp.flush())
    with open(out_path, "w") as f:
        json.dump(emitted, f)
    spark.stop()
"""


def test_sync_group_crash_between_substeps_across_process(tmp_path, spark):
    """Round-7 crash matrix: a process dies BETWEEN event-time
    sub-steps of a multi-source sync group; the restored process
    redelivers the uncommitted feed and the combined committed output
    must equal an uninterrupted run (the mid-batch sub-step that
    applied before the crash rolls back with the uncommitted state)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sd = str(tmp_path / "state")
    child = _SYNC_CHILD.replace("__REPO__", repo)

    def run(phase, out_name):
        out = str(tmp_path / out_name)
        r = subprocess.run([sys.executable, "-c", child, phase, sd, out],
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, f"{phase} child failed:\n{r.stderr[-3000:]}"
        with open(out) as f:
            return json.load(f)

    first = run("first", "first.json")
    second = run("second", "second.json")

    # uninterrupted reference in THIS process
    from pathway_spark.streaming.differential import DifferentialGraph
    from pathway_spark.streaming.sync_group import DifferentialSyncGroup

    A = "k string, v long, ts long"
    g = DifferentialGraph(spark)
    a = g.source("a", spark.createDataFrame([], A))
    b = g.source("b", spark.createDataFrame([], A))
    out = a.union(b).reduce(["k"], n=("count",), s=("sum", "v"))
    grp = DifferentialSyncGroup(g, out, {"a": "ts", "b": "ts"},
                                max_difference=0)

    def df(rows):
        return spark.createDataFrame(rows, A)

    def snap(steps):
        return [[int(t)] + sorted(
            (r["k"], r["n"], r["s"], r["_pw_diff"]) for r in d.collect())
            for t, d in steps]

    want = snap(grp.feed(a=df([("x", 1, 1), ("y", 2, 1), ("x", 3, 2)]),
                         b=df([("x", 10, 1), ("y", 20, 2)])))
    want += snap(grp.feed(a=df([("x", 4, 4), ("y", 5, 5), ("x", 6, 6)]),
                          b=df([("y", 40, 4), ("x", 50, 5),
                                ("y", 60, 6)])))
    want += snap(grp.flush())
    g.restore_session_confs()

    got = [[row[0]] + [tuple(x) for x in row[1:]] for row in first + second]
    want = [[row[0]] + [tuple(x) for x in row[1:]] for row in want]
    assert got == want, f"\ngot:  {got}\nwant: {want}"
