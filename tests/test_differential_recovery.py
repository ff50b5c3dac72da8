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
