"""Key-space sharding (round 8): N DifferentialGraphs over a hashed
key space must equal the unsharded graph through inserts, retractions,
and per-shard crash/restore — the executable form of the reference's
worker sharding (`src/engine/dataflow/config.rs:140-165`)."""

import random

import pytest
from pyspark.sql import functions as F

from pathway_spark.streaming.differential import DIFF, DifferentialGraph
from pathway_spark.streaming.sharding import ShardedDifferential


def _rows(df, *cols):
    return sorted((tuple(r) for r in df.select(*cols).collect()),
                  key=lambda t: tuple((x is None, x) for x in t))


def _build(g):
    """join + reduce keyed on the shard key (user)."""
    o = g.source("orders", g.spark.createDataFrame(
        [], "user long, amount long"))
    u = g.source("users", g.spark.createDataFrame(
        [], "user long, seg string"))
    return (o.join(u, on=["user"])
             .reduce(["user"], total=("sum", "amount"), n=("count",),
                     seg=("any", "seg")))


def _mkbatches(rng, n_users=24, steps=6):
    users = [(u, "AB"[u % 2]) for u in range(n_users)]
    live = []
    batches = []
    for s in range(steps):
        ins = [(rng.randrange(n_users), rng.randint(1, 100))
               for _ in range(rng.randint(2, 6))]
        dels = ([live[rng.randrange(len(live))]]
                if live and rng.random() < 0.5 else [])
        live.extend(ins)
        for d in dels:
            live.remove(d)
        batches.append((ins, dels))
    return users, batches


def _feed(spark, target, users, batch, *, first):
    ins, dels = batch
    rows = [(u, a, 1) for u, a in ins] + [(u, a, -1) for u, a in dels]
    kw = {"orders": spark.createDataFrame(
        rows, "user long, amount long, _pw_diff long")}
    if first:
        kw["users"] = spark.createDataFrame(users, "user long, seg string")
    return kw


def test_sharded_equals_unsharded_with_retractions(spark):
    rng = random.Random(3)
    users, batches = _mkbatches(rng)

    g = DifferentialGraph(spark)
    out = _build(g)
    sh = ShardedDifferential(spark, _build, shards=3, key=["user"])

    log_u, log_s = None, None
    for i, b in enumerate(batches):
        (du,) = g.step(out, **_feed(spark, g, users, b, first=i == 0))
        du = du.localCheckpoint(True)
        ds = sh.step(**_feed(spark, sh, users, b, first=i == 0))
        log_u = du if log_u is None else log_u.unionByName(du)
        log_s = ds if log_s is None else log_s.unionByName(ds)
        got = _rows(DifferentialGraph.integrate(log_s),
                    "user", "total", "n", "seg")
        want = _rows(DifferentialGraph.integrate(log_u),
                     "user", "total", "n", "seg")
        assert got == want, f"diverged at batch {i}"
    g.restore_session_confs()


def test_sharded_crash_restore_per_shard(spark, tmp_path):
    """Commit, then rebuild the whole sharded pipeline from the root
    state_dir (each shard restores its OWN meta) and continue — the
    resumed stream matches an uninterrupted unsharded run."""
    rng = random.Random(9)
    users, batches = _mkbatches(rng, steps=5)
    sd = str(tmp_path / "sharded")

    g = DifferentialGraph(spark)
    out = _build(g)
    full = []
    for i, b in enumerate(batches):
        (du,) = g.step(out, **_feed(spark, g, users, b, first=i == 0))
        full.append(du.localCheckpoint(True))
    g.restore_session_confs()

    sh1 = ShardedDifferential(spark, _build, shards=3, key=["user"],
                              state_dir=sd)
    for i, b in enumerate(batches[:3]):
        sh1.step(**_feed(spark, sh1, users, b, first=i == 0))
    sh1.commit()
    sh1.restore_session_confs()

    sh2 = ShardedDifferential(spark, _build, shards=3, key=["user"],
                              state_dir=sd)
    assert sh2.t == sh1.t, "every shard restored the committed clock"
    tail = None
    for b in batches[3:]:
        ds = sh2.step(**_feed(spark, sh2, users, b, first=False))
        tail = ds if tail is None else tail.unionByName(ds)
    want = full[3]
    for d in full[4:]:
        want = want.unionByName(d)
    assert _rows(tail, "user", "total", "n", "seg", DIFF) == \
        _rows(want, "user", "total", "n", "seg", DIFF)
    sh2.restore_session_confs()


def test_shard_validation_rejects_cross_shard_state(spark):
    def bad_reduce(g):
        o = g.source("o", g.spark.createDataFrame(
            [], "user long, seg string, amount long"))
        # groups by seg only: a segment spans shards keyed on user
        return o.reduce(["seg"], total=("sum", "amount"))

    with pytest.raises(ValueError, match="shard key"):
        ShardedDifferential(spark, bad_reduce, shards=2, key=["user"])

    def bad_join(g):
        a = g.source("a", g.spark.createDataFrame(
            [], "user long, x long"))
        b = g.source("b", g.spark.createDataFrame(
            [], "x long, y long"))
        return a.join(b, on=["x"])          # join key != shard key

    with pytest.raises(ValueError, match="shard key"):
        ShardedDifferential(spark, bad_join, shards=2, key=["user"])

    def watermarked(g):
        o = g.source("o", g.spark.createDataFrame(
            [], "user long, ts long"))
        return o.forget("ts", 100)          # global watermark

    with pytest.raises(TypeError, match="sharded"):
        ShardedDifferential(spark, watermarked, shards=2, key=["user"])

    def missing_key(g):
        o = g.source("o", g.spark.createDataFrame([], "x long"))
        return o.reduce(["x"], n=("count",))

    with pytest.raises(ValueError, match="shard key"):
        ShardedDifferential(spark, missing_key, shards=2, key=["user"])


def test_shard_distinct_dropping_key_fails_loudly(spark):
    def build(g):
        o = g.source("o", g.spark.createDataFrame(
            [], "user long, v long"))
        return o.select(F.col("v")).distinct()   # key projected away

    sh = ShardedDifferential(spark, build, shards=2, key=["user"])
    with pytest.raises(ValueError, match="dropped"):
        sh.step(o=spark.createDataFrame([(1, 5)], "user long, v long"))
