"""Banded distributed θ/interval-join state probe (r9 verdict #1).

The resident `_ThetaBandKernel` solved the tick floor; these tests pin
the DISTRIBUTED path's banding — the 100×-scale story.  With band
metadata on an exact-integer time axis, each delta row explodes to its
2-3 candidate bands and the state probe hash-joins on (equi keys,
band) with the original predicate re-checked, so a key-less interval
condition stops planning a BroadcastNestedLoop of delta × full state
and a keyed one stops scanning O(key history) per delta row.

Reference bar: differential dataflow's time-bucketed arrangements
(python/pathway/stdlib/temporal/_interval_join.py:577)."""

import datetime as dt
import random
import re

import pytest
from pyspark.sql import functions as F

from pathway_spark import this
from pathway_spark.streaming.diff_table import DifferentialTableGraph
from pathway_spark.streaming.differential import as_delta


def _join_strategies(df) -> set[str]:
    phys = df._jdf.queryExecution().sparkPlan().toString()
    return set(re.findall(r"(\w*Join\w*)", phys))


def _state_probe(spark, node, db_rows, rsch):
    """The direction-2 join (A_old ⋈θ dB) exactly as _advance builds
    it — the node's output itself is checkpointed, so the join plan
    must be probed pre-checkpoint."""
    db = spark.createDataFrame(db_rows, rsch + ", _pw_diff long")
    return node._weighted(as_delta(node._sa.get(), time=1),
                          node._small(db, node.inputs[1]), 1,
                          delta_side="r")


LSCH = "lid long, g long, lt long"
RSCH = "rid long, rg long, rt long"


def _setup(spark, *, keyed: bool, banded: bool):
    ldf = spark.createDataFrame(
        [(i, i % 3, i % 40) for i in range(300)], LSCH)
    rdf = spark.createDataFrame(
        [(i, i % 3, (i + 5) % 40) for i in range(80)], RSCH)
    g = DifferentialTableGraph(spark, resident=False)
    lt = g.input("l", ldf)
    rt = g.input("r", rdf)
    args = (this.g == this.rg,) if keyed else ()
    out = lt.interval_join(rt, this.lt, this.rt, (0, 2), *args)
    if not banded:
        out.node._theta_band = None
    (d0,) = g.step(out.node, l=ldf, r=rdf)
    d0.collect()
    return g, out.node


def test_keyless_state_probe_is_hash_join_not_bnl(spark):
    """PLAN GATE: with band metadata, a key-less interval join's state
    probe is a hash join on the band — no BroadcastNestedLoop against
    the state store.  The unbanded control asserts BNL so the gate
    stays meaningful."""
    _, node = _setup(spark, keyed=False, banded=True)
    strategies = _join_strategies(
        _state_probe(spark, node, [(9000, 0, 7, 1)], RSCH))
    assert "BroadcastNestedLoopJoin" not in strategies, strategies
    assert any("HashJoin" in s or "SortMergeJoin" in s
               for s in strategies), strategies

    _, node_u = _setup(spark, keyed=False, banded=False)
    control = _join_strategies(
        _state_probe(spark, node_u, [(9000, 0, 7, 1)], RSCH))
    assert "BroadcastNestedLoopJoin" in control, control


def test_keyed_state_probe_hashes_on_band(spark):
    """Keyed interval join: the band column joins the hash-key set, so
    the probe touches O(band slice) of a key's history, not all of
    it."""
    _, node = _setup(spark, keyed=True, banded=True)
    probe = _state_probe(spark, node, [(9000, 0, 7, 1)], RSCH)
    phys = probe._jdf.queryExecution().sparkPlan().toString()
    hash_joins = [ln for ln in phys.splitlines()
                  if "HashJoin" in ln or "SortMergeJoin" in ln]
    assert hash_joins and all("_pw_theta_band" in ln for ln in hash_joins)


def test_double_axis_bands_no_bnl(spark):
    """r11 (r10 verdict #2): a key-less DOUBLE-axis interval join's
    state probe bands too — predicate-form explode on the interval
    side, point assign on the other — and plans a hash join in BOTH
    probe directions, no BroadcastNestedLoop left anywhere."""
    ldf = spark.createDataFrame(
        [(i, i * 0.7 - 20.0) for i in range(200)], "lid long, lt double")
    rdf = spark.createDataFrame(
        [(i, i * 1.1 - 20.0) for i in range(80)], "rid long, rt double")
    g = DifferentialTableGraph(spark, resident=False)
    out = g.input("l", ldf).interval_join(
        g.input("r", rdf), this.lt, this.rt, (-1.0, 1.0))
    node = out.node
    (d0,) = g.step(node, l=ldf, r=rdf)
    d0.collect()
    assert node._dband is not None and node._dband["kind"] == "dbl"
    # direction 2: A_old state probed by dB
    strategies = _join_strategies(
        _state_probe(spark, node, [(9000, 7.3, 1)], "rid long, rt double"))
    assert "BroadcastNestedLoopJoin" not in strategies, strategies
    assert any("HashJoin" in s or "SortMergeJoin" in s
               for s in strategies), strategies
    # direction 1: dA probes B_new
    da = spark.createDataFrame([(9001, 3.2, 1)],
                               "lid long, lt double, _pw_diff long")
    probe_l = node._weighted(node._small(da, node.inputs[0]),
                             as_delta(node._sb.get(), time=1), 1,
                             delta_side="l")
    strategies = _join_strategies(probe_l)
    assert "BroadcastNestedLoopJoin" not in strategies, strategies


def test_unbandable_axes_keep_catalyst_join(spark):
    """Gates that must NOT band: float32 axes (predicate computes in
    float32), and an int axis with int bounds against a double other
    side (Catalyst adds in int space)."""
    g = DifferentialTableGraph(spark, resident=False)
    lf = spark.createDataFrame([(1, 1.0)], "lid long, lt float")
    rf = spark.createDataFrame([(1, 1.5)], "rid long, rt float")
    out = g.input("l", lf).interval_join(
        g.input("r", rf), this.lt, this.rt, (-1.0, 1.0))
    (d0,) = g.step(out.node, l=lf, r=rf)
    assert d0.count() == 1
    assert out.node._dband is None and out.node._dband_done

    g2 = DifferentialTableGraph(spark, resident=False)
    li = spark.createDataFrame([(1, 10)], "lid long, lt long")
    rd = spark.createDataFrame([(1, 10.5)], "rid long, rt double")
    out2 = g2.input("l", li).interval_join(
        g2.input("r", rd), this.lt, this.rt, (-1, 1))
    (d1,) = g2.step(out2.node, l=li, r=rd)
    d1.collect()
    assert out2.node._dband is None and out2.node._dband_done


def test_banded_equivalence_randomized_double(spark):
    """Randomized double axes with NULL/NaN/±inf/huge-magnitude times
    and inserts/retracts: the banded trace must equal the unbanded
    Catalyst join tick for tick (Spark NaN semantics included)."""
    rng = random.Random(1311)
    NAN, INF = float("nan"), float("inf")

    def tval():
        return rng.choice(
            [None, NAN, INF, -INF, 1e300, -1e300, 2.0 ** 51,
             rng.uniform(-30.0, 30.0), rng.uniform(-30.0, 30.0),
             rng.uniform(-30.0, 30.0)])

    lsch, rsch = "lid long, g long, lt double", "rid long, rg long, rt double"
    lrows = [(i, i % 3, tval()) for i in range(120)]
    rrows = [(i, i % 3, tval()) for i in range(60)]
    ldf = spark.createDataFrame(lrows, lsch)
    rdf = spark.createDataFrame(rrows, rsch)
    ticks = []
    for t in range(4):
        feed = {}
        if t % 2 == 0:
            feed["l"] = spark.createDataFrame(
                [(1000 + t, t % 3, tval(), 1), lrows[t] + (-1,)],
                lsch + ", _pw_diff long")
        else:
            feed["r"] = spark.createDataFrame(
                [(2000 + t, t % 3, tval(), 1), rrows[t] + (-1,)],
                rsch + ", _pw_diff long")
        ticks.append(feed)
    for keys in ((), (("g", "rg"),)):
        a, on_a = _drive(spark, True, ldf, rdf, ticks, keys=keys,
                         interval=(-2.5, 1.5))
        b, on_b = _drive(spark, False, ldf, rdf, ticks, keys=keys,
                         interval=(-2.5, 1.5))
        assert on_a and not on_b
        assert a == b
        assert any(len(t) for t in a)


def test_banded_intervals_over_float_bounds(spark):
    """intervals_over with FLOAT bounds on an int axis rides the dbl
    banding via orig_bounds (the right side explodes the predicate's
    own [p+lo, p+up] range); window contents must match the unbanded
    control through the grouped reduce."""
    data = spark.createDataFrame(
        [(i, i % 25, float(i)) for i in range(200)],
        "id long, t long, v double")
    pts = spark.createDataFrame([(5,), (12,), (24,)], "p long")
    import pathway_spark as pw

    def run(banded):
        g = DifferentialTableGraph(spark, resident=False)
        d = g.input("data", data)
        at = g.input("pts", pts)
        w = pw.temporal.intervals_over(
            at=at, lower_bound=-4.5, upper_bound=3.5)
        grouped = d.windowby(this.t, window=w)
        out = grouped.reduce(s=pw.reducers.sum(this.v),
                             n=pw.reducers.count())
        theta = None
        for node in g._nodes:
            if hasattr(node, "_theta_band"):
                theta = node
                if not banded:
                    node._theta_band = None
        traces = []
        (d0,) = g.step(out.node, data=data, pts=pts)
        traces.append(_trace(d0.collect()))
        (d1,) = g.step(out.node, pts=spark.createDataFrame(
            [(18, 1), (5, -1)], "p long, _pw_diff long"))
        traces.append(_trace(d1.collect()))
        (d2,) = g.step(out.node, data=spark.createDataFrame(
            [(900, 13, 2.5, 1), (0, 0, 0.0, -1)],
            "id long, t long, v double, _pw_diff long"))
        traces.append(_trace(d2.collect()))
        return traces, theta

    a, ta = run(True)
    b, tb = run(False)
    assert a == b
    assert ta._dband is not None and ta._dband["kind"] == "dbl" \
        and ta._dband["orig"]
    assert tb._dband is None


def _trace(rows):
    return sorted(tuple(map(repr, r)) for r in rows)


def _drive(spark, banded, ldf, rdf, ticks, *, keys=(), interval=(0, 2),
           time_cols=("lt", "rt")):
    g = DifferentialTableGraph(spark, resident=False)
    lt = g.input("l", ldf)
    rt = g.input("r", rdf)
    args = tuple(getattr(this, a) == getattr(this, b) for a, b in keys)
    out = lt.interval_join(rt, getattr(this, time_cols[0]),
                           getattr(this, time_cols[1]), interval, *args)
    if not banded:
        out.node._theta_band = None
    traces = []
    (d0,) = g.step(out.node, l=ldf, r=rdf)
    traces.append(_trace(d0.collect()))
    for feed in ticks:
        (d,) = g.step(out.node, **feed)
        traces.append(_trace(d.collect()))
    banded_on = out.node._dband is not None
    return traces, banded_on


def test_banded_equivalence_randomized_int(spark):
    """Randomized inserts/retracts/NULL times/NULL keys: the banded
    distributed trace must equal the unbanded one tick for tick."""
    rng = random.Random(907)
    lrows = [(i, rng.choice([0, 1, 2, None]),
              rng.choice([rng.randrange(-30, 30), None]))
             for i in range(120)]
    rrows = [(i, rng.choice([0, 1, 2, None]),
              rng.choice([rng.randrange(-30, 30), None]))
             for i in range(60)]
    ldf = spark.createDataFrame(lrows, LSCH)
    rdf = spark.createDataFrame(rrows, RSCH)
    ticks = []
    for t in range(4):
        feed = {}
        if t % 2 == 0:
            feed["l"] = spark.createDataFrame(
                [(1000 + t, rng.choice([0, 1, None]),
                  rng.randrange(-30, 30), 1),
                 lrows[t] + (-1,)], LSCH + ", _pw_diff long")
        else:
            feed["r"] = spark.createDataFrame(
                [(2000 + t, rng.choice([0, 1, None]),
                  rng.randrange(-30, 30), 1),
                 rrows[t] + (-1,)], RSCH + ", _pw_diff long")
        ticks.append(feed)
    for keys in ((), (("g", "rg"),)):
        a, on_a = _drive(spark, True, ldf, rdf, ticks, keys=keys,
                         interval=(-3, 2))
        b, on_b = _drive(spark, False, ldf, rdf, ticks, keys=keys,
                         interval=(-3, 2))
        assert on_a and not on_b
        assert a == b


def test_banded_equivalence_timestamps(spark):
    """Timestamp axis under a timedelta interval — micros banding is
    exact long arithmetic regardless of session timezone (both band
    assignment and predicate run through the same Spark exprs)."""
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    lsch = "lid long, lt timestamp"
    rsch = "rid long, rt timestamp"
    lrows = [(i, base + dt.timedelta(seconds=7 * i)) for i in range(50)]
    lrows.append((99, None))
    rrows = [(i, base + dt.timedelta(seconds=11 * i)) for i in range(30)]
    ldf = spark.createDataFrame(lrows, lsch)
    rdf = spark.createDataFrame(rrows, rsch)
    ticks = [
        dict(r=spark.createDataFrame(
            [(500, base + dt.timedelta(seconds=33), 1),
             (0, base, -1)], rsch + ", _pw_diff long")),
        dict(l=spark.createDataFrame(
            [(600, base + dt.timedelta(seconds=40), 1)],
            lsch + ", _pw_diff long")),
    ]
    iv = (dt.timedelta(seconds=-5), dt.timedelta(seconds=15))
    a, on_a = _drive(spark, True, ldf, rdf, ticks, interval=iv)
    b, on_b = _drive(spark, False, ldf, rdf, ticks, interval=iv)
    assert on_a and not on_b
    assert a == b
    assert any(len(t) for t in a)


def test_banded_intervals_over_stays_exact(spark):
    """intervals_over's rearranged band metadata (int_only) rides the
    same distributed banding; the grouped reduce downstream must see
    identical window contents."""
    data = spark.createDataFrame(
        [(i, i % 25, float(i)) for i in range(200)], "id long, t long, v double")
    pts = spark.createDataFrame([(5,), (12,), (24,)], "p long")
    import pathway_spark as pw

    def run(banded):
        g = DifferentialTableGraph(spark, resident=False)
        d = g.input("data", data)
        at = g.input("pts", pts)
        w = pw.temporal.intervals_over(
            at=at, lower_bound=-4, upper_bound=3)
        grouped = d.windowby(this.t, window=w)
        out = grouped.reduce(s=pw.reducers.sum(this.v),
                             n=pw.reducers.count())
        # reach the θ node to strip metadata on the control run
        if not banded:
            for node in g._nodes:
                if hasattr(node, "_theta_band"):
                    node._theta_band = None
        traces = []
        (d0,) = g.step(out.node, data=data, pts=pts)
        traces.append(_trace(d0.collect()))
        (d1,) = g.step(out.node, pts=spark.createDataFrame(
            [(18, 1), (5, -1)], "p long, _pw_diff long"))
        traces.append(_trace(d1.collect()))
        (d2,) = g.step(out.node, data=spark.createDataFrame(
            [(900, 13, 2.5, 1), (0, 0, 0.0, -1)],
            "id long, t long, v double, _pw_diff long"))
        traces.append(_trace(d2.collect()))
        return traces

    assert run(True) == run(False)
