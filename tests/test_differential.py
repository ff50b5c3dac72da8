"""Differential engine: derived-row retraction streams.

Invariant checked throughout: for any sequence of input deltas,
integrate(output changelog) == the same query recomputed from scratch
on integrate(input changelog) — i.e. the incremental plan and the batch
plan agree at every prefix, while the changelog additionally carries
the -1/+1 rows Structured Streaming alone cannot produce for derived
tables (reference `src/engine/dataflow.rs` reduce/join retractions)."""

import pytest
from pyspark.sql import functions as F

from pathway_spark.streaming.differential import (
    DIFF, TIME, DifferentialGraph, as_delta, consolidate,
)


def _rows(df, *cols):
    return sorted((tuple(r) for r in df.select(*cols).collect()),
                  key=lambda t: tuple((x is None, x) for x in t))


def _delta(spark, rows, schema, diff=None):
    df = spark.createDataFrame(rows, schema)
    if diff is not None:
        df = df.withColumn(DIFF, F.lit(diff))
    return df


@pytest.fixture()
def tpl(spark):
    return spark.createDataFrame([], "user string, amount long")


def test_linear_ops_pass_diffs_through(spark, tpl):
    g = DifferentialGraph(spark)
    src = g.source("t", tpl)
    node = (src.filter(F.col("amount") > 10)
               .select("user", doubled=F.col("amount") * 2))
    b1 = _delta(spark, [("a", 5), ("b", 20)], tpl.schema)
    b2 = _delta(spark, [("b", 20)], tpl.schema, diff=-1)
    out = g.run(node, [b1, b2])
    log = _rows(out, "user", "doubled", DIFF, TIME)
    assert log == [("b", 40, -1, 1), ("b", 40, 1, 0)]
    assert _rows(DifferentialGraph.integrate(out), "user", "doubled") == []


def test_reduce_emits_retraction_then_new_value(spark, tpl):
    g = DifferentialGraph(spark)
    totals = g.source("t", tpl).reduce(
        ["user"], total=("sum", "amount"), n=("count",))
    b1 = _delta(spark, [("a", 10), ("a", 5), ("b", 7)], tpl.schema)
    b2 = _delta(spark, [("a", 1)], tpl.schema)
    (d1,) = g.step(totals, t=b1)
    assert _rows(d1, "user", "total", "n", DIFF) == [
        ("a", 15, 2, 1), ("b", 7, 1, 1)]
    (d2,) = g.step(totals, t=b2)
    # b unchanged -> silent; a retracts its old row, emits the new one
    assert _rows(d2, "user", "total", "n", DIFF) == [
        ("a", 15, 2, -1), ("a", 16, 3, 1)]


def test_reduce_min_handles_retraction_of_current_min(spark, tpl):
    g = DifferentialGraph(spark)
    lows = g.source("t", tpl).reduce(["user"], lo=("min", "amount"))
    b1 = _delta(spark, [("a", 3), ("a", 9)], tpl.schema)
    b2 = _delta(spark, [("a", 3)], tpl.schema, diff=-1)
    g.step(lows, t=b1)
    (d2,) = g.step(lows, t=b2)
    # min must climb back to 9 — only possible because the node keeps
    # the group's full multiset, not just the old aggregate
    assert _rows(d2, "user", "lo", DIFF) == [("a", 3, -1), ("a", 9, 1)]


def test_reduce_group_disappears_on_full_retraction(spark, tpl):
    g = DifferentialGraph(spark)
    totals = g.source("t", tpl).reduce(["user"], total=("sum", "amount"))
    g.step(totals, t=_delta(spark, [("a", 4)], tpl.schema))
    (d2,) = g.step(totals, t=_delta(spark, [("a", 4)], tpl.schema, diff=-1))
    assert _rows(d2, "user", "total", DIFF) == [("a", 4, -1)]


def test_inner_join_bilinear_rule(spark):
    left_t = spark.createDataFrame([], "k string, l long")
    right_t = spark.createDataFrame([], "k string, r string")
    g = DifferentialGraph(spark)
    a, b = g.source("a", left_t), g.source("b", right_t)
    j = a.join(b, on=["k"])
    (d1,) = g.step(j, a=_delta(spark, [("x", 1)], left_t.schema))
    assert _rows(d1, "k", "l", "r", DIFF) == []          # no match yet
    (d2,) = g.step(j, b=_delta(spark, [("x", "R")], right_t.schema))
    assert _rows(d2, "k", "l", "r", DIFF) == [("x", 1, "R", 1)]
    # retract the right row -> joined row retracts
    (d3,) = g.step(j, b=_delta(spark, [("x", "R")], right_t.schema, diff=-1))
    assert _rows(d3, "k", "l", "r", DIFF) == [("x", 1, "R", -1)]


def test_join_same_batch_both_sides(spark):
    left_t = spark.createDataFrame([], "k string, l long")
    right_t = spark.createDataFrame([], "k string, r string")
    g = DifferentialGraph(spark)
    a, b = g.source("a", left_t), g.source("b", right_t)
    out = g.run(a.join(b, on=["k"]), [
        {"a": _delta(spark, [("x", 1)], left_t.schema),
         "b": _delta(spark, [("x", "R")], right_t.schema)},
    ])
    # dA ⋈ dB must be counted exactly once
    assert _rows(out, "k", "l", "r", DIFF) == [("x", 1, "R", 1)]


def test_left_join_padding_appears_and_retracts(spark):
    left_t = spark.createDataFrame([], "k string, l long")
    right_t = spark.createDataFrame([], "k string, r string")
    g = DifferentialGraph(spark)
    a, b = g.source("a", left_t), g.source("b", right_t)
    j = a.join(b, on=["k"], how="left")
    (d1,) = g.step(j, a=_delta(spark, [("x", 1)], left_t.schema))
    assert _rows(d1, "k", "l", "r", DIFF) == [("x", 1, None, 1)]
    # match arrives: padded row retracts, joined row appears
    (d2,) = g.step(j, b=_delta(spark, [("x", "R")], right_t.schema))
    assert _rows(d2, "k", "l", "r", DIFF) == [
        ("x", 1, "R", 1), ("x", 1, None, -1)]
    # match leaves again: reverse
    (d3,) = g.step(j, b=_delta(spark, [("x", "R")], right_t.schema, diff=-1))
    assert _rows(d3, "k", "l", "r", DIFF) == [
        ("x", 1, "R", -1), ("x", 1, None, 1)]


def test_left_join_same_batch_new_left_and_presence_flip(spark):
    # the case the padding algebra note covers: a key appears on the
    # right in the SAME batch as new left rows arrive — those rows never
    # emit padding, and nothing is over-retracted
    left_t = spark.createDataFrame([], "k string, l long")
    right_t = spark.createDataFrame([], "k string, r string")
    g = DifferentialGraph(spark)
    a, b = g.source("a", left_t), g.source("b", right_t)
    j = a.join(b, on=["k"], how="left")
    g.step(j, a=_delta(spark, [("x", 1)], left_t.schema))
    (d2,) = g.step(
        j,
        a=_delta(spark, [("x", 2)], left_t.schema),
        b=_delta(spark, [("x", "R")], right_t.schema),
    )
    assert _rows(d2, "k", "l", "r", DIFF) == [
        ("x", 1, "R", 1), ("x", 1, None, -1), ("x", 2, "R", 1)]


def test_distinct_presence_semantics(spark, tpl):
    g = DifferentialGraph(spark)
    d = g.source("t", tpl).select("user").distinct()
    (d1,) = g.step(d, t=_delta(spark, [("a", 1), ("a", 2)], tpl.schema))
    assert _rows(d1, "user", DIFF) == [("a", 1)]          # one insert
    # drop one of the two supporting rows: still present, silent
    (d2,) = g.step(d, t=_delta(spark, [("a", 1)], tpl.schema, diff=-1))
    assert _rows(d2, "user", DIFF) == []
    # drop the last: retract
    (d3,) = g.step(d, t=_delta(spark, [("a", 2)], tpl.schema, diff=-1))
    assert _rows(d3, "user", DIFF) == [("a", -1)]


def test_composition_matches_batch_recompute_at_every_prefix(spark):
    """filter -> join -> reduce, randomized inserts+retractions; the
    integrated changelog equals the from-scratch batch answer after
    every single batch."""
    import random
    rnd = random.Random(7)
    left_t = spark.createDataFrame([], "k string, v long")
    right_t = spark.createDataFrame([], "k string, w long")
    g = DifferentialGraph(spark, checkpoint_every=2)
    a, b = g.source("a", left_t), g.source("b", right_t)
    q = (a.filter(F.col("v") % 2 == 0)
          .join(b, on=["k"])
          .reduce(["k"], s=("sum", "v"), m=("max", "w"), n=("count",)))

    live_a, live_b = [], []   # mirrors of current multiset contents
    logs = []
    for t in range(6):
        da, db = [], []
        for _ in range(rnd.randint(1, 3)):
            da.append((rnd.choice("pqr"), rnd.randint(0, 6), 1))
        if live_a and rnd.random() < 0.7:
            da.append(live_a.pop(rnd.randrange(len(live_a))) + (-1,))
        for _ in range(rnd.randint(0, 2)):
            db.append((rnd.choice("pqr"), rnd.randint(0, 9), 1))
        if live_b and rnd.random() < 0.5:
            db.append(live_b.pop(rnd.randrange(len(live_b))) + (-1,))
        live_a += [r[:2] for r in da if r[2] > 0]
        live_b += [r[:2] for r in db if r[2] > 0]
        (out,) = g.step(
            q,
            a=spark.createDataFrame(da, "k string, v long, _pw_diff long"),
            b=spark.createDataFrame(db, "k string, w long, _pw_diff long"),
        )
        logs.append(out.localCheckpoint(eager=True))
        # batch recompute on current live sets
        adf = spark.createDataFrame(live_a or [("zz", -1)], "k string, v long")
        bdf = spark.createDataFrame(live_b or [("zz", -1)], "k string, w long")
        expect = (adf.filter(F.col("v") % 2 == 0).join(bdf, on=["k"])
                     .groupBy("k").agg(F.sum("v").alias("s"),
                                       F.max("w").alias("m"),
                                       F.count(F.lit(1)).alias("n")))
        if not live_a:
            expect = expect.filter(F.lit(False))
        acc = logs[0]
        for p in logs[1:]:
            acc = acc.unionByName(p)
        got = DifferentialGraph.integrate(acc)
        assert _rows(got, "k", "s", "m", "n") == _rows(expect, "k", "s", "m", "n"), \
            f"diverged at batch {t}"


def test_flatten_union_and_negate(spark):
    tpl = spark.createDataFrame([], "doc string, words array<string>")
    g = DifferentialGraph(spark)
    src = g.source("t", tpl)
    words = src.flatten("words", alias="word").select("word")
    both = words.union(words.negate())
    b1 = as_delta(spark.createDataFrame([("d1", ["x", "y"])], tpl.schema))
    out = g.run(both, [b1])
    # x + (−x) consolidates to nothing
    assert _rows(consolidate(out), "word") == []
    assert _rows(words.delta(0), "word", DIFF) == [("x", 1), ("y", 1)]


def test_avg_and_count_distinct_reducers(spark, tpl):
    g = DifferentialGraph(spark)
    r = g.source("t", tpl).reduce(
        ["user"], mean=("avg", "amount"), k=("count_distinct", "amount"))
    g.step(r, t=_delta(spark, [("a", 10), ("a", 20), ("a", 10)], tpl.schema))
    (d2,) = g.step(r, t=_delta(spark, [("a", 10)], tpl.schema, diff=-1))
    got = {(u, m, k, s) for u, m, k, s in
           (tuple(x) for x in d2.select("user", "mean", "k", DIFF).collect())}
    assert ("a", 40 / 3, 2, -1) in got
    assert ("a", 15.0, 2, 1) in got


# ---------------------------------------------------------------------------
# pathway-style Table syntax over the differential engine (diff_table.py)
# ---------------------------------------------------------------------------

def test_diff_table_pathway_syntax_end_to_end(spark):
    import pathway_spark as pw
    from pathway_spark import this, reducers as r
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "user string, amount long, tag string")
    g = DifferentialTableGraph(spark)
    t = g.input("t", tpl)
    q = (t.filter(this.amount > 0)
          .with_columns(double=this.amount * 2)
          .groupby(this.user)
          .reduce(this.user,
                  total=r.sum(this.double),
                  n=r.count(),
                  hi=r.max(this.amount),
                  first_tag=r.argmin(this.amount, this.tag)))
    b1 = spark.createDataFrame(
        [("a", 3, "x"), ("a", 5, "y"), ("b", -1, "z"), ("b", 2, "w")],
        tpl.schema)
    (d1,) = g.step(q.node, t=b1)
    assert _rows(d1, "user", "total", "n", "hi", "first_tag", DIFF) == [
        ("a", 16, 2, 5, "x", 1), ("b", 4, 1, 2, "w", 1)]
    # retract a's min row: total drops, argmin flips to the other row
    b2 = spark.createDataFrame([("a", 3, "x")], tpl.schema) \
              .withColumn(DIFF, F.lit(-1))
    (d2,) = g.step(q.node, t=b2)
    assert _rows(d2, "user", "total", "n", "hi", "first_tag", DIFF) == [
        ("a", 10, 1, 5, "y", 1), ("a", 16, 2, 5, "x", -1)]


def test_diff_table_join_with_renamed_keys(spark):
    from pathway_spark import this, left, right, reducers as r
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    o_t = spark.createDataFrame([], "custkey long, price double")
    c_t = spark.createDataFrame([], "c_custkey long, seg string")
    g = DifferentialTableGraph(spark)
    o, c = g.input("o", o_t), g.input("c", c_t)
    q = (o.join(c, left.custkey == right.c_custkey)
          .groupby(this.seg)
          .reduce(this.seg, rev=r.sum(this.price)))
    (d1,) = g.step(q.node,
                   o=spark.createDataFrame([(1, 10.0), (2, 4.0)], o_t.schema),
                   c=spark.createDataFrame([(1, "A"), (2, "A")], c_t.schema))
    assert _rows(d1, "seg", "rev", DIFF) == [("A", 14.0, 1)]
    # customer 2 switches segment: A retracts/re-emits, B appears
    db = spark.createDataFrame([(2, "A", -1), (2, "B", 1)],
                               "c_custkey long, seg string, _pw_diff long")
    (d2,) = g.step(q.node, c=db)
    assert _rows(d2, "seg", "rev", DIFF) == [
        ("A", 10.0, 1), ("A", 14.0, -1), ("B", 4.0, 1)]


def test_diff_table_unsupported_reducer_raises(spark):
    import pytest as _pytest
    from pathway_spark import this, reducers as r
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "user string, amount long")
    g = DifferentialTableGraph(spark)
    t = g.input("t", tpl)
    # `tuple` stays batch-only (partition-order dependent);
    # sorted_tuple graduated to the differential reducers in round 5
    with _pytest.raises(NotImplementedError):
        t.groupby(this.user).reduce(this.user,
                                    xs=r.tuple(this.amount))


def test_right_and_outer_join_padding(spark):
    left_t = spark.createDataFrame([], "k string, l long")
    right_t = spark.createDataFrame([], "k string, r string")

    def fresh(how):
        g = DifferentialGraph(spark)
        a, b = g.source("a", left_t), g.source("b", right_t)
        return g, a, b, a.join(b, on=["k"], how=how)

    # right join: unmatched RIGHT rows are padded
    g, a, b, j = fresh("right")
    (d1,) = g.step(j, b=_delta(spark, [("x", "R")], right_t.schema))
    assert _rows(d1, "k", "l", "r", DIFF) == [("x", None, "R", 1)]
    (d2,) = g.step(j, a=_delta(spark, [("x", 7)], left_t.schema))
    assert _rows(d2, "k", "l", "r", DIFF) == [
        ("x", 7, "R", 1), ("x", None, "R", -1)]

    # outer join: both sides padded, and padding flips as matches arrive
    g, a, b, j = fresh("outer")
    (d1,) = g.step(
        j,
        a=_delta(spark, [("only_a", 1)], left_t.schema),
        b=_delta(spark, [("only_b", "B")], right_t.schema),
    )
    assert _rows(d1, "k", "l", "r", DIFF) == [
        ("only_a", 1, None, 1), ("only_b", None, "B", 1)]
    (d2,) = g.step(j, b=_delta(spark, [("only_a", "R2")], right_t.schema))
    assert _rows(d2, "k", "l", "r", DIFF) == [
        ("only_a", 1, "R2", 1), ("only_a", 1, None, -1)]


def test_outer_join_matches_batch_recompute_randomized(spark):
    import random
    rnd = random.Random(23)
    left_t = spark.createDataFrame([], "k string, v long")
    right_t = spark.createDataFrame([], "k string, w long")
    g = DifferentialGraph(spark, checkpoint_every=3)
    a, b = g.source("a", left_t), g.source("b", right_t)
    j = a.join(b, on=["k"], how="outer")
    live_a, live_b, logs = [], [], []
    for t in range(5):
        da, db = [], []
        for _ in range(rnd.randint(0, 2)):
            da.append((rnd.choice("pq"), rnd.randint(0, 3), 1))
        for _ in range(rnd.randint(0, 2)):
            db.append((rnd.choice("pq"), rnd.randint(0, 3), 1))
        if live_a and rnd.random() < 0.6:
            da.append(live_a.pop(rnd.randrange(len(live_a))) + (-1,))
        if live_b and rnd.random() < 0.6:
            db.append(live_b.pop(rnd.randrange(len(live_b))) + (-1,))
        live_a += [r[:2] for r in da if r[2] > 0]
        live_b += [r[:2] for r in db if r[2] > 0]
        (out,) = g.step(
            j,
            a=spark.createDataFrame(da, "k string, v long, _pw_diff long"),
            b=spark.createDataFrame(db, "k string, w long, _pw_diff long"),
        )
        logs.append(out.localCheckpoint(eager=True))
        adf = spark.createDataFrame(live_a or [("zz", -1)], "k string, v long")
        bdf = spark.createDataFrame(live_b or [("zz", -1)], "k string, w long")
        if not live_a:
            adf = adf.filter(F.lit(False))
        if not live_b:
            bdf = bdf.filter(F.lit(False))
        expect = adf.join(bdf, on=["k"], how="outer")
        acc = logs[0]
        for p in logs[1:]:
            acc = acc.unionByName(p)
        got = DifferentialGraph.integrate(acc)
        assert _rows(got, "k", "v", "w") == _rows(expect, "k", "v", "w"), \
            f"outer join diverged at batch {t}"


def test_durable_state_commit_and_resume(spark, tmp_path):
    """Parquet-versioned state: run 2 batches, commit, REBUILD the graph
    in a 'new process' with the same state_dir, feed batch 3 — the
    resumed pipeline emits exactly what an uninterrupted one does."""
    sd = str(tmp_path / "state")
    tpl = spark.createDataFrame([], "user string, amount long")

    def build(g):
        return g.source("t", tpl).reduce(
            ["user"], total=("sum", "amount"), n=("count",))

    batches = [
        _delta(spark, [("a", 10), ("b", 5)], tpl.schema),
        _delta(spark, [("a", 2)], tpl.schema),
        _delta(spark, [("b", 5), ("a", 1)], tpl.schema),
    ]
    # uninterrupted run
    g0 = DifferentialGraph(spark)
    q0 = build(g0)
    full = [g0.step(q0, t=b)[0].collect() for b in batches]

    # durable run: 2 batches then commit
    g1 = DifferentialGraph(spark, checkpoint_every=1, state_dir=sd)
    q1 = build(g1)
    for b in batches[:2]:
        g1.step(q1, t=b)
    g1.commit()
    del g1, q1

    # 'restart': same topology, same state_dir
    g2 = DifferentialGraph(spark, checkpoint_every=1, state_dir=sd)
    q2 = build(g2)
    assert g2._t == 1, "clock restored from _meta.json"
    (d3,) = g2.step(q2, t=batches[2])

    def norm(rows):
        return sorted((r["user"], r["total"], r["n"], r[DIFF]) for r in rows)
    assert norm(d3.collect()) == norm(full[2])


def test_diff_table_tumbling_window_retractions(spark):
    import pathway_spark as pw
    from pathway_spark import this, reducers as r
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "user string, t long, v long")
    g = DifferentialTableGraph(spark)
    tbl = g.input("t", tpl)
    win = (tbl.windowby(this.t, window=pw.temporal.tumbling(10))
              .reduce(this._pw_window_start,
                      n=r.count(), s=r.sum(this.v)))
    b1 = spark.createDataFrame(
        [("a", 3, 1), ("a", 7, 2), ("a", 13, 5)], tpl.schema)
    (d1,) = g.step(win.node, t=b1)
    got1 = _rows(d1, "_pw_window_start", "n", "s", DIFF)
    assert got1 == [(0, 2, 3, 1), (10, 1, 5, 1)]
    # retract the t=7 event: window [0,10) retracts and re-emits; [10,20) silent
    b2 = spark.createDataFrame([("a", 7, 2)], tpl.schema) \
              .withColumn(DIFF, F.lit(-1))
    (d2,) = g.step(win.node, t=b2)
    assert _rows(d2, "_pw_window_start", "n", "s", DIFF) == [
        (0, 1, 1, 1), (0, 2, 3, -1)]


def test_diff_table_sliding_window_fanout(spark):
    import pathway_spark as pw
    from pathway_spark import this, reducers as r
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "t long, v long")
    g = DifferentialTableGraph(spark)
    tbl = g.input("t", tpl)
    win = (tbl.windowby(this.t, window=pw.temporal.sliding(hop=5, duration=10))
              .reduce(this._pw_window_start, n=r.count()))
    (d1,) = g.step(win.node,
                   t=spark.createDataFrame([(7, 1)], tpl.schema))
    # t=7 lands in windows starting at 0 and 5
    assert _rows(d1, "_pw_window_start", "n", DIFF) == [(0, 1, 1), (5, 1, 1)]


def test_diff_table_interval_join_retractions(spark):
    import pathway_spark as pw
    from pathway_spark import this, left, right
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    a_t = spark.createDataFrame([], "aid long, at long, k string")
    b_t = spark.createDataFrame([], "bid long, bt long, kk string")
    g = DifferentialTableGraph(spark)
    a, b = g.input("a", a_t), g.input("b", b_t)
    j = a.interval_join(b, this.at, this.bt, pw.temporal.interval(-2, 2),
                        left.k == right.kk)
    (d1,) = g.step(j.node,
                   a=spark.createDataFrame([(1, 10, "x"), (2, 20, "x")], a_t.schema),
                   b=spark.createDataFrame([(7, 11, "x"), (8, 30, "x")], b_t.schema))
    # only (1,7): |11-10|<=2 and same key
    assert _rows(d1, "aid", "bid", DIFF) == [(1, 7, 1)]
    # retract the matching right row -> pair retracts
    (d2,) = g.step(j.node, b=spark.createDataFrame(
        [(7, 11, "x")], b_t.schema).withColumn(DIFF, F.lit(-1)))
    assert _rows(d2, "aid", "bid", DIFF) == [(1, 7, -1)]
    # same-batch both sides counted once
    (d3,) = g.step(j.node,
                   a=spark.createDataFrame([(3, 100, "y")], a_t.schema),
                   b=spark.createDataFrame([(9, 99, "y")], b_t.schema))
    assert _rows(d3, "aid", "bid", DIFF) == [(3, 9, 1)]


def test_diff_table_asof_join_retraction_promotes_next_best(spark):
    """Asof matching is not bilinear: when the matched right row
    retracts, the left row must re-match to the next-best — the
    keyed-recompute rule handles it."""
    from pathway_spark import this, left, right
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    trades_t = spark.createDataFrame([], "sym string, tt long, px double")
    quotes_t = spark.createDataFrame([], "qsym string, qt long, bid double")
    g = DifferentialTableGraph(spark)
    tr, qu = g.input("t", trades_t), g.input("q", quotes_t)
    j = tr.asof_join(qu, this.tt, this.qt, left.sym == right.qsym,
                     how="inner", direction="backward")
    (d1,) = g.step(j.node,
                   t=spark.createDataFrame([("A", 10, 1.0)], trades_t.schema),
                   q=spark.createDataFrame([("A", 5, 9.0), ("A", 8, 9.5)],
                                           quotes_t.schema))
    assert _rows(d1, "sym", "tt", "qt", "bid", DIFF) == [("A", 10, 8, 9.5, 1)]
    # retract the matched quote (qt=8): match falls back to qt=5
    (d2,) = g.step(j.node, q=spark.createDataFrame(
        [("A", 8, 9.5)], quotes_t.schema).withColumn(DIFF, F.lit(-1)))
    assert _rows(d2, "sym", "tt", "qt", "bid", DIFF) == [
        ("A", 10, 5, 9.0, 1), ("A", 10, 8, 9.5, -1)]
    # an unrelated key's update leaves A silent
    (d3,) = g.step(j.node, q=spark.createDataFrame(
        [("B", 1, 2.0)], quotes_t.schema))
    assert _rows(d3, "sym", "tt", "qt", "bid", DIFF) == []


def test_diff_table_session_window_split_on_retraction(spark):
    """A retraction that removes the bridging event must SPLIT the
    merged session: old merged window retracts, two new ones emit."""
    import pathway_spark as pw
    from pathway_spark import this, reducers as r
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "user string, t long")
    g = DifferentialTableGraph(spark)
    tbl = g.input("t", tpl)
    win = (tbl.windowby(this.t, window=pw.temporal.session(max_gap=5),
                        instance=this.user)
              .reduce(user=this._pw_instance, n=r.count(),
                      lo=r.min(this.t), hi=r.max(this.t)))
    b1 = spark.createDataFrame(
        [("a", 0), ("a", 4), ("a", 8), ("a", 20)], tpl.schema)
    (d1,) = g.step(win.node, t=b1)
    # gap<=5 merges 0,4,8 into one session; 20 is its own
    assert _rows(d1, "user", "n", "lo", "hi", DIFF) == [
        ("a", 1, 20, 20, 1), ("a", 3, 0, 8, 1)]
    # retract the bridge t=4: session [0..8] splits into [0] and [8]
    b2 = spark.createDataFrame([("a", 4)], tpl.schema) \
              .withColumn(DIFF, F.lit(-1))
    (d2,) = g.step(win.node, t=b2)
    assert _rows(d2, "user", "n", "lo", "hi", DIFF) == [
        ("a", 1, 0, 0, 1), ("a", 1, 8, 8, 1), ("a", 3, 0, 8, -1)]


def test_diff_table_intersect_difference_presence(spark):
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "k string, v long")
    g = DifferentialTableGraph(spark)
    a, b = g.input("a", tpl), g.input("b", tpl)
    inter, diff = a.intersect(b), a.difference(b)
    (d1, e1) = g.step([inter.node, diff.node],
                      a=spark.createDataFrame([("x", 1), ("y", 2)], tpl.schema),
                      b=spark.createDataFrame([("x", 1)], tpl.schema))
    assert _rows(d1, "k", "v", DIFF) == [("x", 1, 1)]
    assert _rows(e1, "k", "v", DIFF) == [("y", 2, 1)]
    # the matching right row retracts: x moves from intersect to difference
    (d2, e2) = g.step([inter.node, diff.node],
                      b=spark.createDataFrame([("x", 1)], tpl.schema)
                          .withColumn(DIFF, F.lit(-1)))
    assert _rows(d2, "k", "v", DIFF) == [("x", 1, -1)]
    assert _rows(e2, "k", "v", DIFF) == [("x", 1, 1)]


def test_semi_anti_randomized_prefix_equality(spark):
    import random
    rnd = random.Random(99)
    tpl = spark.createDataFrame([], "k string, v long")
    g = DifferentialGraph(spark, checkpoint_every=2)
    a, b = g.source("a", tpl), g.source("b", tpl)
    semi = a.semi_join(b, ["k"])
    anti = a.anti_join(b, ["k"])
    live_a, live_b, slog, alog = [], [], [], []
    for t in range(5):
        da = [(rnd.choice("pqr"), rnd.randint(0, 2), 1)
              for _ in range(rnd.randint(0, 2))]
        db = [(rnd.choice("pqr"), rnd.randint(0, 2), 1)
              for _ in range(rnd.randint(0, 2))]
        if live_a and rnd.random() < 0.5:
            da.append(live_a.pop(rnd.randrange(len(live_a))) + (-1,))
        if live_b and rnd.random() < 0.5:
            db.append(live_b.pop(rnd.randrange(len(live_b))) + (-1,))
        live_a += [r[:2] for r in da if r[2] > 0]
        live_b += [r[:2] for r in db if r[2] > 0]
        ds, dn = g.step([semi, anti],
                        a=spark.createDataFrame(da, "k string, v long, _pw_diff long"),
                        b=spark.createDataFrame(db, "k string, v long, _pw_diff long"))
        slog.append(ds.localCheckpoint(eager=True))
        alog.append(dn.localCheckpoint(eager=True))
        adf = spark.createDataFrame(live_a or [("zz", -1)], "k string, v long")
        bdf = spark.createDataFrame(live_b or [("zz", -1)], "k string, v long")
        if not live_a:
            adf = adf.filter(F.lit(False))
        if not live_b:
            bdf = bdf.filter(F.lit(False))
        es = adf.join(bdf.select("k").distinct(), on="k", how="left_semi")
        en = adf.join(bdf.select("k").distinct(), on="k", how="left_anti")
        for logs, expect in ((slog, es), (alog, en)):
            acc = logs[0]
            for p in logs[1:]:
                acc = acc.unionByName(p)
            got = DifferentialGraph.integrate(acc)
            assert _rows(got, "k", "v") == _rows(expect, "k", "v"), \
                f"diverged at batch {t}"


def test_diff_table_update_rows_upsert_and_unpatch(spark):
    from pathway_spark import this
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "k string, v long")
    g = DifferentialTableGraph(spark)
    base, patch = g.input("base", tpl), g.input("patch", tpl)
    up = base.update_rows(patch, this.k)
    (d1,) = g.step(up.node,
                   base=spark.createDataFrame([("x", 1), ("y", 2)], tpl.schema))
    assert _rows(d1, "k", "v", DIFF) == [("x", 1, 1), ("y", 2, 1)]
    # patch overrides x: base row retracts, patched value appears
    (d2,) = g.step(up.node,
                   patch=spark.createDataFrame([("x", 99)], tpl.schema))
    assert _rows(d2, "k", "v", DIFF) == [("x", 1, -1), ("x", 99, 1)]
    # patch retraction resurfaces the shadowed base row
    (d3,) = g.step(up.node,
                   patch=spark.createDataFrame([("x", 99)], tpl.schema)
                       .withColumn(DIFF, F.lit(-1)))
    assert _rows(d3, "k", "v", DIFF) == [("x", 1, 1), ("x", 99, -1)]


def test_diff_table_global_reduce(spark):
    from pathway_spark import this, reducers as r
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "k string, v long")
    g = DifferentialTableGraph(spark)
    t = g.input("t", tpl)
    q = t.reduce(total=r.sum(this.v), n=r.count())
    (d1,) = g.step(q.node, t=spark.createDataFrame([("a", 1), ("b", 2)], tpl.schema))
    assert _rows(d1, "total", "n", DIFF) == [(3, 2, 1)]
    (d2,) = g.step(q.node, t=spark.createDataFrame([("c", 10)], tpl.schema))
    assert _rows(d2, "total", "n", DIFF) == [(3, 2, -1), (13, 3, 1)]
    # retract everything: the group disappears, no phantom SQL row
    (d3,) = g.step(q.node, t=spark.createDataFrame(
        [("a", 1, -1), ("b", 2, -1), ("c", 10, -1)],
        "k string, v long, _pw_diff long"))
    assert _rows(d3, "total", "n", DIFF) == [(13, 3, -1)]


# ---------------------------------------------------------------------------
# regressions from the round-4 code review
# ---------------------------------------------------------------------------

def test_run_empty_batches_does_not_poison_memo(spark, tpl):
    g = DifferentialGraph(spark)
    node = g.source("t", tpl).reduce(["user"], total=("sum", "amount"))
    out = g.run(node, [])          # no batches: empty result, clock advances
    assert out.count() == 0
    # the first REAL batch must flow (previously the t=0 memo swallowed it)
    (d,) = g.step(node, t=_delta(spark, [("a", 5)], tpl.schema))
    assert _rows(d, "user", "total", DIFF) == [("a", 5, 1)]


def test_durable_restore_rejects_uncommitted_version(spark, tmp_path):
    """Crash window: a store flushed a newer version but the meta write
    never happened — restore must load the COMMITTED version, and
    refuse when the recorded version is gone."""
    sd = str(tmp_path / "st")
    tpl = spark.createDataFrame([], "user string, amount long")

    def build(g):
        return g.source("t", tpl).reduce(["user"], total=("sum", "amount"))

    g1 = DifferentialGraph(spark, checkpoint_every=1, state_dir=sd)
    q1 = build(g1)
    g1.step(q1, t=_delta(spark, [("a", 1)], tpl.schema))
    g1.commit()                                   # committed: t=0, v1
    # simulate post-commit work whose flush landed but whose meta didn't
    g1.step(q1, t=_delta(spark, [("a", 10)], tpl.schema))
    for st in g1._stores:
        st.flush()                                # uncommitted v2
    del g1, q1

    g2 = DifferentialGraph(spark, checkpoint_every=1, state_dir=sd)
    q2 = build(g2)
    assert g2._t == 0, "clock is the committed one"
    # replaying the uncommitted batch must NOT double-count
    (d,) = g2.step(q2, t=_delta(spark, [("a", 10)], tpl.schema))
    assert _rows(d, "user", "total", DIFF) == [("a", 1, -1), ("a", 11, 1)]


def test_reducer_default_args_raise_clearly(spark):
    import pytest as _pytest
    from pathway_spark import this, reducers as r
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "user string, amount long")
    g = DifferentialTableGraph(spark)
    t = g.input("t", tpl)
    with _pytest.raises(NotImplementedError, match="argmin"):
        t.groupby(this.user).reduce(this.user, a=r.argmin(this.amount))
    with _pytest.raises(NotImplementedError, match="earliest"):
        t.groupby(this.user).reduce(this.user, e=r.earliest(this.amount))


def test_select_rejects_non_reference_positionals(spark):
    import pytest as _pytest
    from pathway_spark import this
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "a long, b long")
    g = DifferentialTableGraph(spark)
    t = g.input("t", tpl)
    with _pytest.raises(TypeError, match="keyword"):
        t.select(this.a, this.b + 1)


def test_intersect_pairs_columns_by_name_not_position(spark):
    from pathway_spark import this
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "src string, dst string")
    g = DifferentialTableGraph(spark)
    a = g.input("a", tpl)
    # b's template lists columns in the REVERSE order
    b = g.input("b", spark.createDataFrame([], "dst string, src string"))
    inter = a.intersect(b)
    (d,) = g.step(inter.node,
                  a=spark.createDataFrame([("s1", "d1")], tpl.schema),
                  b=spark.createDataFrame([("d1", "s1")], "dst string, src string"))
    # same logical row (src=s1, dst=d1) on both sides -> present
    assert _rows(d, "src", "dst", DIFF) == [("s1", "d1", 1)]


def test_reduce_projects_to_requested_keys(spark):
    from pathway_spark import this, reducers as r
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "a string, b string, v long")
    g = DifferentialTableGraph(spark)
    t = g.input("t", tpl)
    q = t.groupby(this.a, this.b).reduce(this.a, x=r.sum(this.v))
    assert sorted(q.column_names) == ["a", "x"]
    (d,) = g.step(q.node, t=spark.createDataFrame(
        [("k", "m", 1), ("k", "n", 2)], tpl.schema))
    assert _rows(d, "a", "x", DIFF) == [("k", 1, 1), ("k", 2, 1)]


def test_zero_cutoff_behavior_sets_watermark(spark):
    import datetime as dtm
    import pathway_spark.streaming as st

    sdf = (spark.readStream.format("rate").option("rowsPerSecond", 1).load())
    out = st.apply_behavior(
        sdf, "timestamp", st.common_behavior(cutoff=dtm.timedelta(0)))
    # a zero cutoff is a real watermark ("0 seconds"), not a no-op
    assert out.isStreaming
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "watermark" in plan.lower(), plan


def test_diff_table_sort_diff_relinks_on_retraction(spark):
    """Ordered diff over a retraction stream: retracting the middle row
    re-links its neighbors — the follower's diff retracts and re-emits
    against the new predecessor (keyed_recompute rule)."""
    from pathway_spark import this
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "m string, t long, v long")
    g = DifferentialTableGraph(spark)
    tbl = g.input("t", tpl)
    q = tbl.sort_diff(this.t, this.v, instance=this.m)
    (d1,) = g.step(q.node, t=spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 13), ("a", 3, 20)], tpl.schema))
    assert _rows(d1, "t", "diff_v", DIFF) == [
        (1, None, 1), (2, 3, 1), (3, 7, 1)]
    # retract the middle row: t=3 now diffs against t=1 (20-10=10)
    (d2,) = g.step(q.node, t=spark.createDataFrame(
        [("a", 2, 13)], tpl.schema).withColumn(DIFF, F.lit(-1)))
    assert _rows(d2, "t", "diff_v", DIFF) == [
        (2, 3, -1), (3, 7, -1), (3, 10, 1)]


def test_diff_table_interpolate_reanchors_on_retraction(spark):
    from pathway_spark import this
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame(
        [("a", 0, 0.0)], "m string, t long, v double").limit(0)
    g = DifferentialTableGraph(spark)
    tbl = g.input("t", tpl)
    q = tbl.interpolate(this.t, this.v, instance=this.m)
    rows = [("a", 0, 0.0), ("a", 2, None), ("a", 4, 8.0)]
    (d1,) = g.step(q.node, t=spark.createDataFrame(rows, tpl.schema))
    got1 = {(r["t"]): r["v"] for r in d1.collect()}
    assert got1[2] == 4.0           # midpoint of 0..8
    # retract the right anchor: t=2 re-interpolates (forward-fill to 0.0)
    (d2,) = g.step(q.node, t=spark.createDataFrame(
        [("a", 4, 8.0)], tpl.schema).withColumn(DIFF, F.lit(-1)))
    changed = {(r["t"], r["v"], r[DIFF]) for r in d2.collect()}
    assert (2, 4.0, -1) in changed
    assert any(t == 2 and d == 1 for t, v, d in changed)


def test_diff_table_without_and_rename(spark):
    from pathway_spark import this
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "a long, b long, c long")
    g = DifferentialTableGraph(spark)
    t = g.input("t", tpl)
    slim = t.without(this.c).rename(x=this.a)
    assert slim.column_names == ["x", "b"]
    (d,) = g.step(slim.node, t=spark.createDataFrame([(1, 2, 3)], tpl.schema))
    assert _rows(d, "x", "b", DIFF) == [(1, 2, 1)]


# ---------------------------------------------------------------- event time
# The reference stamps every delta with its minibatch's LOGICAL time
# (`src/engine/graph.rs:255` DataRow::time; `debug/__init__.py:446`
# __time__ markdown semantics).  These pin that `_pw_time` carries the
# caller-chosen event time, not the batch ordinal.

def test_replay_timed_markdown_reference_stream_semantics(spark):
    """The canonical reference fixture style: a __time__/__diff__
    markdown replayed through groupby/reduce must emit the exact
    (row, time, diff) stream the reference engine would."""
    import pathway_spark as pw
    from pathway_spark.debug import assert_stream_equality

    src = pw.debug.table_from_markdown("""
        k | v | __time__ | __diff__
        a | 1 |     2    |     1
        a | 2 |     2    |     1
        b | 3 |     4    |     1
        a | 1 |     6    |    -1
    """, spark=spark)
    tpl = spark.createDataFrame([], "k string, v long")
    g = DifferentialGraph(spark)
    node = g.source("t", tpl).reduce(["k"], total=("sum", "v"))
    out = g.replay(node, src)
    assert_stream_equality(out, """
        k | total | __time__ | __diff__
        a |   3   |    2     |     1
        b |   3   |    4     |     1
        a |   3   |    6     |    -1
        a |   2   |    6     |     1
    """)


def test_replay_multi_source_timed_join(spark):
    """Timed replay across two sources: each distinct __time__ is one
    logical step over BOTH sources; the joined delta carries the event
    time of the batch that produced it."""
    from pathway_spark.debug import assert_stream_equality

    lt = spark.createDataFrame(
        [("x", 1, 10), ("y", 2, 30)], "k string, l long, _pw_time long")
    rt = spark.createDataFrame(
        [("x", 7, 20)], "k string, r long, _pw_time long")
    g = DifferentialGraph(spark)
    a = g.source("a", spark.createDataFrame([], "k string, l long"))
    b = g.source("b", spark.createDataFrame([], "k string, r long"))
    out = g.replay(a.join(b, on=["k"]), {"a": lt, "b": rt})
    assert_stream_equality(out, """
        k | l | r | __time__ | __diff__
        x | 1 | 7 |    20    |     1
    """)


def test_step_rejects_non_increasing_time(spark, tpl):
    g = DifferentialGraph(spark)
    node = g.source("t", tpl).reduce(["user"], total=("sum", "amount"))
    g.step(node, time=10, t=_delta(spark, [("a", 1)], tpl.schema))
    with pytest.raises(ValueError, match="strictly increasing"):
        g.step(node, time=10, t=_delta(spark, [("a", 2)], tpl.schema))
    with pytest.raises(ValueError, match="strictly increasing"):
        g.step(node, time=3)
    # a later time is fine, and lands on the emitted rows
    (d,) = g.step(node, time=17, t=_delta(spark, [("a", 2)], tpl.schema))
    assert {r[TIME] for r in d.collect()} == {17}


def test_commit_restores_logical_time(spark, tpl, tmp_path):
    sd = str(tmp_path / "evstate")
    g1 = DifferentialGraph(spark, checkpoint_every=1, state_dir=sd)
    n1 = g1.source("t", tpl).reduce(["user"], total=("sum", "amount"))
    g1.step(n1, time=100, t=_delta(spark, [("a", 1)], tpl.schema))
    g1.commit()
    g2 = DifferentialGraph(spark, checkpoint_every=1, state_dir=sd)
    n2 = g2.source("t", tpl).reduce(["user"], total=("sum", "amount"))
    assert g2._t == 100, "logical event-time clock restored"
    (d,) = g2.step(n2, time=250, t=_delta(spark, [("a", 2)], tpl.schema))
    got = _rows(d, "user", "total", DIFF, TIME)
    assert got == [("a", 1, -1, 250), ("a", 3, 1, 250)]


def test_restore_ignores_uncommitted_leftover_versions(spark, tpl, tmp_path):
    """Crash window: stores flushed but the FIRST _meta.json write never
    happened.  Restore must treat the graph as never-committed (start
    empty) — loading the leftover v* dirs while the clock resets would
    double-count the replay of batch 0."""
    sd = str(tmp_path / "crash0")
    g1 = DifferentialGraph(spark, checkpoint_every=1, state_dir=sd)
    n1 = g1.source("t", tpl).reduce(["user"], total=("sum", "amount"))
    g1.step(n1, t=_delta(spark, [("a", 1)], tpl.schema))
    for st in g1._stores:
        st.flush()                    # crash happens HERE: no meta write
    del g1, n1

    g2 = DifferentialGraph(spark, checkpoint_every=1, state_dir=sd)
    n2 = g2.source("t", tpl).reduce(["user"], total=("sum", "amount"))
    assert g2._t == -1, "no committed meta -> fresh clock"
    (d,) = g2.step(n2, t=_delta(spark, [("a", 1)], tpl.schema))
    # replaying batch 0 must emit total=1 exactly once, NOT total=2
    assert _rows(d, "user", "total", DIFF) == [("a", 1, 1)]


def test_reduce_retractions_are_bytewise_exact_from_output_trace(spark):
    """Float sums are summation-order sensitive: a recomputed old
    aggregate can differ from the originally emitted row by one ULP,
    leaving an uncancellable phantom row in the integrated output.
    The reduce node must therefore retract the EXACT bytes it emitted
    (output trace), so every retraction matches a prior insertion."""
    import struct

    tplf = spark.createDataFrame([], "k string, v double")
    g = DifferentialGraph(spark, checkpoint_every=3)
    node = g.source("t", tplf).reduce(["k"], s=("sum", "v"), n=("count",))
    emitted: dict[tuple, int] = {}
    for i in range(8):
        rows = [("a", 0.1 * (i + 1)), ("b", 1e15 if i % 2 else 0.3)]
        (d,) = g.step(node, t=spark.createDataFrame(rows, tplf.schema))
        for r in d.collect():
            key = (r["k"], struct.pack(">d", r["s"]).hex(), r["n"])
            w = emitted.get(key, 0) + r[DIFF]
            assert w >= 0, (
                f"retraction of never-emitted bytes at batch {i}: {key}")
            emitted[key] = w
    live = {k for k, w in emitted.items() if w > 0}
    assert len({k[0] for k in live}) == 2 and len(live) == 2, \
        f"exactly one live row per key expected, got {live}"


def test_reduce_accumulator_strategy_selection(spark):
    """Linear reduces over integral columns take the abelian-group
    accumulator path (state = one partial-sum row per key, no input
    multiset store).  Float sums take it too — with a Neumaier
    compensation term, the reference's DEFAULT float-sum semantics
    (`src/engine/reduce.rs:209-256` FloatSumState) — while
    `strict=True` (spec kind "sum_strict", reference FloatSumReducer)
    keeps the per-group slice recompute."""
    tpl_long = spark.createDataFrame([], "k string, v long")
    tpl_dbl = spark.createDataFrame([], "k string, v double")
    g = DifferentialGraph(spark)
    n_long = g.source("a", tpl_long).reduce(
        ["k"], s=("sum", "v"), n=("count",), m=("avg", "v"))
    n_dbl = g.source("b", tpl_dbl).reduce(["k"], s=("sum", "v"))
    n_strict = g.source("b", tpl_dbl).reduce(["k"], s=("sum_strict", "v"))
    n_minmax = g.source("a", tpl_long).reduce(["k"], mx=("max", "v"))
    g.step([n_long, n_dbl, n_strict, n_minmax],
           a=spark.createDataFrame([("x", 1)], tpl_long.schema),
           b=spark.createDataFrame([("x", 1.0)], tpl_dbl.schema))
    assert n_long._strategy == "acc"
    assert n_long._state is None and n_long._acc is not None
    assert n_dbl._strategy == "acc" and n_dbl._float_accs == {"s"}
    assert n_strict._strategy == "slice" and n_strict._acc is None
    assert n_minmax._strategy == "slice"


def test_reduce_accumulator_matches_slice_randomized(spark):
    """Random insert/retract stream: the accumulator path must emit a
    changelog that integrates to the same snapshot as the generic slice
    path at every prefix (longs — exact on both)."""
    import random

    rng = random.Random(11)
    tpl = spark.createDataFrame([], "k string, v long")
    g = DifferentialGraph(spark, checkpoint_every=3)
    acc_node = g.source("t", tpl).reduce(
        ["k"], s=("sum", "v"), n=("count",), a=("avg", "v"))
    live: list[tuple] = []
    cl = None
    for _ in range(5):
        ins = [(rng.choice("pqr"), rng.randint(-5, 9))
               for _ in range(rng.randint(1, 3))]
        dels = [live[rng.randrange(len(live))]] \
            if live and rng.random() < 0.6 else []
        rows = [(k, v, 1) for k, v in ins] + [(k, v, -1) for k, v in dels]
        (d,) = g.step(acc_node, t=spark.createDataFrame(
            rows, "k string, v long, _pw_diff int"))
        cl = (d if cl is None else cl.unionByName(d)) \
            .localCheckpoint(eager=True)
        live.extend(ins)
        for e in dels:
            live.remove(e)
        got = sorted((r["k"], r["s"], r["n"], r["a"]) for r in
                     DifferentialGraph.integrate(cl).collect())
        want = {}
        for k, v in live:
            s, n = want.get(k, (0, 0))
            want[k] = (s + v, n + 1)
        want = sorted((k, s, n, s / n) for k, (s, n) in want.items())
        assert got == want, f"live={live}"


def test_reduce_accumulator_durable_restore(spark, tmp_path):
    """Acc-strategy reduce round-trips through commit/restore: the
    accumulator store resumes and the continued stream matches an
    uninterrupted run."""
    sd = str(tmp_path / "state")
    tpl = spark.createDataFrame([], "k string, v long")

    def build(g):
        return g.source("t", tpl).reduce(["k"], s=("sum", "v"),
                                         n=("count",))

    batches = [
        [("a", 1), ("b", 2)],
        [("a", 3)],
        [("b", -1), ("c", 5)],
    ]
    g0 = DifferentialGraph(spark)
    q0 = build(g0)
    full = [g0.step(q0, t=spark.createDataFrame(b, tpl.schema))[0]
            .collect() for b in batches]

    g1 = DifferentialGraph(spark, checkpoint_every=1, state_dir=sd)
    q1 = build(g1)
    for b in batches[:2]:
        g1.step(q1, t=spark.createDataFrame(b, tpl.schema))
    g1.commit()
    assert q1._strategy == "acc"

    g2 = DifferentialGraph(spark, checkpoint_every=1, state_dir=sd)
    q2 = build(g2)
    (d3,) = g2.step(q2, t=spark.createDataFrame(batches[2], tpl.schema))

    def norm(rows):
        return sorted((r["k"], r["s"], r["n"], r[DIFF]) for r in rows)
    assert norm(d3.collect()) == norm(full[2])


def test_forget_retracts_expired_rows_downstream(spark):
    """forget() emits -1 deltas past the watermark horizon, so a
    downstream reduce's snapshot only covers the retention window —
    the reference's forget behavior (`table.py:671`), and the bounded-
    state contract for infinite streams."""
    tpl = spark.createDataFrame([], "k string, ts long, v long")
    g = DifferentialGraph(spark)
    src = g.source("t", tpl)
    windowed = src.forget("ts", 10).reduce(
        ["k"], s=("sum", "v"), n=("count",))

    batches = [
        [("a", 1, 100), ("b", 2, 10)],
        [("a", 8, 7)],
        # ts=15 advances the watermark to 15: cut = 5 → rows at ts <= 5 expire
        [("b", 15, 3)],
    ]
    cl = None
    for b in batches:
        (d,) = g.step(windowed, t=spark.createDataFrame(
            b, tpl.schema))
        cl = (d if cl is None else cl.unionByName(d)) \
            .localCheckpoint(eager=True)
    snap = sorted((r["k"], r["s"], r["n"]) for r in
                  DifferentialGraph.integrate(cl).collect())
    # only ts > 5 rows remain: a@8(7), b@15(3)
    assert snap == [("a", 7, 1), ("b", 3, 1)], snap


def test_forget_drops_late_rows(spark):
    """Rows arriving behind the cut never enter downstream state
    (cutoff semantics)."""
    tpl = spark.createDataFrame([], "k string, ts long, v long")
    g = DifferentialGraph(spark)
    src = g.source("t", tpl)
    out = src.forget("ts", 5).reduce(["k"], n=("count",))
    g.step(out, t=spark.createDataFrame([("a", 100, 1)], tpl.schema))
    (d,) = g.step(out, t=spark.createDataFrame(
        [("late", 3, 1), ("ok", 99, 1)], tpl.schema))
    rows = sorted((r["k"], r["n"], r[DIFF]) for r in d.collect())
    assert ("late", 1, 1) not in rows
    assert ("ok", 1, 1) in rows


def test_ignore_late_stateless_cutoff(spark):
    tpl = spark.createDataFrame([], "k string, ts long")
    g = DifferentialGraph(spark)
    src = g.source("t", tpl)
    out = src.ignore_late("ts", 10)
    (d0,) = g.step(out, t=spark.createDataFrame([("x", 100)], tpl.schema))
    d0.collect()
    (d1,) = g.step(out, t=spark.createDataFrame(
        [("old", 50), ("new", 95)], tpl.schema))
    ks = {r["k"] for r in d1.collect()}
    assert ks == {"new"}, ks


def test_buffer_releases_on_watermark(spark):
    """buffer(): rows escape only once max(time) − threshold passes
    their time; a retraction of a still-pending row never emits."""
    tpl = spark.createDataFrame([], "k string, ts long")
    g = DifferentialGraph(spark)
    src = g.source("t", tpl)
    out = src.buffer("ts", 5)

    (d0,) = g.step(out, t=spark.createDataFrame(
        [("a", 10), ("b", 12)], tpl.schema))
    assert d0.count() == 0            # cut = 12−5 = 7: both still pending

    # retract b while pending: must cancel silently
    (d1,) = g.step(out, t=spark.createDataFrame([("b", 12)], tpl.schema)
                   .withColumn(DIFF, F.lit(-1)))
    assert d1.count() == 0

    # watermark jumps to 20 → cut 15: a@10 releases; b was cancelled
    (d2,) = g.step(out, t=spark.createDataFrame([("c", 20)], tpl.schema))
    rows = sorted((r["k"], r["ts"], r[DIFF]) for r in d2.collect())
    assert rows == [("a", 10, 1)], rows

    # watermark to 26 → cut 21: c@20 releases exactly once
    (d3,) = g.step(out, t=spark.createDataFrame([("d", 26)], tpl.schema))
    rows = sorted((r["k"], r["ts"], r[DIFF]) for r in d3.collect())
    assert rows == [("c", 20, 1)], rows


def test_diff_windowby_behavior_forget_retracts_closed_windows(spark):
    """windowby(behavior=common_behavior(cutoff=..., keep_results=False))
    retracts a window's result once its rows fall behind the horizon;
    keep_results=True leaves emitted windows standing."""
    import pathway_spark as pw
    from pathway_spark import this, reducers as r
    from pathway_spark.streaming import common_behavior
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "t long, v long")

    def run(keep):
        g = DifferentialTableGraph(spark)
        tbl = g.input("s", tpl)
        win = (tbl.windowby(this.t, window=pw.temporal.tumbling(10),
                            behavior=common_behavior(cutoff=15,
                                                     keep_results=keep))
               .reduce(this._pw_window_start, n=r.count()))
        cl = None
        for rows in ([(1, 1), (2, 1)], [(12, 1)], [(40, 1)]):
            (d,) = g.step(win.node, s=spark.createDataFrame(
                rows, tpl.schema))
            cl = (d if cl is None else cl.unionByName(d)) \
                .localCheckpoint(eager=True)
        from pathway_spark.streaming.differential import DifferentialGraph
        return sorted((row["_pw_window_start"], row["n"]) for row in
                      DifferentialGraph.integrate(cl).collect())

    # keep_results=False: after t=40 (cut 25), windows [0,10) and
    # [10,20) retracted — only [40,50) remains
    assert run(False) == [(40, 1)]
    # keep_results=True: every emitted window stands
    assert run(True) == [(0, 2), (10, 1), (40, 1)]


def test_diff_asof_now_freezes_matches(spark):
    """asof_now: left rows join the right state AT ARRIVAL; later right
    updates never retract the frozen match, and a left retraction
    removes exactly its frozen rows."""
    import pathway_spark as pw
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    ltpl = spark.createDataFrame([], "k string, lv long")
    rtpl = spark.createDataFrame([], "k string, rv long")
    g = DifferentialTableGraph(spark)
    lt, rt = g.input("l", ltpl), g.input("r", rtpl)
    out = lt.asof_now_join(rt, pw.left.k == pw.right.k)

    # t0: right has (a,1); left (a,10) freezes rv=1
    (d0,) = g.step(out.node,
                   l=spark.createDataFrame([("a", 10)], ltpl.schema),
                   r=spark.createDataFrame([("a", 1)], rtpl.schema))
    assert sorted((r["k"], r["lv"], r["rv"], r[DIFF])
                  for r in d0.collect()) == [("a", 10, 1, 1)]

    # t1: right replaces (a,1)->(a,2): NO retraction of the frozen row
    rdelta = (spark.createDataFrame([("a", 1, -1), ("a", 2, 1)],
                                    "k string, rv long, _pw_diff int"))
    (d1,) = g.step(out.node, r=rdelta)
    assert d1.count() == 0

    # t2: a NEW left row freezes against the CURRENT right value 2
    (d2,) = g.step(out.node,
                   l=spark.createDataFrame([("a", 20)], ltpl.schema))
    assert sorted((r["k"], r["lv"], r["rv"], r[DIFF])
                  for r in d2.collect()) == [("a", 20, 2, 1)]

    # t3: retract left (a,10): exactly its frozen row leaves
    (d3,) = g.step(out.node, l=spark.createDataFrame(
        [("a", 10, -1)], "k string, lv long, _pw_diff int"))
    assert sorted((r["k"], r["lv"], r["rv"], r[DIFF])
                  for r in d3.collect()) == [("a", 10, 1, -1)]


def test_diff_intervals_over_retraction(spark):
    """intervals_over over retraction streams: data and at-point deltas
    both retract; the snapshot equals the batch window contents."""
    import pathway_spark as pw
    from pathway_spark import this, reducers as r
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    dtpl = spark.createDataFrame([], "t long, v long")
    atpl = spark.createDataFrame([], "p long")
    g = DifferentialTableGraph(spark)
    data, pts = g.input("d", dtpl), g.input("a", atpl)
    win = data.windowby(
        this.t, window=pw.temporal.intervals_over(
            at=pts, lower_bound=-5, upper_bound=5)
    ).reduce(n=r.count(), s=r.sum(this.v))

    (d0,) = g.step(win.node,
                   d=spark.createDataFrame([(1, 10), (4, 20), (9, 30)],
                                           dtpl.schema),
                   a=spark.createDataFrame([(3,)], atpl.schema))
    cl = d0.localCheckpoint(eager=True)
    # point 3 covers t in [-2, 8]: rows t=1,4 -> n=2 s=30
    snap = sorted((row["_pw_window_start"], row["n"], row["s"]) for row in
                  DifferentialGraph.integrate(cl).collect())
    assert snap == [(3, 2, 30)]

    # retract the t=4 row AND add point 10 (covers t in [5,15] -> t=9)
    (d1,) = g.step(win.node,
                   d=spark.createDataFrame([(4, 20, -1)],
                                           "t long, v long, _pw_diff int"),
                   a=spark.createDataFrame([(10,)], atpl.schema))
    cl = cl.unionByName(d1.localCheckpoint(eager=True))
    snap = sorted((row["_pw_window_start"], row["n"], row["s"]) for row in
                  DifferentialGraph.integrate(cl).collect())
    assert snap == [(3, 1, 10), (10, 1, 30)]


def test_diff_table_deduplicate_reelects_on_retraction(spark):
    """Differential deduplicate: keep=min column picks the survivor;
    retracting the survivor re-elects the next-best row."""
    import pathway_spark as pw
    from pathway_spark import this
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "txt string, pri long")
    g = DifferentialTableGraph(spark)
    t = g.input("t", tpl)
    out = t.deduplicate(value=this.txt, keep=this.pri)

    (d0,) = g.step(out.node, t=spark.createDataFrame(
        [("x", 5), ("x", 2), ("y", 9)], tpl.schema))
    cl = d0.localCheckpoint(eager=True)
    snap = sorted((r["txt"], r["pri"]) for r in
                  DifferentialGraph.integrate(cl).collect())
    assert snap == [("x", 2), ("y", 9)]

    # retract the x survivor (pri=2): x re-elects pri=5
    (d1,) = g.step(out.node, t=spark.createDataFrame(
        [("x", 2, -1)], "txt string, pri long, _pw_diff int"))
    cl = cl.unionByName(d1.localCheckpoint(eager=True))
    snap = sorted((r["txt"], r["pri"]) for r in
                  DifferentialGraph.integrate(cl).collect())
    assert snap == [("x", 5), ("y", 9)]


def test_forget_randomized_matches_simulator(spark):
    """Random timed stream through forget(): the integrated snapshot
    after every batch must equal a pure-python simulation of the
    watermark semantics (late rows dropped at arrival, alive rows
    retracted when the advancing watermark passes them)."""
    import random

    rng = random.Random(23)
    tpl = spark.createDataFrame([], "k long, ts long")
    g = DifferentialGraph(spark, checkpoint_every=2)
    src = g.source("t", tpl)
    out = src.forget("ts", 20)

    alive: list[tuple] = []     # simulator state
    wm = None
    cl = None
    next_k = 0
    for _ in range(6):
        rows = []
        for _ in range(rng.randint(1, 4)):
            base = wm if wm is not None else 0
            ts = base + rng.randint(-30, 25)
            rows.append((next_k, ts))
            next_k += 1
        (d,) = g.step(out, t=spark.createDataFrame(rows, tpl.schema))
        cl = (d if cl is None else cl.unionByName(d)) \
            .localCheckpoint(eager=True)
        # simulate: watermark advances to max seen; cut = wm - 20
        batch_max = max(ts for _, ts in rows)
        wm = batch_max if wm is None else max(wm, batch_max)
        cut = wm - 20
        # reference convention: rows with ts <= cut are removed
        rows_kept = [(k, ts) for k, ts in rows if ts > cut]
        alive = [(k, ts) for k, ts in alive + rows_kept if ts > cut]
        got = sorted(tuple(r) for r in
                     DifferentialGraph.integrate(cl)
                     .select("k", "ts").collect())
        assert got == sorted(alive), f"wm={wm} cut={cut}"


def test_diff_windowby_exactly_once_behavior(spark):
    """exactly_once_behavior: a window's aggregate emits in ONE batch
    (when the event-time watermark passes its end), never as an
    update stream, and post-release stragglers are dropped."""
    import pathway_spark as pw
    from pathway_spark import this, reducers as r
    from pathway_spark.streaming import exactly_once_behavior
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "t long, v long")
    g = DifferentialTableGraph(spark)
    tbl = g.input("s", tpl)
    win = (tbl.windowby(this.t, window=pw.temporal.tumbling(10),
                        behavior=exactly_once_behavior())
           .reduce(this._pw_window_start, n=r.count()))

    emitted = []
    for rows in ([(1, 1), (2, 1)],       # window [0,10): open
                 [(5, 1)],               # still open — nothing emits
                 [(11, 1)],              # wm 11 → [0,10) closes, n=3
                 [(3, 1)],               # straggler: dropped
                 [(25, 1)]):             # wm 25 → [10,20) closes, n=1
        (d,) = g.step(win.node, s=spark.createDataFrame(rows, tpl.schema))
        emitted.append(sorted((row["_pw_window_start"], row["n"],
                               row[DIFF]) for row in d.collect()))
    assert emitted[0] == [] and emitted[1] == []
    assert emitted[2] == [(0, 3, 1)]
    assert emitted[3] == []              # straggler never re-opens [0,10)
    assert emitted[4] == [(10, 1, 1)]


def test_diff_intervals_over_duplicate_points(spark):
    """Duplicate at-point values must not multiply window weights
    (the batch operator dedups points; the differential one must too)."""
    import pathway_spark as pw
    from pathway_spark import this, reducers as r
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    dtpl = spark.createDataFrame([], "t long, v long")
    atpl = spark.createDataFrame([], "p long")
    g = DifferentialTableGraph(spark)
    data, pts = g.input("d", dtpl), g.input("a", atpl)
    win = data.windowby(
        this.t, window=pw.temporal.intervals_over(
            at=pts, lower_bound=-5, upper_bound=5)
    ).reduce(n=r.count())
    (d0,) = g.step(win.node,
                   d=spark.createDataFrame([(1, 10)], dtpl.schema),
                   a=spark.createDataFrame([(3,), (3,)], atpl.schema))
    rows = [(row["_pw_window_start"], row["n"]) for row in
            DifferentialGraph.integrate(d0).collect()]
    assert rows == [(3, 1)], rows


def test_diff_asof_now_null_left_retraction(spark):
    """Retracting a left row containing a NULL must remove its frozen
    output (null-safe trace slicing)."""
    import pathway_spark as pw
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    ltpl = spark.createDataFrame([], "k string, lv long")
    rtpl = spark.createDataFrame([], "k string, rv long")
    g = DifferentialTableGraph(spark)
    lt, rt = g.input("l", ltpl), g.input("r", rtpl)
    out = lt.asof_now_join(rt, pw.left.k == pw.right.k)
    (d0,) = g.step(out.node,
                   l=spark.createDataFrame([("a", None)], ltpl.schema),
                   r=spark.createDataFrame([("a", 1)], rtpl.schema))
    assert d0.count() == 1
    (d1,) = g.step(out.node, l=spark.createDataFrame(
        [("a", None, -1)], "k string, lv long, _pw_diff int"))
    cl = d0.unionByName(d1)
    assert DifferentialGraph.integrate(cl).count() == 0


def test_diff_reduce_sorted_tuple_retractions(spark):
    """sorted_tuple over a retraction stream: retraction removes the
    element and re-emits the sorted collection (deterministic order,
    weight-true multiset)."""
    import pathway_spark as pw
    from pathway_spark import this, reducers as r
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "k string, v long")
    g = DifferentialTableGraph(spark)
    t = g.input("t", tpl)
    out = t.groupby(this.k).reduce(this.k, vals=r.sorted_tuple(this.v))
    (d0,) = g.step(out.node, t=spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 1), ("b", 9)], tpl.schema))
    cl = d0.localCheckpoint(eager=True)
    snap = sorted((row["k"], tuple(row["vals"])) for row in
                  DifferentialGraph.integrate(cl).collect())
    assert snap == [("a", (1, 1, 3)), ("b", (9,))]
    # retract ONE of the duplicate 1s
    (d1,) = g.step(out.node, t=spark.createDataFrame(
        [("a", 1, -1)], "k string, v long, _pw_diff int"))
    cl = cl.unionByName(d1.localCheckpoint(eager=True))
    snap = sorted((row["k"], tuple(row["vals"])) for row in
                  DifferentialGraph.integrate(cl).collect())
    assert snap == [("a", (1, 3)), ("b", (9,))]


def test_diff_table_update_cells_patch_and_retract(spark):
    """update_cells over retraction streams: a patch replaces only its
    columns for matching keys; retracting the patch restores the
    original cells."""
    import pathway_spark as pw
    from pathway_spark import this
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    btpl = spark.createDataFrame([], "k string, a long, b long")
    ptpl = spark.createDataFrame([], "k string, b long")
    g = DifferentialTableGraph(spark)
    base, patch = g.input("base", btpl), g.input("patch", ptpl)
    out = base.update_cells(patch, this.k)

    (d0,) = g.step(out.node,
                   base=spark.createDataFrame(
                       [("x", 1, 10), ("y", 2, 20)], btpl.schema),
                   patch=spark.createDataFrame([("x", 99)], ptpl.schema))
    cl = d0.localCheckpoint(eager=True)
    snap = sorted((r["k"], r["a"], r["b"]) for r in
                  DifferentialGraph.integrate(cl).collect())
    assert snap == [("x", 1, 99), ("y", 2, 20)]

    # retract the patch: x's original b=10 resurfaces
    (d1,) = g.step(out.node, patch=spark.createDataFrame(
        [("x", 99, -1)], "k string, b long, _pw_diff int"))
    cl = cl.unionByName(d1.localCheckpoint(eager=True))
    snap = sorted((r["k"], r["a"], r["b"]) for r in
                  DifferentialGraph.integrate(cl).collect())
    assert snap == [("x", 1, 10), ("y", 2, 20)]


def test_diff_table_update_cells_duplicate_patch_keys_net_weight_one(spark):
    """A patch stream carrying MULTIPLE rows for the same key must not
    multiply the patched leg: the patch reduces to one row per key
    (deterministic min), so every base key keeps net weight 1 — the
    reference raises on duplicate patch ids (table.py:1834); a stream
    resolves them deterministically instead."""
    import pathway_spark as pw
    from pathway_spark import this
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    btpl = spark.createDataFrame([], "k string, a long, b long")
    ptpl = spark.createDataFrame([], "k string, b long")
    g = DifferentialTableGraph(spark)
    base, patch = g.input("base", btpl), g.input("patch", ptpl)
    out = base.update_cells(patch, this.k)

    (d0,) = g.step(out.node,
                   base=spark.createDataFrame(
                       [("x", 1, 10), ("y", 2, 20)], btpl.schema),
                   patch=spark.createDataFrame(
                       [("x", 99), ("x", 55), ("z", 7)], ptpl.schema))
    cl = d0.localCheckpoint(eager=True)
    rows = sorted((r["k"], r["a"], r["b"]) for r in
                  DifferentialGraph.integrate(cl)
                  .collect())
    # net weight exactly 1 per base key (integrate replicates by net
    # multiplicity, so a weight-2 leg would appear twice); the
    # duplicate resolves to min(55); patch key z (absent) is ignored
    assert rows == [("x", 1, 55), ("y", 2, 20)], rows

    # retracting ONE of the duplicate patch rows re-resolves to the other
    (d1,) = g.step(out.node, patch=spark.createDataFrame(
        [("x", 55, -1)], "k string, b long, _pw_diff int"))
    cl = cl.unionByName(d1.localCheckpoint(eager=True))
    rows = sorted((r["k"], r["a"], r["b"]) for r in
                  DifferentialGraph.integrate(cl).collect())
    assert rows == [("x", 1, 99), ("y", 2, 20)], rows


def test_steady_conf_snapshot_session_scoped_across_graphs(spark):
    """The pre-tuning conf snapshot lives on the SESSION: graph B on
    the same SparkSession must (a) run its wide initial load with the
    ORIGINAL confs even when graph A left its steady tuning applied,
    and (b) never snapshot A's tuned values as the 'originals'."""
    keys = list(DifferentialGraph._STEADY_CONFS)
    orig = {k: spark.conf.get(k, None) for k in keys}
    b = spark.createDataFrame([("a", 1)], "k string, v long")
    try:
        gA = DifferentialGraph(spark)
        tA = gA.source("t", spark.createDataFrame([], "k string, v long"))
        outA = tA.reduce(["k"], n=("count",))
        gA.step(outA, t=b)                     # wide (initial)
        gA.step(outA, t=b)                     # steady -> tuning applied
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"

        gB = DifferentialGraph(spark)
        tB = gB.source("t", spark.createDataFrame([], "k string, v long"))
        outB = tB.reduce(["k"], n=("count",))
        gB.step(outB, t=b)                     # wide: must restore FIRST
        for k in keys:
            assert spark.conf.get(k, None) == orig[k], \
                f"wide batch of a second graph ran tuned: {k}"
        gB.step(outB, t=b)                     # steady again
        gB.restore_session_confs()
        for k in keys:
            assert spark.conf.get(k, None) == orig[k], \
                f"snapshot poisoned by another graph's tuning: {k}"
    finally:
        for k, v in orig.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        setattr(spark, DifferentialGraph._SAVED_CONF_ATTR, None)


def test_diff_table_update_cells_duplicate_keys_no_cross_row_mixing(spark):
    """Duplicate patch keys resolve to ONE WHOLE patch row (struct-min
    over all patched columns) — never an independent per-column min,
    which would fabricate a row combining values from different patch
    rows."""
    from pathway_spark import this
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    btpl = spark.createDataFrame([], "k string, a long, b long")
    ptpl = spark.createDataFrame([], "k string, a long, b long")
    g = DifferentialTableGraph(spark)
    base, patch = g.input("base", btpl), g.input("patch", ptpl)
    out = base.update_cells(patch, this.k)

    (d0,) = g.step(out.node,
                   base=spark.createDataFrame([("x", 7, 70)], btpl.schema),
                   patch=spark.createDataFrame(
                       [("x", 2, 3), ("x", 1, 9)], ptpl.schema))
    rows = sorted((r["k"], r["a"], r["b"]) for r in
                  DifferentialGraph.integrate(
                      d0.localCheckpoint(eager=True)).collect())
    # struct-min row is (1, 9); per-column min would fabricate (1, 3)
    assert rows == [("x", 1, 9)], rows


def test_reduce_null_group_keys_group_together(spark):
    """NULL group keys form ONE group (SQL GROUP BY semantics): the
    affected-key slices and output-trace retractions must match
    NULL-key rows (null-safe joins, r9 fix) — previously each batch
    emitted a fresh NULL-group row beside the stale unretracted one.
    Covers both reduce strategies and distinct."""
    sch = "g long, v long"
    base = spark.createDataFrame([(1, 10), (None, 5), (2, 7)], sch)
    ticks = [[(None, 3, 1), (1, 1, 1)], [(None, 5, -1)]]

    def run(aggs):
        g = DifferentialGraph(spark, resident=False)
        out = g.source("d", base).reduce(["g"], **aggs)
        (d0,) = g.step(out, d=base)
        full = d0.localCheckpoint(True)
        for rows in ticks:
            (d,) = g.step(out, d=spark.createDataFrame(
                rows, sch + ", _pw_diff long"))
            full = full.unionByName(d.localCheckpoint(True))
        snap = sorted(
            (tuple(r) for r in
             DifferentialGraph.integrate(full).collect()), key=repr)
        g.restore_session_confs()
        return snap

    # acc strategy (count+sum): NULL group = {3} after the churn
    assert run(dict(n=("count",), s=("sum", "v"))) == sorted(
        [(1, 2, 11), (2, 1, 7), (None, 1, 3)], key=repr)
    # slice strategy (max forces it)
    assert run(dict(n=("count",), mx=("max", "v"))) == sorted(
        [(1, 2, 10), (2, 1, 7), (None, 1, 3)], key=repr)

    # distinct over NULL-valued rows
    g = DifferentialGraph(spark, resident=False)
    out = g.source("d", base).distinct()
    (d0,) = g.step(out, d=base)
    full = d0.localCheckpoint(True)
    (d1,) = g.step(out, d=spark.createDataFrame(
        [(None, 5, -1), (None, 9, 1)], sch + ", _pw_diff long"))
    full = full.unionByName(d1.localCheckpoint(True))
    snap = sorted((tuple(r) for r in
                   DifferentialGraph.integrate(full).collect()), key=repr)
    g.restore_session_confs()
    assert snap == sorted([(1, 10), (2, 7), (None, 9)], key=repr)


def test_reduce_null_group_keys_rowtimes_fused(spark):
    """The fused multi-time path's base join and accumulator legs are
    null-safe too: a NULL-key group through row_times=True equals
    per-time stepping."""
    sch = "g long, v long"
    base = spark.createDataFrame([(1, 10), (None, 5)], sch)

    def build(g):
        return g.source("d", base).reduce(["g"], n=("count",),
                                          s=("sum", "v"))

    timed = [(None, 3, 1, 5), (1, 1, 1, 5), (None, 2, 1, 7)]
    tsch = sch + ", _pw_diff long, _pw_time long"

    g1 = DifferentialGraph(spark, resident=False)
    q1 = build(g1)
    g1.step(q1, time=1, d=base)
    (f1,) = g1.step(q1, time=7, row_times=True,
                    d=spark.createDataFrame(timed, tsch))
    fused = sorted((tuple(r) for r in f1.collect()), key=repr)
    g1.restore_session_confs()

    g2 = DifferentialGraph(spark, resident=False)
    q2 = build(g2)
    g2.step(q2, time=1, d=base)
    pieces = []
    for tv in (5, 7):
        rows = [r[:3] for r in timed if r[3] == tv]
        (d,) = g2.step(q2, time=tv, d=spark.createDataFrame(
            rows, sch + ", _pw_diff long"))
        pieces.extend(tuple(r) for r in d.collect())
    g2.restore_session_confs()
    assert fused == sorted(pieces, key=repr)
