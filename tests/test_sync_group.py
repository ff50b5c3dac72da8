"""Multi-source event-time alignment (differential sync group).

Criterion: two sources with skewed, out-of-order inter-source event
times fed through one graph produce EXACTLY the trace of feeding one
globally time-ordered schedule — the reference's
register_input_synchronization_group semantics."""

from pyspark.sql import functions as F

from pathway_spark.streaming.differential import DIFF, TIME, DifferentialGraph
from pathway_spark.streaming.sync_group import (
    DifferentialSyncGroup, register_differential_synchronization_group)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


A_SCHEMA = "k long, v long, ts long"
B_SCHEMA = "k long, w long, ts long"

A_ROWS = [(1, 10, 1), (2, 20, 2), (1, 11, 3), (3, 30, 5), (2, 21, 6)]
B_ROWS = [(1, 7, 1), (2, 8, 3), (1, 9, 4), (3, 6, 6)]


def _build(g):
    a = g.source("a", g.spark.createDataFrame([], A_SCHEMA))
    b = g.source("b", g.spark.createDataFrame([], B_SCHEMA))
    joined = (a.select("k", "v", F.col("ts").alias("a_ts"))
              .join(b.select("k", "w", F.col("ts").alias("b_ts")),
                    on=["k"]))
    return joined.reduce(["k"], n=("count",), sv=("sum", "v"),
                         sw=("sum", "w"))


def _trace(deltas):
    out = []
    for t, d in deltas:
        rows = sorted(tuple(r) for r in d.select(
            "k", "n", "sv", "sw", DIFF).collect())
        if rows:
            out.append((t, rows))
    return out


def _reference_trace(spark):
    """The synchronized semantics: one step per global event time, both
    sources feeding their rows for that time."""
    g = DifferentialGraph(spark)
    out = _build(g)
    steps = []
    for tv in sorted({ts for *_, ts in A_ROWS} | {ts for *_, ts in B_ROWS}):
        feeds = {}
        ar = [r for r in A_ROWS if r[2] == tv]
        br = [r for r in B_ROWS if r[2] == tv]
        if ar:
            feeds["a"] = _df(spark, ar, A_SCHEMA)
        if br:
            feeds["b"] = _df(spark, br, B_SCHEMA)
        (d,) = g.step(out, time=tv, **feeds)
        steps.append((tv, d.localCheckpoint(eager=True)))
    return _trace(steps)


def test_skewed_sources_match_synchronized_trace(spark):
    want = _reference_trace(spark)

    g = DifferentialGraph(spark)
    out = _build(g)
    grp = DifferentialSyncGroup(g, out, {"a": "ts", "b": "ts"})

    got = []

    def take(steps):
        got.extend(_trace(
            [(t, d.localCheckpoint(eager=True)) for t, d in steps]))

    # A races ahead (times 1..6 in two feeds) while B lags behind and
    # arrives later — inter-source order is badly skewed
    take(grp.feed(a=_df(spark, A_ROWS[:3], A_SCHEMA)))      # a: ts 1..3
    take(grp.feed(a=_df(spark, A_ROWS[3:], A_SCHEMA)))      # a: ts 5,6
    assert got == []          # b silent: the whole group is blocked
    take(grp.feed(b=_df(spark, B_ROWS[:2], B_SCHEMA)))      # b: ts 1,3
    # b's frontier=3 -> only global times <= 3 may have stepped
    assert all(t <= 3 for t, _ in got)
    take(grp.feed(b=_df(spark, B_ROWS[2:], B_SCHEMA)))      # b: ts 4,6
    take(grp.flush())
    assert got == want, f"\ngot:  {got}\nwant: {want}"


def test_max_difference_allows_bounded_skew(spark):
    g = DifferentialGraph(spark)
    out = _build(g)
    grp = register_differential_synchronization_group(
        g, out, {"a": "ts", "b": "ts"}, max_difference=2)
    steps = grp.feed(a=_df(spark, [(1, 10, 4)], A_SCHEMA),
                     b=_df(spark, [(1, 7, 1)], B_SCHEMA))
    # min frontier 1 + maxd 2 = 3: b's row releases, a's (ts=4) waits
    assert [t for t, _ in steps] == [1]
    steps = grp.feed(b=_df(spark, [(2, 8, 2)], B_SCHEMA))
    # frontier b=2 -> threshold 4: a's buffered row now releases too
    assert [t for t, _ in steps] == [2, 4]


def test_live_streams_synchronized(spark, tmp_path):
    """subscribe_differential_multi(sync_columns=): two live file
    streams with skewed event times emit the globally time-ordered
    trace."""
    import pathway_spark.streaming as st

    fast = tmp_path / "fast"
    slow = tmp_path / "slow"
    fast.mkdir()
    slow.mkdir()
    # fast source publishes ts 1..4 immediately; slow only ts 1
    (fast / "f1.csv").write_text("k,v,ts\n1,10,1\n1,11,2\n2,20,3\n2,21,4\n")
    (slow / "s1.csv").write_text("k,w,ts\n1,5,1\n")

    def mk(path, schema):
        return (spark.readStream.schema(schema)
                .option("header", True)
                .option("maxFilesPerTrigger", 1).csv(str(path)))

    events = []
    queries, grp = st.subscribe_differential_multi(
        {"a": mk(fast, "k long, v long, ts long"),
         "b": mk(slow, "k long, w long, ts long")},
        lambda s: s["a"].select("k", "v").join(
            s["b"].select("k", "w"), on=["k"]).reduce(
            ["k"], n=("count",)),
        lambda row, time, is_addition: events.append(
            (time, row["k"], row["n"], is_addition)),
        sync_columns={"a": "ts", "b": "ts"})
    for q in queries:
        q.processAllAvailable()
    n_before = len(events)
    # only global time 1 may have been released (slow frontier = 1)
    assert all(t <= 1 for t, *_ in events)
    # slow source catches up to ts 4: the withheld fast rows release
    (slow / "s2.csv").write_text("k,w,ts\n2,6,4\n")
    for q in queries:
        q.processAllAvailable()
    for q in queries:
        q.stop()
    assert len(events) > n_before
    # final state: k=1 has 2 pairs (v 10,11 x w 5), k=2 has 2 pairs
    state = {}
    for t, k, n, add in events:
        if add:
            state[k] = n
        elif state.get(k) == n:
            del state[k]
    assert state == {1: 2, 2: 2}
