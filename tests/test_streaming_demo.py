"""Streaming semantics + demo generators — reference test style
(tests/temporal/test_windows_stream.py, demo/__init__.py doctests)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

import pathway_spark as pw
from pathway_spark import this
from pathway_spark import reducers as R
from pathway_spark.table import Table

from tests.test_table_api import rows


def test_groupby_sort_by_tuple(spark):
    t = Table.from_spark(
        spark.createDataFrame(
            [("a", 3, "z"), ("a", 1, "x"), ("a", 2, "y"), ("b", 9, "q")],
            "g string, ord int, v string",
        ),
        id_columns=["g", "ord"],
    )
    out = t.groupby(this.g, sort_by=this.ord).reduce(
        this.g, vs=R.tuple(this.v)
    )
    assert rows(out) == [("a", ["x", "y", "z"]), ("b", ["q"])]


def test_demo_range_stream_static(spark):
    t = pw.demo.range_stream(5, offset=10, spark=spark)
    assert rows(t) == [(10,), (11,), (12,), (13,), (14,)]


def test_demo_noisy_linear(spark):
    t = pw.demo.noisy_linear(4, spark=spark)
    got = rows(t, "x", "y")
    assert [x for x, _ in got] == [0.0, 1.0, 2.0, 3.0]
    assert all(abs(y - x) <= 0.5 for x, y in got)


def test_demo_custom_stream(spark):
    schema = pw.schema_from_types(i=int, s=str)
    t = pw.demo.generate_custom_stream(
        {"i": lambda k: k * 2, "s": lambda k: f"r{k}"},
        schema=schema, nb_rows=3, spark=spark,
    )
    assert rows(t) == [(0, "r0"), (2, "r1"), (4, "r2")]


def test_demo_replay_csv(spark, tmp_path):
    import pathway_spark.streaming as st

    src = tmp_path / "csvsrc"
    src.mkdir()
    (src / "a.csv").write_text("k,v\n1,one\n")
    (src / "b.csv").write_text("k,v\n2,two\n")
    schema = pw.schema_from_types(k=int, v=str)
    t = pw.demo.replay_csv(str(src), schema=schema, mode="streaming", spark=spark)
    res = st.run_to_memory(t.to_df(), "replay_out")
    assert sorted(tuple(r) for r in res.collect()) == [(1, "one"), (2, "two")]


def test_streaming_change_stream_with_retractions(spark, tmp_path):
    """Aggregation over a 2-file replay emits +1 for the first state and
    a retraction (+ new value) when the second file updates a key —
    the reference's insert/retract update-stream semantics."""
    import pathway_spark.streaming as st

    src = tmp_path / "cs"
    src.mkdir()
    (src / "f1.csv").write_text("k,v\na,1\nb,5\n")
    (src / "f2.csv").write_text("k,v\na,2\n")
    schema = pw.schema_from_types(k=str, v=int)
    t = pw.demo.replay_csv(str(src), schema=schema, mode="streaming", spark=spark)
    agg = t._df.groupBy("k").agg(F.sum("v").alias("total"))

    events = []
    q = st.subscribe_stream(
        agg,
        lambda key, row, time, is_addition: events.append(
            (key[0], row["total"], is_addition)
        ),
        key_cols=["k"],
    )
    q.processAllAvailable()
    q.stop()

    final = {}
    for k, total, is_add in events:
        if is_add:
            final[k] = total
        elif final.get(k) == total:
            del final[k]
    assert final == {"a": 3, "b": 5}
    assert ("a", 1, True) in events and ("a", 1, False) in events and ("a", 3, True) in events


def test_streaming_windowed_update_mode(spark, tmp_path):
    import pathway_spark.streaming as st

    src = tmp_path / "wstream"
    spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, 0, i % 10)) for i in range(20)],
        "k int, ts timestamp",
    ).coalesce(4).write.parquet(str(src))
    t = st.stream_from_directory(spark, str(src), "k int, ts timestamp",
                                 max_files_per_trigger=2)
    agg = t._df.groupBy(F.window("ts", "5 minutes").alias("w")).count()
    res = st.run_to_memory(agg, "upd_counts", output_mode="complete")
    got = {(r["w"]["start"].minute, r["count"]) for r in res.collect()}
    assert got == {(0, 10), (5, 10)}


def test_behavior_output_modes():
    b = pw.streaming.common_behavior(cutoff=dt.timedelta(minutes=1))
    assert b.output_mode == "update"
    b2 = pw.streaming.common_behavior(delay=dt.timedelta(minutes=1), keep_results=False)
    assert b2.output_mode == "append"
    assert pw.streaming.exactly_once_behavior().output_mode == "append"


def test_streaming_windowby_through_table_api(spark, tmp_path):
    """The reference's flagship pattern end-to-end on the Table API:
    replayed stream → windowby(tumbling) → reduce → subscribe → run."""
    import pathway_spark.streaming as st

    src = tmp_path / "wapi"
    src.mkdir()
    (src / "a.csv").write_text("k,t\nx,5\nx,15\ny,25\n")
    (src / "b.csv").write_text("k,t\nx,35\ny,45\n")
    schema = pw.schema_from_types(k=str, t=int)
    t = pw.demo.replay_csv(str(src), schema=schema, mode="streaming", spark=spark)
    wt = t.windowby(this.t, window=pw.temporal.tumbling(10))
    agg = wt.reduce(ws=this._pw_window_start, n=R.count())

    seen = {}
    q = st.subscribe_stream(
        agg.to_df(),
        lambda key, row, time, is_addition: seen.__setitem__(row["ws"], row["n"])
        if is_addition else None,
        key_cols=["ws"],
        output_mode="complete",
    )
    q.processAllAvailable()
    q.stop()
    assert seen == {0: 1, 10: 1, 20: 1, 30: 1, 40: 1}


def test_streaming_windowby_with_behavior_watermark(spark, tmp_path):
    """behavior.cutoff becomes a watermark on a timestamp time column."""
    src = tmp_path / "wbehav"
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, 0, i)) for i in range(8)], "k int, ts timestamp"
    )
    df.coalesce(2).write.parquet(str(src))
    import pathway_spark.streaming as st
    from pathway_spark.table import Table

    stream = Table(
        spark.readStream.schema("k int, ts timestamp").parquet(str(src))
        .withColumn("_pw_id", F.xxhash64("k"))
    )
    wt = stream.windowby(
        this.ts,
        window=pw.temporal.tumbling(dt.timedelta(minutes=5)),
        behavior=pw.streaming.common_behavior(cutoff=dt.timedelta(minutes=1)),
    )
    agg = wt.reduce(ws=this._pw_window_start, n=R.count())
    res = st.run_to_memory(agg.to_df(), "wbehav_out", output_mode="append")
    got = {r["ws"]: r["n"] for r in res.collect()}
    # append mode emits only watermark-closed windows
    assert got.get(dt.datetime(2024, 1, 1, 0, 0)) == 5


def test_exactly_once_emit_on_close(spark, tmp_path):
    """exactly_once_behavior → append-mode windowed agg: a window's row
    is emitted exactly once, only after the watermark closes it, and
    late rows beyond the shift are dropped (reference
    temporal_behavior.py:83 exactly-once semantics)."""
    import pyspark.sql.functions as F

    from pathway_spark import streaming as S

    src = tmp_path / "in"; src.mkdir()
    # batch 1: two events in window [0,60s) + one in [60s,120s)
    spark.createDataFrame(
        [(10, "a"), (20, "a"), (70, "b")], "sec long, v string"
    ).coalesce(1).write.parquet(str(src / "b1"))

    sdf = (spark.readStream.schema("sec long, v string")
           .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
    sdf = sdf.withColumn("ts", F.timestamp_seconds("sec"))
    beh = S.exactly_once_behavior(shift="30 seconds")
    wdf = S.apply_behavior(sdf, "ts", beh)
    agg = (wdf.groupBy(F.window("ts", "60 seconds")).count()
           .select(F.col("window.start").alias("w"), "count"))

    q = (agg.writeStream.outputMode(beh.output_mode)
         .format("memory").queryName("eo1").start())
    q.processAllAvailable()
    # watermark hasn't passed window 0's end yet -> nothing final emitted
    n_before = spark.sql("SELECT * FROM eo1").count()

    # batch 2: event far in the future advances the watermark past both
    # windows' ends -> they close and emit exactly once
    spark.createDataFrame(
        [(500, "c")], "sec long, v string"
    ).coalesce(1).write.parquet(str(src / "b2"))
    q.processAllAvailable()
    # batch 3: a row for the already-closed window 0 — dropped (its
    # window end is behind the watermark), the window is NOT reopened
    spark.createDataFrame(
        [(15, "late")], "sec long, v string"
    ).coalesce(1).write.parquet(str(src / "b3"))
    q.processAllAvailable()
    q.stop()

    rows = {r["w"].second + r["w"].minute * 60: r["count"]
            for r in spark.sql("SELECT * FROM eo1").collect()}
    assert n_before == 0          # append mode: no early/partial emission
    assert rows.get(0) == 2       # window emitted once, closed, final
    assert rows.get(60) == 1      # second window closed too
    # the late row (sec=15, behind the watermark) was dropped, not added
    assert spark.sql("SELECT SUM(count) FROM eo1").collect()[0][0] == 3


def test_stream_static_asof_now_state(spark, tmp_path):
    """asof_now_join in streaming: each arriving left row joins the
    CURRENT right-side state (stream-static join re-reads the static
    side per micro-batch) — the reference's asof-now contract
    (_asof_now_join.py:176): no retroactive updates of old outputs."""
    import pyspark.sql.functions as F

    src = tmp_path / "clicks"; src.mkdir()
    state_dir = tmp_path / "state"
    spark.createDataFrame([(1, "c1")], "uid long, click string") \
        .coalesce(1).write.parquet(str(src / "b1"))
    # right-side state v1
    spark.createDataFrame([(1, "bronze")], "uid long, tier string") \
        .write.mode("overwrite").parquet(str(state_dir))

    clicks = (spark.readStream.schema("uid long, click string")
              .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
    out: list[tuple] = []

    def batch_fn(bdf, _bid):
        # stream-static: read the state as-of THIS batch
        st = spark.read.parquet(str(state_dir))
        j = bdf.join(st, "uid", "left").select("click", "tier")
        out.extend((r["click"], r["tier"]) for r in j.collect())

    q = clicks.writeStream.foreachBatch(batch_fn).start()
    q.processAllAvailable()
    # state changes between batches
    spark.createDataFrame([(1, "gold")], "uid long, tier string") \
        .write.mode("overwrite").parquet(str(state_dir))
    spark.createDataFrame([(1, "c2")], "uid long, click string") \
        .coalesce(1).write.parquet(str(src / "b2"))
    q.processAllAvailable()
    q.stop()

    assert ("c1", "bronze") in out   # joined against state at arrival time
    assert ("c2", "gold") in out     # later click sees updated state
    assert ("c1", "gold") not in out  # no retroactive re-join


def test_retraction_semantics_pinned(spark, tmp_path):
    """Documented divergence pin (SURVEY §4): aggregation UPDATE streams
    match the reference (changed groups re-emit with is_addition=False
    then True via subscribe_stream), and FINAL snapshots always match;
    arbitrary derived-row retraction streams are NOT guaranteed. This
    test pins exactly what IS guaranteed."""
    import pyspark.sql.functions as F

    from pathway_spark.streaming import subscribe_stream

    src = tmp_path / "ev"; src.mkdir()
    spark.createDataFrame([(1, 10)], "k long, v long") \
        .coalesce(1).write.parquet(str(src / "b1"))
    sdf = (spark.readStream.schema("k long, v long")
           .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
    agg = sdf.groupBy("k").agg(F.sum("v").alias("total"))

    events: list[tuple] = []
    q = subscribe_stream(
        agg, lambda key, row, time, is_addition:
        events.append((key, row["total"], is_addition)),
        key_cols=["k"], output_mode="update",
    )
    q.processAllAvailable()
    spark.createDataFrame([(1, 5)], "k long, v long") \
        .coalesce(1).write.parquet(str(src / "b2"))
    q.processAllAvailable()
    q.stop()

    # guaranteed: +10, then retraction of 10, then +15 — and the final
    # state equals the batch answer
    assert events[0] == ((1,), 10, True)
    assert ((1,), 10, False) in events
    assert events[-1] == ((1,), 15, True)


def test_streaming_differential_derived_retractions(spark, tmp_path):
    """subscribe_differential: a DERIVED table (filter -> groupby) over a
    live stream emits exact -1/+1 deltas — file 2 updates key `a`, so the
    old aggregate row retracts and the new one appears; key `b` (filtered
    path unchanged) stays silent in batch 2."""
    import pathway_spark.streaming as st

    src = tmp_path / "diffstream"
    src.mkdir()
    (src / "f1.csv").write_text("k,v\na,2\nb,6\na,999\n")
    (src / "f2.csv").write_text("k,v\na,4\n")
    schema = pw.schema_from_types(k=str, v=int)
    t = pw.demo.replay_csv(str(src), schema=schema, mode="streaming",
                           spark=spark)

    events = []
    q = st.subscribe_differential(
        t,
        lambda s: s.filter(F.col("v") < 100).reduce(
            ["k"], total=("sum", "v"), n=("count",)),
        lambda row, time, is_addition: events.append(
            (row["k"], row["total"], row["n"], is_addition, time)),
    )
    q.processAllAvailable()
    q.stop()

    by_batch = {}
    for k, total, n, is_add, tm in events:
        by_batch.setdefault(tm, []).append((k, total, n, is_add))
    assert len(by_batch) == 2, f"expected 2 micro-batches, got {by_batch}"
    b1, b2 = (sorted(by_batch[t]) for t in sorted(by_batch))
    assert b1 == [("a", 2, 1, True), ("b", 6, 1, True)]
    # batch 2: only `a` changes — retraction of (2,1) then (6,2); b silent
    assert b2 == [("a", 2, 1, False), ("a", 6, 2, True)]


def test_streaming_differential_table_syntax(spark, tmp_path):
    """subscribe_differential(table_syntax=True): pathway expressions
    over a live stream, retractions included."""
    import pathway_spark.streaming as st
    from pathway_spark import reducers as rd
    from pathway_spark import this

    src = tmp_path / "diffts"
    src.mkdir()
    (src / "f1.csv").write_text("k,v\na,2\nb,6\n")
    (src / "f2.csv").write_text("k,v\na,4\n")
    schema = pw.schema_from_types(k=str, v=int)
    t = pw.demo.replay_csv(str(src), schema=schema, mode="streaming",
                           spark=spark)
    events = []
    q = st.subscribe_differential(
        t,
        lambda s: (s.filter(this.v > 0).groupby(this.k)
                    .reduce(this.k, total=rd.sum(this.v))),
        lambda row, time, is_addition: events.append(
            (row["k"], row["total"], is_addition)),
        table_syntax=True,
    )
    q.processAllAvailable()
    q.stop()
    assert ("a", 2, True) in events and ("a", 2, False) in events \
        and ("a", 6, True) in events
    assert ("b", 6, True) in events and ("b", 6, False) not in events


def test_streaming_differential_two_live_streams_join(spark, tmp_path):
    """Join of TWO live streams with retractions: when the second
    stream's matching row arrives later, the joined row appears; a
    left-join would retract its padding — here the inner join emits
    exactly the late pair."""
    import pathway_spark.streaming as st

    left_dir, right_dir = tmp_path / "L", tmp_path / "R"
    left_dir.mkdir(); right_dir.mkdir()
    (left_dir / "l1.csv").write_text("k,l\nx,1\ny,2\n")
    (right_dir / "r1.csv").write_text("k,r\nx,10\n")
    lt = pw.demo.replay_csv(str(left_dir),
                            schema=pw.schema_from_types(k=str, l=int),
                            mode="streaming", spark=spark)
    rt = pw.demo.replay_csv(str(right_dir),
                            schema=pw.schema_from_types(k=str, r=int),
                            mode="streaming", spark=spark)

    events = []
    queries = st.subscribe_differential_multi(
        {"L": lt, "R": rt},
        lambda s: s["L"].join(s["R"], on=["k"]),
        lambda row, time, is_addition: events.append(
            (row["k"], row["l"], row["r"], is_addition)),
    )
    for q in queries:
        q.processAllAvailable()
    # late right row for y arrives in a new file
    (right_dir / "r2.csv").write_text("k,r\ny,20\n")
    for q in queries:
        q.processAllAvailable()
    for q in queries:
        q.stop()

    assert ("x", 1, 10, True) in events
    assert ("y", 2, 20, True) in events          # late-arriving match
    assert len([e for e in events if not e[3]]) == 0


def test_subscribe_differential_callbacks_contract(spark, tmp_path):
    """pw.io.subscribe contract on the differential path: rows carry NO
    internal _pw_id, on_time_end(t) closes each batch atomically after
    its changes, and on_end() fires exactly once at stop()."""
    import pathway_spark.streaming as st

    src = tmp_path / "subcontract"
    src.mkdir()
    (src / "f1.csv").write_text("k,v\na,2\n")
    (src / "f2.csv").write_text("k,v\na,4\n")
    t = pw.demo.replay_csv(str(src),
                           schema=pw.schema_from_types(k=str, v=int),
                           mode="streaming", spark=spark)
    log = []
    q = st.subscribe_differential(
        t,
        lambda s: s.reduce(["k"], total=("sum", "v")),
        lambda row, time, is_addition: log.append(("change", dict(row))),
        on_time_end=lambda t_: log.append(("time_end", t_)),
        on_end=lambda: log.append(("end",)),
    )
    q.processAllAvailable()
    q.stop()
    q.stop()      # idempotent: on_end must not re-fire

    assert log[-1] == ("end",)
    assert log.count(("end",)) == 1
    # every change row is free of internal columns
    for kind, payload in ((e[0], e[1]) for e in log if e[0] == "change"):
        assert "_pw_id" not in payload
    # batches close atomically: change+ events, then their time_end
    kinds = [e[0] for e in log]
    assert kinds.count("time_end") == 2
    assert kinds.index("time_end") > kinds.index("change")


def test_subscribe_differential_redelivered_batch_ignored(spark, tmp_path):
    """foreachBatch may re-execute a micro-batch after transient
    failures (and replays the last one on restart): re-delivering an
    already-seen batch_id must be a no-op — graph.step is not
    idempotent, so a double-feed would corrupt derived state."""
    import pathway_spark.streaming as st

    src = tmp_path / "redeliver"
    src.mkdir()
    (src / "f1.csv").write_text("k,v\na,2\n")
    t = pw.demo.replay_csv(str(src),
                           schema=pw.schema_from_types(k=str, v=int),
                           mode="streaming", spark=spark)
    events = []
    q = st.subscribe_differential(
        t,
        lambda s: s.reduce(["k"], total=("sum", "v")),
        lambda row, time, is_addition: events.append(
            (row["k"], row["total"], is_addition)),
    )
    q.processAllAvailable()
    n_before = len(events)
    # simulate Spark re-executing the last micro-batch (same batch_id)
    redelivered = spark.createDataFrame([("a", 2)], "k string, v long")
    q._batch_fn(redelivered, 0)
    q.stop()
    assert len(events) == n_before, \
        f"redelivered batch was re-applied: {events}"
    assert events == [("a", 2, True)]


def test_subscribe_differential_event_time_column(spark, tmp_path):
    """time_column= stamps deltas with SOURCE event time (the
    reference's DataRow::time), splitting a micro-batch into one
    logical step per distinct event time, ascending."""
    import pathway_spark.streaming as st

    src = tmp_path / "evtsub"
    src.mkdir()
    # one file = one micro-batch carrying two event times
    (src / "f1.csv").write_text("k,v,ts\na,2,100\na,3,200\n")
    t = pw.demo.replay_csv(
        str(src), schema=pw.schema_from_types(k=str, v=int, ts=int),
        mode="streaming", spark=spark)
    events = []
    q = st.subscribe_differential(
        t,
        lambda s: s.reduce(["k"], total=("sum", "v")),
        lambda row, time, is_addition: events.append(
            (row["k"], row["total"], time, is_addition)),
        time_column="ts",
    )
    q.processAllAvailable()
    q.stop()
    # order within one logical time is partition-placement-dependent —
    # compare per-time multisets (the reference's stream equality)
    by_time = {}
    for k, total, tm, add in events:
        by_time.setdefault(tm, set()).add((k, total, add))
    assert by_time == {
        100: {("a", 2, True)},            # step at event time 100
        200: {("a", 2, False),            # superseded at event time 200
              ("a", 5, True)},
    }


def test_subscribe_differential_null_event_times_not_dropped(spark, tmp_path):
    """NULL event-time rows ride with the first sub-step of their
    micro-batch instead of vanishing."""
    import pathway_spark as pw
    from pathway_spark import streaming as st

    src = tmp_path / "s"
    src.mkdir()
    (src / "f1.csv").write_text("k,v,ts\na,1,100\nb,2,\n")
    t = pw.demo.replay_csv(
        str(src), schema=pw.schema_from_types(k=str, v=int, ts=int),
        mode="streaming", spark=spark)
    got = []
    q = st.subscribe_differential(
        t, lambda s: s.reduce(["k"], total=("sum", "v")),
        lambda row, time, is_addition: got.append((row["k"], row["total"])),
        time_column="ts")
    q.processAllAvailable()
    q.stop()
    assert sorted(got) == [("a", 1), ("b", 2)], got


def test_step_time_keyword_does_not_shadow_time_source(spark):
    """A source legitimately named 'time' still receives deltas through
    step(time=<DataFrame>)."""
    from pathway_spark.streaming.differential import DifferentialGraph

    tpl = spark.createDataFrame([], "v long")
    g = DifferentialGraph(spark)
    src = g.source("time", tpl)
    out = src.reduce([], n=("count",))
    (d,) = g.step(out, time=spark.createDataFrame([(1,), (2,)], tpl.schema))
    assert [(r["n"], r["_pw_diff"]) for r in d.collect()] == [(2, 1)]


def test_subscribe_differential_time_granularity(spark, tmp_path):
    """time_granularity buckets event times: rows within one bucket
    share a logical step instead of one step per distinct value."""
    import pathway_spark as pw
    from pathway_spark import streaming as st

    src = tmp_path / "gran"
    src.mkdir()
    (src / "f1.csv").write_text(
        "k,v,ts\na,1,101\na,2,104\na,3,208\n")
    t = pw.demo.replay_csv(
        str(src), schema=pw.schema_from_types(k=str, v=int, ts=int),
        mode="streaming", spark=spark)
    times = []
    q = st.subscribe_differential(
        t, lambda s: s.reduce(["k"], total=("sum", "v")),
        lambda row, time, is_addition: times.append(time),
        time_column="ts", time_granularity=100)
    q.processAllAvailable()
    q.stop()
    # ts 101 and 104 share bucket 100 (one step); 208 buckets to 200
    assert sorted(set(times)) == [100, 200], times


def test_subscribe_differential_substep_resume_after_midbatch_failure(
        spark, tmp_path):
    """A foreachBatch redelivery after a MID-batch failure must resume
    from the first unapplied event-time sub-step: sub-steps whose
    graph.step already ran mutated non-idempotent state (clock, state
    chunks), so re-running them would double-count their deltas."""
    import pathway_spark as pw
    from pathway_spark import streaming as st

    src = tmp_path / "resume"
    src.mkdir()
    (src / "f1.csv").write_text("k,v,ts\na,1,50\n")
    t = pw.demo.replay_csv(
        str(src), schema=pw.schema_from_types(k=str, v=int, ts=int),
        mode="streaming", spark=spark)
    events = []
    tripped = {"done": False}

    def on_change(row, time, is_addition):
        if time == 200 and not tripped["done"]:
            tripped["done"] = True
            raise RuntimeError("sink crashed mid-batch")
        events.append((row["k"], row["total"], time, is_addition))

    # float sum => accumulator with a sequential compensation fold =>
    # NOT row-times fusable (round 8): this keeps the test on the
    # SUB-STEP path it exists to cover (fusable graphs apply a
    # multi-time batch atomically and never resume mid-batch)
    q = st.subscribe_differential(
        t, lambda s: s.with_columns(v=F.col("v").cast("double"))
                      .reduce(["k"], total=("sum", "v")),
        on_change, time_column="ts")
    q.processAllAvailable()
    assert ("a", 1, 50, True) in events
    bdf = spark.createDataFrame(
        [("a", 2, 100), ("a", 4, 200), ("a", 8, 300)],
        "k string, v long, ts long")
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        q._batch_fn(bdf, 1)          # applies sub-steps 100 and 200
    q._batch_fn(bdf, 1)              # redelivery: resumes at 300 only
    q.stop()
    adds = [(k, tot, tm) for k, tot, tm, a in events if a]
    # every sub-step applied exactly once: 1+2+4+8 = 15 (a double-apply
    # of the 100/200 steps would end at 21; a skipped 200 step at 11)
    assert adds[-1] == ("a", 15, 300), events
    # sub-step 100's emission happened once, not re-emitted on redelivery
    assert adds.count(("a", 3, 100)) == 1, events
    # sub-step 200's emission was lost to the crash (state-safety trade)
    assert ("a", 7, 200) not in [x[:3] for x in adds], events


def test_subscribe_differential_substep_explosion_warns(
        spark, tmp_path, monkeypatch):
    """>_MAX_SUBSTEPS_WARN distinct event times in one micro-batch
    warns toward time_granularity; WITH granularity the same batch
    executes in O(1) logical steps and does not warn.  The threshold
    is patched low so the un-bucketed leg doesn't actually run 65+
    sequential graph steps in the test."""
    import warnings as _w

    import pathway_spark as pw
    from pathway_spark import streaming as st

    monkeypatch.setattr(st, "_MAX_SUBSTEPS_WARN", 3)
    rows = [("a", 1, 1000 + i) for i in range(6)]

    def run(**kw):
        src = tmp_path / f"explode{len(kw)}"
        src.mkdir()
        (src / "f1.csv").write_text(
            "k,v,ts\n" + "\n".join(f"{k},{v},{ts}" for k, v, ts in rows))
        t = pw.demo.replay_csv(
            str(src), schema=pw.schema_from_types(k=str, v=int, ts=int),
            mode="streaming", spark=spark)
        times = []
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            # float sum: keeps this graph NON-fusable so the
            # sub-step-explosion warning still has a path to fire on
            q = st.subscribe_differential(
                t, lambda s: s.with_columns(v=F.col("v").cast("double"))
                              .reduce(["k"], total=("sum", "v")),
                lambda row, time, is_addition: times.append(time),
                time_column="ts", **kw)
            q.processAllAvailable()
            q.stop()
        return times, [w for w in caught
                       if issubclass(w.category, RuntimeWarning)
                       and "distinct event" in str(w.message)]

    times_g, warns_g = run(time_granularity=1000)
    assert len(set(times_g)) == 1, "granularity should bucket to 1 step"
    assert not warns_g
    times_raw, warns_raw = run()
    assert len(warns_raw) >= 1, "6 distinct times over threshold 3 warn"


def test_fused_multi_time_batch_linear_graph(spark, tmp_path):
    """Round-7 tick fusion: a 100-distinct-timestamp micro-batch over an
    ALL-LINEAR graph (filter+select) runs as ONE fused step — a handful
    of Spark jobs instead of one graph step per distinct time — with a
    callback trace identical to the per-time sub-step path."""
    import pathway_spark as pw
    from pathway_spark import streaming as st

    src = tmp_path / "fused"
    src.mkdir()
    (src / "seed.csv").write_text("k,v,ts\nz,0,1\n")
    t = pw.demo.replay_csv(
        str(src), schema=pw.schema_from_types(k=str, v=int, ts=int),
        mode="streaming", spark=spark)

    def build(s):
        return (s.filter(F.col("v") % 3 != 0)
                .select(F.col("k"), (F.col("v") * 2).alias("v2")))

    events, ends = [], []
    q = st.subscribe_differential(
        t, build,
        lambda row, time, is_addition: events.append(
            (row["k"], row["v2"], time, is_addition)),
        on_time_end=ends.append, time_column="ts")
    q.processAllAvailable()
    events.clear(); ends.clear()

    rows = [(f"k{i % 7}", i, 1000 + i) for i in range(100)]
    bdf = spark.createDataFrame(rows, "k string, v long, ts long")
    sc = spark.sparkContext
    j0 = set(sc.statusTracker().getJobIdsForGroup(None) or [])
    q._batch_fn(bdf, 1)
    jobs = len(set(sc.statusTracker().getJobIdsForGroup(None) or []) - j0)
    assert jobs <= 10, f"fused batch ran {jobs} jobs"
    q.stop()

    # reference: the UNFUSED sub-step trace over the same rows
    want_events, want_ends = [], []
    for k, v, ts in sorted(rows, key=lambda r: r[2]):
        if v % 3 != 0:
            want_events.append((k, v * 2, ts, True))
    want_ends = sorted({ts for _, _, ts in rows})
    assert sorted(events) == sorted(want_events)
    assert ends == want_ends
    # row callbacks arrive in ascending time with ends at boundaries
    assert [e[2] for e in events] == sorted(e[2] for e in events)


def test_fused_multi_time_batch_keyed_reduce(spark, tmp_path):
    """Round-8 keyed tick fusion: a 100-distinct-timestamp micro-batch
    through flatten + keyed COUNT reduce (the differential wordcount)
    runs as ONE fused step — a handful of Spark jobs instead of one
    graph step per distinct time — with a callback trace identical to
    the per-time sub-step path."""
    import pathway_spark as pw
    from pathway_spark import streaming as st

    def mk(tag):
        src = tmp_path / f"fusedk{tag}"
        src.mkdir()
        (src / "seed.csv").write_text("doc,ts\nalpha beta,1\n")
        return pw.demo.replay_csv(
            str(src), schema=pw.schema_from_types(doc=str, ts=int),
            mode="streaming", spark=spark)

    def build(s):
        return (s.with_columns(__ws=F.split(F.col("doc"), r"\s+"))
                .select(F.col("__ws"))
                .flatten("__ws", "w")
                .reduce(["w"], n=("count",)))

    words = ["red", "blue", "green", "red blue", "blue blue green"]
    rows = [(words[i % len(words)], 1000 + i) for i in range(100)]
    bdf = spark.createDataFrame(rows, "doc string, ts long")

    def run(tag):
        events, ends = [], []
        q = st.subscribe_differential(
            mk(tag), build,
            lambda row, time, is_addition: events.append(
                (row["w"], row["n"], time, is_addition)),
            on_time_end=ends.append, time_column="ts")
        q.processAllAvailable()
        events.clear(); ends.clear()
        sc = spark.sparkContext
        j0 = set(sc.statusTracker().getJobIdsForGroup(None) or [])
        q._batch_fn(bdf, 1)
        jobs = len(set(sc.statusTracker().getJobIdsForGroup(None) or [])
                   - j0)
        q.stop()
        return events, ends, jobs

    ev_f, ends_f, jobs_f = run("a")
    assert jobs_f <= 10, f"fused keyed batch ran {jobs_f} jobs"
    assert ends_f == [1000 + i for i in range(100)]

    # reference trace: drive a second graph through per-time sub-steps
    from pathway_spark.streaming.differential import DifferentialGraph
    g = DifferentialGraph(spark)
    out = build(g.source("src", spark.createDataFrame(
        [], "doc string, ts long")))
    g.step(out, src=spark.createDataFrame([("alpha beta", 1)],
                                          "doc string, ts long"))
    want = []
    for doc, ts in rows:
        (d,) = g.step(out, time=ts, src=spark.createDataFrame(
            [(doc, ts)], "doc string, ts long"))
        for r in d.collect():
            want.append((r["w"], r["n"], ts, r["_pw_diff"] > 0))
    g.restore_session_confs()

    def norm(evs):
        return sorted(evs)
    assert norm(ev_f) == norm(want)
    # ascending time order with correct per-time grouping
    assert [e[2] for e in ev_f] == sorted(e[2] for e in ev_f)
