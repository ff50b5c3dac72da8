"""Streaming semantics — temporal behaviors -> watermarks/output modes.

Reference (`stdlib/temporal/temporal_behavior.py`): `common_behavior
(delay, cutoff, keep_results)` line 29, `exactly_once_behavior(shift)` 83.
SURVEY §2.5: `cutoff` == `withWatermark`; delay/exactly-once == append
output mode (emit on window close); keep_results == update vs append.
This is native Structured Streaming — the reference hand-built these from
buffer/freeze/forget engine primitives.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..table import ID, Table


@dataclass
class CommonBehavior:
    """temporal_behavior.py:29."""
    delay: Any = None
    cutoff: Any = None
    keep_results: bool = True

    @property
    def output_mode(self) -> str:
        return "update" if self.keep_results and self.delay is None else "append"


@dataclass
class ExactlyOnceBehavior:
    """temporal_behavior.py:83."""
    shift: Any = None

    @property
    def output_mode(self) -> str:
        return "append"


def common_behavior(delay=None, cutoff=None, keep_results=True) -> CommonBehavior:
    return CommonBehavior(delay, cutoff, keep_results)


def exactly_once_behavior(shift=None) -> ExactlyOnceBehavior:
    return ExactlyOnceBehavior(shift)


def _fmt_interval(d) -> str:
    if isinstance(d, _dt.timedelta):
        return f"{int(d.total_seconds() * 1000)} milliseconds"
    return str(d)


def apply_behavior(df: DataFrame, time_col: str, behavior) -> DataFrame:
    """apply_temporal_behavior (temporal_behavior.py:101): cutoff ->
    watermark (state eviction + late-data drop)."""
    if behavior is None or not df.isStreaming:
        return df
    cutoff = getattr(behavior, "cutoff", None)
    if cutoff is None:
        cutoff = getattr(behavior, "shift", None)
    if cutoff is not None:
        df = df.withWatermark(time_col, _fmt_interval(cutoff))
    return df


def deduplicate_stream(table: Table, value_cols: list[str], *, time_col: str,
                       within) -> Table:
    """Streaming dedup (reference table.py:1315 with persisted name) ->
    dropDuplicatesWithinWatermark — state bounded by the watermark."""
    df = table._df.withWatermark(time_col, _fmt_interval(within))
    return Table(df.dropDuplicatesWithinWatermark(value_cols))


def stream_from_directory(spark, path: str, schema, fmt: str = "parquet",
                          max_files_per_trigger: int = 1) -> Table:
    """File-watch source — the reference's `mode='streaming'` fs connector;
    `maxFilesPerTrigger` replays deterministically for tests."""
    r = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", max_files_per_trigger))
    df = getattr(r, fmt)(path)
    return Table(df.withColumn(ID, F.xxhash64(*[F.col(c) for c in df.columns])))


def subscribe_stream(table_or_df, on_change, *, key_cols: list[str],
                     output_mode: str = "update", on_time_end=None):
    """Reference-style change stream (`io/_subscribe.py:17`): emits
    (key, row, time, is_addition) with retractions — a changed key first
    emits its previous row with is_addition=False, then the new row.

    Update-mode micro-batches carry only changed keys; the previous
    value snapshot lives with the sink (at scale: foreachBatch MERGE
    into a Delta table with Change Data Feed instead of a dict)."""
    df = table_or_df._df if isinstance(table_or_df, Table) else table_or_df
    state: dict = {}

    def batch_fn(bdf: DataFrame, batch_id: int):
        # toLocalIterator bounds driver memory to one partition per step
        for row in bdf.toLocalIterator():
            d = row.asDict()
            d.pop(ID, None)
            key = tuple(d[k] for k in key_cols)
            old = state.get(key)
            if old == d:
                continue
            if old is not None:
                on_change(key=key, row=old, time=batch_id, is_addition=False)
            state[key] = d
            on_change(key=key, row=d, time=batch_id, is_addition=True)
        if on_time_end:
            on_time_end(batch_id)

    q = df.writeStream.outputMode(output_mode).foreachBatch(batch_fn).start()
    return q


def run_to_memory(table_or_df, name: str, output_mode: str = "append"):
    """Drive a streaming plan to completion synchronously (test harness):
    memory sink + processAllAvailable (guide §Structured Streaming)."""
    df = table_or_df._df if isinstance(table_or_df, Table) else table_or_df
    q = (df.writeStream.outputMode(output_mode).format("memory")
         .queryName(name).start())
    q.processAllAvailable()
    q.stop()
    return df.sparkSession.sql(f"SELECT * FROM {name}")


class _SubscribedQuery:
    """Thin proxy over a StreamingQuery that fires `on_end` exactly once
    when the subscription terminates (`stop()` / `awaitTermination`) —
    the reference's `pw.io.subscribe(on_end=)` end-of-stream contract
    (io/_subscribe.py:17)."""

    def __init__(self, query, on_end=None):
        self._q = query
        self._on_end = on_end
        self._ended = False

    def _fire_end(self):
        if not self._ended:
            self._ended = True
            if self._on_end is not None:
                self._on_end()

    def stop(self):
        self._q.stop()
        self._fire_end()

    def awaitTermination(self, timeout=None):
        out = self._q.awaitTermination(timeout)
        if out is not False:   # None (no timeout) or True = terminated
            self._fire_end()
        return out

    def __getattr__(self, name):
        return getattr(self._q, name)


class FrameSink:
    """Marker wrapper for `subscribe_differential`'s change callback:
    `FrameSink(fn)` receives the WHOLE delta DataFrame per logical step
    (`fn(delta_df, time)`) instead of driver-side row callbacks — the
    connector/sink path (e.g. `pw.io.changelog.subscribe_write` appends
    each delta to a retraction-envelope sink executor-side; no rows
    cross the driver)."""

    def __init__(self, fn):
        self.fn = fn


def _emit_delta(delta, on_change, on_time_end, batch_time):
    """Drive the reference subscribe callbacks for one output delta:
    every row change first, then one atomic `on_time_end(time)` —
    the per-minibatch consistency contract (io/_subscribe.py
    on_time_end: 'all changes for a time have been delivered')."""
    from .differential import DIFF, TIME

    if isinstance(on_change, FrameSink):
        on_change.fn(delta, batch_time)
        if on_time_end is not None:
            on_time_end(batch_time)
        return
    # one collect, not toLocalIterator: deltas are micro-batch-bounded
    # (driver callbacks are the per-row contract anyway) and iteration
    # cost ONE SPARK JOB PER PARTITION per tick — a measured slice of
    # the steady-state latency floor
    for row in delta.collect():
        d = row.asDict()
        t, w = d.pop(TIME), d.pop(DIFF)
        for _ in range(abs(int(w))):
            on_change(row=d, time=t, is_addition=w > 0)
    if on_time_end is not None:
        on_time_end(batch_time)


def _emit_delta_times(delta, on_change, on_time_end, effs):
    """Fused-batch emission: one output delta carrying PER-ROW times.
    Row callbacks fire in ascending time order with `on_time_end(t)` at
    every boundary — byte-identical callback sequence to stepping each
    time separately.  A FrameSink receives the whole fused frame once
    (rows carry their own `_pw_time`), then every time-end marker."""
    from .differential import DIFF, TIME

    if isinstance(on_change, FrameSink):
        on_change.fn(delta, effs[-1])
        if on_time_end is not None:
            for t in effs:
                on_time_end(t)
        return
    it = iter(effs)
    pending = next(it, None)
    # fused deltas are micro-batch-bounded and usually already driver-
    # held (LocalRelation from the tick cut): one collect + a python
    # sort replaces orderBy().toLocalIterator(), which cost a sort
    # exchange plus ONE SPARK JOB PER PARTITION of iteration
    rows = sorted(delta.collect(), key=lambda r: r[TIME])
    for row in rows:
        d = row.asDict()
        t, w = d.pop(TIME), d.pop(DIFF)
        while (pending is not None and on_time_end is not None
               and pending < t):
            on_time_end(pending)
            pending = next(it, None)
        for _ in range(abs(int(w))):
            on_change(row=d, time=t, is_addition=w > 0)
    if on_time_end is not None:
        while pending is not None:
            on_time_end(pending)
            pending = next(it, None)


# Above this many distinct event times per micro-batch (each = one full
# sequential graph step), warn the user toward `time_granularity=`.
_MAX_SUBSTEPS_WARN = 64


def subscribe_differential(stream_df, build, on_change, *,
                           on_time_end=None, on_end=None,
                           time_column: str | None = None,
                           time_granularity: int | None = None,
                           checkpoint_every: int = 8,
                           table_syntax: bool = False):
    """Retraction-true subscribe for DERIVED tables over a live stream.

    `subscribe_stream` retracts per-key updates the sink can see; this
    goes further: each micro-batch of the (insert-only, or
    `_pw_diff`-carrying) input stream is fed through a
    `DifferentialGraph` built by `build(source_node)`, so arbitrary
    filter/join/groupby compositions emit exact -1/+1 derived-row
    deltas — the reference's `pw.io.subscribe` contract on derived
    tables (`src/engine/dataflow.rs` reduce/join retractions), which
    Structured Streaming's own output modes cannot produce.

    on_change(row: dict, time: int, is_addition: bool) per delta row
    (driver-side by contract, batches streamed via toLocalIterator);
    on_time_end(time) after each micro-batch's changes (atomic
    per-batch marker); on_end() when the query terminates.

    `time_column` names an EVENT-TIME column of the input: each
    micro-batch is split into one logical step per distinct event time
    (ascending), and emitted deltas carry that time in `_pw_time` —
    the reference's per-minibatch `DataRow::time` semantics
    (`src/engine/graph.rs:255`) instead of the arrival batch ordinal.
    Event times already behind the graph's clock (late arrivals across
    micro-batches) are folded forward to the current processing time,
    exactly as the reference stamps a late row with the minibatch that
    first processes it.  Without `time_column`, times are connector
    commit ordinals (one per micro-batch).
    Returns the StreamingQuery (proxied for on_end)."""
    from .differential import DifferentialGraph

    df = stream_df._df if isinstance(stream_df, Table) else stream_df
    # the Table wrapper's synthetic row id is meaningless across deltas
    # (it would make retraction matching depend on an internal hash) —
    # drop it from the graph's schema, like the multi-stream variant
    if ID in df.columns:
        df = df.drop(ID)
    template = df.sparkSession.createDataFrame([], df.schema)
    if table_syntax:
        # build() receives a DiffTable and writes this/left/right
        # expressions + pw.reducers.* (diff_table.py bridge)
        from .diff_table import DifferentialTableGraph, DiffTable
        graph = DifferentialTableGraph(df.sparkSession,
                                       checkpoint_every=checkpoint_every)
        res = build(graph.input("src", template))
        out = res.node if isinstance(res, DiffTable) else res
    else:
        graph = DifferentialGraph(df.sparkSession,
                                  checkpoint_every=checkpoint_every)
        out = build(graph.source("src", template))

    # Spark re-executes a micro-batch after transient failures (and
    # replays the last one on restart); graph.step is NOT idempotent
    # (it advances the clock and feeds state), so redelivered work must
    # be skipped.  `last` = last fully-applied batch; `sub_batch`/`sub`
    # = last APPLIED SUB-STEP of an in-progress event-time batch, so a
    # redelivery after a mid-batch failure resumes from the first
    # unapplied sub-step instead of re-running steps that already
    # mutated the graph (which would double-count their deltas in
    # state).  Each mark is set right after its step() returns — before
    # the user callback — so a callback crash can lose that one
    # emission but never corrupts state.
    seen = {"last": -1, "sub_batch": -1, "sub": -1}

    def batch_fn(bdf: DataFrame, batch_id: int):
        if batch_id <= seen["last"]:
            return
        if time_column is None:
            (delta,) = graph.step(out, src=bdf)
            seen["last"] = batch_id
            _emit_delta(delta, on_change, on_time_end, graph._t)
            return
        # event-time mode: one logical step per distinct event time in
        # this micro-batch, ascending; late times fold forward to the
        # clock (strict monotonicity of the differential clock).
        # NULL event times cannot be ordered — they ride with the
        # FIRST sub-step (the minibatch that processes them, exactly
        # how the reference stamps un-timed rows), never dropped.
        tv_col = F.col(time_column)
        dtype = dict(bdf.dtypes).get(time_column, "")
        if "timestamp" in dtype:
            tv_col = F.unix_micros(tv_col)
        if time_granularity:
            tv_col = (tv_col - tv_col % F.lit(int(time_granularity)))
        tagged = bdf.withColumn("__pw_evt", tv_col)
        times = sorted(r[0] for r in
                       tagged.select("__pw_evt").distinct().collect()
                       if r[0] is not None)
        if (len(times) > _MAX_SUBSTEPS_WARN and not time_granularity
                and not graph.fusable_rowtimes()):
            import warnings
            warnings.warn(
                f"subscribe_differential: {len(times)} distinct event "
                f"times in one micro-batch — each runs a full graph "
                f"step ({len(times)} sequential Spark jobs). Pass "
                f"time_granularity= to bucket event times (e.g. 1s of "
                f"your time unit) and bound steps per batch.",
                RuntimeWarning, stacklevel=2)
        if not times:
            if tagged.isEmpty():
                seen["last"] = batch_id
                return
            (delta,) = graph.step(out, src=tagged.drop("__pw_evt"))
            seen["last"] = batch_id
            _emit_delta(delta, on_change, on_time_end, graph._t)
            return
        if graph.fusable_rowtimes() and batch_id != seen["sub_batch"]:
            # TICK FUSION (round 7, extended round 8 to keyed integral-
            # accumulator reduces): deltas of different logical times
            # either never interact through state (linear graph) or
            # commute through per-key integer accumulators, so the
            # whole multi-time batch runs as ONE step with per-row
            # times — a handful of Spark jobs instead of one full graph
            # step per distinct event time, with an identical trace.
            # Late/NULL event times fold forward to the processing
            # time, exactly like the sub-step path.  (A batch that
            # already applied sub-steps before a mid-batch failure
            # replays through the sub-step path so the marks hold.)
            prev = graph._t
            # SEQUENTIAL late-fold, exactly as the sub-step path would
            # have assigned clocks: each time folds to at least one
            # past its predecessor's effective clock
            effs, c = [], prev
            for tv in times:
                c = max(int(tv), c + 1)
                effs.append(c)
            from .differential import TIME as _T
            # key the time→clock map on the RAW event values (collected
            # from the column itself, so lookup equality is exact): an
            # int(tv)-keyed map breaks on fractional (double) time
            # columns — two distinct event times sharing an integer
            # part collide into a DUPLICATED_MAP_KEY runtime error, and
            # even without collision the cast('long') lookup silently
            # merges distinct times the sub-step path kept apart
            mapping = F.create_map(
                *[F.lit(x) for tv, e in zip(times, effs)
                  for x in (tv, e)])
            fused = tagged.withColumn(
                _T, F.coalesce(mapping[F.col("__pw_evt")].cast("long"),
                               F.lit(effs[0]))).drop("__pw_evt")
            (delta,) = graph.step(out, time=effs[-1], row_times=True,
                                  src=fused)
            seen["last"] = batch_id
            _emit_delta_times(delta, on_change, on_time_end, effs)
            return
        for i, tv in enumerate(times):
            if batch_id == seen["sub_batch"] and i <= seen["sub"]:
                continue    # applied before a mid-batch failure
            eff = max(int(tv), graph._t + 1)
            cond = F.col("__pw_evt") == tv
            if i == 0:
                # NULL event times ride with the first sub-step
                cond = cond | F.col("__pw_evt").isNull()
            sub = tagged.filter(cond).drop("__pw_evt")
            (delta,) = graph.step(out, time=eff, src=sub)
            seen["sub_batch"], seen["sub"] = batch_id, i
            _emit_delta(delta, on_change, on_time_end, eff)
        seen["last"] = batch_id

    q = df.writeStream.outputMode("append").foreachBatch(batch_fn).start()
    proxy = _SubscribedQuery(q, on_end)
    proxy._batch_fn = batch_fn   # exposed for redelivery/idempotency tests
    return proxy


from . import differential  # noqa: E402,F401  (retraction-stream engine)
from .differential import DifferentialGraph  # noqa: E402,F401
from .diff_table import DifferentialTableGraph  # noqa: E402,F401
from .sharding import ShardedDifferential  # noqa: E402,F401
from .incremental_graph import (  # noqa: E402,F401
    incremental_bellman_ford,
    incremental_bellman_ford_cascade,
    incremental_connected_components,
    incremental_louvain,
    incremental_pagerank,
    incremental_pagerank_cascade,
)
from .incremental_dedup import (  # noqa: E402,F401
    incremental_dedup_clusters,
    incremental_embedding_pairs,
    incremental_minhash_pairs,
    incremental_simhash_pairs,
)
from .incremental_bm25 import incremental_bm25_topk  # noqa: E402,F401
from .incremental_topk import (  # noqa: E402,F401
    incremental_knn_topk,
    incremental_topk_join,
)
from .iterate_diff import iterate_differential  # noqa: E402,F401
from .sync_group import (  # noqa: E402,F401
    DifferentialSyncGroup,
    register_differential_synchronization_group,
)


def subscribe_differential_multi(streams, build, on_change, *,
                                 on_time_end=None,
                                 checkpoint_every: int = 8,
                                 table_syntax: bool = False,
                                 sync_columns: dict | None = None,
                                 max_difference: int = 0,
                                 time_granularity: int | None = None):
    """Differential subscribe over SEVERAL live streams — e.g. a join
    of two file-watch sources emitting exact -1/+1 deltas as either
    side changes.

    `streams`: {source_name: streaming DataFrame (or Table)}.
    `build(sources: dict[str, node])` returns the output node (or
    DiffTable with table_syntax=True).  Each stream's micro-batches
    feed the shared graph under a lock, one logical step per batch
    (absent sources see empty deltas — valid differential semantics);
    `on_change(row, time, is_addition)` fires per output delta row,
    then `on_time_end(time)` closes the batch atomically.
    Returns the list of StreamingQuery handles (stop/processAllAvailable
    each).

    `sync_columns` ({source_name: event_time_column}) places the
    sources in an input synchronization group (the reference's
    `register_input_synchronization_group` on the differential
    engine): rows are released into the graph in GLOBAL event-time
    order once every source's frontier is within `max_difference` —
    a fast source waits for slow ones.  Returns `(queries, group)`
    in this mode; call `group.flush()` after the streams drain to
    release rows still held behind a silent source.  Redelivery
    granularity is per micro-batch (a crash between buffering and the
    mark may re-buffer one batch — the unsynchronized path's per-sub-
    step resume does not apply here)."""
    import threading

    from .differential import DifferentialGraph

    frames = {n: (s._df if isinstance(s, Table) else s)
              for n, s in streams.items()}
    # the Table wrapper's synthetic row id is meaningless across deltas
    # and collides when two sources join — drop it everywhere
    frames = {n: (f.drop(ID) if ID in f.columns else f)
              for n, f in frames.items()}
    spark = next(iter(frames.values())).sparkSession
    if table_syntax:
        from .diff_table import DifferentialTableGraph, DiffTable
        graph = DifferentialTableGraph(spark,
                                       checkpoint_every=checkpoint_every)
        sources = {n: graph.input(n, spark.createDataFrame([], f.schema))
                   for n, f in frames.items()}
        res = build(sources)
        out = res.node if isinstance(res, DiffTable) else res
    else:
        graph = DifferentialGraph(spark, checkpoint_every=checkpoint_every)
        sources = {n: graph.source(n, spark.createDataFrame([], f.schema))
                   for n, f in frames.items()}
        out = build(sources)

    lock = threading.Lock()
    seen: dict[str, int] = {n: -1 for n in frames}
    group = None
    if sync_columns is not None:
        from .sync_group import DifferentialSyncGroup

        group = DifferentialSyncGroup(
            graph, out, sync_columns, max_difference=max_difference,
            time_granularity=time_granularity)

    def make_batch_fn(name):
        def batch_fn(bdf: DataFrame, batch_id: int):
            with lock:      # one logical step per arriving micro-batch
                # idempotent against foreachBatch re-execution: the
                # graph clock/state already absorbed this batch_id
                if batch_id <= seen[name]:
                    return
                if group is not None:
                    for eff, delta in group.feed(**{name: bdf}):
                        _emit_delta(delta, on_change, on_time_end, eff)
                else:
                    (delta,) = graph.step(out, **{name: bdf})
                    _emit_delta(delta, on_change, on_time_end, graph._t)
                # mark AFTER success: a mid-batch failure must be
                # re-appliable on redelivery
                seen[name] = batch_id
        return batch_fn

    queries = [f.writeStream.outputMode("append")
                .foreachBatch(make_batch_fn(n)).start()
               for n, f in frames.items()]
    return (queries, group) if group is not None else queries
