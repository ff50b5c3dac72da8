"""Multi-source event-time alignment for the differential engine.

Reference: `pw.io.register_input_synchronization_group`
(`python/pathway/io/_utils.py` / connector-group tracking in
`src/connectors/synchronization.rs`): sources placed in one group are
read so that the values of the chosen sync columns never diverge by
more than `max_difference` — a fast source WAITS for slow ones, and
rows enter the engine in global sync-column order, so a join/window
over the two streams sees the same minibatch timeline regardless of
how the connectors interleave physically.

Spark translation: the group buffers each source's pending delta
frames on the driver (frames stay distributed; only per-source
frontier maxima and released distinct times are collected — both
micro-batch-bounded).  A row is released once EVERY source's frontier
(max sync value fed so far) is within `max_difference` of it:

    release threshold = min over sources of frontier + max_difference

Released rows are sliced into one `graph.step(time=...)` per distinct
sync value ASCENDING ACROSS SOURCES — the same per-event-time
sub-stepping the single-source subscribe uses, generalized to a
min-watermark over the group.  The resulting trace is identical to
feeding one globally time-ordered stream, which is the reference's
synchronized semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .differential import DIFF, DiffNode


class DifferentialSyncGroup:
    """Feed skewed sources; step the graph in global event-time order.

    `columns` maps source name -> sync column.  `feed(**deltas)`
    buffers and returns the list of `(time, output_delta)` steps it
    released; `flush()` releases everything still buffered (end of
    input)."""

    def __init__(self, graph, output: DiffNode,
                 columns: dict[str, str], *,
                 max_difference: int = 0,
                 time_granularity: int | None = None):
        self.graph = graph
        self.out = output
        self.cols = dict(columns)
        self.maxd = int(max_difference)
        self.gran = time_granularity
        self._buf: dict[str, DataFrame | None] = {s: None for s in columns}
        self._frontier: dict[str, int | None] = {s: None for s in columns}
        self._feeds: dict[str, int] = {s: 0 for s in columns}

    def _sync_col(self, src: str, df: DataFrame):
        c = F.col(self.cols[src])
        if "timestamp" in dict(df.dtypes).get(self.cols[src], ""):
            c = F.unix_micros(c)
        if self.gran:
            c = c - c % F.lit(int(self.gran))
        return c

    def feed(self, **deltas: DataFrame) -> list[tuple[int, DataFrame]]:
        unknown = set(deltas) - set(self.cols)
        if unknown:
            raise KeyError(f"sources not in group: {sorted(unknown)}")
        for s, df in deltas.items():
            # materialize the fed frame EAGERLY, before anything else
            # references it: in foreachBatch the incoming DataFrame is
            # only guaranteed replayable during its own micro-batch
            # (input files may be compacted, broker offsets retired) —
            # a buffer of lazy plans over old batch frames would
            # re-read the source when a release finally fires, failing
            # or silently reading different rows.  The eager checkpoint
            # doubles as the action the frontier max needs, so the max
            # below runs over materialized blocks (no extra source scan)
            tagged = (df.withColumn("__pw_sync", self._sync_col(s, df))
                      .localCheckpoint(eager=True))
            mx = tagged.agg(F.max("__pw_sync")).collect()[0][0]
            if mx is not None:
                f = self._frontier[s]
                self._frontier[s] = mx if f is None else max(f, mx)
            buf = self._buf[s]
            # the buffer itself is a lazy union over eager-checkpointed
            # frames (never the raw sources); compact the union/filter
            # chain every 16th feed to bound plan depth for a source
            # long-blocked on a slow peer
            self._feeds[s] += 1
            eager = self._feeds[s] % 16 == 0
            self._buf[s] = (tagged if buf is None
                            else buf.unionByName(tagged)) \
                .localCheckpoint(eager=eager)
        if any(f is None for f in self._frontier.values()):
            return []    # a source that has produced nothing blocks
        thr = min(self._frontier.values()) + self.maxd
        return self._release(thr)

    def flush(self) -> list[tuple[int, DataFrame]]:
        """End of input: release every buffered row regardless of
        frontiers (the reference drains groups at connector EOF)."""
        return self._release(None)

    def _release(self, thr: int | None) -> list[tuple[int, DataFrame]]:
        rel: dict[str, DataFrame] = {}
        for s, buf in self._buf.items():
            if buf is None:
                continue
            if thr is None:
                rel[s], self._buf[s] = buf, None
            else:
                cond = (F.col("__pw_sync") <= F.lit(thr)) \
                    | F.col("__pw_sync").isNull()
                rel[s] = buf.filter(cond)
                self._buf[s] = buf.filter(~((F.col("__pw_sync")
                                             <= F.lit(thr))
                                            | F.col("__pw_sync")
                                            .isNull())) \
                    .localCheckpoint(eager=False)
        if not rel:
            return []
        # ONE collect for (source, distinct sync value) pairs — decides
        # the step schedule AND which sources feed each step
        tag = None
        for s, df in rel.items():
            part = df.select(F.lit(s).alias("__s"), "__pw_sync").distinct()
            tag = part if tag is None else tag.unionByName(part)
        pairs = tag.collect()
        times = sorted({r["__pw_sync"] for r in pairs
                        if r["__pw_sync"] is not None})
        by_time: dict = {tv: set() for tv in times}
        null_src = {r["__s"] for r in pairs if r["__pw_sync"] is None}
        if not times and null_src:
            # only un-timed rows: one step at the next clock tick
            times = [self.graph._t + 1]
            by_time = {times[0]: set(null_src)}
            null_src = set()
        for r in pairs:
            if r["__pw_sync"] is not None:
                by_time[r["__pw_sync"]].add(r["__s"])
        steps: list[tuple[int, DataFrame]] = []
        for i, tv in enumerate(times):
            # NULL sync values ride with the first step (the minibatch
            # that processes them — reference stamping of un-timed rows)
            srcs = by_time[tv] | (null_src if i == 0 else set())
            feeds = {}
            for s in srcs:
                cond = F.col("__pw_sync") == F.lit(tv)
                if i == 0 and s in null_src:
                    cond = cond | F.col("__pw_sync").isNull()
                feeds[s] = rel[s].filter(cond).drop("__pw_sync")
            eff = max(int(tv), self.graph._t + 1)
            (d,) = self.graph.step(self.out, time=eff, **feeds)
            steps.append((eff, d))
        return steps


def register_differential_synchronization_group(
        graph, output: DiffNode, columns: dict[str, str], *,
        max_difference: int = 0,
        time_granularity: int | None = None) -> DifferentialSyncGroup:
    """Differential-engine counterpart of
    `pw.io.register_input_synchronization_group` — see
    :class:`DifferentialSyncGroup`."""
    return DifferentialSyncGroup(graph, output, columns,
                                 max_difference=max_difference,
                                 time_granularity=time_granularity)
