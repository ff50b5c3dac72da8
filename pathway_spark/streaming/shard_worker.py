"""One-shard worker process — the executable multi-process deployment
of `ShardedDifferential`.

The reference runs one timely worker per process and hash-exchanges
keys between them over TCP (`PATHWAY_PROCESSES`,
src/engine/dataflow/config.rs:140-165).  The Spark translation needs
no exchange at runtime: `sharding.py` proves (at build time) that every
stateful operator keys on a superset of the shard key, so each shard is
a fully independent `DifferentialGraph` over its own key slice — one
DRIVER PER SHARD, disjoint durable state under
``<state_root>/shard_{i:03d}``, fed by any partitioned transport.

This module is that driver's main loop.  The in-tree transport is a
batch DIRECTORY FEED — the simplest partitioned transport that works
everywhere (the same layout a Kafka-partition consumer group or a
bucketed object-store drop zone would produce):

    <feed_dir>/<source>/t=<T>/ ...parquet...

Every batch directory holds ONE logical minibatch stamped with event
time ``T``; the worker reads only times above its own committed clock
(crash-restore = replay your own tail, touching no other shard),
filters rows to ``pmod(xxhash64(key), shards) == shard_id`` — the
exact routing expression `ShardedDifferential.step` uses, so N workers
over the same feed compute precisely the single-process sharded run —
steps, writes the shard's output delta to
``<out_dir>/shard_{i:03d}/t=<T>``, and commits.  Output writes happen
BEFORE the commit and use overwrite mode: a crash between write and
commit replays the batch and rewrites byte-identical content
(idempotent redelivery, same contract as the engine's recovery tests).

For a Kafka deployment, pass ``transport=KafkaShardFeed(...)`` (r10):
one assigned partition per shard over key-partitioned topics via the
jar-gated Kafka batch reader — the loop body is unchanged, and the
record-assembly protocol (batch grouping by event time, completeness
witness, clock filtering) is itself transport-independent and
parity-tested against the directory feed without a broker
(tests/test_sharding.py), so the only untested-in-sandbox piece is the
wire transport.
"""

from __future__ import annotations

import importlib.util
import re
import time as _time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .differential import DifferentialGraph
from .sharding import _shard_col, _validate_shardable

# to_json's default timestampFormat truncates to milliseconds; the wire
# protocol must round-trip the full microsecond precision parquet
# transport carries, or "N workers == single-process run" breaks on
# timestamp columns.  Same option string on BOTH producer and consumer.
_WIRE_TS_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}

_T_RE = re.compile(r"^t=(\d+)$")


def load_program(path: str):
    """Import the pipeline program: a Python file defining
    ``build(graph) -> DiffNode`` (sources declared via
    ``graph.source``, exactly the `ShardedDifferential` contract)."""
    spec = importlib.util.spec_from_file_location("pw_shard_program", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if not hasattr(mod, "build"):
        raise ValueError(f"{path} must define build(graph) -> output node")
    return mod


def _list_times(spark, feed_dir: str, sources: list[str]) -> dict:
    """{time: {source: uri}} for every complete batch directory.  A
    `_SUCCESS`-less directory is a torn in-flight write — skipped, the
    next poll sees it complete (same witness the state backends use).
    Plain paths list via the driver's filesystem; URIs (s3a://, hdfs://,
    file://) via the Hadoop FileSystem API."""
    if "://" in feed_dir:
        from .state_backend import _HadoopFS
        fs = _HadoopFS(spark, feed_dir)
        listdir, exists = fs.listdir, fs.exists
    else:
        import os

        def listdir(p):
            return os.listdir(p) if os.path.isdir(p) else []

        def exists(p):
            return os.path.exists(p)
    out: dict[int, dict[str, str]] = {}
    for name in sources:
        root = f"{feed_dir}/{name}"
        for d in listdir(root):
            m = _T_RE.match(d)
            if not m:
                continue
            uri = f"{root}/{d}"
            if not exists(f"{uri}/_SUCCESS"):
                continue
            out.setdefault(int(m.group(1)), {})[name] = uri
    return out


class KafkaShardFeed:
    """Kafka-partition transport for `run_shard_worker` — one ASSIGNED
    partition per shard over key-partitioned topics (the reference's
    multi-process deployment consumes one Kafka partition set per
    worker; src/engine/dataflow/config.rs:140-165 is its TCP
    equivalent).

    Record protocol (per partition, batch-contiguous):
      data record   value = ``{"t": <event time>, "row": {...}}``
      commit marker value = ``{"t": <event time>, "commit": true,
                               "rows": <per-partition row count>}``
    A batch (topic, t) is consumable only when its marker AND all
    `rows` data records have been fetched — a fetch boundary that
    splits a batch simply defers it to the next poll via the pending
    buffer (the `_SUCCESS` witness of the directory feed,
    re-expressed).  The offset cursor tracks fetch position; after a
    crash both cursor and buffer reset, the partition replays from the
    earliest offset, and batches with t ≤ the worker's committed clock
    are consumed-and-skipped (idempotent redelivery, same contract as
    the directory feed).  Rows re-parse through `from_json` with the
    source's template schema, so types (timestamps included) resolve
    Spark-side, not by Python JSON guessing.

    `fetch(spark, topics, shard_id, offsets) -> [(topic, offset,
    value_str)]` is the wire layer: the default uses the jar-gated
    Kafka batch reader; tests inject a fake to parity-check the
    protocol without a broker."""

    def __init__(self, bootstrap_servers: str | None = None,
                 topic_of: Callable[[str], str] | None = None,
                 fetch: Callable | None = None):
        self.bootstrap = bootstrap_servers
        self.topic_of = topic_of or (lambda src: src)
        self._fetch = fetch or self._kafka_fetch
        self._offsets: dict[str, int] = {}       # next offset to read
        self._pending: dict[str, list] = {}      # topic -> [(off, dict)]

    def _kafka_fetch(self, spark, topics, shard_id, offsets):
        import json
        assign = {t: [shard_id] for t in topics}
        starting = {t: {str(shard_id): offsets.get(t, -2)}
                    for t in topics}
        df = (spark.read.format("kafka")
              .option("kafka.bootstrap.servers", self.bootstrap)
              .option("assign", json.dumps(assign))
              .option("startingOffsets", json.dumps(starting))
              .option("endingOffsets", "latest")
              .load())
        return [(r["topic"], r["offset"],
                 bytes(r["value"]).decode("utf-8"))
                for r in df.select("topic", "offset", "value")
                           .orderBy("topic", "offset").collect()]

    def poll(self, spark, sources: list[str], shard_id: int, clock: int,
             schemas: dict) -> dict[int, dict[str, "DataFrame"]]:
        """Fetch new records, assemble COMPLETE batches in per-topic
        order, advance offsets past them, and return {t: {source: df}}
        for t > clock."""
        import json

        from pyspark.sql import types as T

        topic_src = {self.topic_of(s): s for s in sources}
        recs = self._fetch(spark, list(topic_src), shard_id,
                           self._offsets)
        for topic, off, val in sorted(recs, key=lambda r: (r[0], r[1])):
            if off < self._offsets.get(topic, 0):
                continue                      # replayed tail, already had
            self._pending.setdefault(topic, []).append(
                (off, json.loads(val)))
            self._offsets[topic] = off + 1
        out: dict[int, dict[str, DataFrame]] = {}
        for topic, buf in self._pending.items():
            src = topic_src.get(topic)
            if src is None:
                continue
            # consume the longest prefix of COMPLETE batches, in order
            while True:
                batch_t = None
                rows, marker = [], None
                consumed = 0
                for off, rec in buf:
                    t = rec["t"]
                    if batch_t is None:
                        batch_t = t
                    if t != batch_t:
                        break                 # next batch began
                    consumed += 1
                    if rec.get("commit"):
                        marker = rec
                        break
                    rows.append(rec["row"])
                if marker is None or len(rows) != marker.get("rows", -1):
                    break                     # torn/in-flight: wait
                del buf[:consumed]
                if batch_t <= clock:
                    continue                  # committed already: skip
                tpl: T.StructType = schemas[src]
                has_diff = any("_pw_diff" in r for r in rows)
                fields = list(tpl.fields) + (
                    [T.StructField("_pw_diff", T.LongType())]
                    if has_diff and "_pw_diff" not in tpl.names else [])
                sch = T.StructType(fields)
                raw = spark.createDataFrame(
                    [(json.dumps(r),) for r in rows], "v string")
                df = (raw.select(
                          F.from_json("v", sch, _WIRE_TS_OPTS).alias("r"))
                      .select("r.*"))
                out.setdefault(batch_t, {})[src] = df
        return out


def run_shard_worker(spark: SparkSession, program_path: str, *,
                     shard_id: int, shards: int, key: list[str],
                     state_root: str, out_dir: str,
                     feed_dir: str | None = None,
                     transport=None,
                     poll_interval: float = 1.0,
                     stop_after_time: int | None = None,
                     idle_timeout: float | None = None,
                     on_batch: Callable | None = None) -> int:
    """Run ONE shard's driver loop; returns the number of batches
    processed.  Feed via `feed_dir` (directory transport) or a
    `transport` object with the `KafkaShardFeed.poll` contract.
    `stop_after_time` exits once that event time commits (test/drain
    mode); `idle_timeout` exits after that many seconds with no new
    batch; `on_batch(t, delta_df)` is the subscriber hook, called
    after the shard's output is written and BEFORE the commit."""
    if not 0 <= shard_id < shards:
        raise ValueError(f"shard_id {shard_id} not in [0, {shards})")
    if (feed_dir is None) == (transport is None):
        raise ValueError("pass exactly one of feed_dir / transport")
    prog = load_program(program_path)
    g = DifferentialGraph(
        spark, state_dir=f"{state_root.rstrip('/')}/shard_{shard_id:03d}",
        checkpoint_every=1)
    out_node = prog.build(g)
    _validate_shardable(g, key)
    srcs = list(g._sources)
    mine = _shard_col(key, shards) == shard_id
    my_out = f"{out_dir.rstrip('/')}/shard_{shard_id:03d}"

    processed = 0
    idle_since = _time.monotonic()
    while True:
        if transport is not None:
            # DATA columns only: the graph template carries the
            # engine-internal _pw_diff/_pw_time, which from_json would
            # otherwise parse as NULL columns out of row JSON
            from pyspark.sql import types as T

            from .differential import _data_cols
            schemas = {}
            for s in srcs:
                tpl = g._sources[s]._template
                keep = set(_data_cols(tpl))
                schemas[s] = T.StructType(
                    [f for f in tpl.schema.fields if f.name in keep])
            ready = transport.poll(spark, srcs, shard_id, g._t, schemas)
        else:
            times = _list_times(spark, feed_dir, srcs)
            ready = {t: {name: spark.read.parquet(uri)
                         for name, uri in times[t].items()}
                     for t in times if t > g._t}
        todo = sorted(ready)
        for t in todo:
            # the routing filter stays on for BOTH transports: Kafka
            # partitions are produced with the same hash, so it's a
            # no-op there — but it keeps the exact-routing invariant
            # (N workers ≡ the single-process sharded run) independent
            # of producer correctness
            feeds = {name: df.filter(mine)
                     for name, df in ready[t].items()}
            (delta,) = g.step(out_node, time=t, **feeds)
            delta = g.materialize(delta)
            # overwrite => a replayed (crashed-before-commit) batch
            # rewrites identical bytes instead of duplicating them
            delta.write.mode("overwrite").parquet(f"{my_out}/t={t}")
            if on_batch is not None:
                on_batch(t, delta)
            g.commit()
            processed += 1
            idle_since = _time.monotonic()
            if stop_after_time is not None and t >= stop_after_time:
                g.restore_session_confs()
                return processed
        if not todo:
            if idle_timeout is not None and \
                    _time.monotonic() - idle_since > idle_timeout:
                g.restore_session_confs()
                return processed
            _time.sleep(poll_interval)


def write_feed_batch(df, feed_dir: str, source: str, t: int) -> None:
    """Producer-side helper: publish one minibatch into the directory
    feed (parquet + the `_SUCCESS` completeness witness Spark writes
    at job commit)."""
    df.write.mode("overwrite").parquet(f"{feed_dir}/{source}/t={t}")


def kafka_feed_records(df, t: int, shards: int, key: list[str]
                       ) -> list[tuple[int, str]]:
    """Producer-side protocol encoder for `KafkaShardFeed`: one
    (partition, json value) pair per row — partitioned with EXACTLY
    the worker's routing hash — followed by one commit marker per
    partition carrying its row count (the completeness witness).
    Returned as plain records so tests can drive the protocol without
    a broker; `write_kafka_feed_batch` ships them through the
    jar-gated Kafka sink."""
    import json

    part = df.select(_shard_col(key, shards).alias("__p"),
                     F.to_json(F.struct(*df.columns),
                               _WIRE_TS_OPTS).alias("__v"))
    counts = {p: 0 for p in range(shards)}
    out = []
    for r in part.collect():
        p = int(r["__p"])
        out.append((p, json.dumps({"t": t, "row": json.loads(r["__v"])})))
        counts[p] += 1
    for p in range(shards):
        out.append((p, json.dumps({"t": t, "commit": True,
                                   "rows": counts[p]})))
    return out


def write_kafka_feed_batch(spark, df, *, bootstrap_servers: str,
                           topic: str, t: int, shards: int,
                           key: list[str]) -> None:
    """Publish one minibatch to a key-partitioned topic (jar-gated):
    `kafka_feed_records` rows land on their shard's partition via the
    Kafka sink's `partition` column, markers last."""
    recs = kafka_feed_records(df, t, shards, key)
    out = spark.createDataFrame(
        [(p, v) for p, v in recs], "partition int, value string")
    (out.selectExpr("partition", "CAST(value AS BINARY) AS value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic).save())


__all__ = ["run_shard_worker", "write_feed_batch", "load_program",
           "KafkaShardFeed", "kafka_feed_records",
           "write_kafka_feed_batch"]
