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

For a Kafka deployment, replace the directory listing with one
consumer group per shard over a key-partitioned topic (the jar-gated
`io.connectors` Kafka reader) — the loop body is unchanged.
"""

from __future__ import annotations

import importlib.util
import re
import time as _time
from typing import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .differential import DifferentialGraph
from .sharding import _shard_col, _validate_shardable

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


def run_shard_worker(spark: SparkSession, program_path: str, *,
                     shard_id: int, shards: int, key: list[str],
                     state_root: str, feed_dir: str, out_dir: str,
                     poll_interval: float = 1.0,
                     stop_after_time: int | None = None,
                     idle_timeout: float | None = None,
                     on_batch: Callable | None = None) -> int:
    """Run ONE shard's driver loop; returns the number of batches
    processed.  `stop_after_time` exits once that event time commits
    (test/drain mode); `idle_timeout` exits after that many seconds
    with no new batch; `on_batch(t, delta_df)` is the subscriber hook,
    called after the shard's output is written and BEFORE the commit."""
    if not 0 <= shard_id < shards:
        raise ValueError(f"shard_id {shard_id} not in [0, {shards})")
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
        batches = _list_times(spark, feed_dir, srcs)
        todo = sorted(t for t in batches if t > g._t)
        for t in todo:
            feeds = {name: spark.read.parquet(uri).filter(mine)
                     for name, uri in batches[t].items()}
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


__all__ = ["run_shard_worker", "write_feed_batch", "load_program"]
