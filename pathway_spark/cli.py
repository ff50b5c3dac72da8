"""Command-line entry point — the reference's `pathway` CLI
(`python/pathway/cli.py`: `spawn`, `spawn-from-env`, `replay`),
re-mapped to Spark's execution model.

The reference spawns N worker PROCESSES × T threads that gossip over
`--first-port`/`--addresses`; Spark's unit of parallelism is the
executor/core, so `spawn -t T -n N program.py` runs ONE driver program
with `SPARK_GRAFT_CPUS = T × N` (local mode) — on a real cluster the
same program submits through `spark-submit`, where `--addresses` has
no meaning (cluster managers own placement).  The record/replay flags
map to the same environment contract the reference uses
(`PATHWAY_REPLAY_STORAGE` / `PATHWAY_SNAPSHOT_ACCESS` /
`PATHWAY_CONTINUE_AFTER_REPLAY`), which `pathway_spark.persistence`
consumers can read.

The implementation is plain argparse (no optional dependencies);
subcommand and flag names mirror the reference CLI one-for-one.
"""

from __future__ import annotations

import os
import shlex
import subprocess
import sys


def _resolve(threads: int, processes: int | None, addresses: str | None,
             process_id: int | None) -> int:
    """Validate the reference's spawn arguments; return total
    parallelism.  Mirrors `cli.py validate_and_resolve_spawn_args`
    minus the port bookkeeping Spark does not need."""
    if threads < 1:
        raise SystemExit("--threads must be at least 1")
    if processes is not None and addresses is not None:
        raise SystemExit("--processes and --addresses are mutually exclusive")
    if addresses is not None:
        n = len([a for a in addresses.split(",") if a])
        if process_id is None:
            raise SystemExit("--process-id is required when --addresses is set")
        if not (0 <= process_id < n):
            raise SystemExit("--process-id out of range")
        # one Spark driver per machine is the translation; each gets
        # the per-process thread budget
        return threads
    n = processes if processes is not None else 1
    if n < 1:
        raise SystemExit("--processes must be at least 1")
    return threads * n


def _run(program: str, arguments: list[str], cpus: int,
         extra_env: dict[str, str], *, threads: int = 1,
         processes: int = 1) -> int:
    env = os.environ.copy()
    env.update(extra_env)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    # reference contract (cli.py:125): per-process thread count and
    # process count, exactly as given — plus the resolved total for
    # the Spark session
    env["PATHWAY_THREADS"] = str(threads)
    env["PATHWAY_PROCESSES"] = str(processes)
    cmd = [sys.executable, program, *arguments] \
        if program.endswith(".py") else [program, *arguments]
    return subprocess.call(cmd, env=env)


def _spawn_args(p):
    p.add_argument("-t", "--threads", type=int, default=1)
    p.add_argument("-n", "--processes", type=int, default=None)
    p.add_argument("--first-port", type=int, default=10000)
    p.add_argument("--addresses", type=str, default=None)
    p.add_argument("-pi", "--process-id", type=int, default=None)
    p.add_argument("program")
    p.add_argument("arguments", nargs="...")


def main(argv: list[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="pathway_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("spawn", help="run a program with N×T parallelism")
    _spawn_args(sp)
    sp.add_argument("--record", action="store_true")
    sp.add_argument("--record-path", type=str, default="record")

    se = sub.add_parser("spawn-from-env",
                        help="spawn with args from $PATHWAY_SPAWN_ARGS")

    rp = sub.add_parser("replay", help="re-run a program from a recording")
    _spawn_args(rp)
    rp.add_argument("--record-path", type=str, default="record")
    rp.add_argument("--mode", choices=["batch", "speedrun"], default="batch")
    rp.add_argument("--continue", dest="continue_after_replay",
                    action="store_true")

    # one-driver-per-shard deployment of a key-space-sharded pipeline
    # (streaming/shard_worker.py) — the reference's multi-process
    # cluster shape (PATHWAY_PROCESSES, src/engine/dataflow/config.rs)
    sw = sub.add_parser(
        "shard-worker",
        help="run ONE shard of a key-sharded differential pipeline")
    sw.add_argument("program", type=str,
                    help="pipeline file defining build(graph)")
    sw.add_argument("--shard-id", type=int, required=True)
    sw.add_argument("--shards", type=int, required=True)
    sw.add_argument("--key", type=str, required=True,
                    help="comma-separated shard key columns")
    sw.add_argument("--state-root", type=str, required=True)
    feed_grp = sw.add_mutually_exclusive_group(required=True)
    feed_grp.add_argument("--feed-dir", type=str, default=None,
                          help="directory-feed transport root")
    feed_grp.add_argument("--kafka-bootstrap", type=str, default=None,
                          help="Kafka transport (jar-gated): broker "
                               "list; topics default to source names, "
                               "or map via --kafka-topic src=topic")
    sw.add_argument("--kafka-topic", action="append", default=[],
                    metavar="SRC=TOPIC",
                    help="source->topic override (repeatable)")
    sw.add_argument("--out-dir", type=str, required=True)
    sw.add_argument("--poll-interval", type=float, default=1.0)
    sw.add_argument("--stop-after-time", type=int, default=None)
    sw.add_argument("--idle-timeout", type=float, default=None)
    sw.add_argument("--threads", "-t", type=int,
                    default=os.cpu_count() or 4)

    args = ap.parse_args(argv)

    if args.cmd == "shard-worker":
        from .session import get_spark
        from .streaming.shard_worker import run_shard_worker

        spark = get_spark(f"pw-shard-{args.shard_id}",
                          cpus=str(args.threads))
        transport = None
        if args.kafka_bootstrap:
            from .streaming.shard_worker import KafkaShardFeed
            tmap = dict(kv.split("=", 1) for kv in args.kafka_topic)
            transport = KafkaShardFeed(
                bootstrap_servers=args.kafka_bootstrap,
                topic_of=lambda s: tmap.get(s, s))
        n = run_shard_worker(
            spark, args.program, shard_id=args.shard_id,
            shards=args.shards, key=args.key.split(","),
            state_root=args.state_root, feed_dir=args.feed_dir,
            transport=transport,
            out_dir=args.out_dir, poll_interval=args.poll_interval,
            stop_after_time=args.stop_after_time,
            idle_timeout=args.idle_timeout)
        print(f"shard {args.shard_id}: {n} batches processed")
        return 0

    if args.cmd == "spawn-from-env":
        raw = os.environ.get("PATHWAY_SPAWN_ARGS")
        if not raw:
            print("PATHWAY_SPAWN_ARGS variable is unspecified, exiting...",
                  file=sys.stderr)
            return 0
        return main(["spawn", *shlex.split(raw)])

    cpus = _resolve(args.threads, args.processes, args.addresses,
                    args.process_id)
    extra: dict[str, str] = {}
    if args.cmd == "spawn":
        if args.record:
            extra["PATHWAY_REPLAY_STORAGE"] = args.record_path
            extra["PATHWAY_SNAPSHOT_ACCESS"] = "record"
            extra["PATHWAY_CONTINUE_AFTER_REPLAY"] = "true"
    else:  # replay
        extra["PATHWAY_REPLAY_STORAGE"] = args.record_path
        extra["PATHWAY_SNAPSHOT_ACCESS"] = "replay"
        extra["PATHWAY_PERSISTENCE_MODE"] = args.mode
        extra["PATHWAY_REPLAY_MODE"] = args.mode
        if args.continue_after_replay:
            extra["PATHWAY_CONTINUE_AFTER_REPLAY"] = "true"
    n_proc = (args.processes if args.processes is not None
              else (len([a for a in (args.addresses or "").split(",") if a])
                    or 1))
    return _run(args.program, args.arguments, cpus, extra,
                threads=args.threads, processes=n_proc)


if __name__ == "__main__":
    raise SystemExit(main())
