"""Key-space sharding for differential graphs — executable scale-out.

The reference scales its dataflow across workers/processes by hashing
keys over timely workers (`PATHWAY_THREADS` / `PATHWAY_PROCESSES`,
`src/engine/dataflow/config.rs:140-165`); every exchange routes a key
to its owning worker, so per-key state lives exactly once.  The Spark
translation: N independent `DifferentialGraph`s, each owning the rows
whose SHARD KEY hashes to it, with disjoint durable state dirs.  A tick
hash-partitions each fed delta once and steps every shard; the output
changelog is the union of the shards' deltas.

Soundness precondition (asserted at build): every STATEFUL operator in
the graph must key on a superset of the shard key, so no state lookup
ever needs a row that lives in another shard — the per-shard run is
then exactly the restriction of the unsharded run to its key slice,
and the union of outputs equals the unsharded output.  Operators that
coordinate across the whole stream (watermark behaviors — their
cutoff is a GLOBAL max; iteration/graph algorithms — connectivity
crosses shards; theta joins — unverifiable predicate) are rejected.

Deployment shape this enables: one driver per shard (separate
processes or machines), each with `state_dir=<root>/shard_{i:03d}`,
fed by any partitioned transport (e.g. one Kafka partition group per
shard); `ShardedDifferential` is the single-process harness of the
same math and the reference for its tests.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .differential import (
    DiffNode, DifferentialGraph, SourceNode, _AsofNowNode, _DistinctNode,
    _JoinNode, _KeyedRecomputeNode, _KeyedRecomputeUnaryNode, _LinearNode,
    _ReduceNode, _SemiAntiNode, _UnionNode,
)


def _shard_col(key: Sequence[str], n: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in key]), F.lit(n))


def _validate_shardable(graph: DifferentialGraph,
                        key: Sequence[str]) -> None:
    """Reject any operator whose state could span shards.  Name-based:
    the shard key columns must survive (unrenamed) into every stateful
    operator's key set — rename them and the proof breaks, so the
    build fails loudly rather than silently mis-sharding."""
    ks = set(key)
    for node in graph._nodes:
        if isinstance(node, (SourceNode, _LinearNode, _UnionNode)):
            continue
        if isinstance(node, _JoinNode):
            have = set(node.on)
        elif isinstance(node, _SemiAntiNode):
            have = set(node._lkeys) & set(node._rkeys)
        elif isinstance(node, _ReduceNode):
            have = set(node.keys)
        elif isinstance(node, _DistinctNode):
            # distinct is per-row: identical rows agree on the shard
            # key whenever the key columns are part of the row — the
            # row schema only exists at the first advance, so this is
            # re-checked there (see ShardedDifferential.step)
            continue
        elif isinstance(node, _AsofNowNode):
            have = set(node._lk) & set(node._rk)
        elif isinstance(node, _KeyedRecomputeNode):
            have = set(node._lkeys) & set(node._rkeys)
        elif isinstance(node, _KeyedRecomputeUnaryNode):
            have = set(node._keys)
        else:
            raise TypeError(
                f"{type(node).__name__} cannot be key-space sharded: "
                "its state (watermarks, iteration, theta predicates) "
                "is not partitionable by a key — run it unsharded or "
                "behind a per-shard key instance")
        if not ks <= have:
            raise ValueError(
                f"{type(node).__name__} keys {sorted(have)} do not "
                f"cover the shard key {sorted(ks)}: a group/match "
                "could span shards; key the operator on (a superset "
                "of) the shard key")


class ShardedDifferential:
    """N disjoint differential graphs over a hash-partitioned key
    space.

    >>> sh = ShardedDifferential(
    ...     spark, build_fn, shards=4, key=["user"],
    ...     state_dir="/state/pipeline")       # or s3a://bucket/...
    >>> out = sh.step(orders=delta_df)         # unioned changelog
    >>> sh.commit()                            # all shards, own metas

    `build_fn(graph)` declares the pipeline on ONE graph (sources via
    `graph.source`) and returns the output node; it runs once per
    shard, so all shards share one topology — exactly the contract a
    multi-process deployment needs for deterministic restore."""

    def __init__(self, spark: SparkSession,
                 build_fn: Callable[[DifferentialGraph], DiffNode],
                 *, shards: int, key: Sequence[str],
                 state_dir: str | None = None,
                 checkpoint_every: int = 8):
        if shards < 1:
            raise ValueError("shards must be >= 1")
        self.spark = spark
        self.n = shards
        self.key = list(key)
        self._graphs: list[DifferentialGraph] = []
        self._outs: list[DiffNode] = []
        for i in range(shards):
            sd = (f"{state_dir.rstrip('/')}/shard_{i:03d}"
                  if state_dir is not None else None)
            g = DifferentialGraph(spark, state_dir=sd,
                                  checkpoint_every=checkpoint_every)
            out = build_fn(g)
            _validate_shardable(g, self.key)
            for name, src in g._sources.items():
                missing = [c for c in self.key
                           if c not in src._template.columns]
                if missing:
                    raise ValueError(
                        f"source {name!r} lacks shard key column(s) "
                        f"{missing}: every fed delta must carry the "
                        "shard key so rows route to their owner")
            self._graphs.append(g)
            self._outs.append(out)
        self._distinct_checked = False

    @property
    def t(self) -> int:
        return self._graphs[0]._t

    def step(self, *, time: int | None = None,
             **deltas: DataFrame) -> DataFrame:
        """Route each fed delta to its owning shard (one hash pass per
        source, cut once so N shard filters rescan cheap stable bytes),
        advance every shard to the same logical time, and return the
        UNION of the shards' output deltas — byte-compatible with the
        unsharded graph's changelog."""
        from .resident import LocalRows, local_rows_to_df
        deltas = {
            name: (local_rows_to_df(
                self.spark, lr,
                self._graphs[0]._sources[name]._template.schema)
                if (lr := LocalRows.coerce(df)) is not None else df)
            for name, df in deltas.items()}
        tagged = {
            name: df.withColumn("__pw_shard",
                                _shard_col(self.key, self.n))
                    .localCheckpoint(eager=True)
            for name, df in deltas.items()}
        outs = []
        for i, (g, o) in enumerate(zip(self._graphs, self._outs)):
            part = {name: df.filter(F.col("__pw_shard") == i)
                        .drop("__pw_shard")
                    for name, df in tagged.items()}
            (d,) = g.step(o, time=time, **part)
            outs.append(d.localCheckpoint(eager=True))
        if not self._distinct_checked:
            # distinct row schemas exist only after the first advance:
            # a distinct whose rows dropped the shard key would emit a
            # per-shard presence row for the "same" value — fail loudly
            # before any result is trusted
            self._distinct_checked = True
            ks = set(self.key)
            for node in self._graphs[0]._nodes:
                if isinstance(node, _DistinctNode) \
                        and node._state is not None:
                    cols = {c for c in node._state._cols
                            if c != "_pw_diff"}
                    if not ks <= cols:
                        raise ValueError(
                            f"distinct() rows {sorted(cols)} dropped "
                            f"the shard key {sorted(ks)}: identical "
                            "rows could live in several shards")
        acc = outs[0]
        for d in outs[1:]:
            acc = acc.unionByName(d)
        return acc

    def commit(self) -> None:
        """Commit every shard.  Shards commit independently (their
        state spaces are disjoint); on restore each shard resumes from
        ITS committed clock — in a multi-process deployment a straggler
        shard simply replays its own tail, touching no other shard."""
        for g in self._graphs:
            g.commit()

    def restore_session_confs(self) -> None:
        self._graphs[0].restore_session_confs()

    @staticmethod
    def integrate(changelog: DataFrame) -> DataFrame:
        return DifferentialGraph.integrate(changelog)
