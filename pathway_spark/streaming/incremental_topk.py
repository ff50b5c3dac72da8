"""Incrementally-maintained top-k similarity join — a live KNN index.

The streaming face of `operators/similarity.py:brute_force_topk` and
the reference's `KNNIndex` / `DataIndex` retrieval surface
(`python/pathway/stdlib/indexing/nearest_neighbors.py`): a query
stream and a document stream both change over time, and every query's
exact top-k neighbor set is kept current — new documents push weaker
neighbors out, retracted documents pull replacements in, all as
-old/+new retraction deltas.

Contrast with `DiffTable.asof_now_join` (freeze-at-arrival, answers
never revised): this is the LIVE mode — the reference's plain
`index.query` semantics, where answers update as the corpus changes.

The maintenance rule is delta-proportional, not recompute-everything:

- a QUERY delta touches only its own query ids;
- a DOC INSERT touches only queries it would actually enter — those
  with fewer than k results or whose k-th score it meets
  (one |Q|-row score pass against the (small) insert delta decides);
- a DOC RETRACTION touches only queries currently HOLDING that doc in
  their top-k (one output-trace probe by doc id decides).

Touched queries then re-rank against the full doc state; everything
else emits nothing.  Steady-state cost per batch:
O(|dq|·|D| + |Q|·|dd| + |touched|·|D|) — in a mature corpus most
inserts beat nobody's k-th score, so |touched| ≈ 0 and the batch is
two delta-sized scoring passes.  At 100 TB corpus scale the re-rank
scan parallelizes over doc partitions with the touched query slice
broadcast; compose with IVF/LSH blocking upstream when even that scan
must prune.

Float discipline: retractions come from the node's OUTPUT TRACE
(exact bytes), and scores are computed by the sequential array fold
(`zip_with`/`aggregate`), which is deterministic — so -old/+new pairs
cancel exactly and re-ranks of unchanged queries net to zero rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..operators.dedup import _dot, _norm
from .differential import (
    DIFF,
    TIME,
    DiffNode,
    _data_cols,
    _emit_traced,
    _trace_old,
    consolidate,
)


class _TopKJoinNode(DiffNode):
    """Live top-k join.  queries delta schema: (query_id, …payload);
    docs delta schema: (neighbor_id, …payload) — payload column names
    must be disjoint.  `score_builder(crossed_df) -> Column` scores a
    (query, doc) pair from the crossed frame's columns."""

    _CKPT_OUT = True

    def __init__(self, graph, queries: DiffNode, docs: DiffNode,
                 score_builder, k: int):
        super().__init__(graph, [queries, docs])
        self._score = score_builder
        self._k = k
        self._sq = None     # query state (set semantics, keyed query_id)
        self._sd = None     # doc state  (set semantics, keyed neighbor_id)
        self._out_state = None   # output trace, keyed query_id

    def _delta_bounded(self) -> bool:
        # a doc that beats every query's k-th score touches ALL queries
        # in one batch — the output delta is bounded by |Q|·k, not by
        # the micro-batch size, so downstream must not blind-broadcast
        return False

    def _res_kernel(self, eng):
        """Resident-engine hook (resident.py): steady batches decide
        the touched set in Python and run ONE re-rank job against a
        cached corpus LocalRelation — see `_TopKKernel`."""
        return _TopKKernel(eng, self)

    def _small(self, df, src=None):
        # _trace_old probes the output trace with the touched-id frame
        # through this hook; honor the measured per-batch gate so a
        # giant touched set is never blind-broadcast (see _advance)
        if not getattr(self, "_bc_ok", True):
            return df
        return super()._small(df, src)

    def _present(self, ms: DataFrame) -> DataFrame:
        """Multiset → present-row set (ids are unique per contract, so
        weight clamps to presence, mirroring the batch Table input)."""
        return consolidate(ms).filter(F.col(DIFF) > 0).drop(DIFF)

    def _advance(self, t: int) -> DataFrame:
        self._bc_ok = True      # per-batch; re-decided after tk count
        dq = self.inputs[0].delta(t)
        dd = self.inputs[1].delta(t)
        if self._sq is None:
            self._sq = self.graph._make_store(dq.drop(TIME),
                                              key_cols=["query_id"])
            self._sd = self.graph._make_store(dd.drop(TIME),
                                              key_cols=["neighbor_id"])
        dd_net = consolidate(dd.drop(TIME))
        dd_net = dd_net.localCheckpoint(eager=False)

        touched = [dq.select("query_id")]
        if self._out_state is not None:
            trace = consolidate(self._out_state.get())
            trace = trace.localCheckpoint(eager=False)
            # doc retractions → queries holding that doc right now
            dd_del = dd_net.filter(F.col(DIFF) < 0) \
                           .select("neighbor_id").distinct()
            touched.append(
                trace.join(self._small(dd_del), on=["neighbor_id"],
                           how="left_semi").select("query_id"))
            # doc inserts → queries they would enter: score every live
            # query against the (small) insert delta, compare with the
            # query's current k-th score / result count from the trace
            dd_ins = dd_net.filter(F.col(DIFF) > 0).drop(DIFF)
            stats = trace.groupBy("query_id").agg(
                F.min("score").alias("__kth"),
                F.sum(DIFF).alias("__cnt"))
            q_live = self._present(self._sq.get())
            crossed = q_live.crossJoin(self._small(dd_ins))
            beaten = (crossed
                      .withColumn("__s", self._score(crossed))
                      .select("query_id", "__s")
                      .join(stats, on=["query_id"], how="left")
                      .filter(F.col("__kth").isNull()
                              | (F.col("__cnt") < self._k)
                              | (F.col("__s") >= F.col("__kth")))
                      .select("query_id"))
            touched.append(beaten)
        tk = touched[0]
        for p in touched[1:]:
            tk = tk.unionByName(p)
        # the touched set is NOT micro-batch-bounded (a doc insert that
        # beats every k-th score touches all |Q| queries — the reason
        # _delta_bounded() is False), so the broadcast fast path is
        # gated on a MEASURED count, never the blind delta hint:
        # materialize tk (consumed 3× anyway), count it, and hint only
        # below thresholds — id frame generously, the payload slice
        # (embedding vectors, ~KBs/row) conservatively
        tk = tk.distinct().localCheckpoint(eager=True)
        n_tk = tk.count()
        self._bc_ok = n_tk <= 1_000_000
        bc_ids = (F.broadcast if (not self.graph._wide_batch
                                  and n_tk <= 1_000_000) else (lambda x: x))
        bc_payload = (F.broadcast if (not self.graph._wide_batch
                                      and n_tk <= 50_000) else (lambda x: x))

        # re-rank the touched queries against the full current corpus
        q_all = self._sq.get(probe=tk, on=["query_id"]) \
                        .unionByName(dq.drop(TIME))
        q_slice = self._present(
            q_all.join(bc_ids(tk), on=["query_id"], how="left_semi"))
        d_all = self._present(
            self._sd.get().unionByName(dd.drop(TIME)))
        pairs = d_all.crossJoin(bc_payload(q_slice))
        scored = pairs.withColumn("score", self._score(pairs))
        w = W.partitionBy("query_id").orderBy(F.col("score").desc(),
                                              F.col("neighbor_id"))
        new = (scored.withColumn("rank", F.row_number().over(w))
               .filter(F.col("rank") <= self._k)
               .select("query_id", "neighbor_id", "rank", "score")
               .withColumn(DIFF, F.lit(1).cast("long")))
        old = _trace_old(self, new, ["query_id"], tk,
                         lambda: new.limit(0))
        wide = self.graph._wide_batch
        self._sq.update(dq.drop(TIME), wide=wide,
                        positive=self.inputs[0]._insert_only())
        self._sd.update(dd.drop(TIME), wide=wide,
                        positive=self.inputs[1]._insert_only())
        return _emit_traced(self, old, new, t)


class _TopKKernel:
    """Resident evaluator for `_TopKJoinNode` (resident.py custom-
    kernel hook): query/doc/trace state in driver mirrors, the touched
    set decided in Python, and ONE Spark job per batch — the re-rank
    of the touched queries against a CACHED corpus LocalRelation
    (rebuilt only on doc churn).  Scores evaluate through the same
    Column expressions as the distributed path."""

    def __init__(self, eng, node):
        self.eng = eng
        self.node = node
        self.sq = self.sd = self.tr = None
        self._corpus_df = None        # cache; invalidated on doc churn

    def ensure(self) -> bool:
        n = self.node
        if n._sq is None or n._sd is None or n._out_state is None:
            return False
        if self.sq is None:
            from .resident import _KeyedMirror  # noqa: F401 (type)
            sq = self.eng._mirror_for(n._sq, ["query_id"])
            sd = self.eng._mirror_for(n._sd, ["neighbor_id"])
            tr = self.eng._mirror_for(n._out_state, ["query_id"])
            if None in (sq, sd, tr):
                return False
            self.sq, self.sd, self.tr = sq, sd, tr
        return True

    def _present_df(self, mirror, schema_fields):
        from .resident import rows_to_df
        from pyspark.sql import types as T
        rows = [d for d, w in mirror.data.items() if w > 0]
        return rows_to_df(self.eng.spark, rows,
                          T.StructType(list(schema_fields)))

    def advance(self, t: int, dq, dd):
        from .resident import RDelta, _JoinKernel, collect_rows, rows_to_df
        from pyspark.sql import types as T
        node, sq, sd, tr = self.node, self.sq, self.sd, self.tr
        q_cols = [f.name for f in sq.schema.fields[:-1]]
        d_cols = [f.name for f in sd.schema.fields[:-1]]
        dq_pairs = _JoinKernel._aligned(dq, q_cols)
        dd_pairs = _JoinKernel._aligned(dd, d_cols)
        qi = q_cols.index("query_id")
        di = d_cols.index("neighbor_id")
        tcols = [f.name for f in tr.schema.fields[:-1]]
        tqi, tni, tsi = (tcols.index("query_id"),
                         tcols.index("neighbor_id"), tcols.index("score"))

        touched = {p[qi] for p, _ in dq_pairs if p[qi] is not None}
        dd_net: dict = {}
        for data, w in dd_pairs:
            nw = dd_net.get(data, 0) + w
            if nw == 0:
                dd_net.pop(data, None)
            else:
                dd_net[data] = nw
        if dd_net:
            del_ids = {d[di] for d, w in dd_net.items() if w < 0}
            if del_ids:
                # queries currently holding a deleted doc
                for row, wt in tr.data.items():
                    if wt > 0 and row[tni] in del_ids:
                        touched.add(row[tqi])
            ins_rows = [d for d, w in dd_net.items() if w > 0]
            if ins_rows:
                # queries the inserts would enter: score LIVE queries
                # against the (small) insert delta in one job, gate on
                # each query's current k-th score / result count
                stats: dict = {}
                for row, wt in tr.data.items():
                    if wt > 0:
                        s = stats.get(row[tqi])
                        if s is None:
                            stats[row[tqi]] = [row[tsi], wt]
                        else:
                            s[0] = min(s[0], row[tsi])
                            s[1] += wt
                q_live = self._present_df(sq, sq.schema.fields[:-1])
                d_ins = rows_to_df(self.eng.spark, ins_rows,
                                   T.StructType(list(sd.schema.fields[:-1])))
                stats_df = rows_to_df(
                    self.eng.spark,
                    [(q, s[0], s[1]) for q, s in stats.items()],
                    T.StructType([sq.schema.fields[qi],
                                  T.StructField("__kth", T.DoubleType()),
                                  T.StructField("__cnt", T.LongType())]))
                crossed = q_live.crossJoin(d_ins)
                beaten = (crossed
                          .withColumn("__s", node._score(crossed))
                          .select("query_id", "__s")
                          .join(stats_df, on=["query_id"], how="left")
                          .filter(F.col("__kth").isNull()
                                  | (F.col("__cnt") < node._k)
                                  | (F.col("__s") >= F.col("__kth")))
                          .select("query_id").distinct())
                for r in collect_rows(beaten):
                    touched.add(r[0])

        # state advances, then the re-rank sees the post-delta corpus
        if dq.rows:
            sq.apply(dq_pairs)
        if dd.rows:
            sd.apply(dd_pairs)
            self._corpus_df = None

        out: dict = {}
        trace_delta: list = []
        for q in touched:
            for row, wt in tr.idx.get((q,), {}).items():
                nw = out.get(row, 0) - wt
                if nw == 0:
                    out.pop(row, None)
                else:
                    out[row] = nw
                trace_delta.append((row, -wt))
        if touched:
            if self._corpus_df is None:
                self._corpus_df = self._present_df(
                    sd, sd.schema.fields[:-1]).localCheckpoint(eager=False)
            q_rows = []
            for q in sorted(touched, key=repr):
                q_rows.extend(d for d, w in sq.idx.get((q,), {}).items()
                              if w > 0)
            if q_rows:
                qdf = rows_to_df(self.eng.spark, q_rows,
                                 T.StructType(list(sq.schema.fields[:-1])))
                pairs = self._corpus_df.crossJoin(F.broadcast(qdf))
                scored = pairs.withColumn("score", node._score(pairs))
                w = W.partitionBy("query_id").orderBy(
                    F.col("score").desc(), F.col("neighbor_id"))
                new = (scored.withColumn("rank", F.row_number().over(w))
                       .filter(F.col("rank") <= node._k)
                       .select(*tcols))
                for raw in collect_rows(new):
                    nw = out.get(raw, 0) + 1
                    if nw == 0:
                        out.pop(raw, None)
                    else:
                        out[raw] = nw
                    trace_delta.append((raw, 1))
        tr.apply(trace_delta)
        return RDelta(tcols + ["_pw_diff", "_pw_time"],
                      [row + (wt, t) for row, wt in out.items()])


def _score_expr(metric: str, qv: Column, dv: Column) -> Column:
    if metric == "cosine":
        return _dot(qv, dv) / (_norm(qv) * _norm(dv))
    if metric == "dot":
        return _dot(qv, dv)
    if metric == "l2":
        return -F.sqrt(F.aggregate(
            F.zip_with(qv, dv, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x))
    raise ValueError(f"unknown metric {metric!r}")


def incremental_knn_topk(queries: DiffNode, docs: DiffNode, *,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id", k: int = 3,
                         metric: str = "cosine") -> DiffNode:
    """Live exact-KNN index over streaming corpus + streaming queries.

    Deltas accumulate to `operators/similarity.py:brute_force_topk`
    (`self_exclude=False`) over the live corpus and query set:
    `(query_id, neighbor_id, rank, score)`, rank 1..k by score desc
    with neighbor-id tie-break.  `metric`: cosine | dot | l2."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("__qv"))
    d = docs.select(F.col(id_col).alias("neighbor_id"),
                    F.col(vec_col).cast("array<double>").alias("__dv"))

    def score(_df: DataFrame) -> Column:
        return _score_expr(metric, F.col("__qv"), F.col("__dv"))

    return _TopKJoinNode(queries.graph, q, d, score, k)


def incremental_topk_join(queries: DiffNode, docs: DiffNode,
                          score, *, k: int = 3) -> DiffNode:
    """Generic live top-k join: `score(crossed_df) -> Column` ranks
    every (query, doc) pair; the node maintains each query's k best
    docs under both streams' inserts and retractions.  The query side
    must carry `query_id`, the doc side `neighbor_id` (unique ids,
    Table contract)."""
    return _TopKJoinNode(queries.graph, queries, docs, score, k)
