"""Generic incremental `iterate` over the differential engine.

The reference runs arbitrary `pw.iterate` fixed points *inside* the
dataflow (`python/pathway/internals/common.py:39-91` builds an iterate
scope; engine `src/engine/graph.rs:931` — differential dataflow's
`iterate` with product timestamps `(outer time, iteration)`), so any
user-written loop body updates incrementally when its inputs change.

Spark translation — the **level cascade**: the inner (iteration)
timestamp is realized as a persistent *iteration trace*.  Level `i` is
an independent incremental instance of the body — its own DiffNode
subgraph with its own operator state — computing

    V(i) = body(V(i-1), I)

where `V(i-1)` arrives as level `i-1`'s consolidated output delta and
the loop-invariant inputs `I` are ingested at EVERY level (differential
iterate's `ingress`).  Because every operator in the engine is exactly
incremental, level `i`'s accumulated output always equals the batch
iterate's `i`-th iterate — for ARBITRARY bodies, monotone or not (this
is what seeded warm-start recomputation gets wrong: after a retraction,
min-style bodies are fixed points of stale answers; the cascade
re-derives every iterate from the seed, incrementally in outer time).

Per outer batch the cascade feeds each level the previous level's
delta, so cost is Σ_levels incremental-body(δ) — proportional to the
circulating deltas, not to the data.  Depth grows (a new level is
built and seeded with the full current value — the only full-width
work, amortized like DD's initial iteration) exactly when the deepest
two levels diverge; once `V(N) = V(N-1)` every deeper iterate is equal,
so the deepest level IS the fixed point.  With `iteration_limit=n` the
depth is capped at `n` and the output is the `n`-th iterate — the
reference's `iteration_limit` semantics, exactly.

Scale notes: loop-invariant inputs named in `arranged=` are held ONCE
in a shared arrangement that every level's direct join reuses (DD's
arrangement sharing — memory O(|I|) instead of O(depth·|I|); the owner
appends each batch's delta after all level pulls so consumers see
B_old).  Unarranged inputs and the per-level V-side state stay
per-instance: memory O(depth · |V|), per-batch cost O(depth · δ) —
the differential-dataflow iterate cost model.  Durable restore
persists the depth in the graph's node_meta and keys level stores by
(iterate-index, level) namespaces, so store directories align no
matter when depth grew.
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .differential import (DIFF, TIME, ArrangedInput, DiffNode, SourceNode,
                           _cc, _data_cols, consolidate)


def _ms_equal(a: DataFrame, b: DataFrame) -> bool:
    """Weighted-multiset equality in one action: union with negated
    weights, residual check.  Weight-aware, so both sides may be
    unconsolidated."""
    cols = _data_cols(a)
    tagged = a.select(*cols, F.col(DIFF)).unionByName(
        b.select(*cols, (-F.col(DIFF)).alias(DIFF)))
    return (tagged.groupBy(*cols).agg(F.sum(DIFF).alias("__s"))
                  .filter(F.col("__s") != 0).isEmpty())


class _IterateNode(DiffNode):
    """Fixed-point of `body(v, **inputs)` maintained incrementally.

    `body` must be a pure builder: called once per level with fresh
    source nodes, it returns the DiffNode for one application of the
    loop body.  The loop variable seeds from the `var` input stream
    (the reference iterates the tables passed to `pw.iterate`)."""

    _CKPT_OUT = True

    def __init__(self, graph, var: DiffNode,
                 inputs: Mapping[str, DiffNode],
                 body: Callable[..., DiffNode],
                 iteration_limit: int | None = None,
                 max_depth: int = 64,
                 arranged: tuple = (),
                 dense_delta_guard: float | None = None,
                 dense_guard_min_rows: int = 10_000):
        self._input_names = list(inputs)
        self._arranged = set(arranged)
        bad = self._arranged - set(self._input_names)
        if bad:
            raise KeyError(f"arranged= names not in inputs: {sorted(bad)}")
        super().__init__(graph, [var] + [inputs[k] for k in self._input_names])
        self._body = body
        self._limit = iteration_limit
        self._max_depth = (max_depth if iteration_limit is None
                           else min(max_depth, iteration_limit))
        self._nidx = graph._iter_count
        graph._iter_count += 1
        self._levels: list[dict] = []     # {vsrc, isrcs, out}
        self._istores = None              # accumulated loop-invariant inputs
        self._trace = None                # emitted output value (exact bytes)
        self._ensured = False
        # -- dense-delta cost guard (COVERAGE's cascade cost cliff) ----
        # The cascade's per-level work is proportional to the level's
        # circulating delta; on small-diameter graphs under dense
        # deltas that width approaches the fixed point's size EVERY
        # level, and level-by-level maintenance costs MORE than one
        # batch recompute.  With `dense_delta_guard=f`, any level delta
        # wider than max(dense_guard_min_rows, f x |fixed point|) trips
        # a STICKY switch: this batch still completes through the
        # cascade (level state stays coherent), every later batch
        # recomputes the fixed point from the accumulated inputs and
        # emits the exact-bytes diff against the output trace.  The
        # integrated output is identical either way; the decision is
        # logged once.  None = off (no per-level count jobs).
        self._guard = dense_delta_guard
        self._guard_min = dense_guard_min_rows
        self._dense = False
        self._fp_rows: int | None = None
        self._vstore = None               # accumulated var (recompute seed)

    # -- level machinery -------------------------------------------------

    def _meta_key(self) -> str:
        return f"it{self._nidx}_depth"

    def _build_level(self, v_tpl: DataFrame,
                     i_tpls: dict[str, DataFrame]) -> dict:
        lvl = len(self._levels) + 1
        ns = f"it{self._nidx}L{lvl}"
        with self.graph._store_namespace(ns):
            vsrc = SourceNode(self.graph, f"__{ns}_v", v_tpl)
            isrcs = {
                k: (ArrangedInput(self.graph, f"__{ns}_{k}", i_tpls[k],
                                  self._istores[k])
                    if k in self._arranged
                    else SourceNode(self.graph, f"__{ns}_{k}", i_tpls[k]))
                for k in self._input_names}
            out = self._body(vsrc, **isrcs)
        level = {"ns": ns, "vsrc": vsrc, "isrcs": isrcs, "out": out}
        self._levels.append(level)
        self.graph._node_meta[self._meta_key()] = len(self._levels)
        return level

    def _ensure(self, dv: DataFrame, dis: dict[str, DataFrame]) -> None:
        """First advance: create the input accumulators + output trace,
        and rebuild any levels a committed predecessor process had (the
        restored depth comes from node_meta; level stores then restore
        their committed state by namespace key on first pull)."""
        if self._ensured:
            return
        self._ensured = True
        ns = f"it{self._nidx}"
        with self.graph._store_namespace(ns):
            # accumulator/trace templates must NOT carry TIME: state
            # rows from different batches have to cancel by value
            self._istores = {
                k: self.graph._make_store(
                    dis[k].drop(TIME).filter(F.lit(False)))
                for k in self._input_names}
            self._trace = None   # created when the first level exists
            self._v_tpl = dv.drop(TIME).filter(F.lit(False))
            if self._guard is not None:
                # recompute needs the variable's FULL value — only
                # accumulated when the guard may switch modes
                self._vstore = self.graph._make_store(self._v_tpl)
        self._dense = bool(self.graph._node_meta.get(
            f"it{self._nidx}_dense", 0))
        if self._dense and self._guard is None:
            # the predecessor process committed in dense-recompute mode
            # (its guard tripped); a rebuild that omits the guard has no
            # _vstore to recompute from — continuing would crash later
            # in _advance_dense or silently seed from an empty variable
            raise RuntimeError(
                "restored iterate node was committed in dense-recompute "
                "mode but this build passes no dense_delta_guard=; "
                "rebuild the graph with the same guard so the recompute "
                "path has its accumulated variable state")
        depth = self.graph._node_meta.get(self._meta_key(), 0)
        i_tpls = {k: dis[k].drop(TIME).filter(F.lit(False))
                  for k in self._input_names}
        for _ in range(depth):
            self._build_level(self._v_tpl, i_tpls)
        if depth and self._trace is None:
            self._make_trace()

    def _make_trace(self) -> None:
        # the body output schema equals the loop-variable schema (the
        # output feeds back as the next level's variable), so the trace
        # template is the variable template + DIFF
        tpl = self._v_tpl.withColumn(DIFF, F.lit(1).cast("long"))
        with self.graph._store_namespace(f"it{self._nidx}"):
            self._trace = self.graph._make_store(tpl)

    def _pull(self, level: dict, t: int) -> DataFrame:
        """Advance one level under its store namespace (its body's
        operators create their state stores on first pull)."""
        with self.graph._store_namespace(level["ns"]):
            d = level["out"].delta(t)
        return consolidate(d).withColumn(TIME, F.lit(t)) \
            .localCheckpoint(eager=False)

    # -- evaluation ------------------------------------------------------

    def _advance(self, t: int) -> DataFrame:
        g = self.graph
        var, ins = self.inputs[0], dict(zip(self._input_names,
                                            self.inputs[1:]))
        dv = var.delta(t)
        dis = {k: n.delta(t) for k, n in ins.items()}
        self._ensure(dv, dis)
        if self._vstore is not None and not var._empty_at(t):
            self._vstore.update(dv, wide=g._wide_batch)
        if self._dense:
            return self._advance_dense(t, var, ins)

        # non-arranged accumulators update FIRST so a level built this
        # batch seeds from a value that includes this batch's delta;
        # ARRANGED stores update LAST (after every consumer pulled) so
        # the shared arrangement still shows B_old during the cascade
        fed_i = {}
        for k, n in ins.items():
            if not n._empty_at(t):
                if k not in self._arranged:
                    self._istores[k].update(dis[k], wide=g._wide_batch)
                fed_i[k] = dis[k]

        def finish(out: DataFrame) -> DataFrame:
            for k in self._arranged:
                if k in fed_i:
                    self._istores[k].update(fed_i[k], wide=g._wide_batch)
            return out

        # cascade through the existing levels
        d_prev = consolidate(dv).withColumn(TIME, F.lit(t)) \
            .localCheckpoint(eager=False) if not var._empty_at(t) else None
        deltas = [d_prev]            # deltas[i] = δV(i); index 0 = seed
        for level in self._levels:
            if d_prev is not None:
                level["vsrc"]._feed(d_prev.drop(TIME), t)
            for k, d in fed_i.items():
                level["isrcs"][k]._feed(d.drop(TIME), t)
            d_prev = self._pull(level, t)
            deltas.append(d_prev)
            if self._guard is not None and not self._dense:
                width = d_prev.count()
                cap = max(self._guard_min,
                          int(self._guard * (self._fp_rows or 0))
                          if self._fp_rows else self._guard_min)
                if width > cap:
                    # sticky: finish THIS batch through the cascade so
                    # level state stays coherent, recompute from the
                    # next batch on
                    import logging
                    logging.getLogger(__name__).warning(
                        "iterate dense-delta guard tripped: level delta "
                        "width %d > %d (%.2f x fixed-point %s rows); "
                        "switching to per-batch recompute",
                        width, cap, self._guard, self._fp_rows)
                    self._dense = True
                    self.graph._node_meta[f"it{self._nidx}_dense"] = 1

        depth0 = len(self._levels)
        if self._limit is not None and depth0 >= self._limit:
            converged = True          # capped: output IS the n-th iterate
        elif depth0 == 0:
            converged = False         # body never applied yet
        else:
            converged = _ms_equal(deltas[-1], deltas[-2]
                                  if deltas[-2] is not None
                                  else deltas[-1].filter(F.lit(False)))

        if converged:
            out = deltas[-1] if deltas[-1] is not None else \
                self._v_tpl.withColumn(DIFF, F.lit(1).cast("long")) \
                           .withColumn(TIME, F.lit(t))
            if self._trace is not None:
                self._trace.update(out.drop(TIME), wide=g._wide_batch)
            return finish(out)

        # -- depth growth: full-width seeding of new levels ------------
        # rare (initial convergence, or the fixed point deepened);
        # restore full session confs so the wide seeds keep AQE + real
        # shuffle parallelism, and skip broadcast hints for the batch
        if g._tune_steady:
            g.restore_session_confs()
        g._batch_wide = True
        if depth0 == 0:
            cur_full = deltas[0]      # first batch: V(0) = δv alone
            if cur_full is None:
                cur_full = self._v_tpl.withColumn(
                    DIFF, F.lit(1).cast("long")).withColumn(TIME, F.lit(t))
        else:
            base = self._trace.get()
            cur_full = consolidate(
                base.select(*_data_cols(base), DIFF).unionByName(
                    deltas[-1].select(*_data_cols(base), DIFF))) \
                .localCheckpoint(eager=False)
        i_tpls = {k: dis[k].filter(F.lit(False))
                  for k in self._input_names}
        # non-arranged inputs seed new levels with their FULL value;
        # arranged inputs only get this batch's delta — the shared
        # arrangement already holds the backlog (B_old), so the new
        # level's join sees B_old + delta without re-ingesting I
        i_fulls = {k: consolidate(self._istores[k].get())
                   .localCheckpoint(eager=False)
                   for k in self._input_names if k not in self._arranged}
        while True:
            if len(self._levels) >= self._max_depth:
                raise RuntimeError(
                    f"iterate did not converge within {self._max_depth} "
                    f"levels; pass iteration_limit= or raise max_depth=")
            level = self._build_level(self._v_tpl, i_tpls)
            if self._trace is None:
                self._make_trace()
            level["vsrc"]._feed(cur_full.drop(TIME), t)
            for k in self._input_names:
                if k in self._arranged:
                    if k in fed_i:
                        level["isrcs"][k]._feed(fed_i[k].drop(TIME)
                                                if TIME in fed_i[k].columns
                                                else fed_i[k], t)
                else:
                    level["isrcs"][k]._feed(i_fulls[k].drop(TIME), t)
            new_full = self._pull(level, t)
            if _ms_equal(new_full, cur_full):
                break
            cur_full = new_full
            if (self._limit is not None
                    and len(self._levels) >= self._limit):
                break
        if self._guard is not None:
            self._fp_rows = cur_full.count()

        # emitted delta = exact-bytes diff of the new fixed point vs the
        # previously emitted value (float-safe cancellation, the same
        # output-trace rule _ReduceNode uses)
        trace = self._trace.get()
        old = trace.select(*_data_cols(trace),
                           (-F.col(DIFF)).alias(DIFF))
        out = consolidate(
            old.unionByName(cur_full.select(*old.columns))) \
            .withColumn(TIME, F.lit(t)).localCheckpoint(eager=False)
        self._trace.update(out.drop(TIME), wide=True)
        return finish(out)

    # -- dense mode: per-batch recompute against the output trace -----
    def _advance_dense(self, t: int, var, ins: dict) -> DataFrame:
        """Once the guard trips, each batch recomputes the fixed point
        from the ACCUMULATED inputs on a scratch graph (one wide batch
        through a fresh _IterateNode — the same machinery the seeding
        path uses) and emits the exact-bytes diff against this node's
        output trace.  Integrated output is identical to the cascade's;
        per-batch cost is one batch recompute, which on dense-delta /
        small-diameter graphs beats output-sized per-level work."""
        from .differential import DifferentialGraph

        g = self.graph
        for k, n in ins.items():
            if not n._empty_at(t):
                self._istores[k].update(n.delta(t), wide=g._wide_batch)
        v_full = consolidate(self._vstore.get()) \
            .localCheckpoint(eager=False)
        i_fulls = {k: consolidate(st.get()).localCheckpoint(eager=False)
                   for k, st in self._istores.items()}
        scratch = DifferentialGraph(g.spark, tune_steady_confs=False)
        vsrc = scratch.source("__v", self._v_tpl)
        isrcs = {k: scratch.source(f"__i_{k}",
                                   i_fulls[k].filter(F.lit(False)))
                 for k in self._input_names}
        it = _IterateNode(scratch, vsrc, isrcs, self._body,
                          iteration_limit=self._limit,
                          max_depth=self._max_depth)
        feeds = {"__v": v_full}
        feeds.update({f"__i_{k}": i_fulls[k] for k in self._input_names})
        (res,) = scratch.step(it, **feeds)
        new_full = consolidate(res.drop(TIME)).localCheckpoint(eager=False)
        trace = self._trace.get()
        old = trace.select(*_data_cols(trace), (-_cc(DIFF)).alias(DIFF))
        out = consolidate(old.unionByName(new_full.select(*old.columns))) \
            .withColumn(TIME, F.lit(t)).localCheckpoint(eager=False)
        self._trace.update(out.drop(TIME), wide=True)
        return out


class _IterateResidentKernel:
    """Driver-resident steady ticks for the level cascade (r9 — the
    last core operator class on the distributed per-tick floor): each
    level's body advances through the resident engine's OWN kernels
    over mirrored level state, the convergence check is a Python
    multiset compare (no count jobs), and accumulators/trace apply as
    mirror deltas.  Depth GROWTH (rare, amortized — initial
    convergence or a deepened fixed point) runs the classic
    distributed seeding path inline: a new level is a fresh subgraph
    with no attached mirrors, so the two engines compose without
    tripping the store-update guard; the new level's stores are
    mirrored from the next tick on.  Arranged inputs (shared
    arrangements are distributed state by contract) and
    dense-recompute mode stay distributed: ensure() refuses and the
    graph falls back for that tick."""

    def __init__(self, eng, node: "_IterateNode"):
        self.eng = eng
        self.node = node
        self.tr = None
        self.vst = None
        self.ist: dict = {}

    # -- helpers ----------------------------------------------------------

    @staticmethod
    def _walk(out) -> list:
        order, seen = [], set()

        def visit(n):
            if id(n) in seen:
                return
            seen.add(id(n))
            for i in n.inputs:
                visit(i)
            order.append(n)
        visit(out)
        return order

    @staticmethod
    def _consol(d, t: int):
        """Consolidated copy of an RDelta (weights folded by data
        tuple), stamped t — the resident analog of `_pull`'s
        consolidate().  Returns None for an all-cancelled delta? No —
        keeps the (possibly empty) RDelta; emptiness is data."""
        from .resident import RDelta
        dp, tp = d.pos(DIFF), d.pos(TIME)
        di = [i for i in range(len(d.cols)) if i not in (dp, tp)]
        acc: dict = {}
        for r in d.rows:
            k = tuple(r[i] for i in di)
            nw = acc.get(k, 0) + r[dp]
            if nw == 0:
                acc.pop(k, None)
            else:
                acc[k] = nw
        cols = [d.cols[i] for i in di] + [DIFF, TIME]
        return RDelta(cols, [k + (w, t) for k, w in acc.items()])

    @staticmethod
    def _net(d) -> dict:
        if d is None:
            return {}
        dp, tp = d.pos(DIFF), d.pos(TIME)
        di = [i for i in range(len(d.cols)) if i not in (dp, tp)]
        out: dict = {}
        for r in d.rows:
            k = tuple(r[i] for i in di)
            nw = out.get(k, 0) + r[dp]
            if nw == 0:
                out.pop(k, None)
            else:
                out[k] = nw
        return out

    def _store_pairs(self, d, mirror) -> list:
        """RDelta rows aligned to a mirror's store layout (data cols +
        DIFF) as (data, weight) pairs."""
        s_cols = [f.name for f in mirror.schema.fields[:-1]]
        idx = [d.cols.index(c) for c in s_cols]
        dp = d.pos(DIFF)
        return [(tuple(r[i] for i in idx), r[dp]) for r in d.rows]

    def _feed_src(self, src, d, t: int) -> None:
        """Memo-feed one level source with an RDelta aligned to its
        template layout (the engine's source delta contract)."""
        from . import differential as D
        from .resident import RDelta
        tpl_cols = D._data_cols(src._template)
        cols = tpl_cols + [DIFF, TIME]
        if d is None or not d.rows:
            self.eng._memo[id(src)] = (t, RDelta(cols, []))
            return
        idx = [d.cols.index(c) for c in tpl_cols]
        dp, tp = d.pos(DIFF), d.pos(TIME)
        rows = [tuple(r[i] for i in idx) + (r[dp], r[tp]) for r in d.rows]
        src._ins_only = False      # level deltas carry retractions
        self.eng._memo[id(src)] = (t, RDelta(cols, rows))

    # -- protocol ----------------------------------------------------------

    def ensure(self) -> bool:
        from .differential import SourceNode
        eng, node = self.eng, self.node
        if not node._ensured or node._dense or node._arranged:
            return False
        for k, st in (node._istores or {}).items():
            m = eng._mirror_for(st, None)
            if m is None:
                return False
            self.ist[k] = m
        if node._trace is not None:
            self.tr = eng._mirror_for(node._trace, None)
            if self.tr is None:
                return False
        if node._vstore is not None:
            self.vst = eng._mirror_for(node._vstore, None)
            if self.vst is None:
                return False
        for level in node._levels:
            for n in self._walk(level["out"]):
                if isinstance(n, SourceNode):
                    continue
                if not eng._node_capable(n):
                    return False
                if n._empty_tpl is None:
                    return False
                if not eng._ensure_kernel(n):
                    return False
        return True

    def advance(self, t: int, dv, *dis_list):
        from .resident import RDelta
        eng, node = self.eng, self.node
        g = node.graph
        names = node._input_names
        dis = dict(zip(names, dis_list))
        if self.vst is not None and dv.rows:
            self.vst.apply(self._store_pairs(dv, self.vst))
        for k in names:
            if dis[k].rows:
                self.ist[k].apply(self._store_pairs(dis[k], self.ist[k]))

        d_prev = self._consol(dv, t) if dv.rows else None
        deltas = [d_prev]
        for level in node._levels:
            self._feed_src(level["vsrc"], d_prev, t)
            for k in names:
                self._feed_src(level["isrcs"][k], dis[k], t)
            d = self._consol(eng._delta(level["out"], t), t)
            deltas.append(d)
            if node._guard is not None and not node._dense:
                cap = max(node._guard_min,
                          int(node._guard * (node._fp_rows or 0))
                          if node._fp_rows else node._guard_min)
                if len(d.rows) > cap:
                    import logging
                    logging.getLogger(__name__).warning(
                        "iterate dense-delta guard tripped (resident): "
                        "level delta width %d > %d; switching to "
                        "per-batch recompute", len(d.rows), cap)
                    node._dense = True
                    g._node_meta[f"it{node._nidx}_dense"] = 1
            d_prev = d

        depth0 = len(node._levels)
        if node._limit is not None and depth0 >= node._limit:
            converged = True
        elif depth0 == 0:
            converged = False
        else:
            converged = self._net(deltas[-1]) == self._net(deltas[-2])

        out_cols = ([c for c in node._v_tpl.columns if c != DIFF]
                    + [DIFF, TIME])
        if converged:
            out = deltas[-1] if deltas[-1] is not None \
                else RDelta(out_cols, [])
            if self.tr is not None and out.rows:
                self.tr.apply(self._store_pairs(out, self.tr))
            return out
        return self._grow(t, deltas, dis)

    # -- depth growth: classic distributed seeding, mirror-aware ---------
    def _grow(self, t: int, deltas, dis):
        from .resident import RDelta, collect_rows, rows_to_df
        eng, node = self.eng, self.node
        g = node.graph

        def full_df(mapping: dict, schema):
            rows = [k + (w,) for k, w in mapping.items()]
            return rows_to_df(eng.spark, rows, schema)

        # current full value = trace ⊕ last level delta (all in mirrors)
        cur = dict(self.tr.data) if self.tr is not None else {}
        for k, w in self._net(deltas[-1]).items():
            nw = cur.get(k, 0) + w
            if nw == 0:
                cur.pop(k, None)
            else:
                cur[k] = nw
        if g._tune_steady:
            g.restore_session_confs()
        g._batch_wide = True
        v_schema = node._v_tpl.schema     # data cols + DIFF
        i_tpls = {k: rows_to_df(eng.spark, [], self.ist[k].schema)
                  for k in node._input_names}
        i_fulls = {k: full_df(dict(self.ist[k].data), self.ist[k].schema)
                   for k in node._input_names}
        while True:
            if len(node._levels) >= node._max_depth:
                raise RuntimeError(
                    f"iterate did not converge within {node._max_depth} "
                    f"levels; pass iteration_limit= or raise max_depth=")
            level = node._build_level(node._v_tpl, i_tpls)
            if node._trace is None:
                node._make_trace()
            level["vsrc"]._feed(full_df(cur, v_schema), t)
            for k in node._input_names:
                level["isrcs"][k]._feed(i_fulls[k], t)
            new_df = node._pull(level, t)
            new = {}
            dp = new_df.columns.index(DIFF)
            di = [i for i, c in enumerate(new_df.columns)
                  if c not in (DIFF, TIME)]
            for r in collect_rows(new_df):
                k = tuple(r[i] for i in di)
                nw = new.get(k, 0) + r[dp]
                if nw == 0:
                    new.pop(k, None)
                else:
                    new[k] = nw
            if new == cur:
                break
            cur = new
            if (node._limit is not None
                    and len(node._levels) >= node._limit):
                break
        g._batch_wide = False
        if g._tune_steady:
            g._apply_steady_confs()
        if node._guard is not None:
            node._fp_rows = len(cur)

        # exact-bytes diff vs the emitted trace, applied to the MIRROR
        # (the trace store has a mirror attached — store.update would
        # trip the guard; the mirror syncs back on detach/commit)
        if self.tr is None:
            self.tr = eng._mirror_for(node._trace, None)
        old = self.tr.data
        diff: dict = {}
        for k, w in old.items():
            diff[k] = -w
        for k, w in cur.items():
            nw = diff.get(k, 0) + w
            if nw == 0:
                diff.pop(k, None)
            else:
                diff[k] = nw
        self.tr.apply(list(diff.items()))
        out_cols = ([c for c in node._v_tpl.columns if c != DIFF]
                    + [DIFF, TIME])
        return RDelta(out_cols, [k + (w, t) for k, w in diff.items()])


def _iterate_res_kernel(self, eng):
    return _IterateResidentKernel(eng, self)


_IterateNode._res_kernel = _iterate_res_kernel


def iterate_differential(body: Callable[..., DiffNode], var: DiffNode,
                         inputs: Mapping[str, DiffNode] | None = None,
                         *, iteration_limit: int | None = None,
                         max_depth: int = 64,
                         arranged: tuple = (),
                         dense_delta_guard: float | None = None,
                         dense_guard_min_rows: int = 10_000) -> DiffNode:
    """Incrementally-maintained `pw.iterate` (reference
    `internals/common.py:39-91`, engine `graph.rs:931`).

    `body(v, **inputs) -> DiffNode` builds ONE application of the loop
    body from the given source-like nodes using the standard DiffNode
    builder API; `var` is the iterated stream (its accumulated value
    seeds the loop), `inputs` are loop-invariant streams visible to
    every iteration.  Returns a node whose delta stream maintains the
    fixed point under arbitrary insertions AND retractions of any
    input — prefix-equal to recomputing `iterate` from scratch.

    `arranged` names inputs whose state should be held ONCE and shared
    by every level (DD arrangement sharing: memory O(|I|) instead of
    O(depth·|I|)).  Contract: an arranged input may only be JOINED
    directly inside the body (enforced at build time) — its levels are
    fed deltas only, so any other operator would silently miss the
    backlog a new level needs.

    `dense_delta_guard=f` arms the measured cost guard: a cascade
    level whose delta is wider than max(dense_guard_min_rows,
    f x |fixed point|) switches the node (stickily, logged, durable
    via node_meta) to per-batch recompute — same integrated output,
    bounded per-batch cost on dense-delta/small-diameter graphs where
    circulating deltas approach the fixed point's size every level.
    None (default) adds no per-level count jobs."""
    return _IterateNode(var.graph, var, dict(inputs or {}), body,
                        iteration_limit=iteration_limit,
                        max_depth=max_depth, arranged=tuple(arranged),
                        dense_delta_guard=dense_delta_guard,
                        dense_guard_min_rows=dense_guard_min_rows)
