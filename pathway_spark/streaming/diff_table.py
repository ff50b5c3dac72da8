"""Pathway-style Table syntax over the differential engine.

Lets a user write the reference's pipeline idiom —
``this``-expressions, ``pw.reducers.*``, ``groupby().reduce()`` —
against a live retraction stream (reference
`python/pathway/internals/table.py` API over
`src/engine/dataflow.rs` incremental operators):

>>> g = DifferentialTableGraph(spark)
>>> orders = g.input("orders", template_df)
>>> totals = (orders.filter(this.amount > 0)
...                 .groupby(this.user)
...                 .reduce(this.user, total=reducers.sum(this.amount)))
>>> g.run(totals.node, batches)        # -> full retraction changelog

The bridge compiles each expression with the existing
`pathway_spark.expressions` machinery (so the whole scalar namespace —
str.*/dt.*/num.*, if_else, JSON ops — works unchanged), but resolves
column references *by name* instead of binding to a concrete
DataFrame: the resulting Columns then apply to whatever delta frame
flows through the node at each micro-batch.

Reducer support is the weight-aware subset (sum/count/min/max/avg/
count_distinct/any/unique/argmin/argmax/earliest/latest); reducers
whose value depends on row multiplicity in a way order statistics
can't express (tuple, sorted_tuple, ndarray) raise with a pointer to
the batch path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..expressions import (
    BinaryOp,
    ColumnReference,
    ReducerExpression,
    RowContext,
    to_col,
)
from ..table import Table
from .differential import DIFF, TIME, DiffNode, DifferentialGraph, _data_cols


class _NameContext(RowContext):
    """Resolve refs to unbound `F.col(name)` so compiled Columns apply
    to the per-batch delta frame, not the (empty) template; keeps the
    template around for dtype-aware compilation (string +, int // ...)."""

    def __init__(self, frames):
        super().__init__(frames)

    def ref(self, ref: ColumnReference) -> Column:
        # validate the name resolves somewhere, then emit unbound
        super().ref(ref)
        return F.col(ref._name)


# reference reducer name -> weight-aware differential spec kind
_RED_MAP = {
    "sum": "sum", "sum_strict": "sum_strict",
    "count": "count", "min": "min", "max": "max",
    "avg": "avg", "count_distinct": "count_distinct", "any": "any",
    "unique": "unique", "argmin": "argmin", "argmax": "argmax",
    "earliest": "earliest", "latest": "latest",
    "sorted_tuple": "sorted_tuple",
}


class DiffTable:
    """A node in the differential graph, exposed through the reference's
    Table vocabulary. `.node` is the underlying `DiffNode` (feed it to
    `graph.run`/`graph.step`)."""

    def __init__(self, node: DiffNode, template: DataFrame):
        self.node = node
        self._template = template  # empty frame carrying the schema

    # -- schema plumbing -------------------------------------------------
    def _ctx(self) -> _NameContext:
        return _NameContext({"this": self._template})

    def _apply_template(self, fn) -> DataFrame:
        return fn(self._template)

    @property
    def column_names(self) -> list[str]:
        return _data_cols(self._template)

    # -- row ops ---------------------------------------------------------
    def select(self, *args, **kwargs) -> "DiffTable":
        ctx = self._ctx()
        for a in args:
            if not isinstance(a, ColumnReference):
                raise TypeError(
                    f"positional select args must be column references "
                    f"(got {type(a).__name__}); name computed expressions "
                    f"as keyword args")
        cols = [to_col(a, ctx).alias(a._name) for a in args]
        cols += [to_col(e, ctx).alias(n) for n, e in kwargs.items()]
        node = self.node.select(*cols)
        return DiffTable(node, self._template.select(
            *[c for c in cols]).limit(0))

    def with_columns(self, **kwargs) -> "DiffTable":
        ctx = self._ctx()
        named = {n: to_col(e, ctx) for n, e in kwargs.items()}
        node = self.node.with_columns(**named)
        tpl = self._template
        for n, c in named.items():
            tpl = tpl.withColumn(n, c)
        return DiffTable(node, tpl.limit(0))

    def filter(self, expr) -> "DiffTable":
        cond = to_col(expr, self._ctx())
        return DiffTable(self.node.filter(cond), self._template)

    def flatten(self, ref: ColumnReference) -> "DiffTable":
        name = ref._name
        node = self.node.flatten(name)
        tpl = self._template.withColumn(
            name, F.explode_outer(name)).limit(0)
        return DiffTable(node, tpl)

    def concat(self, other: "DiffTable") -> "DiffTable":
        return DiffTable(self.node.union(other.node), self._template)

    # -- joins -----------------------------------------------------------
    def join(self, other: "DiffTable", *on, how: str = "inner") -> "DiffTable":
        """`on`: equality conditions `left.a == right.b` (or bare
        `this.k` refs for same-named keys).  Right key columns are
        renamed to the left's names; remaining name collisions raise —
        rename before joining (the reference disambiguates via its
        JoinResult namespace, which has no meaning on raw deltas)."""
        keys: list[tuple[str, str]] = []
        for cond in on:
            if isinstance(cond, ColumnReference):
                keys.append((cond._name, cond._name))
            elif (isinstance(cond, BinaryOp) and cond._op == "=="
                    and isinstance(cond._lhs, ColumnReference)
                    and isinstance(cond._rhs, ColumnReference)):
                keys.append((cond._lhs._name, cond._rhs._name))
            else:
                raise TypeError(
                    "differential join conditions must be column equalities")
        lnames = [l for l, _ in keys]
        rnode, rtpl = other.node, other._template
        ren = {r: l for l, r in keys if l != r}
        if ren:
            rnode = rnode.select(
                *[F.col(c).alias(ren.get(c, c)) for c in _data_cols(rtpl)])
            rtpl = rtpl.withColumnsRenamed(ren)
        clash = (set(_data_cols(self._template)) &
                 set(_data_cols(rtpl))) - set(lnames)
        if clash:
            raise ValueError(
                f"column collision in differential join: {sorted(clash)}; "
                "rename before joining")
        node = self.node.join(rnode, on=lnames, how=how)
        rextra = [c for c in _data_cols(rtpl) if c not in lnames]
        tpl = self._template.join(rtpl.select(*lnames, *rextra),
                                  on=lnames, how=how).limit(0)
        return DiffTable(node, tpl)

    def interval_join(self, other: "DiffTable", self_time: ColumnReference,
                      other_time: ColumnReference, interval,
                      *on) -> "DiffTable":
        """Stream-stream interval join WITH retractions: matches rows
        where other_time − self_time ∈ [interval.lower, interval.upper]
        (reference `temporal.interval_join`); the bilinear delta rule is
        predicate-agnostic, so retracting either side retracts exactly
        its joined pairs.  `interval` is `pw.temporal.interval(lo, hi)`
        or any object with lower_bound/upper_bound; bounds are ints for
        numeric time columns, timedeltas for timestamps."""
        import datetime as _dt

        lo = getattr(interval, "lower_bound", None)
        hi = getattr(interval, "upper_bound", None)
        if lo is None:
            lo, hi = interval  # plain (lo, hi) tuple
        lname, rname = self_time._name, other_time._name
        keys = []
        for cond in on:
            if (isinstance(cond, BinaryOp) and cond._op == "=="
                    and isinstance(cond._lhs, ColumnReference)
                    and isinstance(cond._rhs, ColumnReference)):
                keys.append((cond._lhs._name, cond._rhs._name))
            else:
                raise TypeError("extra interval_join conditions must be "
                                "column equalities")
        lcols = _data_cols(self._template)
        rcols = [c for c in _data_cols(other._template)]
        clash = set(lcols) & set(rcols)
        if clash:
            raise ValueError(
                f"column collision in interval_join: {sorted(clash)}; "
                "rename before joining")

        def _us(c):
            return F.unix_micros(c.cast("timestamp"))

        use_td = isinstance(lo, _dt.timedelta)
        lo_v = int(lo.total_seconds() * 1_000_000) if use_td else lo
        hi_v = int(hi.total_seconds() * 1_000_000) if use_td else hi

        def cond_fn(a, b):
            lt, rt = a[lname], b[rname]
            if use_td:
                lt, rt = _us(lt), _us(rt)
            c = (rt >= lt + F.lit(lo_v)) & (rt <= lt + F.lit(hi_v))
            for lk, rk in keys:
                c = c & (a[lk] == b[rk])
            return c

        node = self.node.join_theta(
            other.node, cond_fn, lcols, rcols,
            # banding metadata: lets the resident fast path arrange both
            # sides by (equi keys, ⌊time/interval-width⌋) and keep live
            # interval-join ticks in the ~10 ms class (r8 verdict #1) —
            # the reference's signature temporal operator
            # (python/pathway/stdlib/temporal/_interval_join.py)
            band=dict(ltime=lname, rtime=rname, lo=lo_v, hi=hi_v,
                      micros=use_td, keys=keys))
        tpl = self._template.crossJoin(other._template).limit(0)
        return DiffTable(node, tpl)

    def asof_join(self, other: "DiffTable", self_time: ColumnReference,
                  other_time: ColumnReference, *on, how: str = "inner",
                  direction: str = "backward") -> "DiffTable":
        """Asof join over retraction streams.  Asof matching is NOT
        bilinear (retracting the matched right row promotes the
        next-best), so it runs on the generic keyed-recompute rule:
        per batch, the affected-key slices of both sides recompute the
        batch `operators.asof.asof_join` and the node emits
        new − old.  Correct for any insert/retract sequence; cost is
        O(rows under affected keys), not O(state)."""
        from ..operators.asof import asof_join as _batch_asof
        from ..table import Table
        from .differential import _KeyedRecomputeNode

        keys = []
        for cond in on:
            if isinstance(cond, ColumnReference):
                keys.append((cond._name, cond._name))
            elif (isinstance(cond, BinaryOp) and cond._op == "=="
                    and isinstance(cond._lhs, ColumnReference)
                    and isinstance(cond._rhs, ColumnReference)):
                keys.append((cond._lhs._name, cond._rhs._name))
            else:
                raise TypeError("asof_join conditions must be column "
                                "equalities")
        if not keys:
            raise ValueError("differential asof_join needs at least one "
                             "equality key (slices recompute per key)")
        conds = [ColumnReference("left", l) == ColumnReference("right", r)
                 for l, r in keys]

        def op_fn(ldf, rdf):
            out = _batch_asof(
                Table.from_spark(ldf), Table.from_spark(rdf),
                self_time, other_time, conds,
                how=how, direction=direction)
            return out.to_df()

        node = _KeyedRecomputeNode(
            self.node.graph, self.node, other.node,
            [l for l, _ in keys], [r for _, r in keys], op_fn)
        tpl = op_fn(self._template, other._template).limit(0)
        return DiffTable(node, tpl)

    def asof_now_join(self, other: "DiffTable", *on,
                      how: str = "inner") -> "DiffTable":
        """Differential asof_now (reference `_asof_now_join.py:176`):
        each LEFT delta row joins the right side's CURRENT state and
        the match is FROZEN — later right-side changes never retract
        it (unlike asof_join/join).  Left retractions remove the
        frozen rows via the output trace."""
        from .differential import _AsofNowNode

        if how != "inner":
            raise NotImplementedError(
                "differential asof_now_join supports how='inner'")
        lk, rk = [], []
        for c in on:
            if not isinstance(c, BinaryOp) or c._op != "==":
                raise TypeError("asof_now_join takes pw.left.x == pw.right.y")
            lk.append(c._lhs._name)
            rk.append(c._rhs._name)
        node = _AsofNowNode(self.node.graph, self.node, other.node, lk, rk)
        rtpl = other._template
        rcols = [c for c in _data_cols(rtpl) if c not in _data_cols(
            self._template)]
        tpl = (self._template.crossJoin(rtpl.select(*rcols))
               if rcols else self._template).limit(0)
        return DiffTable(node, tpl)

    def join_left(self, other: "DiffTable", *on) -> "DiffTable":
        return self.join(other, *on, how="left")

    def join_inner(self, other: "DiffTable", *on) -> "DiffTable":
        return self.join(other, *on, how="inner")

    # -- grouping --------------------------------------------------------
    def groupby(self, *refs: ColumnReference) -> "DiffGrouped":
        return DiffGrouped(self, [r._name for r in refs])

    def reduce(self, **kwargs) -> "DiffTable":
        """Global (keyless) reduce over the retraction stream — emits
        -old/+new for THE one group per batch; an empty stream emits
        nothing (matching differential reduce, not SQL's phantom row)."""
        return DiffGrouped(self, []).reduce(**kwargs)

    def iterate(self, body, inputs: dict[str, "DiffTable"] | None = None,
                *, iteration_limit: int | None = None,
                max_depth: int = 64) -> "DiffTable":
        """Incrementally-maintained `pw.iterate` in the Table idiom
        (reference `internals/common.py:39-91`; engine `graph.rs:931`
        iterate scope).  `body(v, **inputs) -> DiffTable` builds one
        application of the loop body from DiffTables; this table's
        stream seeds the loop variable, `inputs` are loop-invariant
        streams.  The fixed point stays correct under arbitrary
        insertions and retractions — see
        `streaming/iterate_diff.py` (level cascade)."""
        from .iterate_diff import iterate_differential

        inputs = dict(inputs or {})
        vt = self._template
        its = {k: t._template for k, t in inputs.items()}

        def node_body(v, **ins):
            out = body(DiffTable(v, vt),
                       **{k: DiffTable(n, its[k]) for k, n in ins.items()})
            return out.node if isinstance(out, DiffTable) else out

        node = iterate_differential(
            node_body, self.node, {k: t.node for k, t in inputs.items()},
            iteration_limit=iteration_limit, max_depth=max_depth)
        return DiffTable(node, vt)

    # -- generic extension point -----------------------------------------
    def keyed_recompute(self, keys, op_fn) -> "DiffTable":
        """Make ANY keyed batch operator incrementally maintainable.

        `op_fn(Table) -> Table` must produce, for key k, output that
        depends only on input rows with key k (per-key sort/diff,
        interpolation, custom per-entity logic...).  Per batch the
        affected-key slice recomputes through `op_fn` and the node
        emits new − old — the same rule the built-in asof join and
        session windows use.  `keys`: this-references naming the
        recompute scope."""
        from ..table import Table
        from .differential import _KeyedRecomputeUnaryNode

        knames = [k._name for k in keys] \
            if isinstance(keys, (list, tuple)) else [keys._name]

        def raw_op(df):
            return op_fn(Table.from_spark(df)).to_df()

        node = _KeyedRecomputeUnaryNode(
            self.node.graph, self.node, knames, raw_op)
        tpl = raw_op(self._template).limit(0)
        return DiffTable(node, tpl)

    def sort_diff(self, timestamp: ColumnReference, *values,
                  instance: ColumnReference) -> "DiffTable":
        """Ordered per-instance difference (reference `table.diff`) over
        a retraction stream: retracting a middle row re-links its
        neighbors, so the follower's `diff_*` retracts and re-emits
        against the new predecessor.  Built on `keyed_recompute`."""
        from ..operators.sort import diff as _batch_diff

        return self.keyed_recompute(
            [instance],
            lambda t: _batch_diff(t, timestamp, values, instance))

    def interpolate(self, timestamp: ColumnReference, *values,
                    mode: str = "linear",
                    instance: ColumnReference) -> "DiffTable":
        """Per-instance linear gap interpolation with retractions:
        retracting a non-null anchor re-interpolates the rows that
        leaned on it (keyed_recompute; instance required — it is the
        recompute scope, as in the batch operator's scale note)."""
        from ..operators.sort import interpolate as _batch_interp

        return self.keyed_recompute(
            [instance],
            lambda t: _batch_interp(t, timestamp, *values, mode=mode,
                                    instance=instance))

    def deduplicate(self, *, value: ColumnReference,
                    keep: ColumnReference,
                    instance: ColumnReference | None = None) -> "DiffTable":
        """Differential deduplicate (reference `table.py:1315`): one
        surviving row per `value` (or per `instance`) — the row
        minimizing `keep` (a value-deterministic order; the batch
        engine-order default has no meaning across deltas, so `keep`
        is required here).  Retractions re-elect the survivor.

        The survivor is selected as ONE argmin over the whole packed
        row under a total order (keep, then every remaining column) —
        per-column argmins would assemble a franken-row mixing fields
        of tied rows."""
        keys = [(instance or value)._name]
        rest = [c for c in _data_cols(self._template) if c not in keys]
        packed = self.node.select(
            *keys,
            F.struct(*[F.col(c) for c in rest]).alias("__row"),
            F.struct(F.col(keep._name),
                     *[F.col(c) for c in rest]).alias("__ord"))
        red = packed.reduce(keys, __row=("argmin", "__row", "__ord"))
        node = red.select(*keys, *[F.col(f"__row.`{c}`").alias(c)
                                   for c in rest])
        tpl = self._template.select(*keys, *rest).limit(0)
        return DiffTable(node, tpl)

    def ignore_late(self, time_ref: ColumnReference, threshold) -> "DiffTable":
        """Cutoff behavior (reference `table.py:852`): drop rows older
        than max(time) − threshold as the watermark advances."""
        return DiffTable(self.node.ignore_late(time_ref._name, threshold),
                         self._template)

    def forget(self, time_ref: ColumnReference, threshold) -> "DiffTable":
        """State-eviction behavior (reference `table.py:671`): rows
        falling behind the watermark horizon are RETRACTED, so every
        downstream join/groupby evicts them — bounded state over
        infinite streams."""
        return DiffTable(self.node.forget(time_ref._name, threshold),
                         self._template)

    def buffer(self, time_ref: ColumnReference, threshold) -> "DiffTable":
        """Exactly-once release behavior (reference `_buffer`): rows are
        held until the watermark passes their event time."""
        return DiffTable(self.node.buffer(time_ref._name, threshold),
                         self._template)

    # -- incremental graph algorithms ------------------------------------
    def _edge_node(self, u, v) -> DiffNode:
        un = u._name if u is not None else "u"
        vn = v._name if v is not None else "v"
        if (un, vn) == ("u", "v"):
            return self.node
        return self.node.select(F.col(un).alias("u"), F.col(vn).alias("v"))

    def pagerank(self, u=None, v=None, *, steps: int = 5,
                 damping_pct: int = 85,
                 strategy: str = "component") -> "DiffTable":
        """Incremental PageRank over a live edge stream (reference
        `stdlib/graphs/pagerank` inside an iterate scope).  Ranks are
        10^-9 fixed-point integers (engine-exact).

        `strategy="component"` (default): (w, rank, comp) deltas; an
        edge delta re-solves the affected component.
        `strategy="cascade"`: (w, rank) deltas on the level cascade —
        per-delta cost O(k-hop of the delta), the right choice when the
        graph has one giant component."""
        un = u._name if u is not None else "u"
        if strategy == "cascade":
            from .incremental_graph import incremental_pagerank_cascade

            node = incremental_pagerank_cascade(
                self._edge_node(u, v), steps=steps,
                damping_pct=damping_pct)
            tpl = (self._template.select(F.col(un).alias("w")).limit(0)
                   .withColumn("rank", F.lit(0).cast("long")))
            return DiffTable(node, tpl)
        from .incremental_graph import incremental_pagerank

        node = incremental_pagerank(self._edge_node(u, v), steps=steps,
                                    damping_pct=damping_pct)
        tpl = (self._template
               .select(F.col(un).alias("w"), F.col(un).alias("comp"))
               .limit(0)
               .withColumn("rank", F.lit(0).cast("long"))
               .select("w", "rank", "comp"))
        return DiffTable(node, tpl)

    def connected_components(self, u=None, v=None) -> "DiffTable":
        """Incremental connected components over a live edge stream
        (reference `stdlib/graphs` via iterate): (w, label) deltas;
        retracting a bridge edge splits the component and relabels only
        the affected nodes."""
        from .incremental_graph import incremental_connected_components

        node = incremental_connected_components(self._edge_node(u, v))
        un = u._name if u is not None else "u"
        tpl = (self._template
               .select(F.col(un).alias("w"), F.col(un).alias("label"))
               .limit(0))
        return DiffTable(node, tpl)

    # -- incremental near-duplicate detection ----------------------------
    def minhash_dedup_pairs(self, text: ColumnReference,
                            id_ref: ColumnReference, *,
                            n: int = 3, num_hashes: int = 64,
                            bands: int = 16, threshold: float = 0.5,
                            verify: bool = True) -> "DiffTable":
        """Incrementally-maintained MinHash-LSH near-duplicate pairs
        over a live document stream — the streaming face of
        `operators/dedup.py:minhash_lsh_pairs` (same hash family, same
        banding), maintained at O(delta) per batch.  Emits
        `(id_a, id_b, jaccard)` deltas (`(id_a, id_b)` with
        verify=False)."""
        from .incremental_dedup import incremental_minhash_pairs

        node = incremental_minhash_pairs(
            self.node, text._name, id_ref._name, n=n,
            num_hashes=num_hashes, bands=bands, threshold=threshold,
            verify=verify)
        idc = F.col(id_ref._name)
        tpl = self._template.select(idc.alias("id_a"), idc.alias("id_b"))
        if verify:
            tpl = tpl.withColumn("jaccard", F.lit(0.0))
        return DiffTable(node, tpl.limit(0))

    def simhash_dedup_pairs(self, text: ColumnReference,
                            id_ref: ColumnReference, *,
                            n: int = 2,
                            max_hamming: int = 3) -> "DiffTable":
        """Incrementally-maintained SimHash near-duplicate pairs over a
        live document stream — streaming face of
        `operators/dedup.py:simhash_pairs`.  Emits
        `(id_a, id_b, hamming)` deltas."""
        from .incremental_dedup import incremental_simhash_pairs

        node = incremental_simhash_pairs(
            self.node, text._name, id_ref._name, n=n,
            max_hamming=max_hamming)
        idc = F.col(id_ref._name)
        tpl = (self._template
               .select(idc.alias("id_a"), idc.alias("id_b"))
               .withColumn("hamming", F.lit(0).cast("long")))
        return DiffTable(node, tpl.limit(0))

    def embedding_dup_pairs(self, vec: ColumnReference,
                            id_ref: ColumnReference, *,
                            threshold: float = 0.95,
                            num_planes: int = 64,
                            bands: int = 4) -> "DiffTable":
        """Incrementally-maintained embedding near-duplicate pairs —
        streaming face of `operators/dedup.py:embedding_neardup_pairs
        (cross_engine=True)` (the q52 integer-exact hyperplane-LSH
        plan).  Emits `(id_a, id_b)` deltas, `id_a < id_b`, verified
        on the quantized integers; prefix-equal to the batch operator
        bit-for-bit (integer sums commute exactly)."""
        from .incremental_dedup import incremental_embedding_pairs

        node = incremental_embedding_pairs(
            self.node, vec._name, id_ref._name, threshold=threshold,
            num_planes=num_planes, bands=bands)
        idc = F.col(id_ref._name)
        tpl = self._template.select(idc.alias("id_a"), idc.alias("id_b"))
        return DiffTable(node, tpl.limit(0))

    def sort(self, key: ColumnReference, id_ref: ColumnReference, *,
             instance: ColumnReference | None = None,
             bucket_width=None) -> "DiffTable":
        """Live sort — prev/next neighbor pointers maintained under
        inserts AND retractions (reference `table.sort`,
        `src/engine/dataflow/operators/prev_next.rs` keeps a doubly-
        linked order inside the dataflow).  Streams carry no universe
        ids, so the pointers are `id_ref` VALUES (NULL at the ends);
        order is (key, id) per instance.

        Affected-instance recompute: a delta re-sorts only the
        instances it touches — pass `instance=` to bound the slice.

        `bucket_width` (numeric keys) arranges each instance into
        FIXED KEY-RANGE BUCKETS — the Spark-shaped counterpart of the
        reference's O(log n) arranged BTree updates: within-bucket
        prev/next recompute only for TOUCHED buckets, per-bucket
        (first, last) summaries link neighbor buckets through a
        per-instance pass over #buckets rows, and a bilinear join
        stitches boundary pointers.  Per-batch cost is
        O(touched-bucket rows + #buckets), never O(instance rows)."""
        from pyspark.sql import Window as W

        from .differential import _KeyedRecomputeUnaryNode

        kname, idn = key._name, id_ref._name
        inst = instance._name if instance is not None else "__pw_inst"
        node = (self.node if instance is not None
                else self.node.with_columns(__pw_inst=F.lit(0)))
        cols = [c for c in _data_cols(self._template)]
        tpl0 = (self._template if instance is not None
                else self._template.withColumn("__pw_inst", F.lit(0)))

        if bucket_width is None:
            def op(plain: DataFrame) -> DataFrame:
                w = (W.partitionBy(inst)
                     .orderBy(F.col(kname), F.col(idn)))
                return (plain.withColumn("prev", F.lag(idn).over(w))
                             .withColumn("next", F.lead(idn).over(w)))

            knode = _KeyedRecomputeUnaryNode(self.node.graph, node,
                                             [inst], op)
            out = knode.select(*[F.col(c) for c in cols],
                               F.col("prev"), F.col("next"))
            # derive the template THROUGH op so prev/next carry the id
            # column's true runtime dtype
            tpl = op(tpl0).select(*cols, "prev", "next")
            return DiffTable(out, tpl.limit(0))

        # ---- bucketed order-statistics arrangement (round 8) --------
        bkt = F.floor(F.col(kname) / F.lit(bucket_width)).cast("long")
        bnode = node.with_columns(__pw_bkt=bkt)

        def op_in(plain: DataFrame) -> DataFrame:
            w = (W.partitionBy(inst, "__pw_bkt")
                 .orderBy(F.col(kname), F.col(idn)))
            return (plain.withColumn("prev", F.lag(idn).over(w))
                         .withColumn("next", F.lead(idn).over(w)))

        inner = _KeyedRecomputeUnaryNode(self.node.graph, bnode,
                                         [inst, "__pw_bkt"], op_in)
        # per-bucket boundary summaries: (first, last) by (key, id)
        summ = (bnode
                .with_columns(__pw_ord=F.struct(F.col(kname), F.col(idn)))
                .reduce([inst, "__pw_bkt"],
                        first_id=("argmin", idn, "__pw_ord"),
                        last_id=("argmax", idn, "__pw_ord")))

        def op_link(plain: DataFrame) -> DataFrame:
            w = W.partitionBy(inst).orderBy("__pw_bkt")
            return (plain
                    .withColumn("__prev_last", F.lag("last_id").over(w))
                    .withColumn("__next_first",
                                F.lead("first_id").over(w)))

        links = _KeyedRecomputeUnaryNode(self.node.graph, summ,
                                         [inst], op_link) \
            .select(F.col(inst), F.col("__pw_bkt"),
                    F.col("__prev_last"), F.col("__next_first"))
        joined = inner.join(links, on=[inst, "__pw_bkt"])
        # a NULL within-bucket pointer means bucket-first/-last: stitch
        # the neighbor bucket's boundary id (NULL again at the true
        # ends — empty neighbor buckets are skipped by construction,
        # the summary window only sees NON-EMPTY buckets)
        out = joined.select(
            *[F.col(c) for c in cols],
            F.coalesce(F.col("prev"), F.col("__prev_last")).alias("prev"),
            F.coalesce(F.col("next"), F.col("__next_first")).alias("next"))
        tpl = (op_in(tpl0.withColumn("__pw_bkt", F.lit(0)))
               .withColumn("__prev_last", F.lit(None))
               .withColumn("__next_first", F.lit(None))
               .select(*cols,
                       F.coalesce(F.col("prev"), F.col("__prev_last"))
                       .alias("prev"),
                       F.coalesce(F.col("next"), F.col("__next_first"))
                       .alias("next")))
        return DiffTable(out, tpl.limit(0))

    def diff_by(self, timestamp: ColumnReference,
                id_ref: ColumnReference, *values: ColumnReference,
                instance: ColumnReference | None = None) -> "DiffTable":
        """Live `Table.diff` with a DETERMINISTIC tie-break: value −
        previous value in (timestamp, caller-id) order per instance,
        as `diff_<name>` columns, maintained by the same
        affected-instance recompute as :meth:`sort`.

        Contrast :meth:`sort_diff`, which wraps the batch operator
        verbatim (internal-ID tie-break on equal timestamps —
        nondeterministic across recomputes); here equal timestamps
        order by `id_ref`, so integrated deltas are reproducible."""
        from pyspark.sql import Window as W

        from .differential import _KeyedRecomputeUnaryNode

        tname, idn = timestamp._name, id_ref._name
        inst = instance._name if instance is not None else "__pw_inst"
        node = (self.node if instance is not None
                else self.node.with_columns(__pw_inst=F.lit(0)))
        vnames = [v._name for v in values]

        def op(plain: DataFrame) -> DataFrame:
            w = (W.partitionBy(inst)
                 .orderBy(F.col(tname), F.col(idn)))
            for v in vnames:
                plain = plain.withColumn(
                    f"diff_{v}", F.col(v) - F.lag(v).over(w))
            return plain

        knode = _KeyedRecomputeUnaryNode(self.node.graph, node, [inst], op)
        cols = [c for c in _data_cols(self._template)]
        out = knode.select(*[F.col(c) for c in cols],
                           *[F.col(f"diff_{v}") for v in vnames])
        # template THROUGH op: `c - lag(c)` changes dtype for
        # timestamp/date/decimal values (e.g. timestamp -> interval)
        tpl0 = (self._template if instance is not None
                else self._template.withColumn("__pw_inst", F.lit(0)))
        tpl = op(tpl0).select(*cols, *[f"diff_{v}" for v in vnames])
        return DiffTable(out, tpl.limit(0))

    def dedup_clusters(self, text: ColumnReference,
                       id_ref: ColumnReference, *,
                       method: str = "minhash", **kw) -> "DiffTable":
        """Live near-dup cluster canonicalization: every document maps
        to its cluster's MIN member id (the batch `deduplicate(keep=)`
        survivor rule), maintained incrementally — dup pairs (by
        `method`) + per-doc self-loops through spanning-forest CC.
        Emits `(<id_col>, canonical)` deltas."""
        from .incremental_dedup import incremental_dedup_clusters

        node = incremental_dedup_clusters(
            self.node, text._name, id_ref._name, method=method, **kw)
        idc = F.col(id_ref._name)
        tpl = self._template.select(idc.alias(id_ref._name),
                                    idc.alias("canonical"))
        return DiffTable(node, tpl.limit(0))

    def knn_topk(self, queries: "DiffTable", vec: ColumnReference,
                 id_ref: ColumnReference, *, k: int = 3,
                 metric: str = "cosine") -> "DiffTable":
        """Live exact-KNN index (reference `KNNIndex` / `DataIndex`
        plain-query semantics, `stdlib/indexing/nearest_neighbors.py`):
        self is the corpus, `queries` the query stream; every query's
        top-k updates as either side changes.  Emits
        `(query_id, neighbor_id, rank, score)` deltas.  For
        freeze-at-arrival answers use `asof_now_join` pipelines."""
        from .incremental_topk import incremental_knn_topk

        node = incremental_knn_topk(
            queries.node, self.node, vec_col=vec._name,
            id_col=id_ref._name, k=k, metric=metric)
        idc = F.col(id_ref._name)
        tpl = (self._template
               .select(idc.alias("query_id"), idc.alias("neighbor_id"))
               .withColumn("rank", F.lit(0))
               .withColumn("score", F.lit(0.0)))
        return DiffTable(node, tpl.limit(0))

    def ann_topk(self, queries: "DiffTable", vec: ColumnReference,
                 id_ref: ColumnReference, *, k: int = 3,
                 n_bits: int = 6, tables: int = 4,
                 multiprobe: int | None = None) -> "DiffTable":
        """Live APPROXIMATE nearest neighbors with freeze-at-arrival
        query answers (reference usearch `query_as_of_now`,
        `stdlib/indexing/nearest_neighbors.py:65`): self is the corpus,
        `queries` the query stream (must carry `query_id` + the vector
        column).  The IVF cell index is maintained as differential
        state — per-query cost is the probed cells, never the corpus
        (contrast :meth:`knn_topk`, exact and live-revising).  Emits
        `(query_id, neighbor_id, rank)` deltas."""
        from .incremental_ann import incremental_ivf_topk

        node = incremental_ivf_topk(
            queries.node, self.node, vec_col=vec._name,
            id_col=id_ref._name, k=k, n_bits=n_bits, tables=tables,
            multiprobe=multiprobe)
        idc = F.col(id_ref._name)
        tpl = (self._template
               .select(idc.alias("query_id"), idc.alias("neighbor_id"))
               .withColumn("rank", F.lit(0)))
        return DiffTable(node, tpl.limit(0))

    def bm25_topk(self, queries: "DiffTable", text: ColumnReference,
                  id_ref: ColumnReference, *,
                  query_col: str = "query", k: int = 10,
                  k1: float = 1.2, b: float = 0.75) -> "DiffTable":
        """Live BM25 index with freeze-at-arrival query answers
        (reference `DocumentStore` retrieval / `TantivyBM25`,
        `stdlib/indexing/bm25.py` + `query_as_of_now` semantics): self
        is the document stream, `queries` the query stream (must carry
        `query_id` and `query_col`).  Emits
        `(query_id, <id_col>, rank, score)` deltas — each query scored
        against the corpus as of its arrival tick, never revised."""
        from .incremental_bm25 import incremental_bm25_topk

        node = incremental_bm25_topk(
            self.node, queries.node, text_col=text._name,
            id_col=id_ref._name, query_col=query_col, k=k, k1=k1, b=b)
        idc = F.col(id_ref._name)
        tpl = (self._template
               .select(idc.alias("query_id"), idc.alias(id_ref._name))
               .withColumn("rank", F.lit(0))
               .withColumn("score", F.lit(0.0)))
        return DiffTable(node, tpl.limit(0))

    # -- trivial row-op parity -------------------------------------------
    def without(self, *refs: ColumnReference) -> "DiffTable":
        drop = {r._name for r in refs}
        keep = [c for c in _data_cols(self._template) if c not in drop]
        return DiffTable(self.node.select(*[F.col(c) for c in keep]),
                         self._template.select(*keep).limit(0))

    def rename(self, **kwargs: ColumnReference) -> "DiffTable":
        """new_name=this.old_name, reference `rename_columns` style."""
        ren = {ref._name: new for new, ref in kwargs.items()}
        cols = [F.col(c).alias(ren.get(c, c))
                for c in _data_cols(self._template)]
        tpl = self._template.withColumnsRenamed(ren)
        return DiffTable(self.node.select(*cols), tpl.limit(0))

    def windowby(self, time_ref, *, window, instance=None,
                 behavior=None) -> "DiffGrouped":
        """Tumbling/sliding windows over a retraction stream: window
        assignment (`_assign_hopping`) is a pure projection — LINEAR —
        so it composes with delta propagation unchanged; the windowed
        aggregate then retracts/re-emits per affected window like any
        differential reduce.  Session windows merge neighboring rows
        (non-linear), so they run the keyed-recompute rule per
        `instance` — a retraction that SPLITS a session retracts the
        old merged window and emits the two new ones.

        `behavior` (reference `temporal_behavior.py`) composes the
        differential behavior nodes onto the TIME column:
        `delay` → buffer (rows wait for the watermark);
        `cutoff` → ignore_late when `keep_results` (late rows dropped,
        emitted windows stand) or forget when not (results retract as
        their rows fall behind the horizon)."""
        from ..operators.temporal import WEND, WSTART, _assign_hopping

        src: DiffTable = self
        exactly_once = behavior is not None and hasattr(behavior, "shift") \
            and not hasattr(behavior, "cutoff")
        if behavior is not None and not exactly_once:
            delay = getattr(behavior, "delay", None)
            cutoff = getattr(behavior, "cutoff", None)
            keep = getattr(behavior, "keep_results", True)
            if delay is not None:
                src = src.buffer(time_ref, delay)
            if cutoff is not None:
                src = (src.ignore_late(time_ref, cutoff) if keep
                       else src.forget(time_ref, cutoff))
        self = src

        if window.kind == "session":
            if exactly_once:
                raise NotImplementedError(
                    "exactly_once_behavior is wired for tumbling/sliding "
                    "windows (session bounds are data-dependent)")
            if instance is None:
                raise ValueError(
                    "differential session windows need instance= (the "
                    "recompute scope); without one every batch would "
                    "recompute all sessions")
            return _SessionDiffGrouped(self, time_ref, window, instance)
        if window.kind == "intervals_over":
            if exactly_once:
                raise NotImplementedError(
                    "exactly_once_behavior is wired for tumbling/sliding "
                    "windows (intervals_over points are data-dependent)")
            return _IntervalsOverDiffGrouped(self, time_ref, window)
        if window.kind not in ("tumbling", "sliding"):
            raise NotImplementedError(
                f"differential windowby supports tumbling/sliding/"
                f"session/intervals_over, got {window.kind!r}")
        tcol = to_col(time_ref, self._ctx())
        node = _LinearWindowNode(self.node, tcol, window,
                                 tname=getattr(time_ref, "_name", None))
        tpl = _assign_hopping(self._template, tcol, window).limit(0)
        if exactly_once:
            # release a window's rows TOGETHER once the event-time
            # watermark passes its END (+shift): buffer keyed on WEND
            # with the watermark advancing on the raw time column, and
            # drop rows arriving after their window already released —
            # the reduce below then emits each window exactly once
            import datetime as _dt

            from pyspark.sql import types as _T

            from .differential import _BufferNode

            shift = getattr(behavior, "shift", None)
            if shift is None:
                # zero in the WEND column's own algebra: timestamps
                # need an INTERVAL, numerics a plain 0 (`or 0` would
                # also swallow an explicit timedelta(0))
                wend_t = tpl.schema[WEND].dataType
                shift = (_dt.timedelta(0)
                         if isinstance(wend_t, (_T.TimestampType,
                                                _T.TimestampNTZType,
                                                _T.DateType)) else 0)
            node = _BufferNode(self.node.graph, node, WEND, shift,
                               wm_col=time_ref._name, drop_late=True)
        keys = [WSTART, WEND]
        if instance is not None:
            keys.append(instance._name)
        return DiffGrouped(DiffTable(node, tpl), keys)

    def distinct(self) -> "DiffTable":
        return DiffTable(self.node.distinct(), self._template)

    # -- set ops (row-level; the reference keys these on row ids) --------
    def _same_schema_cols(self, other: "DiffTable", op: str) -> list[str]:
        cols = _data_cols(self._template)
        if set(cols) != set(_data_cols(other._template)):
            raise ValueError(
                f"{op} requires identical column sets; got {cols} vs "
                f"{_data_cols(other._template)}")
        return cols

    def intersect(self, other: "DiffTable") -> "DiffTable":
        """Rows of self whose full row content appears in `other`."""
        cols = self._same_schema_cols(other, "intersect")
        # pair by NAME on both sides, never by position
        return DiffTable(self.node.semi_join(other.node, cols, cols),
                         self._template)

    def difference(self, other: "DiffTable") -> "DiffTable":
        """Rows of self absent (by full row content) from `other`."""
        cols = self._same_schema_cols(other, "difference")
        return DiffTable(self.node.anti_join(other.node, cols, cols),
                         self._template)

    def update_cells(self, other: "DiffTable",
                     *keys: ColumnReference) -> "DiffTable":
        """Patch a SUBSET of columns for matching keys (reference
        `table.py:1834` update_cells): rows outside the patch keep
        their cells (anti-join), matching rows join the patch stream's
        values — both legs differential, so patch retractions restore
        the original cells.

        Divergences from the reference, both key-multiplicity guards:
        the reference RAISES on duplicate patch ids; a stream cannot,
        so the patch is reduced to ONE WHOLE ROW per key first (the
        struct-min row over all patched columns — never an independent
        per-column min, which would fabricate a patch row mixing values
        from different patch rows) — without this, a net-weight-2 patch
        key would double the joined leg while the anti-join removes the
        base row only once, leaving net weight >1.  Patch keys absent
        from the base are ignored (the reference raises on a universe
        mismatch)."""
        knames = [k._name for k in keys]
        if not knames:
            raise ValueError("differential update_cells needs key columns")
        ocols = [c for c in _data_cols(other._template)
                 if c not in knames]
        missing = set(ocols) - set(_data_cols(self._template))
        if missing:
            raise ValueError(
                f"update_cells: patch columns {sorted(missing)} do not "
                "exist on the base table")
        cols = _data_cols(self._template)
        kept = self.node.anti_join(other.node, knames)
        base = self.node.select(
            *[F.col(c) for c in cols if c not in ocols])
        patch = other.node.select(
            *[F.col(c) for c in (*knames, *ocols)],
            __row=F.struct(*[F.col(c) for c in ocols])).reduce(
            knames, {c: ("argmin", c, "__row") for c in ocols})
        patched = base.join(patch, on=knames).select(
            *[F.col(c) for c in cols])
        node = patched.union(kept)
        return DiffTable(node, self._template)

    def update_rows(self, other: "DiffTable",
                    *keys: ColumnReference) -> "DiffTable":
        """Upsert `other`'s rows over self by key (reference
        `table.py:1776`, keyed explicitly here since raw deltas carry
        no universe): pure composition — other ∪ (self ⋉̸ keys(other))
        — so an upsert arriving on the patch stream retracts the base
        row it shadows, and a patch RETRACTION resurfaces it."""
        knames = [k._name for k in keys]
        if not knames:
            raise ValueError("differential update_rows needs key columns")
        if set(_data_cols(self._template)) != set(_data_cols(other._template)):
            raise ValueError("update_rows requires identical schemas")
        kept = self.node.anti_join(other.node, knames)
        node = other.node.select(
            *[F.col(c) for c in _data_cols(self._template)]).union(kept)
        return DiffTable(node, self._template)


def _LinearWindowNode(node: DiffNode, tcol: Column, window,
                      tname: str | None = None):
    from ..operators.temporal import _assign_hopping

    graph = node.graph
    # reuse the generic linear wrapper: window fan-out applies per delta
    # row; diffs ride along untouched
    from .differential import _LinearNode
    out = _LinearNode(graph, node,
                      lambda df: _assign_hopping(df, tcol, window))
    if tname is not None:
        # resident fast path: sliding fan-out is an EXPLODE, which
        # never constant-folds (Generate ⇒ one micro-job per tick) —
        # the resident evaluator assigns windows in Python with the
        # exact `_assign_hopping` arithmetic (resident._hopping_rows;
        # type/timezone-gated, falls back to this fn otherwise)
        out._res_hopping = (tname, window)
    return out


class DiffGrouped:
    def __init__(self, parent: DiffTable, keys: list[str]):
        self._parent = parent
        self._keys = keys

    def reduce(self, *args, **kwargs) -> DiffTable:
        parent, keys = self._parent, self._keys
        ctx = parent._ctx()
        specs: dict[str, tuple] = {}
        out_names: list[str] = []
        for a in args:
            if not isinstance(a, ColumnReference) or a._name not in keys:
                raise TypeError(
                    "positional reduce args must be grouping columns")
            out_names.append(a._name)
        prepared: dict[str, Column] = {}
        for name, expr in kwargs.items():
            if not isinstance(expr, ReducerExpression):
                raise TypeError(
                    f"{name!r}: differential reduce takes pw.reducers.* "
                    "expressions")
            kind = _RED_MAP.get(expr._name)
            if kind is None:
                raise NotImplementedError(
                    f"reducer {expr._name!r} is multiplicity-sensitive; "
                    "use the batch groupby/reduce path")
            for a in expr._args:
                if (isinstance(a, ColumnReference)
                        and a._name not in parent._template.columns):
                    raise NotImplementedError(
                        f"reducer {expr._name!r} references "
                        f"{a._name!r}, which differential deltas do not "
                        "carry (this is the reducer's implicit default); "
                        "pass the argument explicitly, e.g. "
                        "argmin(value, arg) / earliest(expr, time=this.<col>)")
            cols = [to_col(a, ctx) for a in expr._args]
            if not cols:
                cols = [None]
            # pre-compute reducer inputs as derived columns so the
            # multiset state stores exactly what the aggregate consumes
            argnames = []
            for i, c in enumerate(cols):
                if c is None:
                    argnames.append(None)
                    continue
                an = f"__arg_{name}_{i}"
                prepared[an] = c
                argnames.append(an)
            if expr._name in ("argmin", "argmax", "earliest", "latest"):
                # reference order: (value_to_return, order_key) for
                # argmin/argmax = (arg, value); earliest/latest single-arg
                if len(argnames) == 1:
                    argnames = [argnames[0], argnames[0]]
            specs[name] = (kind, *[a for a in argnames if a is not None]) \
                if any(argnames) else (kind,)
        node = parent.node
        if prepared:
            node = node.with_columns(**prepared)
        node = node.select(
            *[F.col(k) for k in keys],
            **{n: F.col(n) for n in prepared})
        red = node.reduce(keys, specs)
        # template: keys + one column per reducer (types approximated)
        from .differential import _AGG_BUILDERS
        tpl = parent._template
        for n, c in prepared.items():
            tpl = tpl.withColumn(n, c)
        tpl = tpl.withColumn(DIFF, F.lit(1).cast("long"))
        aggs = []
        for n, (kind, *argn) in specs.items():
            argn = argn or [keys[0] if keys else DIFF]
            aggs.append(_AGG_BUILDERS[kind](*argn).alias(n))
        tpl = tpl.groupBy(*keys).agg(*aggs).limit(0)
        out = DiffTable(red, tpl)
        if out_names and set(out_names) != set(keys):
            # the reference projects to exactly the requested grouping
            # columns; dropping a key is fine in multiset semantics
            sel = out_names + list(specs)
            out = DiffTable(out.node.select(*[F.col(c) for c in sel]),
                            tpl.select(*sel).limit(0))
        return out


class _SessionDiffGrouped:
    """windowby(session).reduce over a retraction stream: the whole
    windowby+reduce recomputes per affected instance (keyed-recompute),
    because session bounds depend on neighboring rows."""

    def __init__(self, parent: DiffTable, time_ref, window, instance):
        self._parent = parent
        self._time_ref = time_ref
        self._window = window
        self._instance = instance

    def reduce(self, *args, **kwargs) -> DiffTable:
        from ..operators import temporal
        from ..table import Table
        from .differential import _KeyedRecomputeUnaryNode

        parent = self._parent
        time_ref, window, instance = (self._time_ref, self._window,
                                      self._instance)

        def op_fn(df):
            t = Table.from_spark(df)
            wt = temporal.windowby(t, time_ref, window=window,
                                   instance=instance)
            return wt.reduce(*args, **kwargs).to_df()

        node = _KeyedRecomputeUnaryNode(
            parent.node.graph, parent.node, [instance._name], op_fn)
        tpl = op_fn(parent._template).limit(0)
        return DiffTable(node, tpl)


class _IntervalsOverDiffGrouped:
    """windowby(intervals_over(at=DiffTable)).reduce over retraction
    streams: the window IS a θ-join of the data against the at-points
    (t ∈ [p+lower, p+upper]) followed by a per-point reduce — both
    already differential, so data AND at-point deltas retract exactly.
    The point column is exposed as `_pw_window_start`, like the batch
    operator."""

    def __init__(self, parent: DiffTable, time_ref, window):
        from ..operators.temporal import WSTART

        at = window.at
        if not isinstance(at, DiffTable):
            raise TypeError(
                "differential intervals_over needs at=DiffTable (a live "
                "point stream); wrap static points in a graph input")
        at_cols = _data_cols(at._template)
        if len(at_cols) != 1:
            raise TypeError("intervals_over: at= must have ONE time column")
        lo, up = window.lower, window.upper
        if not isinstance(lo, (int, float)) or not isinstance(up, (int, float)):
            raise NotImplementedError(
                "differential intervals_over takes integer bounds "
                "(same units as the time column)")
        tname = time_ref._name
        # DISTINCT the point stream like the batch operator
        # (temporal.py intervals_over applies .distinct()): duplicate
        # at-values must not multiply window weights
        at_node = at.node.select(F.col(at_cols[0]).alias(WSTART)).distinct()

        def cond(a, b):
            t, p = a[tname], b[WSTART]
            return (t >= p + F.lit(lo)) & (t <= p + F.lit(up))

        lcols = _data_cols(parent._template)
        # resident banding (r9): t ∈ [p+lo, p+up] rearranged to the
        # kernel's rtime-in-range form p ∈ [t-up, t-lo] — exact as-is
        # for integer axes; float axes band too (r10) because
        # orig_bounds hands the kernel the ORIGINAL predicate to
        # re-check (bands generate with ulp slack, candidates pass
        # `t ∈ [p+lo, p+up]` in IEEE doubles — Catalyst-identical)
        node = parent.node.join_theta(
            at_node, cond, lcols, [WSTART],
            band=dict(ltime=tname, rtime=WSTART, lo=-up, hi=-lo,
                      micros=False, keys=[], int_only=True,
                      orig_bounds=(lo, up)))
        tpl = parent._template.crossJoin(
            at._template.select(F.col(at_cols[0]).alias(WSTART))).limit(0)
        self._grouped = DiffGrouped(DiffTable(node, tpl), [WSTART])

    def reduce(self, *args, **kwargs) -> DiffTable:
        return self._grouped.reduce(*args, **kwargs)


class DifferentialTableGraph(DifferentialGraph):
    """DifferentialGraph whose sources speak the Table idiom."""

    def input(self, name: str, template) -> DiffTable:
        df = template._df if isinstance(template, Table) else template
        df = df.select(*[c for c in df.columns
                         if c not in ("_pw_id", DIFF, TIME)])
        node = self.source(name, df.limit(0))
        return DiffTable(node, df.limit(0))
