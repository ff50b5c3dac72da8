"""Incremental graph algorithms over the differential engine.

The reference iterates *inside* the dataflow, so `pw.iterate`-built
results (pagerank, connected components) update incrementally when
edges change (`internals/common.py:39-91` iterate over a subgraph;
engine `graph.rs:931` `iterate` scope — deltas circulate through the
loop instead of recomputing it).  The Spark translation here uses the
**affected-component rule**, the graph analogue of the differential
reduce's affected-key rule:

- a batch's edge delta can only change results inside the connected
  components touching the delta's endpoints (plus any components the
  new edges merge) — component-local algorithms (min-label CC;
  PageRank in its N-free form `r = base + d·Σ r_u/deg(u)`) never see
  cross-component contributions;
- so per batch: find the touched components from the node's own
  OUTPUT TRACE, slice the edge state to those components (old
  components are edge-closed, one semi-join), re-run the batch
  algorithm on the slice only, and emit `new − old` where `old` is
  the exact previously-emitted bytes (float/ULP-safe cancellation,
  same as `_ReduceNode`'s output trace).

Cost per batch is O(|affected components|): an edge retraction in one
small component re-solves that component only, not the graph.  Both
algorithms are engine-exact (min-label integers; `pagerank_exact`'s
10^-9 fixed-point integers), so the emitted changelog integrates to
the SAME rows a full batch recompute would produce — prefix equality,
not just tolerance.

Scale notes: the state scans are pruned by broadcast semi-joins on
delta-derived key sets before any shuffle; the inner fixed-point loop
runs on the (small) component slice with per-iteration localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .differential import (DIFF, TIME, DiffNode, _data_cols, _expand,
                           consolidate)


class _ComponentRecomputeNode(DiffNode):
    """Differential wrapper for component-local graph algorithms.

    `op(edges_df) -> DataFrame` must be a DETERMINISTIC function of the
    edge multiset whose output rows for a connected component depend
    only on that component's edges, keyed by a node column `node_col`
    present in the output."""

    def __init__(self, graph, edges: DiffNode, op_fn, out_template_fn,
                 node_col: str = "w", comp_cols: list[str] | None = None):
        super().__init__(graph, [edges])
        self._op = op_fn
        self._out_tpl = out_template_fn   # (edge_template_df) -> empty out df
        self._ncol = node_col
        self._ccols = comp_cols
        self._estate = None      # edge multiset
        self._out_state = None   # output trace (exact emitted bytes)
        self._primed = False     # True once the trace holds a full answer

    def _ensure_stores(self, dE: DataFrame) -> None:
        """Both stores are created UP FRONT (deterministic creation
        order for durable restore) from explicit templates; whether the
        node starts 'primed' comes from the restored trace version, NOT
        from in-memory state — a restored process must take the
        incremental branch, never re-emit the whole answer as +1."""
        if self._estate is not None:
            return
        self._estate = self.graph._make_store(dE)
        tpl = self._out_tpl(dE.filter(F.lit(False))) \
            .withColumn(DIFF, F.lit(1).cast("long"))
        self._out_state = self.graph._make_store(tpl)
        self._primed = self._out_state._ver > 0 or self._estate._ver > 0

    def _advance(self, t: int) -> DataFrame:
        dE = self.inputs[0].delta(t)
        self._ensure_stores(dE)
        e_state = self._estate.get()
        nc = self._ncol

        # nodes the delta touches (either endpoint)
        touched = (dE.select(F.col("u").alias(nc))
                     .unionByName(dE.select(F.col("v").alias(nc)))
                     .distinct())

        if not self._primed:
            # first batch: no previous output — everything is "new"
            self._primed = True
            e_new = _expand(consolidate(
                e_state.unionByName(dE.select(*_data_cols(e_state), DIFF))))
            new = self._op(e_new).withColumn(DIFF, F.lit(1).cast("long"))
            out = new.withColumn(TIME, F.lit(t)).localCheckpoint(eager=False)
            self._out_state.update(out, wide=self.graph._wide_batch)
            self._estate.update(dE, wide=self.graph._wide_batch)
            return out

        trace = self._out_state.get()
        # labels of the touched nodes only (broadcast-pruned slice scan)
        touched_lab = consolidate(
            trace.join(self._small(touched), on=nc, how="left_semi"))
        # every previously-emitted row of the affected components: any
        # output row sharing a value-tuple "component key" with a
        # touched node.  For CC the component key IS the label column;
        # for pagerank we carry an explicit `comp` column in the output
        # (see incremental_pagerank) for exactly this purpose.
        comp_cols = self._ccols or [c for c in _data_cols(trace)
                                    if c != nc]
        comps = touched_lab.select(*comp_cols).distinct()
        old_rows = consolidate(
            trace.join(self._small(comps), on=comp_cols, how="left_semi"))

        slice_nodes = (old_rows.select(nc).unionByName(touched).distinct())
        # slice FIRST, consolidate the slice: consolidate commutes with
        # the semi-join (u is a group-by column), and consolidating the
        # whole edge state would pay a full-state shuffle per batch.
        # Old components are edge-closed and labels are symmetric, so
        # the u-side semi-join alone covers every intra-component edge;
        # delta edges' endpoints are in slice_nodes via `touched`.
        # slice_nodes is COMPONENT-sized (not delta-bounded) — no
        # broadcast hint; this join may legitimately shuffle.
        sn_u = slice_nodes.withColumnRenamed(nc, "u")
        e_slice_ms = consolidate(
            e_state.join(sn_u, on="u", how="left_semi")
                   .unionByName(dE.select(*_data_cols(e_state), DIFF)))
        e_slice = _expand(e_slice_ms).localCheckpoint(eager=False)

        new = self._op(e_slice).withColumn(DIFF, F.lit(1).cast("long"))
        old = old_rows.withColumn(DIFF, -F.col(DIFF))
        out = consolidate(old.unionByName(new.select(*old.columns))) \
            .withColumn(TIME, F.lit(t)).localCheckpoint(eager=False)
        self._out_state.update(out, wide=self.graph._wide_batch)
        self._estate.update(dE, wide=self.graph._wide_batch)
        return out


def _cc_labels(e: DataFrame) -> DataFrame:
    """Min-label propagation on a plain (u, v) edge frame → (w, label):
    the batch operator, shorn of its Table/ID wrapper (ONE loop to
    maintain — incremental and batch labelings cannot diverge)."""
    from ..operators.iterate import connected_components
    from ..table import ID, Table

    return connected_components(Table(e.select("u", "v")))._df.drop(ID)


def incremental_connected_components(edges: DiffNode) -> DiffNode:
    """Differential connected components: emits (w, label) insertions
    and retractions as edges come and go.  The label doubles as the
    component key, so affected-component slicing needs no extra
    column."""
    def tpl(e):
        return e.select(F.col("u").alias("w"), F.col("u").alias("label"))

    return _ComponentRecomputeNode(edges.graph, edges, _cc_labels, tpl,
                                   node_col="w", comp_cols=["label"])


def incremental_pagerank(edges: DiffNode, steps: int = 5,
                         damping_pct: int = 85) -> DiffNode:
    """Differential PageRank: (w, rank, comp) with 10^-9 fixed-point
    integer ranks (`operators/iterate.py pagerank_exact` recurrence —
    engine-exact, so retract/insert pairs cancel bit-for-bit).

    The output carries the node's component label `comp` as the
    component key for affected-component slicing; the N-free
    recurrence makes ranks component-local, so slice-recompute equals
    full recompute exactly."""
    from ..operators.iterate import pagerank_exact
    from ..table import ID, Table

    def op(e: DataFrame) -> DataFrame:
        ranks = pagerank_exact(Table(e), steps=steps,
                               damping_pct=damping_pct)._df.drop(ID)
        labels = _cc_labels(e)
        return (ranks.join(labels, "w")
                     .select("w", "rank", F.col("label").alias("comp")))

    def tpl(e):
        return e.select(F.col("u").alias("w"),
                        F.lit(0).cast("long").alias("rank"),
                        F.col("u").alias("comp"))

    return _ComponentRecomputeNode(edges.graph, edges, op, tpl,
                                   node_col="w", comp_cols=["comp"])


def incremental_bellman_ford(edges: DiffNode, start_vertex) -> DiffNode:
    """Differential single-source shortest paths (reference
    `stdlib/graphs/bellman_ford`): (w, d, comp) deltas over a live
    (u, v, dist) edge stream.  Nodes unreachable from the start carry
    d = NULL (like the batch operator); the affected-component rule
    applies unchanged because distances depend only on the node's
    component; relaxation to a fixed point is deterministic (min over
    path sums), so retract/insert pairs cancel exactly via the output
    trace.  Relaxation is bounded by |V| passes (the Bellman-Ford
    guarantee); a graph still relaxing after that has a negative
    cycle and raises rather than spinning forever."""
    from ..operators.iterate import bellman_ford
    from ..table import ID, Table

    def op(e: DataFrame) -> DataFrame:
        verts = (e.select(F.col("u").alias("w"))
                  .union(e.select(F.col("v").alias("w"))).distinct())
        dists = bellman_ford(Table(verts), Table(e),
                             start_vertex)._df.drop(ID)
        labels = _cc_labels(e)
        return (dists.join(labels, "w")
                     .select("w", "d", F.col("label").alias("comp")))

    def tpl(e):
        return e.select(F.col("u").alias("w"),
                        F.lit(0.0).cast("double").alias("d"),
                        F.col("u").alias("comp"))

    return _ComponentRecomputeNode(edges.graph, edges, op, tpl,
                                   node_col="w", comp_cols=["comp"])
