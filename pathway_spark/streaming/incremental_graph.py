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

from .differential import (DIFF, TIME, DiffNode, _LinearNode, _data_cols,
                           _expand, consolidate)


def _cc_decision_rows(ins_pairs, cut_pairs, sl_del, lab, seen):
    """Forest-CC decision rows from this batch's true inserts, forest
    cuts and self-loop deletes, given the touched labels (`lab`) and
    the set of nodes with a live trace row (`seen`).  Pure function —
    shared verbatim by the distributed `_ForestCCNode._advance` and
    the resident `_ForestCCKernel`."""
    rows = []
    for u, v in ins_pairs:
        lu, lv = lab.get(u, u), lab.get(v, v)
        su, sv = u in seen, v in seen
        if lu != lv or not su or not sv:
            rows.append({"u": u, "v": v, "lu": lu, "lv": lv,
                         "su": su, "sv": sv, "cut": False})
    for a, b in cut_pairs:
        la = lab.get(a, a)
        rows.append({"u": a, "v": b, "lu": la, "lv": la,
                     "su": True, "sv": True, "cut": True})
    for w in sl_del:
        lw = lab.get(w, w)
        rows.append({"u": w, "v": w, "lu": lw, "lv": lw,
                     "su": True, "sv": True, "cut": True})
    return rows


def _cc_decide(rows):
    """Driver union-find over the touched labels: which label groups
    FLIP (pure relabel), which labels must RE-SOLVE (bridge cuts), and
    which unseen endpoints emit as fresh singletons.  Pure function of
    the decision rows — shared by both execution paths."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    tree_edges, cutset, singles_unseen = [], set(), {}
    for r in sorted((r for r in rows if not r["cut"]),
                    key=lambda r: (r["lu"], r["lv"], r["u"], r["v"])):
        lu, lv = find(r["lu"]), find(r["lv"])
        parent.setdefault(r["lu"], r["lu"])
        parent.setdefault(r["lv"], r["lv"])
        if not r["su"]:
            singles_unseen[r["u"]] = True
        if not r["sv"]:
            singles_unseen[r["v"]] = True
        if lu != lv:
            parent[max(lu, lv)] = min(lu, lv)
            tree_edges.append((r["u"], r["v"], r["lu"]))
    for r in rows:
        if r["cut"]:
            cutset.add(r["lu"])
            cutset.add(r["lv"])
    groups: dict = {}
    for l in parent:
        groups.setdefault(find(l), set()).add(l)
    resolve_labels = set()
    for l in cutset:
        resolve_labels |= groups.get(find(l), {l}) if l in parent \
            else {l}
    resolve_roots = {find(l) for l in cutset if l in parent} | cutset
    mapping, singles_out = {}, []
    for root, members in groups.items():
        if members & resolve_labels:
            continue
        m = min(members)
        for l in members:
            if l != m:
                mapping[l] = m
    for w in singles_unseen:
        lw = find(w) if w in parent else w
        if w in resolve_labels or lw in resolve_roots \
                or (w in parent and groups.get(find(w), set())
                    & resolve_labels):
            continue          # the re-solve emits these
        singles_out.append((w, mapping.get(w, min(groups[find(w)])
                                           if w in parent else w)))
    flip_tree = [(u, v) for (u, v, lu) in tree_edges
                 if not (groups.get(find(lu), {lu}) & resolve_labels)]
    resolve_extra = [w for w in singles_unseen
                     if w in resolve_labels
                     or (w in parent and groups.get(find(w), set())
                         & resolve_labels)]
    return {"mapping": mapping, "singles_out": singles_out,
            "flip_tree": flip_tree, "resolve_labels": resolve_labels,
            "resolve_extra": resolve_extra}


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
        self._primed = (self._out_state._ver_ord > 0
                        or self._estate._ver_ord > 0)

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
            self._out_state.update(out, wide=self.graph._wide_batch,
                                   cut=False)
            self._estate.update(dE, wide=self.graph._wide_batch, cut=False)
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
        self._out_state.update(out, wide=self.graph._wide_batch, cut=False)
        self._estate.update(dE, wide=self.graph._wide_batch, cut=False)
        return out


def _cc_labels(e: DataFrame) -> DataFrame:
    """Min-label propagation on a plain (u, v) edge frame → (w, label):
    the batch operator, shorn of its Table/ID wrapper (ONE loop to
    maintain — incremental and batch labelings cannot diverge)."""
    from ..operators.iterate import connected_components
    from ..table import ID, Table

    return connected_components(Table(e.select("u", "v")))._df.drop(ID)


def _cc_labels_forest(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Min-label propagation that also extracts a spanning forest:
    `parent(w)` is the neighbor that delivered w's FINAL label when it
    first arrived (struct-min tie-break), so parent chains strictly
    decrease in adoption round — acyclic, and every non-root adopted
    its label from someone, so the parent edges span each component.
    Returns (labels (w, label), forest (a, b) with a < b normalized).

    Same recurrence as `connected_components` (labels are bit-identical
    to the batch operator); the extra `via` column rides along the
    min-struct."""
    from ..operators.iterate import _dfs_equal

    e2 = e.select("u", "v")
    sym = e2.union(e2.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = (sym.select(F.col("u").alias("w")).distinct()
                 .select("w", F.col("w").alias("label"),
                         F.col("w").alias("parent")))
    while True:
        cand = (sym.join(labels.select(F.col("w").alias("v"),
                                       F.col("label").alias("nl")), "v")
                   .select(F.col("u").alias("w"), "nl",
                           F.col("v").alias("via")))
        best = cand.groupBy("w").agg(
            F.min(F.struct("nl", "via")).alias("m"))
        new = (labels.join(best, "w", "left")
               .select("w",
                       F.when(F.col("m.nl") < F.col("label"),
                              F.col("m.nl")).otherwise(
                                  F.col("label")).alias("label"),
                       F.when(F.col("m.nl") < F.col("label"),
                              F.col("m.via")).otherwise(
                                  F.col("parent")).alias("parent"))
               ).localCheckpoint(eager=True)
        if _dfs_equal(new.select("w", "label"),
                      labels.select("w", "label")):
            labels = new
            break
        labels = new
    forest = (labels.filter(F.col("parent") != F.col("w"))
              .select(F.least("w", "parent").alias("a"),
                      F.greatest("w", "parent").alias("b")).distinct())
    return labels.select("w", "label"), forest


class _ForestCCNode(DiffNode):
    """Connected components with spanning-forest state — the
    giant-component mitigation.

    (decision-phase helpers `_cc_decision_rows` / `_cc_decide` are
    module-level so the resident kernel and the distributed path make
    BIT-IDENTICAL flip/resolve decisions — see `_ForestCCKernel`.)

    The affected-component rule re-solves the WHOLE touched component
    per delta; on real graphs (one giant component) that degenerates to
    full recompute.  This node keeps a spanning forest so that most
    deltas never run the fixed point at all:

    - insert inside a component (endpoint labels equal): no-op;
    - insert joining two components: a driver-side union-find over the
      batch's (micro-batch-bounded) label pairs plus ONE label-keyed
      trace flip — rows of the losing components retract and re-emit
      with the group-min label; the uniting edge joins the forest.  No
      edge-state scan, no fixed-point loop;
    - delete a NON-forest edge: no-op (connectivity unchanged);
    - delete a forest edge (or a node's last self-loop): only then the
      affected components re-solve via `_cc_labels_forest`, which also
      rebuilds their forests.

    Per-delta cost is therefore proportional to the OUTPUT change
    (label flips) except for genuine bridge cuts — the differential-
    dataflow cost profile for CC.  The driver collect is bounded by the
    batch size (label pairs of delta edges), the same contract as the
    engine's distinct-event-time collect.  The output trace is
    bucket-keyed by `label`, so flip/re-solve probes prune durable
    state by component."""

    def __init__(self, graph, edges: DiffNode):
        super().__init__(graph, [edges])
        self._estate = None
        self._forest = None
        self._trace = None
        self._primed = False

    def _res_kernel(self, eng):
        """Resident-engine hook (resident.py): steady micro-batches run
        the forest algebra in driver dicts via `_ForestCCKernel`."""
        return _ForestCCKernel(eng, self)

    def _ensure(self, dE: DataFrame) -> None:
        if self._estate is not None:
            return
        # bucket the edge state by u so both the per-batch old-weight
        # probe and the resolve-path component slice prune durable
        # state to the touched buckets (the trace below gets the same
        # treatment keyed by label)
        self._estate = self.graph._make_store(dE, key_cols=["u"])
        empty = dE.filter(F.lit(False))
        ftpl = (empty.select(F.least("u", "v").alias("a"),
                             F.greatest("u", "v").alias("b"))
                .withColumn(DIFF, F.lit(1).cast("long")))
        self._forest = self.graph._make_store(ftpl)
        ttpl = (empty.select(F.col("u").alias("w"),
                             F.col("u").alias("label"))
                .withColumn(DIFF, F.lit(1).cast("long")))
        self._trace = self.graph._make_store(ttpl, key_cols=["label"])
        # per-node NON-SELF edge degree as multiset weight — O(|V|)
        # rows, O(delta) upkeep.  Soundness: pair nets in a well-formed
        # stream are >= 0, so weight > 0 ⟹ some live incident pair
        # (never marks a dead node alive); a pathological mixed-sign
        # multiset can only UNDERcount, which costs an exact component
        # re-solve, never a wrong label.  Exists so the self-loop
        # aliveness check in _advance is a bucket-pruned O(|sl|) probe,
        # not a full edge-state scan.  Created LAST: stores restore by
        # creation index, so appending (not inserting) keeps state dirs
        # committed by earlier builds loadable
        dtpl = (empty.select(F.col("u").alias("w"))
                .withColumn(DIFF, F.lit(1).cast("long")))
        self._deg = self.graph._make_store(dtpl, key_cols=["w"])
        self._primed = (self._trace._ver_ord > 0
                        or self._estate._ver_ord > 0)
        self._ltype = dict(dE.dtypes)["u"]

    def _deg_delta(self, dE: DataFrame) -> DataFrame:
        e = dE.filter(F.col("u") != F.col("v")).select("u", "v", DIFF)
        return (e.select(F.col("u").alias("w"), DIFF)
                .unionByName(e.select(F.col("v").alias("w"), DIFF)))

    def _prime(self, dE: DataFrame, t: int) -> DataFrame:
        e_new = _expand(consolidate(
            self._estate.get().unionByName(
                dE.select("u", "v", DIFF))))
        labels, forest = _cc_labels_forest(e_new)
        out = (labels.withColumn(DIFF, F.lit(1).cast("long"))
               .withColumn(TIME, F.lit(t)).localCheckpoint(eager=False))
        wide = self.graph._wide_batch
        self._trace.update(out, wide=wide, cut=False)
        self._forest.update(
            forest.withColumn(DIFF, F.lit(1).cast("long")), wide=wide)
        self._deg.update(self._deg_delta(dE.select("u", "v", DIFF)),
                         wide=wide, cut=False)
        self._estate.update(dE, wide=wide, cut=False)
        return out

    def _advance(self, t: int) -> DataFrame:
        dE = self.inputs[0].delta(t)
        self._ensure(dE)
        if not self._primed:
            self._primed = True
            return self._prime(dE, t)
        g, spark = self.graph, self.graph.spark
        wide = g._wide_batch

        dnet = consolidate(dE).localCheckpoint(eager=False)
        pairs = dnet.select("u", "v")
        old_w = (self._estate.get(probe=pairs, on=["u"])
                 .join(self._small(pairs), on=["u", "v"], how="left_semi")
                 .groupBy("u", "v").agg(F.sum(DIFF).alias("__old")))
        chg = (dnet.join(old_w, ["u", "v"], "left")
               .select("u", "v",
                       F.coalesce(F.col("__old"), F.lit(0)).alias("__old"),
                       (F.coalesce(F.col("__old"), F.lit(0))
                        + F.col(DIFF)).alias("__new"))
               .localCheckpoint(eager=False))
        true_ins = chg.filter((F.col("__old") <= 0) & (F.col("__new") > 0))
        true_del = chg.filter((F.col("__old") > 0) & (F.col("__new") <= 0))

        # forest rows cut by true deletions (normalized orientation)
        del_n = true_del.select(F.least("u", "v").alias("a"),
                                F.greatest("u", "v").alias("b"))
        cuts = (self._forest.get()
                .join(self._small(del_n), on=["a", "b"], how="left_semi"))

        # ONE tagged delta-sized collect feeds the whole driver decision
        # phase; the label lookup is a second delta-keyed probe collect.
        # (The previous shape joined broadcast label frames into
        # ins_info/cut_info plans — each distinct broadcast leg executes
        # as its own driver job, ~13 sequential mini-jobs per batch, the
        # dominant term of the CC per-batch floor.  The decision data is
        # micro-batch-bounded either way; moving the lookup join to a
        # Python dict trades those jobs for two collects.)
        tagged = (true_ins.select(F.lit("i").alias("__k"), "u", "v")
                  .unionByName(true_del.filter(F.col("u") == F.col("v"))
                               .select(F.lit("s").alias("__k"), "u", "v"))
                  .unionByName(cuts.select(F.lit("c").alias("__k"),
                                           F.col("a").alias("u"),
                                           F.col("b").alias("v"))))
        base_rows = tagged.collect()                      # O(|batch|)
        ins_pairs = [(r["u"], r["v"]) for r in base_rows if r["__k"] == "i"]
        sl_del = sorted({r["u"] for r in base_rows if r["__k"] == "s"})
        cut_pairs = [(r["u"], r["v"]) for r in base_rows if r["__k"] == "c"]
        node_set = sorted({x for p in ins_pairs for x in p}
                          | {x for p in cut_pairs for x in p}
                          | set(sl_del))
        lab: dict = {}
        seen: set = set()
        if node_set:
            ndf = spark.createDataFrame([(w,) for w in node_set],
                                        f"w {self._ltype}")
            # must consolidate: an unconsolidated trace slice's +x/-x
            # pair would record a stale label for a net-absent row
            tr_slice = consolidate(
                self._trace.get(probe=ndf, on=["w"])
                .join(F.broadcast(ndf), on="w", how="left_semi"))
            for r in tr_slice.select("w", "label").collect():
                lab[r["w"]] = r["label"]
                seen.add(r["w"])
        rows = _cc_decision_rows(ins_pairs, cut_pairs, sl_del, lab, seen)

        # a deleted SELF-LOOP is a cut only when it was the node's LAST
        # live edge (self-loops are never forest edges and never carry
        # connectivity between distinct nodes; their one effect is node
        # existence).  Deciding needs an incident-edge probe, so it runs
        # as a second tiny job ONLY on batches that deleted self-loops —
        # treating every self-loop delete as a cut would re-solve the
        # node's whole (possibly giant) component for a delete that
        # changes no labels
        sl_nodes = sorted({r["u"] for r in rows
                           if r["cut"] and r["u"] == r["v"]})
        sl_alive: set = set()
        if sl_nodes:
            lt0 = self._ltype
            slw = spark.createDataFrame([(w,) for w in sl_nodes],
                                        f"w {lt0}")
            # bucket-pruned O(|sl|) probe of the degree store (+ this
            # batch's own deg delta), NOT an edge-state scan
            deg = (self._deg.get(probe=slw, on=["w"])
                   .unionByName(self._deg_delta(dnet))
                   .join(F.broadcast(slw), "w", "left_semi")
                   .groupBy("w").agg(F.sum(DIFF).alias("__d"))
                   .filter(F.col("__d") > 0))
            sl_alive = {r["w"] for r in deg.select("w").collect()}
        rows = [r for r in rows
                if not (r["cut"] and r["u"] == r["v"]
                        and r["u"] in sl_alive)]

        # -- driver union-find over the touched labels ------------------
        dec = _cc_decide(rows)
        mapping, singles_out = dec["mapping"], dec["singles_out"]
        flip_tree, resolve_labels = dec["flip_tree"], dec["resolve_labels"]

        lt = self._ltype
        pieces, f_pieces = [], []

        # -- flip path: label rewrite, no fixed point -------------------
        if mapping:
            map_df = spark.createDataFrame(
                sorted(mapping.items()), f"label {lt}, __nl {lt}")
            # NO inner consolidate: the output union is consolidated
            # below, and an unconsolidated trace slice's +x/−x pairs
            # map to symmetric ± legs that cancel in the same final
            # (w, label) groups — one shuffle per batch saved.  (The
            # label-LOOKUP slice tr_slice above must stay consolidated:
            # duplicate lookup rows would duplicate ins_info rows and
            # double forest-edge weights in the driver union-find.)
            members = (self._trace.get(probe=map_df, on=["label"])
                       .join(F.broadcast(map_df), "label"))
            pieces.append(members.select(
                "w", "label", (-F.col(DIFF)).alias(DIFF)))
            pieces.append(members.select(
                "w", F.col("__nl").alias("label"), F.col(DIFF)))
        if singles_out:
            pieces.append(spark.createDataFrame(
                sorted(singles_out), f"w {lt}, label {lt}")
                .withColumn(DIFF, F.lit(1).cast("long")))
        if flip_tree:
            f_pieces.append(spark.createDataFrame(
                sorted(flip_tree), f"u {lt}, v {lt}")
                .select(F.least("u", "v").alias("a"),
                        F.greatest("u", "v").alias("b"))
                .withColumn(DIFF, F.lit(1).cast("long")))

        # -- resolve path: bridge cuts re-solve their components --------
        if resolve_labels:
            res_lab = spark.createDataFrame(
                sorted((l,) for l in resolve_labels), f"label {lt}")
            # unconsolidated is safe here too: the retraction leg's
            # pairs cancel in the final consolidate, and a phantom w
            # (net-zero rows) in res_nodes pulls no live edges into
            # e_slice, so the re-solve ignores it
            old_rows = (self._trace.get(probe=res_lab, on=["label"])
                        .join(F.broadcast(res_lab), "label", "left_semi"))
            res_nodes = old_rows.select("w")
            extra = dec["resolve_extra"]
            if extra:
                res_nodes = res_nodes.unionByName(spark.createDataFrame(
                    sorted((w,) for w in extra), f"w {lt}"))
            sn_u = res_nodes.withColumnRenamed("w", "u")
            dE_slice = dnet.join(F.broadcast(sn_u), "u", "left_semi")
            e_slice = _expand(consolidate(
                self._estate.get(probe=sn_u, on=["u"])
                    .join(sn_u, "u", "left_semi")
                    .select("u", "v", DIFF)
                    .unionByName(dE_slice.select("u", "v", DIFF))))
            labels_new, forest_new = _cc_labels_forest(
                e_slice.localCheckpoint(eager=False))
            pieces.append(old_rows.select(
                "w", "label", (-F.col(DIFF)).alias(DIFF)))
            pieces.append(labels_new.withColumn(
                DIFF, F.lit(1).cast("long")))
            f_old = (self._forest.get()
                     .join(sn_u.withColumnRenamed("u", "a"), "a",
                           "left_semi"))
            f_pieces.append(f_old.select(
                "a", "b", (-F.col(DIFF)).alias(DIFF)))
            f_pieces.append(forest_new.withColumn(
                DIFF, F.lit(1).cast("long")))

        ttpl = (self._trace.get().filter(F.lit(False))
                .select("w", "label", DIFF))
        out = ttpl
        for p in pieces:
            out = out.unionByName(p.select("w", "label", DIFF))
        out = (consolidate(out).withColumn(TIME, F.lit(t))
               .localCheckpoint(eager=False))
        self._trace.update(out, wide=wide, cut=False)
        if f_pieces:
            fd = f_pieces[0]
            for p in f_pieces[1:]:
                fd = fd.unionByName(p.select(*fd.columns))
            self._forest.update(consolidate(fd), wide=wide)
        self._deg.update(self._deg_delta(dnet), wide=wide, cut=False)
        self._estate.update(dnet.withColumn(TIME, F.lit(t)), wide=wide,
                            cut=False)
        return out


def _cc_solve_py(res_nodes, est_idx):
    """Resident-path component re-solve: deterministic BFS over the
    post-delta edge slice of the resolved components (edge-closed, so
    the u-side index covers every in-component edge).  Same min-label
    result as `_cc_labels_forest`; the BFS tree is an equally valid
    spanning forest.  Module-level so the cheap-path tests can count
    re-solves on this path exactly as on the distributed one."""
    nbr: dict = {}
    live: set = set()
    for u in res_nodes:
        for (eu, ev), wt in est_idx.get((u,), {}).items():
            if wt > 0:
                live.add(eu)
                live.add(ev)
                if eu != ev:
                    nbr.setdefault(eu, set()).add(ev)
                    nbr.setdefault(ev, set()).add(eu)
    labels, tree = [], []
    seen: set = set()
    for start in sorted(live):
        if start in seen:
            continue
        comp = [start]
        seen.add(start)
        frontier = [start]
        while frontier:
            nxt = []
            for x in frontier:
                for y in sorted(nbr.get(x, ())):
                    if y not in seen:
                        seen.add(y)
                        comp.append(y)
                        tree.append((min(x, y), max(x, y)))
                        nxt.append(y)
            frontier = nxt
        m = min(comp)
        labels.extend((w, m) for w in comp)
    return labels, tree


class _ForestCCKernel:
    """Resident evaluator for `_ForestCCNode` (resident.py's custom-
    kernel hook): the spanning-forest state lives in driver dicts and
    a steady batch runs entirely in Python — no per-tick planning, no
    probe jobs.  Decision logic is the SAME code the distributed path
    runs (`_cc_decision_rows` / `_cc_decide`); the resolve path's
    fixed point becomes a BFS over the component slice (same min-label
    result; any spanning forest of the live graph is equivalent for
    future cut decisions).  Ineligible batches (unprimed node, over-cap
    state) fall back to the distributed `_advance` unchanged."""

    def __init__(self, eng, node):
        self.eng = eng
        self.node = node
        self.estate = self.forest = self.trace = self.deg = None
        self.wlab: dict | None = None

    def ensure(self) -> bool:
        n = self.node
        if n._estate is None or not n._primed:
            return False
        if self.estate is None:
            est = self.eng._mirror_for(n._estate, ["u"])
            fo = self.eng._mirror_for(n._forest, None)
            tr = self.eng._mirror_for(n._trace, ["label"])
            dg = self.eng._mirror_for(n._deg, None)
            if None in (est, fo, tr, dg):
                return False
            self.estate, self.forest, self.trace, self.deg = est, fo, tr, dg
            self.wlab = {d[0]: d[1] for d in tr.data}
        return True

    def advance(self, t: int, dE) -> "object":
        from .resident import RDelta
        up, vp, dp = dE.pos("u"), dE.pos("v"), dE.pos(DIFF)
        net: dict = {}
        for r in dE.rows:
            k = (r[up], r[vp])
            nw = net.get(k, 0) + r[dp]
            if nw == 0:
                net.pop(k, None)
            else:
                net[k] = nw

        est, fo, tr, dg = self.estate, self.forest, self.trace, self.deg
        true_ins, true_del = [], []
        for (u, v), dw in net.items():
            old = est.data.get((u, v), 0)
            new = old + dw
            if old <= 0 < new:
                true_ins.append((u, v))
            elif old > 0 >= new:
                true_del.append((u, v))
        del_n = {(min(u, v), max(u, v)) for u, v in true_del}
        cut_pairs = [(a, b) for (a, b) in del_n
                     if fo.data.get((a, b), 0) > 0]
        sl_del = sorted({u for u, v in true_del if u == v})

        node_set = ({x for p in true_ins for x in p}
                    | {x for p in cut_pairs for x in p} | set(sl_del))
        lab = {w: self.wlab[w] for w in node_set if w in self.wlab}
        rows = _cc_decision_rows(true_ins, cut_pairs, sl_del, lab,
                                 set(lab))

        # self-loop delete is a cut only when it was the node's LAST
        # live edge — deg mirror + this batch's own degree delta
        bd: dict = {}
        for (u, v), dw in net.items():
            if u != v:
                bd[u] = bd.get(u, 0) + dw
                bd[v] = bd.get(v, 0) + dw
        sl_alive = {r["u"] for r in rows
                    if r["cut"] and r["u"] == r["v"]
                    and dg.data.get((r["u"],), 0)
                    + bd.get(r["u"], 0) > 0}
        rows = [r for r in rows
                if not (r["cut"] and r["u"] == r["v"]
                        and r["u"] in sl_alive)]
        dec = _cc_decide(rows)

        # state advances BEFORE the resolve reads it: the slice must be
        # the post-delta edge multiset (the distributed path gets the
        # same effect by unioning dE into the slice)
        est.apply(net.items())
        dg.apply(((w,), dw) for w, dw in bd.items())

        out: dict = {}

        def emit(w, l, dw):
            k = (w, l)
            nw = out.get(k, 0) + dw
            if nw == 0:
                out.pop(k, None)
            else:
                out[k] = nw

        f_delta: dict = {}

        def femit(a, b, dw):
            k = (a, b)
            nw = f_delta.get(k, 0) + dw
            if nw == 0:
                f_delta.pop(k, None)
            else:
                f_delta[k] = nw

        # -- flip path: pure relabel of the losing components ----------
        for l, nl in dec["mapping"].items():
            for (w, _l), wt in tr.idx.get((l,), {}).items():
                emit(w, l, -wt)
                emit(w, nl, wt)
        for w, l in dec["singles_out"]:
            emit(w, l, 1)
        for u, v in dec["flip_tree"]:
            femit(min(u, v), max(u, v), 1)

        # -- resolve path: bridge cuts re-solve their components -------
        resolve_labels = dec["resolve_labels"]
        if resolve_labels:
            res_nodes = set(dec["resolve_extra"])
            for l in resolve_labels:
                for (w, _l), wt in tr.idx.get((l,), {}).items():
                    emit(w, _l, -wt)
                    res_nodes.add(w)
            labels_new, tree_new = _cc_solve_py(res_nodes, est.idx)
            for w, m in labels_new:
                emit(w, m, 1)
            for a, b in tree_new:
                femit(a, b, 1)
            # old forest rows of the resolved components retract
            for (a, b), wt in list(fo.data.items()):
                if a in res_nodes:
                    femit(a, b, -wt)

        # -- apply + emit ----------------------------------------------
        tr.apply(list(out.items()))
        for (w, l), dw in out.items():
            if dw < 0 and self.wlab.get(w) == l:
                del self.wlab[w]
        for (w, l), dw in out.items():
            if dw > 0:
                self.wlab[w] = l
        if f_delta:
            fo.apply(f_delta.items())
        return RDelta(["w", "label", DIFF, TIME],
                      [(w, l, dw, t) for (w, l), dw in out.items()])


def incremental_connected_components(edges: DiffNode,
                                     strategy: str = "forest") -> DiffNode:
    """Differential connected components: emits (w, label) insertions
    and retractions as edges come and go.

    `strategy="forest"` (default) keeps spanning-forest state so that
    intra-component inserts and non-bridge deletes cost O(delta) — only
    bridge cuts re-solve their component.  `strategy="component"` is
    the plain affected-component recompute (re-solves every touched
    component per batch)."""
    if strategy == "forest":
        return _ForestCCNode(edges.graph, edges)

    def tpl(e):
        return e.select(F.col("u").alias("w"), F.col("u").alias("label"))

    return _ComponentRecomputeNode(edges.graph, edges, _cc_labels, tpl,
                                   node_col="w", comp_cols=["label"])


def incremental_louvain(edges: DiffNode, *,
                        max_iterations: int = 10) -> DiffNode:
    """Incremental community detection (reference
    `stdlib/graphs/louvain_communities/impl.py`, here the same
    weighted-LPA approximation as the batch operator): (n, label)
    deltas as weighted edges come and go.

    Built ON the generic level cascade (`iterate_diff.py`) — one LPA
    round is expressed with DiffNode join/reduce/argmin operators and
    iterated with `iteration_limit=max_iterations`, so the incremental
    answer is EXACTLY the batch operator's `max_iterations`-th iterate
    (including non-converged/oscillating graphs).  Integer edge weights
    keep the weighted sums engine-exact; float weights may differ from
    a batch recompute by summation-order ULPs on near-ties (same
    caveat as the batch operator's own determinism note)."""
    # symmetrize with a weight column (default 1)
    def w_col(df):
        return (F.col("weight") if "weight" in df.columns
                else F.lit(1).cast("long")).alias("w")

    # pre-shaped OUTSIDE the loop (u, x=v, w) so the body joins the
    # invariant edge stream DIRECTLY — one shared arrangement serves
    # all max_iterations levels instead of one edge-state copy each
    sym = _LinearNode(
        edges.graph, edges,
        lambda df: df.select(F.col("u"), F.col("v").alias("x"),
                             w_col(df), DIFF, TIME)
        .unionByName(df.select(F.col("v").alias("u"),
                               F.col("u").alias("x"), w_col(df),
                               DIFF, TIME)))
    seed = sym.select(F.col("u").alias("n"),
                      F.col("u").alias("label")).distinct()

    def lpa_round(v, incident):
        neigh = (v.select(F.col("n").alias("x"), F.col("label"))
                 .join(incident, on=["x"])
                 .reduce(["u", "label"], lw=("sum", "w")))
        best = neigh.reduce(
            ["u"],
            new_label=("argmin", "label",
                       F.struct((-F.col("lw")).alias("a"),
                                F.col("label").alias("b"))))
        return (v.join(best.select(F.col("u").alias("n"), "new_label"),
                       on=["n"], how="left")
                .select(F.col("n"),
                        F.coalesce("new_label", "label").alias("label")))

    from .iterate_diff import iterate_differential
    return iterate_differential(lpa_round, seed, {"incident": sym},
                                iteration_limit=max_iterations,
                                arranged=("incident",))


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


def incremental_pagerank_cascade(edges: DiffNode, steps: int = 5,
                                 damping_pct: int = 85,
                                 dense_delta_guard: float | None = None,
                                 dense_guard_min_rows: int = 10_000
                                 ) -> DiffNode:
    """PageRank on the generic level cascade — the giant-component-safe
    variant: per-delta cost is O(edges within `steps` hops of the
    delta), never O(component), because each level propagates only the
    circulating rank deltas (the affected-component rule re-solves the
    whole touched component, which on real graphs IS the graph).
    The k-hop bound is data-dependent: on small-diameter graphs the
    steps-hop neighborhood approaches the whole graph and most ranks
    legitimately change — no exact incremental scheme can emit less
    than that true output delta; prefer this variant on graphs with
    locality or where component slicing degenerates (COVERAGE.md
    cascade cost note).

    Exactly `pagerank_exact`'s 10^-9 fixed-point integer recurrence
    (engine-exact: every retraction cancels its insertion
    bit-for-bit), with `iteration_limit=steps` — the batch operator
    runs exactly `steps` rounds, so parity is structural.  Emits
    (w, rank) deltas.  The invariant streams (edges, out-degrees,
    vertices) are shared arrangements across all levels."""
    from ..operators.iterate import PAGERANK_SCALE
    from .iterate_diff import iterate_differential

    def idiv(a, b):
        return ((a - F.pmod(a, b)) / b).cast("long")

    base = (100 - damping_pct) * PAGERANK_SCALE // 100
    e = _LinearNode(edges.graph, edges,
                    lambda df: df.select("u", "v", DIFF, TIME))
    verts = _LinearNode(
        edges.graph, edges,
        lambda df: df.select(F.col("u").alias("w"), DIFF, TIME)
        .unionByName(df.select(F.col("v").alias("w"), DIFF, TIME))) \
        .distinct()
    outdeg = e.reduce(["u"], deg=("count",))
    seed = verts.select(
        "w", F.lit(PAGERANK_SCALE).cast("long").alias("rank"))

    def pr_round(r, e, outdeg, verts):
        contrib = (r.select(F.col("w").alias("u"), "rank")
                   .join(outdeg, on=["u"])
                   .join(e, on=["u"])
                   .select(F.col("v").alias("w"),
                           idiv(F.col("rank"), F.col("deg")).alias("c"))
                   .reduce(["w"], in_rank=("sum", "c")))
        return (verts.join(contrib.select("w", "in_rank"),
                           on=["w"], how="left")
                .select("w", (F.lit(base) + idiv(
                    F.lit(damping_pct)
                    * F.coalesce("in_rank", F.lit(0)), F.lit(100)))
                    .alias("rank")))

    return iterate_differential(
        pr_round, seed, {"e": e, "outdeg": outdeg, "verts": verts},
        iteration_limit=steps, arranged=("e", "outdeg", "verts"),
        dense_delta_guard=dense_delta_guard,
        dense_guard_min_rows=dense_guard_min_rows)


def incremental_bellman_ford_cascade(edges: DiffNode,
                                     start_vertex,
                                     max_depth: int = 64) -> DiffNode:
    """Single-source shortest paths on the level cascade — per-delta
    cost O(edges within hop-radius of the delta), never O(component)
    (see `incremental_pagerank_cascade`).  The body is the batch
    operator's relaxation round bit-for-bit (float ADDITION along a
    path is deterministic per row; only MIN selection aggregates, so
    no summation-order drift), iterated to the fixed point; depth
    equals the shortest-path hop radius.  `max_depth` bounds runaway
    relaxation (negative-weight cycles raise, like the batch |V|-pass
    guard).  Emits (w, d) deltas; unreachable nodes carry d = NULL."""
    from .iterate_diff import iterate_differential

    e = _LinearNode(edges.graph, edges,
                    lambda df: df.select("u", "v", "dist", DIFF, TIME))
    verts = _LinearNode(
        edges.graph, edges,
        lambda df: df.select(F.col("u").alias("w"), DIFF, TIME)
        .unionByName(df.select(F.col("v").alias("w"), DIFF, TIME))) \
        .distinct()
    seed = verts.select(
        "w", F.when(F.col("w") == F.lit(start_vertex),
                    F.lit(0.0)).alias("d"))

    def bf_round(dists, e):
        relaxed = (dists.select(F.col("w").alias("u"), "d")
                   .join(e, on=["u"])
                   .select(F.col("v").alias("w"),
                           (F.col("d") + F.col("dist")).alias("nd"))
                   .reduce(["w"], nd=("min", "nd")))
        return (dists.join(relaxed, on=["w"], how="left")
                .select("w", F.least("d", "nd").alias("d")))

    return iterate_differential(bf_round, seed, {"e": e},
                                arranged=("e",), max_depth=max_depth)


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
