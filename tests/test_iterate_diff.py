"""Generic incremental iterate (level cascade) vs batch recompute.

The bodies below are USER-written fixed points — not the shipped
incremental graph algorithms — built from the DiffNode operator API.
Invariant: after every batch of insertions/retractions, integrating
the iterate node's changelog equals recomputing the fixed point from
scratch on the accumulated inputs (prefix equality).

Reachability is the discriminating case: the stale reachable set
REMAINS a fixed point of `v ∪ hop(v)` after an edge retraction, so any
warm-seeded recomputation returns the stale answer — only re-deriving
every iterate from the seed (what the level cascade maintains
incrementally) shrinks the set correctly.
"""

import random

import pytest
from pyspark.sql import functions as F

from pathway_spark.streaming.differential import (
    DIFF, DifferentialGraph,
)
from pathway_spark.streaming.iterate_diff import iterate_differential


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _reach_body(v, edges):
    """One application of: reachable = reachable ∪ successors."""
    hop = (v.select(F.col("x").alias("u"))
            .join(edges, ["u"])
            .select(F.col("v").alias("x")))
    return v.union(hop).distinct()


def _bfs(seeds, edges):
    """Python oracle: nodes reachable from seeds over directed edges."""
    adj = {}
    for u, w in edges:
        adj.setdefault(u, set()).add(w)
    seen, frontier = set(seeds), list(seeds)
    while frontier:
        nxt = []
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in seen:
                    seen.add(m)
                    nxt.append(m)
        frontier = nxt
    return seen


def _feed(spark, g, node, seeds_d=None, edges_d=None):
    kw = {}
    if seeds_d:
        df = spark.createDataFrame([(x,) for x, _ in seeds_d], "x long")
        kw["seeds"] = df.withColumn(
            DIFF, F.lit(seeds_d[0][1])) if seeds_d[0][1] != 1 else df
    if edges_d:
        df = spark.createDataFrame([(u, v) for u, v, _ in edges_d],
                                   "u long, v long")
        kw["edges"] = df.withColumn(
            DIFF, F.lit(edges_d[0][2])) if edges_d[0][2] != 1 else df
    return g.step(node, **kw)


def test_reachability_insert_only_converges(spark):
    g = DifferentialGraph(spark)
    seeds = g.source("seeds", spark.createDataFrame([], "x long"))
    edges = g.source("edges", spark.createDataFrame([], "u long, v long"))
    reach = iterate_differential(_reach_body, seeds, {"edges": edges})

    (d1,) = _feed(spark, g, reach, seeds_d=[(1, 1)],
                  edges_d=[(1, 2, 1), (2, 3, 1), (5, 6, 1)])
    assert _rows(DifferentialGraph.integrate(d1), "x") == [(1,), (2,), (3,)]

    # connect the far component: only the newly-reachable nodes emit
    (d2,) = _feed(spark, g, reach, edges_d=[(3, 5, 1)])
    assert _rows(d2, "x", DIFF) == [(5, 1), (6, 1)]


def test_reachability_retraction_shrinks_stale_fixed_point(spark):
    """Cutting the bridge edge must retract the downstream nodes even
    though the stale set is still a fixed point of the body."""
    g = DifferentialGraph(spark)
    seeds = g.source("seeds", spark.createDataFrame([], "x long"))
    edges = g.source("edges", spark.createDataFrame([], "u long, v long"))
    reach = iterate_differential(_reach_body, seeds, {"edges": edges})

    _feed(spark, g, reach, seeds_d=[(1, 1)],
          edges_d=[(1, 2, 1), (2, 3, 1), (3, 4, 1)])
    (d2,) = _feed(spark, g, reach, edges_d=[(2, 3, -1)])
    assert _rows(d2, "x", DIFF) == [(3, -1), (4, -1)]


def test_randomized_prefix_equality_vs_batch_recompute(spark):
    rng = random.Random(7)
    g = DifferentialGraph(spark)
    seeds = g.source("seeds", spark.createDataFrame([], "x long"))
    edges = g.source("edges", spark.createDataFrame([], "u long, v long"))
    reach = iterate_differential(_reach_body, seeds, {"edges": edges})

    cur_seeds, cur_edges = set(), set()
    log = []
    for step in range(6):
        add_e = {(rng.randrange(12), rng.randrange(12))
                 for _ in range(rng.randrange(1, 4))} - cur_edges
        del_e = (set(rng.sample(sorted(cur_edges),
                                k=min(len(cur_edges), rng.randrange(0, 3))))
                 if cur_edges else set())
        add_s = ({rng.randrange(12)} - cur_seeds
                 if rng.random() < 0.5 or not cur_seeds else set())
        cur_edges = (cur_edges | add_e) - del_e
        cur_seeds |= add_s
        kw = {}
        if add_s:
            kw["seeds"] = spark.createDataFrame(
                [(x,) for x in add_s], "x long")
        ed = ([(u, v, 1) for u, v in add_e]
              + [(u, v, -1) for u, v in del_e])
        if ed:
            kw["edges"] = spark.createDataFrame(
                ed, "u long, v long, _pw_diff long")
        if not kw:
            kw["seeds"] = spark.createDataFrame([(0,)], "x long")
            cur_seeds |= {0}
        (d,) = g.step(reach, **kw)
        log.append(d.localCheckpoint(eager=True))
        acc = log[0]
        for piece in log[1:]:
            acc = acc.unionByName(piece)
        got = {r["x"] for r in
               DifferentialGraph.integrate(acc).collect()}
        want = _bfs(cur_seeds, cur_edges)
        assert got == want, f"step {step}: {sorted(got)} != {sorted(want)}"


def test_iteration_limit_matches_capped_batch_iterate(spark):
    """body: keep adding x+1 below 100 — with iteration_limit=3 the
    output is the 3rd iterate (seed + up to 3 hops), exactly the
    reference's iteration_limit semantics."""
    g = DifferentialGraph(spark)
    start = g.source("start", spark.createDataFrame([], "x long"))

    def body(v):
        nxt = (v.filter(F.col("x") < 100)
                .select((F.col("x") + 10).alias("x")))
        return v.union(nxt).distinct()

    capped = iterate_differential(body, start, iteration_limit=3)
    (d1,) = g.step(capped, start=spark.createDataFrame([(0,)], "x long"))
    assert _rows(DifferentialGraph.integrate(d1), "x") == [
        (0,), (10,), (20,), (30,)]
    # a later seed flows through the same 3 capped levels
    (d2,) = g.step(capped, start=spark.createDataFrame([(500,)], "x long"))
    assert _rows(d2, "x", DIFF) == [(500, 1)]


def test_depth_grows_on_later_batches(spark):
    """A chain that lengthens after convergence forces new levels —
    the grown trace still emits exact deltas."""
    g = DifferentialGraph(spark)
    seeds = g.source("seeds", spark.createDataFrame([], "x long"))
    edges = g.source("edges", spark.createDataFrame([], "u long, v long"))
    reach = iterate_differential(_reach_body, seeds, {"edges": edges})

    _feed(spark, g, reach, seeds_d=[(0, 1)], edges_d=[(0, 1, 1)])
    depth0 = len(reach._levels)
    # extend the chain far beyond the current depth
    (d2,) = _feed(spark, g, reach,
                  edges_d=[(i, i + 1, 1) for i in range(1, 8)])
    assert len(reach._levels) > depth0
    assert _rows(d2, "x", DIFF) == [(i, 1) for i in range(2, 9)]
    # steady batch after growth stays incremental and exact
    (d3,) = _feed(spark, g, reach, edges_d=[(0, 1, -1)])
    assert _rows(d3, "x", DIFF) == [(i, -1) for i in range(1, 9)]


def test_durable_commit_restore_continues(spark, tmp_path):
    sd = str(tmp_path / "state")

    def build(g):
        seeds = g.source("seeds", spark.createDataFrame([], "x long"))
        edges = g.source("edges",
                         spark.createDataFrame([], "u long, v long"))
        return iterate_differential(_reach_body, seeds, {"edges": edges})

    g = DifferentialGraph(spark, state_dir=sd)
    reach = build(g)
    _feed(spark, g, reach, seeds_d=[(1, 1)],
          edges_d=[(1, 2, 1), (2, 3, 1), (3, 4, 1)])
    g.commit()
    depth = len(reach._levels)

    g2 = DifferentialGraph(spark, state_dir=sd)
    reach2 = build(g2)
    (d,) = _feed(spark, g2, reach2, edges_d=[(2, 3, -1)])
    assert len(reach2._levels) >= depth   # depth restored from node_meta
    assert _rows(d, "x", DIFF) == [(3, -1), (4, -1)]


def test_table_syntax_iterate(spark):
    """DiffTable.iterate: the Table-idiom bridge over the level
    cascade — user writes this/left/right expressions."""
    import pathway_spark as pw
    from pathway_spark import this, left, right
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    g = DifferentialTableGraph(spark)
    seeds = g.input("seeds", spark.createDataFrame([], "x long"))
    edges = g.input("edges", spark.createDataFrame([], "u long, v long"))

    def body(v, edges):
        hop = (v.select(u=this.x)
                .join(edges, this.u)
                .select(x=this.v))
        return v.concat(hop).distinct()

    reach = seeds.iterate(body, {"edges": edges})
    (d1,) = g.step(reach.node,
                   seeds=spark.createDataFrame([(1,)], "x long"),
                   edges=spark.createDataFrame([(1, 2), (2, 3), (8, 9)],
                                               "u long, v long"))
    got = sorted(r["x"] for r in
                 DifferentialGraph.integrate(d1).collect())
    assert got == [1, 2, 3]
    (d2,) = g.step(reach.node,
                   edges=spark.createDataFrame(
                       [(2, 3)], "u long, v long").withColumn(
                       DIFF, F.lit(-1)))
    assert sorted((r["x"], r[DIFF]) for r in d2.collect()) == [(3, -1)]


def test_arranged_input_shares_one_store_across_levels(spark):
    """DD arrangement sharing: every level's join against an
    arranged input references THE shared store (memory O(|I|), not
    O(depth*|I|)), and results stay prefix-equal through growth and
    retraction."""
    from pathway_spark.streaming.differential import _JoinNode

    g = DifferentialGraph(spark)
    seeds = g.source("seeds", spark.createDataFrame([], "x long"))
    edges = g.source("edges", spark.createDataFrame([], "u long, v long"))
    reach = iterate_differential(_reach_body, seeds, {"edges": edges},
                                 arranged=("edges",))

    _feed(spark, g, reach, seeds_d=[(0, 1)], edges_d=[(0, 1, 1)])
    # growth beyond the current depth exercises the delta-only seeding
    (d2,) = _feed(spark, g, reach,
                  edges_d=[(i, i + 1, 1) for i in range(1, 8)])
    assert _rows(d2, "x", DIFF) == [(i, 1) for i in range(2, 9)]
    (d3,) = _feed(spark, g, reach, edges_d=[(3, 4, -1)])
    assert _rows(d3, "x", DIFF) == [(i, -1) for i in range(4, 9)]

    joins = [n for n in g._nodes if isinstance(n, _JoinNode)
             and n._sb_shared]
    assert len(joins) == len(reach._levels) >= 3
    assert len({id(n._sb) for n in joins}) == 1   # ONE arrangement


def test_arranged_randomized_prefix_equality(spark):
    rng = random.Random(21)
    g = DifferentialGraph(spark)
    seeds = g.source("seeds", spark.createDataFrame([], "x long"))
    edges = g.source("edges", spark.createDataFrame([], "u long, v long"))
    reach = iterate_differential(_reach_body, seeds, {"edges": edges},
                                 arranged=("edges",))
    cur_seeds, cur_edges, log = set(), set(), []
    for step in range(5):
        add_e = {(rng.randrange(10), rng.randrange(10))
                 for _ in range(rng.randrange(1, 4))} - cur_edges
        del_e = (set(rng.sample(sorted(cur_edges),
                                k=min(len(cur_edges), rng.randrange(0, 2))))
                 if cur_edges else set())
        add_s = {rng.randrange(10)} - cur_seeds if step % 2 == 0 else set()
        cur_edges = (cur_edges | add_e) - del_e
        cur_seeds |= add_s
        kw = {}
        if add_s:
            kw["seeds"] = spark.createDataFrame(
                [(x,) for x in add_s], "x long")
        ed = ([(u, v, 1) for u, v in add_e]
              + [(u, v, -1) for u, v in del_e])
        if ed:
            kw["edges"] = spark.createDataFrame(
                ed, "u long, v long, _pw_diff long")
        if not kw:
            continue
        (d,) = g.step(reach, **kw)
        log.append(d.localCheckpoint(eager=True))
        acc = log[0]
        for piece in log[1:]:
            acc = acc.unionByName(piece)
        got = {r["x"] for r in DifferentialGraph.integrate(acc).collect()}
        assert got == _bfs(cur_seeds, cur_edges), f"step {step}"


def test_arranged_input_rejects_non_join_consumers(spark):
    g = DifferentialGraph(spark)
    seeds = g.source("seeds", spark.createDataFrame([], "x long"))
    edges = g.source("edges", spark.createDataFrame([], "u long, v long"))

    def bad_body(v, edges):
        filtered = edges.filter(F.col("u") > 0)   # transform: needs a copy
        return v.union(v.select(F.col("x").alias("u"))
                       .join(filtered, ["u"])
                       .select(F.col("v").alias("x"))).distinct()

    node = iterate_differential(bad_body, seeds, {"edges": edges},
                                arranged=("edges",))
    with pytest.raises(TypeError, match="arranged input"):
        g.step(node, seeds=spark.createDataFrame([(1,)], "x long"),
               edges=spark.createDataFrame([(1, 2)], "u long, v long"))


def test_arranged_durable_commit_restore(spark, tmp_path):
    sd = str(tmp_path / "state")

    def build(g):
        seeds = g.source("seeds", spark.createDataFrame([], "x long"))
        edges = g.source("edges",
                         spark.createDataFrame([], "u long, v long"))
        return iterate_differential(_reach_body, seeds, {"edges": edges},
                                    arranged=("edges",))

    g = DifferentialGraph(spark, state_dir=sd)
    reach = build(g)
    _feed(spark, g, reach, seeds_d=[(1, 1)],
          edges_d=[(1, 2, 1), (2, 3, 1), (3, 4, 1)])
    g.commit()

    g2 = DifferentialGraph(spark, state_dir=sd)
    reach2 = build(g2)
    (d,) = _feed(spark, g2, reach2, edges_d=[(2, 3, -1)])
    assert _rows(d, "x", DIFF) == [(3, -1), (4, -1)]

def test_dense_delta_guard_falls_back_to_recompute(spark):
    """Round-7 cost guard: on a dense, small-diameter graph a seed
    relabel makes every cascade level's circulating delta fixed-point
    wide — the guard must trip (stickily, durably), switch the node to
    per-batch recompute, and keep integrated results EXACTLY equal to
    the Python BFS oracle through further inserts AND retractions."""
    rng = random.Random(7)
    n = 60
    # dense random digraph: diameter ~2
    edges0 = sorted({(rng.randrange(n), rng.randrange(n))
                     for _ in range(n * 6)})

    def labeled_reach(v, edges):
        # seed-LABELED reachability: (x, s) rows — a label flip changes
        # every row, so circulating deltas are fixed-point wide
        hop = (v.select(F.col("x").alias("u"), F.col("s"))
                .join(edges, ["u"])
                .select(F.col("v").alias("x"), F.col("s")))
        return v.union(hop).distinct()

    g = DifferentialGraph(spark)
    seeds = g.source("seeds", spark.createDataFrame([], "x long, s long"))
    edges = g.source("edges", spark.createDataFrame([], "u long, v long"))
    reach = iterate_differential(
        labeled_reach, seeds, {"edges": edges},
        dense_delta_guard=0.5, dense_guard_min_rows=10)

    live = list(edges0)
    (d0,) = g.step(reach,
                   seeds=spark.createDataFrame([(0, 0)], "x long, s long"),
                   edges=spark.createDataFrame(edges0, "u long, v long"))
    log = d0.localCheckpoint(eager=True)
    # initial seeding is full-width by design — not a guard concern
    assert not reach._dense

    # flip the seed's LABEL: every level retracts (x, 0) and inserts
    # (x, 1) for the whole reach set — the guard must trip here,
    # finish THIS batch through the cascade, and switch
    seed_flip = (spark.createDataFrame([(0, 1)], "x long, s long")
                 .withColumn(DIFF, F.lit(1))
                 .unionByName(spark.createDataFrame([(0, 0)],
                                                    "x long, s long")
                              .withColumn(DIFF, F.lit(-1))))
    (d1,) = g.step(reach, seeds=seed_flip)
    log = log.unionByName(d1.localCheckpoint(eager=True))
    assert reach._dense, "guard must trip on the dense seed flip"
    assert g._node_meta.get("it0_dense") == 1, "switch must be durable"

    def want_rows(live_edges):
        return sorted((x, 1) for x in _bfs([0], live_edges))

    got = _rows(DifferentialGraph.integrate(log), "x", "s")
    assert got == want_rows(live), "switch batch itself must stay exact"

    batches = [
        ([(n + 1, n + 2), (0, n + 1)], []),            # grow outward
        ([], [(0, n + 1)]),                            # retract the bridge
        ([(rng.randrange(n), rng.randrange(n))
          for _ in range(5)], [edges0[3], edges0[10]]),
    ]
    for ins, dels in batches:
        for e in dels:
            live.remove(e)
        live += ins
        df = None
        if ins:
            df = (spark.createDataFrame(ins, "u long, v long")
                  .withColumn(DIFF, F.lit(1)))
        if dels:
            dd = (spark.createDataFrame(dels, "u long, v long")
                  .withColumn(DIFF, F.lit(-1)))
            df = dd if df is None else df.unionByName(dd)
        (d,) = g.step(reach, edges=df)
        log = log.unionByName(d.localCheckpoint(eager=True))
        got = _rows(DifferentialGraph.integrate(log), "x", "s")
        assert got == want_rows(live), f"after ins={ins} dels={dels}"


def test_resident_cascade_equivalence_and_activation(spark):
    """Round 9: steady iterate ticks run on the resident engine
    (kernel cascade over mirrored level state) — exact traces vs an
    always-distributed drive through inserts, retractions, AND a
    depth-growing batch (growth seeds distributed inline, then
    residency resumes)."""
    seeds0 = [(0,)]
    # chain 0->1->2 plus a spur; later batches extend the chain (depth
    # growth) and retract an edge (shrinking fixed point)
    edges0 = [(0, 1), (1, 2), (0, 5)]
    ticks = [
        dict(edges=[(2, 3, 1)]),                   # extends reach
        dict(edges=[(3, 4, 1), (4, 6, 1)]),        # deepens: growth
        dict(edges=[(1, 2, -1)]),                  # retraction shrinks
        dict(edges=[(1, 2, 1)]),                   # back
    ]

    def drive(resident):
        g = DifferentialGraph(spark, resident=resident)
        seeds = g.source("seeds", spark.createDataFrame([], "x long"))
        edges = g.source("edges", spark.createDataFrame(
            [], "u long, v long"))
        out = iterate_differential(_reach_body, seeds,
                                   {"edges": edges})
        (d0,) = g.step(out,
                       seeds=spark.createDataFrame(seeds0, "x long"),
                       edges=spark.createDataFrame(edges0,
                                                   "u long, v long"))
        traces = [_rows(d0, "x", DIFF)]
        active = []
        for tk in ticks:
            rows = [(u, v, w) for u, v, w in tk["edges"]]
            (d,) = g.step(out, edges=spark.createDataFrame(
                rows, "u long, v long, _pw_diff long"))
            traces.append(_rows(d, "x", DIFF))
            active.append(g._res_last_t == g._t)
        g.restore_session_confs()
        return traces, active

    tr_res, act = drive(True)
    tr_cls, _ = drive(False)
    assert tr_res == tr_cls
    assert all(act), f"iterate ticks should run resident: {act}"


def test_resident_cascade_commit_restore(spark, tmp_path):
    """Mirrored level/trace/accumulator state from resident iterate
    ticks must reach durable storage: commit, restore into a fresh
    process-equivalent graph, continue — equal to one distributed
    drive."""
    sd = str(tmp_path / "itres")
    seeds0 = [(0,)]
    edges0 = [(0, 1), (1, 2)]
    pre = [dict(edges=[(2, 3, 1)]), dict(edges=[(0, 7, 1)])]
    post = [dict(edges=[(1, 2, -1)])]

    def build(g):
        seeds = g.source("seeds", spark.createDataFrame([], "x long"))
        edges = g.source("edges",
                         spark.createDataFrame([], "u long, v long"))
        return iterate_differential(_reach_body, seeds,
                                    {"edges": edges})

    def feed0(g, out):
        return g.step(out,
                      seeds=spark.createDataFrame(seeds0, "x long"),
                      edges=spark.createDataFrame(edges0,
                                                  "u long, v long"))

    g = DifferentialGraph(spark, resident=True, state_dir=sd)
    out = build(g)
    (d0,) = feed0(g, out)
    traces = [_rows(d0, "x", DIFF)]
    for tk in pre:
        (d,) = g.step(out, edges=spark.createDataFrame(
            tk["edges"], "u long, v long, _pw_diff long"))
        traces.append(_rows(d, "x", DIFF))
    assert g._res_last_t == g._t
    g.commit()
    g.restore_session_confs()

    g2 = DifferentialGraph(spark, resident=True, state_dir=sd)
    out2 = build(g2)
    for tk in post:
        (d,) = g2.step(out2, edges=spark.createDataFrame(
            tk["edges"], "u long, v long, _pw_diff long"))
        traces.append(_rows(d, "x", DIFF))
    g2.restore_session_confs()

    gr = DifferentialGraph(spark, resident=False)
    outr = build(gr)
    (r0,) = feed0(gr, outr)
    want = [_rows(r0, "x", DIFF)]
    for tk in pre + post:
        (d,) = gr.step(outr, edges=spark.createDataFrame(
            tk["edges"], "u long, v long, _pw_diff long"))
        want.append(_rows(d, "x", DIFF))
    gr.restore_session_confs()
    assert traces == want
