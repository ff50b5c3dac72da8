"""Physical-plan quality gates — the properties the 100 TB design
relies on, asserted per headline query (SURVEY §4): parquet filter
pushdown, no row-at-a-time Python in relational hot paths, broadcast
joins for dim tables."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from pathway_spark.plans import plan_report
from tests.conftest import SF_DIR

QUERIES = entry_mod.queries()

# every relational/temporal/dedup query must stay JVM-side end-to-end
NO_PYTHON = [
    "q01_filter_groupby", "q02_project_ifelse", "q03_join_agg",
    "q04_left_join", "q09_flatten_wordcount", "q16_sort_diff",
    "q19_tumbling_sliding", "q21_session", "q22_asof_join",
    "q23_interval_join", "q29_dedup_exact", "q31_ngram_jaccard",
    "q32_minhash_lsh", "q33_simhash", "q34_knn_bruteforce",
    "q36_text_profile", "q46_bm25",
    "q62_split_documents", "q63_salted_agg", "q51_pagerank",
]


@pytest.mark.parametrize("name", NO_PYTHON)
def test_no_python_in_hot_path(name, spark):
    rep = plan_report(QUERIES[name](spark, SF_DIR))
    assert rep["python_evals"] == 0, f"{name} has python eval nodes: {rep}"


def test_filter_pushdown_q01(spark):
    rep = plan_report(QUERIES["q01_filter_groupby"](spark, SF_DIR))
    assert rep["pushed_filters"], "l_quantity filter must reach the parquet scan"


def test_broadcast_dims_q03(spark):
    rep = plan_report(QUERIES["q03_join_agg"](spark, SF_DIR))
    assert rep["broadcast_joins"] >= 1, "dim joins should broadcast at this SF"


def test_single_shuffle_q01(spark):
    # filter → groupBy: exactly one exchange (the agg shuffle)
    rep = plan_report(QUERIES["q01_filter_groupby"](spark, SF_DIR))
    assert rep["shuffles"] <= 1, f"q01 should shuffle once, saw {rep['shuffles']}"


def test_udf_query_uses_arrow(spark):
    # q42 is the deliberate python path: must be Arrow-batched, not row UDF
    from pathway_spark.plans import plan_text

    txt = plan_text(QUERIES["q42_udf"](spark, SF_DIR))
    assert "ArrowEvalPython" in txt or "BatchEvalPython" not in txt


def test_custom_reducer_is_arrow_aggregate(spark):
    """stateful_many must compile to a pandas GROUPED_AGG
    (ArrowAggregatePython), never a scalar row UDF over collect_list."""
    from pathway_spark import reducers as R, this
    from pathway_spark.plans import plan_text
    from pathway_spark.table import Table

    t = Table.from_spark(
        spark.read.parquet(f"{SF_DIR}/events.parquet"), id_columns=["event_id"]
    )

    def ssq(state, rows) -> float:
        return sum(r[0] * r[0] for r in rows)

    df = t.groupby(this.user_id).reduce(
        this.user_id, s=R.stateful_many(ssq, this.value), n=R.count()
    ).to_df()
    txt = plan_text(df)
    assert "ArrowAggregatePython" in txt or "AggregateInPandas" in txt, txt
    assert "BatchEvalPython" not in txt, "scalar row UDF in custom reducer path"


def test_bucketed_join_skips_shuffle(spark):
    """Bucketing both sides on the join key removes the join shuffles —
    the co-located join pattern for repeatedly-joined 100 TB tables."""
    import pathway_spark as pw
    from pathway_spark.table import Table

    o = Table.from_spark(
        spark.read.parquet(f"{SF_DIR}/orders.parquet"), id_columns=["o_orderkey"]
    )
    li = Table.from_spark(
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet"),
        id_columns=["l_orderkey", "l_linenumber"],
    )
    pw.io.parquet.write_bucketed(o, "b_orders", ["o_orderkey"], num_buckets=8)
    pw.io.parquet.write_bucketed(li, "b_lineitem", ["l_orderkey"], num_buckets=8)
    ob = spark.table("b_orders")
    lb = spark.table("b_lineitem")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"]).select(
            "l_orderkey", "o_totalprice"
        )
        rep = plan_report(j)
        assert rep["shuffles"] == 0, f"bucketed join still shuffles: {rep}"
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_fuzzy_match_plan_jvm_side(spark):
    """Edge-level fuzzy match: two hash joins + window argmax, zero
    python eval nodes — the whole matcher is Catalyst-optimizable."""
    from pathway_spark.table import ID, Table

    import pathway_spark as pw
    from pyspark.sql import functions as F

    el = Table.from_spark(spark.createDataFrame(
        [(1, 101, 1.0)], "node long, feature long, weight double"))
    er = Table.from_spark(spark.createDataFrame(
        [(11, 101, 1.0)], "node long, feature long, weight double"))
    feats = Table(spark.createDataFrame(
        [(101, 1.0, 1)], "id long, weight double, normalization_type int",
    ).withColumnRenamed("id", ID))
    out = pw.ml.fuzzy_match(el, er, feats)
    rep = plan_report(out)
    assert rep["python_evals"] == 0, rep


def test_argmax_rows_single_shuffle(spark):
    """argmax_rows is ONE window-rank pass: a single exchange, no join
    back to the input."""
    import pathway_spark as pw

    orders = pw.io.parquet.read(f"{SF_DIR}/orders.parquet", spark=spark)
    out = pw.utils.filtering.argmax_rows(
        orders, orders.o_orderpriority, what=orders.o_totalprice)
    rep = plan_report(out)
    assert rep["python_evals"] == 0
    assert rep["shuffles"] <= 1, rep


def test_string_concat_stays_codegen(spark):
    """Type-aware + compilation must produce concat (JVM), never a
    fallback python eval."""
    import pathway_spark as pw

    nation = pw.io.parquet.read(f"{SF_DIR}/nation.parquet", spark=spark)
    out = nation.select(tag=pw.this.n_name + "-" + pw.this.n_name)
    rep = plan_report(out)
    assert rep["python_evals"] == 0


def test_simhash_self_join_reuses_exchange(spark):
    """q33's pigeonhole self-join must compute the simhash subtree
    (explode → 60 vote sums → bit-pack) ONCE: the forced shuffle join
    puts an identical Exchange(chunk, ck) over both sides and AQE's
    stage cache collapses the second build into a ReusedExchange.  A
    broadcast join here would materialize the subtree twice — once per
    side.  Reuse only appears in the FINAL adaptive plan, so execute
    first and read executedPlan (r11)."""
    df = QUERIES["q33_simhash"](spark, SF_DIR)
    df.collect()  # small (pair rows); drives AQE to the final plan
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in txt, txt
    assert "BroadcastHashJoin" not in txt, txt


def test_static_plans_keep_smj_for_table_sized_joins(spark):
    """Under `preferSortMergeJoin=false` the planner may statically pick
    ShuffledHashJoin from SIZE ESTIMATES alone; a bad under-estimate on a
    table-sized build side is an executor OOM at scale, and SHJ spills
    far less gracefully than SMJ (guide §3.1/§5).  q05 (full-width outer
    join on _pw_id) and q67 (semi+anti over lineitem) are the table-vs-
    table shapes: their INITIAL plans must keep SortMergeJoin for those
    joins — an AQE conversion to SHJ at runtime (from measured post-
    shuffle sizes under maxShuffledHashJoinLocalMapThreshold) is fine
    and is not what this gate reads (plan_text shows the pre-execution
    plan).  Guards against estimate drift or a Spark upgrade silently
    re-picking an OOM-prone static build."""
    from pathway_spark.plans import plan_text

    for name in ("q05_update_rows", "q67_semijoin_exists"):
        txt = plan_text(QUERIES[name](spark, SF_DIR))
        assert "ShuffledHashJoin" not in txt, f"{name} statically plans SHJ:\n{txt}"
        assert "SortMergeJoin" in txt, f"{name} lost its SMJ shape:\n{txt}"


def test_ngram_jaccard_has_no_cache_scan(spark):
    """q31's shingle relation must NOT be SQL-persisted: an
    InMemoryRelation there made the concurrent broadcast-build jobs
    (hot-gram list, the two sizes attaches) race to fill the cache —
    each recomputed the tokenize→explode lineage and paid the
    cache-store write on top (r11 stage metrics: total executorRunTime
    4.6 s → 2.2 s without the persist, results hash-identical).  Since
    9696028 the shingle relation is shared via a lazy RDD
    localCheckpoint instead — consumers hang off one Scan ExistingRDD,
    not a reused Exchange — so this gate guards against an SQL-level
    persist (InMemoryRelation, CacheManager-visible and leaky across
    structurally-equal invocations) creeping back."""
    from pathway_spark.plans import plan_text

    txt = plan_text(QUERIES["q31_ngram_jaccard"](spark, SF_DIR))
    assert "InMemoryTableScan" not in txt, txt
    assert "InMemoryRelation" not in txt, txt


def test_differential_step_plans_stay_jvm_side(spark):
    """Every per-batch differential rule (join delta, reduce affected-key,
    distinct presence) must compile to pure JVM DataFrame algebra — no
    Python eval nodes — and the reduce path must not explode into
    unbounded shuffles (state semi-join + two aggregations)."""
    from pyspark.sql import functions as F
    from pathway_spark.streaming.differential import DifferentialGraph

    left_t = spark.createDataFrame([], "k string, v long")
    right_t = spark.createDataFrame([], "k string, w long")
    g = DifferentialGraph(spark, resident=False)
    a, b = g.source("a", left_t), g.source("b", right_t)
    q = (a.filter(F.col("v") > 0)
          .join(b, on=["k"], how="left")
          .reduce(["k"], s=("sum", "v"), m=("max", "w")))
    (d1,) = g.step(
        q,
        a=spark.createDataFrame([("x", 1)], left_t.schema),
        b=spark.createDataFrame([("x", 2)], right_t.schema),
    )
    rep = plan_report(d1)
    assert rep["python_evals"] == 0, rep
    # affected-key reduce over a 1-batch state: bounded exchange count
    assert rep["shuffles"] <= 14, rep


def test_tpch_plan_quality(spark):
    """TPC-H suite stays the 100 TB shape: shipdate/orderdate filters
    reach the parquet scan, dimension joins broadcast, fact-fact joins
    are the only sort-merge shuffles, and nothing drops to Python."""
    from pathway_spark.benchmarks import tpch

    expectations = {
        #            min_bcast  max_shuffles
        "tpch_q1":  (0, 2),
        "tpch_q7":  (3, 5),
        "tpch_q10": (2, 3),
        "tpch_q18": (1, 3),
    }
    for name, (min_bcast, max_shuf) in expectations.items():
        rep = plan_report(tpch.QUERIES[name](spark, SF_DIR).to_df())
        assert rep["python_evals"] == 0, (name, rep)
        assert rep["pushed_filters"], (name, rep)
        assert rep["broadcast_joins"] >= min_bcast, (name, rep)
        assert rep["shuffles"] <= max_shuf, (name, rep)


def test_tpch_ext_plan_quality(spark):
    """The synthesized-table TPC-H queries keep the same 100 TB shape:
    pushed filters, broadcast dims, bounded shuffles, no Python."""
    from pathway_spark.benchmarks import tpch_ext

    expectations = {
        #             min_bcast  max_shuffles
        "tpch_q2":   (6, 4),
        "tpch_q4":   (1, 3),
        "tpch_q5":   (4, 2),
        "tpch_q9":   (4, 2),
        "tpch_q11":  (4, 3),
        "tpch_q12":  (1, 2),
        "tpch_q13":  (1, 3),
        "tpch_q16":  (2, 4),
        "tpch_q19":  (1, 2),
        "tpch_q20":  (3, 4),
        "tpch_q21":  (3, 5),
    }
    for name, (min_bcast, max_shuf) in expectations.items():
        rep = plan_report(tpch_ext.QUERIES[name](spark, SF_DIR).to_df())
        assert rep["python_evals"] == 0, (name, rep)
        assert rep["pushed_filters"], (name, rep)
        assert rep["broadcast_joins"] >= min_bcast, (name, rep)
        assert rep["shuffles"] <= max_shuf, (name, rep)


def test_differential_steady_delta_broadcasts(spark, monkeypatch):
    """Steady-state differential joins must BROADCAST the delta side:
    checkpointed state frames have no stats, so without the explicit
    hint Catalyst shuffles the full state against a tiny delta every
    batch (the round-5 6.1s->2.2s/batch fix).  _CKPT_OUT is disabled
    so the raw join plan is inspectable."""
    from pyspark.sql import functions as F
    from pathway_spark.streaming import differential as D

    monkeypatch.setattr(D._JoinNode, "_CKPT_OUT", False)
    tpl_a = spark.createDataFrame([], "k string, v long")
    tpl_b = spark.createDataFrame([], "k string, w long")
    # resident=False: this gate inspects the DISTRIBUTED steady-tick
    # plan (the path over-cap / non-capable graphs still take)
    g = D.DifferentialGraph(spark, resident=False)
    a, b = g.source("a", tpl_a), g.source("b", tpl_b)
    q = a.join(b, on=["k"])
    # batch 0: wide initial load (no hint expected)
    g.step(q, a=spark.createDataFrame([("x", 1)], tpl_a.schema),
           b=spark.createDataFrame([("x", 2)], tpl_b.schema))[0] \
        .localCheckpoint(eager=True)
    # steady batch: inspect the join delta's physical plan
    (d,) = g.step(q, a=spark.createDataFrame([("y", 3)], tpl_a.schema))
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_differential_forget_amplified_delta_not_broadcast(spark, monkeypatch):
    """A join DOWNSTREAM of a retract-mode forget must NOT broadcast
    its delta side: a watermark jump can make forget retract a
    state-sized batch, and broadcasting that risks driver OOM — the
    structural _delta_bounded guard trades the hint for a shuffle on
    such pipelines (ADVICE r5).  The same join without forget keeps
    the broadcast fast path (previous test)."""
    from pathway_spark.streaming import differential as D

    monkeypatch.setattr(D._JoinNode, "_CKPT_OUT", False)
    tpl_a = spark.createDataFrame([], "k string, ts long, v long")
    tpl_b = spark.createDataFrame([], "k string, w long")
    g = D.DifferentialGraph(spark, resident=False)
    a, b = g.source("a", tpl_a), g.source("b", tpl_b)
    q = a.forget("ts", 10).join(b, on=["k"])
    assert not q._delta_bounded()
    g.step(q, a=spark.createDataFrame([("x", 1, 1)], tpl_a.schema),
           b=spark.createDataFrame([("x", 2)], tpl_b.schema))[0] \
        .localCheckpoint(eager=True)
    (d,) = g.step(q, a=spark.createDataFrame([("y", 2, 3)], tpl_a.schema))
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan
    # ignore_late (no retraction state) stays bounded -> hint preserved
    g2 = D.DifferentialGraph(spark)
    a2, b2 = g2.source("a", tpl_a), g2.source("b", tpl_b)
    q2 = a2.ignore_late("ts", 10).join(b2, on=["k"])
    assert q2._delta_bounded()


def test_intervals_over_batch_bands_to_hash_join(spark):
    """Batch intervals_over on an integral axis must band: points carry
    ⌊t/W⌋, at-points explode to their ≤2 candidate bands, and the join
    plans as a HASH join on the band with the original range predicate
    as a re-check — NOT a BroadcastNestedLoopJoin of every point against
    every at-point (r11; mirrors the distributed/resident θ banding).
    Control: a FLOAT32 axis (excluded from both the int and the double
    banding gates — the predicate computes in float32) falls back to the
    un-banded θ join and the quadratic join reappears, proving the gate
    bites."""
    import pathway_spark as pw
    from pathway_spark import reducers as R
    from pathway_spark import this
    from pathway_spark.plans import plan_text

    rows = [(i, i * 7 % 100) for i in range(50)]
    tbl = pw.Table(spark.createDataFrame(rows, "eid long, ts_us long"))
    at = pw.Table(spark.createDataFrame([(5,), (40,), (77,)], "at_t long"))
    wt = tbl.windowby(
        this.ts_us,
        window=pw.temporal.intervals_over(at=at, lower_bound=-10,
                                          upper_bound=10),
    )
    out = wt.reduce(at_t=this._pw_window_start, n=R.count())
    txt = plan_text(out.to_df())
    assert "BroadcastNestedLoopJoin" not in txt, txt
    assert "CartesianProduct" not in txt, txt
    assert "_pw_theta_band" in txt, txt

    # control: float32 axis -> un-banded fallback -> quadratic join
    tbl_f = pw.Table(spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "eid long, ts_f float"))
    at_f = pw.Table(spark.createDataFrame([(5.0,)], "at_t float"))
    wt_f = tbl_f.windowby(
        this.ts_f,
        window=pw.temporal.intervals_over(at=at_f, lower_bound=-2.0,
                                          upper_bound=2.0),
    )
    out_f = wt_f.reduce(at_t=this._pw_window_start, n=R.count())
    txt_f = plan_text(out_f.to_df())
    assert ("BroadcastNestedLoopJoin" in txt_f
            or "CartesianProduct" in txt_f), txt_f


def test_intervals_over_and_interval_join_double_axis_band_and_match(spark):
    """Double axes band too (r11, via differential._dband_*): plan shows
    a hash join on the band, and the result equals a brute-force
    evaluation of the predicate — negative times, NULLs, and values that
    are not exactly representable sums included."""
    import pathway_spark as pw
    from pathway_spark import reducers as R
    from pathway_spark import this
    from pathway_spark.plans import plan_text

    lrows = [(i, (i * 37 % 400 - 200) / 7.0) for i in range(300)] + [
        (900, None)]
    rrows = [(i + 1000, (i * 53 % 400 - 200) / 7.0) for i in range(300)] + [
        (1900, None)]
    lo, up = -1.3, 1.3

    # intervals_over
    tbl = pw.Table(spark.createDataFrame(lrows, "eid long, ts_d double"))
    at = pw.Table(spark.createDataFrame(
        [(v,) for _, v in rrows], "at_t double"))
    wt = tbl.windowby(
        this.ts_d,
        window=pw.temporal.intervals_over(at=at, lower_bound=lo,
                                          upper_bound=up))
    out = wt.reduce(at_t=this._pw_window_start, n=R.count()).to_df()
    txt = plan_text(out)
    assert "BroadcastNestedLoopJoin" not in txt, txt
    assert "CartesianProduct" not in txt, txt
    assert "_pw_theta_band" in txt, txt
    got = sorted(map(tuple, out.collect()))
    ats = sorted({v for _, v in rrows if v is not None})
    want = sorted(
        (a, sum(1 for _, t in lrows
                if t is not None and a + lo <= t <= a + up))
        for a in ats)
    want = [(a, n) for a, n in want if n > 0]
    assert got == want

    # key-less interval_join
    l = pw.Table(spark.createDataFrame(lrows, "lid long, lt double"))
    r = pw.Table(spark.createDataFrame(rrows, "rid long, rt double"))
    jr = pw.temporal.interval_join(l, r, this.lt, this.rt, (lo, up), [])
    jout = jr.select(lid=pw.left.lid, rid=pw.right.rid).to_df()
    jtxt = plan_text(jout)
    assert "BroadcastNestedLoopJoin" not in jtxt, jtxt
    assert "CartesianProduct" not in jtxt, jtxt
    jgot = sorted(map(tuple, jout.select("lid", "rid").collect()))
    jwant = sorted(
        (lid, rid)
        for lid, t in lrows for rid, rt_ in rrows
        if t is not None and rt_ is not None and rt_ + lo <= t <= rt_ + up)
    assert jgot == jwant


def test_interval_join_keyless_bands_and_matches_unbanded(spark):
    """Key-less integral-axis inner interval_join must band (hash join
    on ⌊t/W⌋, no nested-loop/cartesian) and return exactly the
    un-banded result — negative times and NULLs included (r11)."""
    import pathway_spark as pw
    from pathway_spark import this
    from pathway_spark.plans import plan_text

    lrows = [(i, (i * 37) % 400 - 200) for i in range(300)] + [(900, None)]
    rrows = [(i + 1000, (i * 53) % 400 - 200) for i in range(300)] + [
        (1900, None)]
    l = pw.Table(spark.createDataFrame(lrows, "lid long, lt long"))
    r = pw.Table(spark.createDataFrame(rrows, "rid long, rt long"))
    jr = pw.temporal.interval_join(l, r, this.lt, this.rt, (-7, 7), [])
    out = jr.select(lid=pw.left.lid, rid=pw.right.rid).to_df()
    txt = plan_text(out)
    assert "BroadcastNestedLoopJoin" not in txt, txt
    assert "CartesianProduct" not in txt, txt
    assert "_pw_theta_band" in txt, txt
    got = sorted(map(tuple, out.select("lid", "rid").collect()))
    want = sorted(
        (lid, rid)
        for lid, lt_ in lrows for rid, rt_ in rrows
        if lt_ is not None and rt_ is not None
        and rt_ - 7 <= lt_ <= rt_ + 7)
    assert got == want
