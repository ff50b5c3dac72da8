"""Differential-engine throughput micro-benchmark.

Builds the canonical join+reduce graph (orders join customer →
groupby nation, sum revenue) over sf data, loads the initial state
in batch 0, then feeds N small delta batches and reports
batches/sec steady-state (batch 0 excluded).

Run:  python scripts/diff_bench.py [n_batches] [delta_rows]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    delta_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    from pathway_spark.session import get_spark
    from pathway_spark.streaming.differential import DifferentialGraph
    from pyspark.sql import functions as F

    spark = get_spark("diff-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet") \
        .select("o_orderkey", "o_custkey", "o_totalprice")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet") \
        .select("c_custkey", "c_nationkey") \
        .withColumnRenamed("c_custkey", "o_custkey")

    g = DifferentialGraph(spark)
    src_o = g.source("orders", orders)
    src_c = g.source("customer", cust)
    joined = src_o.join(src_c, on=["o_custkey"])
    out = joined.reduce(["c_nationkey"],
                        revenue=("sum", "o_totalprice"),
                        n=("count",))

    # batch 0: initial load (wide)
    t0 = time.perf_counter()
    (d,) = g.step(out, orders=orders, customer=cust)
    d.localCheckpoint(eager=True).count()
    load_s = time.perf_counter() - t0

    # steady state: small order deltas (new rows with shifted keys)
    base = orders.limit(delta_rows).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    per = []
    for i in range(n_batches):
        delta = base.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit((i + 1) * 10_000_000))
        tb = time.perf_counter()
        (d,) = g.step(out, orders=delta)
        d.localCheckpoint(eager=True).count()
        per.append(round(time.perf_counter() - tb, 2))
    steady_s = time.perf_counter() - t0
    print("per-batch:", per)

    print({
        "initial_load_sec": round(load_s, 3),
        "batches": n_batches,
        "delta_rows": delta_rows,
        "steady_total_sec": round(steady_s, 3),
        "sec_per_batch": round(steady_s / n_batches, 3),
        "batches_per_sec": round(n_batches / steady_s, 3),
    })


if __name__ == "__main__":
    main()
