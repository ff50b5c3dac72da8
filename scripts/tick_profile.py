"""Per-tick cost breakdown for the differential join+reduce shape:
splits each steady batch into (plan-construction, execution) time and
reports Spark job/stage counts per tick — the profiler behind the
round-7 per-tick-floor work.

Run:  python scripts/tick_profile.py [n_batches] [delta_rows]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    delta_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    from pathway_spark.session import get_spark
    from pathway_spark.streaming.differential import DifferentialGraph
    from pyspark.sql import functions as F

    spark = get_spark("tick-profile", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet") \
        .select("o_orderkey", "o_custkey", "o_totalprice")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet") \
        .select("c_custkey", "c_nationkey") \
        .withColumnRenamed("c_custkey", "o_custkey")

    g = DifferentialGraph(spark)
    src_o = g.source("orders", orders)
    src_c = g.source("customer", cust)
    out = src_o.join(src_c, on=["o_custkey"]).reduce(
        ["c_nationkey"], revenue=("sum", "o_totalprice"), n=("count",))

    (d,) = g.step(out, orders=orders, customer=cust)
    d.localCheckpoint(eager=True).count()

    base = orders.limit(delta_rows).localCheckpoint(eager=True)
    rows = []
    for i in range(n_batches):
        delta = base.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit((i + 1) * 10_000_000))
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        (d,) = g.step(out, orders=delta)
        t1 = time.perf_counter()
        d.localCheckpoint(eager=True)
        t2 = time.perf_counter()
        n = d.count()
        t3 = time.perf_counter()
        jobs = len(sc.statusTracker().getJobIdsForGroup(None) or []) - j0
        rows.append((round(t1 - t0, 3), round(t2 - t1, 3),
                     round(t3 - t2, 3), jobs, n))
    print("tick  plan_s  exec_s  count_s  jobs  out_rows")
    for i, r in enumerate(rows):
        print(f"{i:4d}  {r[0]:6.3f}  {r[1]:6.3f}  {r[2]:7.3f}  {r[3]:4d}  {r[4]}")


if __name__ == "__main__":
    main()
