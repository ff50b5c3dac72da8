"""Forest-CC bench-shape profiler: per-batch plan/exec split on the
power-law 20k-node graph (the diff_cc_forest_4x200 bench line)."""
from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pathway_spark.session import get_spark
    from pathway_spark.streaming.differential import DifferentialGraph
    from pathway_spark.streaming.incremental_graph import (
        incremental_connected_components)
    from pyspark.sql import functions as F

    spark = get_spark("cc-profile", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    rng = random.Random(42)
    n = 20_000
    pl_edges = [(i, max(0, min(i - 1, int(rng.paretovariate(1.2)))))
                for i in range(1, n)]
    extra = [(rng.randrange(n), rng.randrange(n)) for _ in range(5000)]
    g = DifferentialGraph(spark)
    src = g.source("e", spark.createDataFrame([], "u long, v long"))
    out = incremental_connected_components(src)
    (c0,) = g.step(out, e=spark.createDataFrame(
        pl_edges + extra, "u long, v long"))
    c0.localCheckpoint(eager=True)
    cyc = [(rng.randrange(n), rng.randrange(n)) for _ in range(400)]
    (c1,) = g.step(out, e=spark.createDataFrame(cyc, "u long, v long"))
    c1.localCheckpoint(eager=True)

    print("batch  plan_s  exec_s  jobs  tasks")
    for i in range(4):
        ins = [(rng.randrange(n), rng.randrange(n)) for _ in range(100)]
        dels = cyc[i * 100:(i + 1) * 100]
        delta = (spark.createDataFrame(ins, "u long, v long")
                 .withColumn("_pw_diff", F.lit(1))
                 .unionByName(spark.createDataFrame(dels, "u long, v long")
                              .withColumn("_pw_diff", F.lit(-1))))
        tr = sc.statusTracker()
        j0 = set(tr.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        (d,) = g.step(out, e=delta)
        t1 = time.perf_counter()
        d.localCheckpoint(eager=True)
        t2 = time.perf_counter()
        new = set(sc.statusTracker().getJobIdsForGroup(None) or []) - j0
        ntasks = 0
        for j in new:
            info = sc.statusTracker().getJobInfo(j)
            if info:
                for sid in info.stageIds:
                    si = sc.statusTracker().getStageInfo(sid)
                    if si:
                        ntasks += si.numTasks
        print(f"{i:5d}  {t1-t0:6.2f}  {t2-t1:6.2f}  {len(new):4d}  {ntasks}")


if __name__ == "__main__":
    main()
