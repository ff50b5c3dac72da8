"""Per-stage cost attribution for one or more declared queries (guide
§1.1/§7.1): run the query through the noop sink, then pull stage metrics
from the Spark UI REST API and print stages sorted by executorRunTime —
the single-task scan stages and fetch-wait-heavy stages fall straight
out.

Usage: python scripts/r11_stages.py q01_filter_groupby [q03_join_agg ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    os.environ["SPARK_GRAFT_CPUS"] = CPUS
    from pyspark.sql import SparkSession

    from pathway_spark.session import ensure_engine_confs

    import __spark_entry__ as entry_mod

    # mirror get_spark but with the UI on (metrics source) — probe only
    spark = (
        SparkSession.builder.appName("pathway-spark-r11-stages")
        .master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.default.parallelism", CPUS)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .getOrCreate()
    )
    ensure_engine_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    from pathway_spark.benchmarks import tpch

    for _tq in ("tpch_q1", "tpch_q7", "tpch_q18"):
        qs[_tq] = (lambda f: lambda sp, sf: f(sp, sf).to_df())(tpch.QUERIES[_tq])

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages_after(cutoff_stage: int, label: str) -> None:
        url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        data = json.load(urllib.request.urlopen(url))
        rows = [s for s in data if s["stageId"] > cutoff_stage]
        rows.sort(key=lambda s: -s["executorRunTime"])
        print(f"--- {label}: top stages by executorRunTime (ms) ---")
        for s in rows[:10]:
            print(f"  stage {s['stageId']:>4} tasks={s['numTasks']:>3} "
                  f"run={s['executorRunTime']:>6} cpu={s['executorCpuTime']//1_000_000:>6} "
                  f"shufR={s['shuffleReadBytes']:>9} shufW={s['shuffleWriteBytes']:>9} "
                  f"in={s['inputBytes']:>9}  {s['name'][:70]}")

    for name in sys.argv[1:]:
        # warm pass (untimed, mirrors bench methodology)
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        url = f"{ui}/api/v1/applications/{app_id}/stages"
        done = json.load(urllib.request.urlopen(url))
        cutoff = max((s["stageId"] for s in done), default=-1)
        df = qs[name](spark, SF_DIR)
        spark.sparkContext.setJobDescription(f"r11 stages: {name}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.3)
        print(f"\n=== {name}: wall {wall:.3f}s ===")
        stages_after(cutoff, name)


if __name__ == "__main__":
    main()
