"""Round-11 measurement harness (guide §1): capture .explain("formatted")
and noop-sink timings for every declared query at the bench SF.

Usage:
    python scripts/r12_capture.py [--suffix before|after] [--only q01,q03,...]

Writes plans/r12/<query>_<suffix>.txt and prints a JSON timing line.
Timing methodology matches bench.py (warm untimed pass, then best of 2
noop-sink runs) so numbers are comparable with BENCH_r10.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default="")
    ap.add_argument("--no-time", action="store_true")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = CPUS
    from pathway_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("pathway-spark-r12-capture", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    from pathway_spark.benchmarks import tpch

    for _tq in ("tpch_q1", "tpch_q7", "tpch_q18"):
        qs[_tq] = (lambda f: lambda sp, sf: f(sp, sf).to_df())(tpch.QUERIES[_tq])

    names = sorted(qs)
    if args.only:
        names = [n for n in args.only.split(",") if n]

    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(outdir, exist_ok=True)

    timings: dict[str, float] = {}
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"## {name}: BUILD FAILED: {e}", file=sys.stderr)
            continue
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        with open(os.path.join(outdir, f"{name}_{args.suffix}.txt"), "w") as f:
            f.write(plan)
        if args.no_time:
            continue
        spark.sparkContext.setJobDescription(f"r12 {args.suffix}: {name}")
        df.write.format("noop").mode("overwrite").save()  # warm, untimed
        best = float("inf")
        for _ in range(2):
            df2 = qs[name](spark, SF_DIR)
            t0 = time.perf_counter()
            df2.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {timings[name]}", file=sys.stderr)

    print(json.dumps({"suffix": args.suffix, "sf": SF_DIR, "cpus": CPUS,
                      "timings": timings, "total": round(
                          sum(v for v in timings.values() if v > 0), 3)}))


if __name__ == "__main__":
    main()
