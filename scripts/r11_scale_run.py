"""Run the batch headline gates at sf0.1 AND the synthesized sf1 (10x)
and report per-gate scaling ratios (VERDICT r10 #1).

Methodology: per query, one untimed warm pass per SF, then REPS timed
noop-sink passes INTERLEAVED (sf0.1, sf1, sf0.1, ...) with the r11_ab
stall sentinel so host scheduling stalls hit both sides equally and
stalled samples are dropped.  Reports median seconds per SF, the
ratio, and log10(ratio) (the scaling exponent for a 10x input).

Usage: python scripts/r11_scale_run.py [--only q01,...] [--reps N]
Writes JSON to plans/r11/scaling_sf1.json.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scale", "sf1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

BATCH_HEADLINE = [
    "q01_filter_groupby", "q03_join_agg", "q66_tpch5_shape",
    "q09_flatten_wordcount", "q16_sort_diff", "q19_tumbling_sliding",
    "q21_session", "q22_asof_join", "q29_dedup_exact",
    "q31_ngram_jaccard", "q32_minhash_lsh", "q33_simhash",
    "q34_knn_bruteforce", "q35_embedding_neardup", "q46_bm25",
    "q51_pagerank", "q52_embedding_lsh", "q62_split_documents",
    "q63_salted_agg", "tpch_q1", "tpch_q7", "tpch_q18",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = CPUS
    from pathway_spark.session import get_spark
    from r11_ab import _sentinel

    import __spark_entry__ as entry_mod
    from pathway_spark.benchmarks import tpch

    spark = get_spark("pathway-spark-scale", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(entry_mod.queries())
    for tq in ("tpch_q1", "tpch_q7", "tpch_q18"):
        qs[tq] = (lambda f: lambda sp, sf: f(sp, sf).to_df())(tpch.QUERIES[tq])

    names = [n for n in BATCH_HEADLINE
             if not args.only or n in args.only.split(",")]
    floor = min(_sentinel() for _ in range(3))
    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"scale:{name}")
        kept = {SF01: [], SF1: []}
        try:
            for sf in (SF01, SF1):          # warm, untimed
                qs[name](spark, sf).write.format("noop").mode(
                    "overwrite").save()
            for _ in range(args.reps):
                for sf in (SF01, SF1):
                    # same measurement fix as bench.py (r11): clear the
                    # SQL cache so persist-carrying queries (q32/q46/
                    # q52) compute from parquet on every timed pass
                    # instead of reading the previous invocation's
                    # cache via canonical-plan lookup
                    spark.catalog.clearCache()
                    df = qs[name](spark, sf)
                    s0 = _sentinel()
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    dt = time.perf_counter() - t0
                    s1 = _sentinel()
                    if max(s0, s1) > 1.6 * floor:
                        continue
                    kept[sf].append(dt)
        except Exception as e:  # noqa: BLE001 — record and continue
            results[name] = {"err": str(e)[:200]}
            continue
        med = {}
        for sf, ts in kept.items():
            ts.sort()
            med[sf] = ts[len(ts) // 2] if ts else float("nan")
        ratio = med[SF1] / med[SF01] if med[SF01] else float("nan")
        results[name] = {
            "sf0.1_s": round(med[SF01], 3),
            "sf1_s": round(med[SF1], 3),
            "ratio": round(ratio, 2),
            "exponent": round(math.log10(ratio), 2)
            if ratio == ratio and ratio > 0 else None,
            "kept": [len(kept[SF01]), len(kept[SF1])],
        }
        print(name, results[name], flush=True)
    out = os.path.join(REPO, "plans", "r11", "scaling_sf1.json")
    with open(out, "w") as f:
        json.dump({"cpus": CPUS, "copies": 10, "results": results}, f,
                  indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
