"""A/B the static-vs-adaptive broadcast threshold split (guide §3.1).

Hypothesis (r11 stage metrics): the static planner broadcasts the FACT
side (q03: a 600 k-row lineitem hash relation built in ONE task, 1.2 s)
because a join-output estimate without CBO is sizeL×sizeR — always over
threshold — while a projected fact scan estimate sneaks under it.  Run
with a LOW static threshold (dims only) and a HIGH adaptive threshold so
broadcast decisions use AQE's measured runtime sizes instead.

Usage: python scripts/r11_join_ab.py q03_join_agg q66_tpch5_shape ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    os.environ["SPARK_GRAFT_CPUS"] = CPUS
    from pathway_spark.session import get_spark
    from r11_ab import ab

    import __spark_entry__ as entry_mod

    spark = get_spark("pathway-spark-r11-joinab", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    from pathway_spark.benchmarks import tpch

    for _tq in ("tpch_q1", "tpch_q7", "tpch_q18"):
        qs[_tq] = (lambda f: lambda sp, sf: f(sp, sf).to_df())(tpch.QUERIES[_tq])

    MB = 1024 * 1024

    def set_static64():
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * MB))
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        spark.conf.unset("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold")

    def set_adaptive():
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(1 * MB))
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                       str(64 * MB))
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        spark.conf.unset("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold")

    def set_adaptive_shj():
        set_adaptive()
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
        spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                       str(64 * MB))

    for name in sys.argv[1:]:
        print(f"\n=== {name} ===", flush=True)

        def mk(setter):
            def build():
                setter()
                return qs[name](spark, SF_DIR)
            return build

        ab({"static64": mk(set_static64),
            "adaptive": mk(set_adaptive),
            "adaptive_shj": mk(set_adaptive_shj)}, reps=7)
        set_static64()


if __name__ == "__main__":
    main()
