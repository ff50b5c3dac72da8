"""Attribution for the stream_wordcount bench line (VERDICT r11 #7):
run the exact bench drain shape and dump every micro-batch's
durationMs breakdown (triggerExecution, queryPlanning, getBatch,
addBatch, walCommit, commitOffsets) plus state-store commit counts, so
the fixed per-drain cost is attributed with stage-level proof instead
of hand-waving."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    os.environ["SPARK_GRAFT_CPUS"] = CPUS
    from pyspark.sql import functions as SF

    from pathway_spark.session import get_spark

    spark = get_spark("r12-stream-attrib", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    def drain(qname: str):
        stream = (
            spark.readStream.schema("doc_id long, text string, lang string, "
                                    "source string, n_chars long")
            .option("maxFilesPerTrigger", 1000)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(SF_DIR)
        )
        wc = (stream.select(
                SF.explode(SF.split(SF.col("text"), r"\s+")).alias("w"))
              .groupBy("w").count())
        t0 = time.perf_counter()
        q = (wc.writeStream.outputMode("complete").format("memory")
             .queryName(qname).start())
        q.processAllAvailable()
        wall = time.perf_counter() - t0
        prog = [json.loads(p.prettyJson if isinstance(p, str) else p.json)
                for p in q.recentProgress]
        q.stop()
        return wall, prog

    drain("attrib_prime")                     # untimed priming drain
    wall, prog = drain("attrib_timed")
    print(f"drain wall: {wall:.3f} s over {len(prog)} micro-batches")
    tot = {}
    for p in prog:
        d = p.get("durationMs", {})
        row = {k: d.get(k, 0) for k in
               ("triggerExecution", "queryPlanning", "getBatch",
                "latestOffset", "addBatch", "walCommit", "commitOffsets")}
        ops = p.get("stateOperators", [])
        st = ops[0] if ops else {}
        row["stateCommitMs"] = st.get("allUpdatesTimeMs", 0) + \
            st.get("commitTimeMs", 0)
        row["numRowsIn"] = p.get("numInputRows", 0)
        print(f"  batch {p.get('batchId')}: {row}")
        for k, v in row.items():
            tot[k] = tot.get(k, 0) + v
    print("totals:", tot)
    unacct = wall * 1000 - tot.get("triggerExecution", 0)
    print(f"outside triggerExecution (stream start/teardown/poll): "
          f"{unacct:.0f} ms")


if __name__ == "__main__":
    main()
