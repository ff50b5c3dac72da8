"""Profile one resident tick: where do the milliseconds go?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pathway_spark.session import get_spark
from pathway_spark.streaming.differential import DifferentialGraph
from pyspark.sql import functions as SF

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
spark = get_spark("profile-tick", cpus="8")
spark.sparkContext.setLogLevel("ERROR")

docs_txt = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
g = DifferentialGraph(spark)
src_w = g.source("docs", docs_txt.limit(0))
wc_out = (src_w
          .with_columns(__ws=SF.split(SF.col("text"), r"\s+"))
          .select(SF.col("doc_id"), SF.col("__ws"))
          .flatten("__ws", "w")
          .reduce(["w"], n=("count",)))
batch_rows = 500
all_rows = docs_txt.limit(21 * batch_rows).localCheckpoint(eager=True)
for i in range(4):
    b = all_rows.filter(SF.col("doc_id") % 21 == 20 - i).localCheckpoint(eager=True)
    (d,) = g.step(wc_out, docs=b)
    d.localCheckpoint(eager=True)

# timed, with phase instrumentation
import cProfile, pstats
lats = []
for i in range(30):
    b = (all_rows.filter(SF.col("doc_id") % 21 == (i % 20))
         .withColumn("doc_id", SF.col("doc_id") + SF.lit((i + 1) * 10**9))
         .localCheckpoint(eager=True))
    t0 = time.perf_counter()
    (d,) = g.step(wc_out, docs=b)
    t1 = time.perf_counter()
    d.localCheckpoint(eager=True)
    t2 = time.perf_counter()
    lats.append((t1 - t0, t2 - t1))
lats.sort(key=lambda x: x[0] + x[1])
mid = lats[len(lats)//2]
print(f"p50 step={mid[0]*1000:.1f}ms  ckpt={mid[1]*1000:.1f}ms")
print(f"min  step={min(l[0] for l in lats)*1000:.1f}ms  ckpt={min(l[1] for l in lats)*1000:.1f}ms")

# profile 20 more ticks
pr = cProfile.Profile()
pr.enable()
for i in range(20):
    b = (all_rows.filter(SF.col("doc_id") % 21 == (i % 20))
         .withColumn("doc_id", SF.col("doc_id") + SF.lit((i + 100) * 10**9))
         .localCheckpoint(eager=True))
    (d,) = g.step(wc_out, docs=b)
    d.localCheckpoint(eager=True)
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(30)
