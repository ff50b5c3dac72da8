"""Interleaved A/B for q34: old cosine shape (separate norm aggregates
re-attached by joins) vs the r12 fused-norm aggregate. Both built inline
so one session times both; stall-sentinel rejection via r11_ab.ab."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from r11_ab import ab  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    os.environ["SPARK_GRAFT_CPUS"] = CPUS
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from pathway_spark.session import get_spark

    spark = get_spark("r12-ab-q34", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def base():
        cex = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "cx"))
        qex = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "qx"))
        parts = cex.join(F.broadcast(qex), "i").filter(
            F.col("query_id") != F.col("neighbor_id"))
        return cex, qex, parts

    def old_shape():
        cex, qex, parts = base()
        cnorm = cex.groupBy("neighbor_id").agg(
            F.sqrt(F.sum(F.col("cx") * F.col("cx"))).alias("cn"))
        qnorm = qex.groupBy("query_id").agg(
            F.sqrt(F.sum(F.col("qx") * F.col("qx"))).alias("qn"))
        dots = (parts.groupBy("query_id", "neighbor_id")
                .agg(F.sum(F.col("cx") * F.col("qx")).alias("dot")))
        scored = (dots.join(F.broadcast(qnorm), "query_id")
                  .join(cnorm, "neighbor_id")
                  .withColumn("score", F.col("dot") / (F.col("cn") * F.col("qn"))))
        w = W.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("neighbor_id"))
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 5)
                .select("query_id", "neighbor_id", "rank"))

    def new_shape():
        cex, qex, parts = base()
        scored = (parts.groupBy("query_id", "neighbor_id")
                  .agg(F.sum(F.col("cx") * F.col("qx")).alias("dot"),
                       F.sum(F.col("cx") * F.col("cx")).alias("cn2"),
                       F.sum(F.col("qx") * F.col("qx")).alias("qn2"))
                  .withColumn("score",
                              F.col("dot") / (F.sqrt("cn2") * F.sqrt("qn2"))))
        w = W.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("neighbor_id"))
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 5)
                .select("query_id", "neighbor_id", "rank"))

    # result equality first (exact rows)
    a = {tuple(r) for r in old_shape().collect()}
    b = {tuple(r) for r in new_shape().collect()}
    assert a == b, f"result mismatch: {len(a ^ b)} differing rows"
    print(f"results identical: {len(a)} rows")

    ab({"old_joined_norms": old_shape, "new_fused_norms": new_shape},
       reps=int(os.environ.get("REPS", "8")))


if __name__ == "__main__":
    main()
