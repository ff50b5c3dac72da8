"""Similarity search over embedding columns (`array<float>`).

Mirrors the reference's KNN surface (`stdlib/indexing/nearest_neighbors.py`:
BruteForceKnn 170, LshKnn 262) with Spark-scale designs:

- brute_force_topk: broadcast the (small) query set against the corpus —
  corpus-side scan is embarrassingly parallel, cosine via zip_with/
  aggregate (JVM), per-query top-k via window rank. One shuffle on
  query_id for the rank.
- ivf_topk: IVF-style coarse quantization — k-means-lite centroids from a
  deterministic sample, cluster-pruned search (nprobe clusters per query).
  The 100 TB path: corpus partitioned by centroid, only nprobe/nlist of
  the data scanned per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..table import ID, Table
from .dedup import _dot, _norm, cosine_similarity


def brute_force_topk(corpus: Table, queries: Table, *, vec_col: str = "embedding",
                     id_col: str = "vec_id", k: int = 10,
                     metric: str = "cosine") -> Table:
    """Exact top-k neighbors for each query vector.

    Scale design: vectors explode to (id, dim, x) rows and the corpus ×
    query dot products become one broadcast join on the dimension index
    plus a map-side sum aggregate — whole-stage codegen end to end (the
    array-HOF cosine is interpreted per element and ~10x slower). The
    corpus-side scan stays embarrassingly parallel; the only wide
    shuffle keys on (query, neighbor) with partial aggregation.

    Output: (query_id, neighbor_id, rank, score)."""
    cex = corpus._df.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "cx"),
    )
    qex = queries._df.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "qx"),
    )
    cnorm = cex.groupBy("neighbor_id").agg(
        F.sqrt(F.sum(F.col("cx") * F.col("cx"))).alias("cn"))
    qnorm = qex.groupBy("query_id").agg(
        F.sqrt(F.sum(F.col("qx") * F.col("qx"))).alias("qn"))
    parts = (
        cex.join(F.broadcast(qex), "i")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    if metric == "l2":
        agg = F.sum((F.col("cx") - F.col("qx")) * (F.col("cx") - F.col("qx")))
        scored = (parts.groupBy("query_id", "neighbor_id")
                  .agg((-F.sqrt(agg)).alias("score")))
    else:
        dots = (parts.groupBy("query_id", "neighbor_id")
                .agg(F.sum(F.col("cx") * F.col("qx")).alias("dot")))
        if metric == "cosine":
            scored = (
                dots.join(F.broadcast(qnorm), "query_id")
                .join(cnorm, "neighbor_id")
                .withColumn("score", F.col("dot") / (F.col("cn") * F.col("qn")))
            )
        else:  # dot
            scored = dots.withColumn("score", F.col("dot"))
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.col("score"))
    )
    return Table(out.withColumn(ID, F.xxhash64("query_id", "rank")))


def _centroids(df: DataFrame, vec_col: str, nlist: int, iters: int = 3) -> DataFrame:
    """Deterministic k-means-lite: seed centroids = hash-sampled rows,
    refine with `iters` Lloyd steps (all DataFrame aggs)."""
    seeds = (
        df.withColumn("__r", F.xxhash64(F.col(vec_col).cast("string")))
        .orderBy("__r").limit(nlist)
        .select(F.monotonically_increasing_id().alias("cid"),
                F.col(vec_col).alias("centroid"))
    )
    cents = seeds
    for _ in range(iters):
        assigned = df.crossJoin(F.broadcast(cents)).withColumn(
            "sim", cosine_similarity(F.col(vec_col), F.col("centroid")))
        w = W.partitionBy(vec_col).orderBy(F.col("sim").desc())
        best = assigned.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
        dim_expr = F.size(F.col(vec_col))
        cents = (
            best.groupBy("cid")
            .agg(F.collect_list(vec_col).alias("vs"))
            .select(
                "cid",
                F.expr(
                    "transform(sequence(0, size(vs[0])-1), "
                    "i -> aggregate(vs, cast(0.0 as double), (acc, v) -> acc + v[i]) / size(vs))"
                ).alias("centroid"),
            )
        ).localCheckpoint(eager=True)
    return cents


def ivf_topk(corpus: Table, queries: Table, *, vec_col: str = "embedding",
             id_col: str = "vec_id", k: int = 10, nlist: int = 16,
             nprobe: int = 4) -> Table:
    """Approximate top-k: assign corpus to nlist centroid cells, search
    only the nprobe closest cells per query (scans ~nprobe/nlist of data)."""
    c = corpus._df.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).cast("array<double>").alias("cv"))
    q = queries._df.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).cast("array<double>").alias("qv"))
    cents = _centroids(c.select(F.col("cv").alias("v")), "v", nlist)

    def assign(df, vcol, out_name, topn):
        a = df.crossJoin(F.broadcast(cents)).withColumn(
            "sim", cosine_similarity(F.col(vcol), F.col("centroid")))
        w = W.partitionBy(*df.columns).orderBy(F.col("sim").desc())
        return (a.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= topn).select(*df.columns, F.col("cid").alias(out_name)))

    c_assigned = assign(c, "cv", "cell", 1)
    q_assigned = assign(q, "qv", "cell", nprobe)
    cand = c_assigned.join(q_assigned, "cell").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.withColumn("score", cosine_similarity(F.col("cv"), F.col("qv")))
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.col("score"))
    )
    return Table(out.withColumn(ID, F.xxhash64("query_id", "rank")))
