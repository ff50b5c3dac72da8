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

# Above this Catalyst-estimated plan size the query side is NOT hinted
# for broadcast: a large query set × vector dim would OOM every executor
# holding the broadcast copy. Matches Spark's own 8GB hard hint limit
# logic but far more conservative (explode multiplies row count by dim).
_BROADCAST_LIMIT_BYTES = 256 << 20


def _maybe_broadcast(df: DataFrame) -> DataFrame:
    """Broadcast hint gated on Catalyst's size estimate (no action run).

    Falls back to returning the frame unhinted — shuffle hash join /
    AQE decide — when the estimate is unavailable or above the limit."""
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return F.broadcast(df)  # stats unavailable: preserve old behavior
    return F.broadcast(df) if size <= _BROADCAST_LIMIT_BYTES else df


def brute_force_topk(corpus: Table, queries: Table, *, vec_col: str = "embedding",
                     id_col: str = "vec_id", k: int = 10,
                     metric: str = "cosine", self_exclude: bool = True) -> Table:
    """Exact top-k neighbors for each query vector.

    Scale design: vectors explode to (id, dim, x) rows and the corpus ×
    query dot products become one broadcast join on the dimension index
    plus a map-side sum aggregate — whole-stage codegen end to end (the
    array-HOF cosine is interpreted per element and ~10x slower). The
    corpus-side scan stays embarrassingly parallel; the only wide
    shuffle keys on (query, neighbor) with partial aggregation.

    `self_exclude` drops neighbors whose id equals the query id — right
    for self-join dedup/search over ONE id space (the default use). Pass
    False when queries and corpus are distinct tables that merely share
    an id range (e.g. KNN classification), where an id-equal neighbor is
    a coincidence, not the same row.

    Output: (query_id, neighbor_id, rank, score)."""
    cex = corpus._df.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "cx"),
    )
    qex = queries._df.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "qx"),
    )
    qex_b = _maybe_broadcast(qex)
    parts = cex.join(qex_b, "i")
    if self_exclude:
        parts = parts.filter(F.col("query_id") != F.col("neighbor_id"))
    if metric == "l2":
        agg = F.sum((F.col("cx") - F.col("qx")) * (F.col("cx") - F.col("qx")))
        scored = (parts.groupBy("query_id", "neighbor_id")
                  .agg((-F.sqrt(agg)).alias("score")))
    elif metric == "cosine":
        # fused norms (r12): every dimension of both vectors is present
        # in each (query, neighbor) group (dense posexplode + inner join
        # on i), so Σcx² and Σqx² within the group ARE the two squared
        # norms — computing them as sibling aggregates removes the two
        # norm aggregations AND the two re-attach joins (one of which,
        # the corpus-norms join, lost its static broadcast under the
        # r11 1 MB threshold and paid an extra shuffle round: q34 bench
        # 0.333 → 0.547 s).  Same float ops per value, same (already
        # nondeterministic) partial-agg addition order as the separate
        # aggregates; score expression unchanged: dot / (√Σcx² · √Σqx²).
        scored = (
            parts.groupBy("query_id", "neighbor_id")
            .agg(F.sum(F.col("cx") * F.col("qx")).alias("dot"),
                 F.sum(F.col("cx") * F.col("cx")).alias("cn2"),
                 F.sum(F.col("qx") * F.col("qx")).alias("qn2"))
            .withColumn("score",
                        F.col("dot") / (F.sqrt("cn2") * F.sqrt("qn2")))
        )
    else:  # dot
        scored = (parts.groupBy("query_id", "neighbor_id")
                  .agg(F.sum(F.col("cx") * F.col("qx")).alias("score")))
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.col("score"))
    )
    return Table(out.withColumn(ID, F.xxhash64("query_id", "rank")))

def _assign_cells(ex: DataFrame, cents_ex: DataFrame, topn: int,
                  id_name: str) -> DataFrame:
    """(id → topn closest centroid cells) via exploded dot products:
    join on the dimension index, sum per (id, cid), rank by cosine.
    cents_ex is small (nlist × dim) and broadcast."""
    cnorm = cents_ex.groupBy("cid").agg(
        F.sqrt(F.sum(F.col("cx") * F.col("cx"))).alias("cnorm"))
    dots = (
        ex.join(F.broadcast(cents_ex), "i")
        .groupBy(id_name, "cid")
        .agg(F.sum(F.col("x") * F.col("cx")).alias("dot"))
        .join(F.broadcast(cnorm), "cid")
        .withColumn("sim", F.col("dot") / F.col("cnorm"))  # |v| constant per id
    )
    w = W.partitionBy(id_name).orderBy(F.col("sim").desc(), F.col("cid"))
    return (dots.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= topn).select(id_name, F.col("cid").alias("cell")))


def _centroids_ex(ex: DataFrame, nlist: int, iters: int = 3) -> DataFrame:
    """Deterministic k-means-lite over exploded vectors: seeds = the
    nlist hash-smallest vector ids; Lloyd steps are joins + avgs — all
    whole-stage codegen, one localCheckpoint per iteration."""
    seeds = (
        ex.select("vid").distinct()
        .withColumn("__r", F.xxhash64("vid"))
        .orderBy("__r").limit(nlist)
        .withColumn("cid", F.monotonically_increasing_id())
        .select("vid", "cid")
    )
    cents = (
        ex.join(F.broadcast(seeds), "vid")
        .select("cid", "i", F.col("x").alias("cx"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        best = _assign_cells(ex, cents, 1, "vid")
        cents = (
            ex.join(best, "vid")
            .groupBy(F.col("cell").alias("cid"), F.col("i"))
            .agg(F.avg("x").alias("cx"))
        ).localCheckpoint(eager=True)
    return cents


def ivf_topk(corpus: Table, queries: Table, *, vec_col: str = "embedding",
             id_col: str = "vec_id", k: int = 10, nlist: int = 16,
             nprobe: int = 4, self_exclude: bool = True) -> Table:
    """Approximate top-k: assign corpus to nlist centroid cells, search
    only the nprobe closest cells per query (scans ~nprobe/nlist of the
    data). All dot products run as exploded-dimension joins + sum
    aggregates (codegen); at 100 TB the corpus stays partitioned by cell
    so each query touches only nprobe cells."""
    from pyspark.storagelevel import StorageLevel

    cex = corpus._df.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    qex = queries._df.select(
        F.col(id_col).alias("qid"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"),
    )
    cents = _centroids_ex(cex, nlist)
    c_cells = _assign_cells(cex, cents, 1, "vid")
    q_cells = _assign_cells(qex.withColumnRenamed("qid", "vid"), cents, nprobe, "vid") \
        .withColumnRenamed("vid", "qid")

    # candidates: corpus rows in any probed cell of the query
    cand = c_cells.join(q_cells, "cell")
    if self_exclude:
        # see brute_force_topk: only valid for one shared id space
        cand = cand.filter(F.col("qid") != F.col("vid"))
    cand = cand.select("qid", "vid").distinct()
    # fused norms (r12, same argument as brute_force_topk): every dim of
    # both vectors is present per (qid, vid) group, so the squared norms
    # ride the dot aggregate as siblings — no separate norm aggregations,
    # no re-attach joins.
    scored = (
        cand.join(cex, "vid")
        .join(F.broadcast(qex.select(F.col("qid"), "i", F.col("x").alias("qx"))),
              ["qid", "i"])
        .groupBy("qid", "vid")
        .agg(F.sum(F.col("x") * F.col("qx")).alias("dot"),
             F.sum(F.col("x") * F.col("x")).alias("vn2"),
             F.sum(F.col("qx") * F.col("qx")).alias("qn2"))
        .withColumn("score",
                    F.col("dot") / (F.sqrt("vn2") * F.sqrt("qn2")))
    )
    w = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vid"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), F.col("vid").alias("neighbor_id"),
                "rank", F.col("score"))
    )
    return Table(out.withColumn(ID, F.xxhash64("query_id", "rank")))
