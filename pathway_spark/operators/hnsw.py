"""Per-partition HNSW approximate nearest neighbors.

Parity target: the reference's ``USearchKnn`` retriever
(``/root/reference/python/pathway/stdlib/indexing/nearest_neighbors.py:65``),
which wraps the usearch HNSW library. That library is not in this
container, so the graph index is a self-contained numpy implementation
of HNSW (Malkov & Yashunin, TPAMI'18, public algorithm): per-node level
sampled from a geometric distribution, greedy descent through upper
layers, beam (ef) search at layer 0.

Scale design — the 100 TB shape:
- the corpus is NEVER collected: ``mapInPandas`` builds one in-memory
  HNSW graph per Arrow batch (bounded by ``spark.sql.execution.arrow.
  maxRecordsPerBatch``) and searches the broadcast query set against it,
  emitting each partition's local top-k;
- local top-k rows (``n_partitions × n_queries × k``, tiny) are merged
  by a window rank — the same merge the brute-force path uses;
- the query side is broadcast once via ``sparkContext.broadcast``
  (queries are the small side in retrieval; for query sets too large to
  broadcast use brute_force_topk's shuffle path instead).

Determinism: level assignment uses a hash of the vector id, not an RNG,
so rebuilding the same partition yields the same graph.
"""

from __future__ import annotations

import heapq
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..table import ID, Table


class HnswIndex:
    """In-memory HNSW graph over a (n, dim) float32 matrix."""

    def __init__(self, vectors: np.ndarray, ids: np.ndarray, *, m: int = 16,
                 ef_construction: int = 64, metric: str = "cosine"):
        self.metric = metric
        if metric == "cosine":
            norms = np.linalg.norm(vectors, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            self.vecs = (vectors / norms).astype(np.float32)
        else:
            self.vecs = vectors.astype(np.float32)
        self.ids = ids
        self.m = m
        self.ef_c = max(ef_construction, m)
        n = len(ids)
        # deterministic level per node: geometric from the id hash
        # (reference HNSW uses -ln(U)*mL; U derived from a splitmix of id)
        h = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        u = (h.astype(np.float64) + 1.0) / float(1 << 24)
        ml = 1.0 / np.log(max(m, 2))
        self.levels = np.floor(-np.log(u) * ml).astype(np.int64)
        self.max_level = int(self.levels.max(initial=0))
        # adjacency: per level, list of neighbor-index lists
        self.graph: list[dict[int, list[int]]] = [
            {} for _ in range(self.max_level + 1)
        ]
        self.entry = -1
        for i in range(n):
            self._insert(i)

    # ---------------------------------------------------------------- dist
    def _dist(self, q: np.ndarray, cand: list[int] | np.ndarray) -> np.ndarray:
        sub = self.vecs[cand]
        if self.metric == "l2":
            d = sub - q
            return np.sqrt(np.einsum("ij,ij->i", d, d))
        return -sub @ q  # cosine/dot on (unit-)normalized vectors

    # -------------------------------------------------------------- search
    def _search_layer(self, q: np.ndarray, entry: int, ef: int, level: int) -> list[tuple[float, int]]:
        """Beam search at one layer; returns up to ef (dist, idx) sorted."""
        g = self.graph[level]
        d0 = float(self._dist(q, [entry])[0])
        visited = {entry}
        cand = [(d0, entry)]          # min-heap of frontier
        best = [(-d0, entry)]         # max-heap (neg dist) of results
        while cand:
            d, c = heapq.heappop(cand)
            if d > -best[0][0] and len(best) >= ef:
                break
            neigh = [x for x in g.get(c, ()) if x not in visited]
            if not neigh:
                continue
            visited.update(neigh)
            dists = self._dist(q, neigh)
            for nd, nx in zip(dists, neigh):
                nd = float(nd)
                if len(best) < ef or nd < -best[0][0]:
                    heapq.heappush(cand, (nd, nx))
                    heapq.heappush(best, (-nd, nx))
                    if len(best) > ef:
                        heapq.heappop(best)
        return sorted((-d, i) for d, i in best)

    def _insert(self, i: int) -> None:
        level = int(self.levels[i])
        if self.entry < 0:
            self.entry = i
            for lv in range(level + 1):
                self.graph[lv][i] = []
            return
        q = self.vecs[i]
        ep = self.entry
        # greedy descend through layers above the node's level
        for lv in range(self.max_level, level, -1):
            if not self.graph[lv]:
                continue
            ep = self._search_layer(q, ep, 1, lv)[0][1]
        for lv in range(min(level, self.max_level), -1, -1):
            if not self.graph[lv]:
                self.graph[lv][i] = []
                continue
            found = self._search_layer(q, ep, self.ef_c, lv)
            m = self.m * 2 if lv == 0 else self.m
            neigh = [x for _, x in found[:m]]
            self.graph[lv][i] = neigh
            for x in neigh:
                lst = self.graph[lv].setdefault(x, [])
                lst.append(i)
                if len(lst) > m:
                    # keep the m closest back-links (simple pruning)
                    d = self._dist(self.vecs[x], lst)
                    order = np.argsort(d, kind="stable")[:m]
                    self.graph[lv][x] = [lst[j] for j in order]
            ep = found[0][1]
        if level > int(self.levels[self.entry]):
            self.entry = i

    def search(self, q: np.ndarray, k: int, *, ef_search: int = 64):
        """Top-k (id, score) for one query; score matches brute_force_topk
        (cosine similarity / dot / negative l2)."""
        if self.entry < 0:
            return []
        qq = q.astype(np.float32)
        if self.metric == "cosine":
            n = np.linalg.norm(qq)
            qq = qq / (n if n else 1.0)
        ep = self.entry
        for lv in range(self.max_level, 0, -1):
            if self.graph[lv]:
                ep = self._search_layer(qq, ep, 1, lv)[0][1]
        found = self._search_layer(qq, ep, max(ef_search, k), 0)[:k]
        return [(int(self.ids[i]), -d) for d, i in found]


# Above this Catalyst-estimated size the query set is NOT collected to
# the driver: hnsw_topk's broadcast-the-queries design assumes a small
# query set (its intended regime); when queries ≈ corpus (self-join
# dedup use) the toPandas() below is a driver OOM at scale, so route to
# ivf_topk, which keeps queries distributed end to end.
_QUERY_COLLECT_LIMIT_BYTES = 64 << 20
# Catalyst reports ~Long.MaxValue-ish sizes when it has no statistics
# (e.g. filters over local relations); past this the estimate is a
# sentinel, not a measurement — fall back to a bounded count probe.
_SANE_ESTIMATE_CAP = 1 << 50
_QUERY_COLLECT_LIMIT_ROWS = 100_000


def hnsw_topk(corpus: Table, queries: Table, *, vec_col: str = "embedding",
              id_col: str = "vec_id", k: int = 10, metric: str = "cosine",
              m: int = 16, ef_construction: int = 64, ef_search: int = 64,
              exclude_self: bool = True) -> Table:
    """Approximate top-k via per-partition HNSW + window merge.

    Output schema matches brute_force_topk: (query_id, neighbor_id,
    rank, score). Each Arrow batch builds its own graph; the per-batch
    local top-k lists merge with one tiny shuffle on query_id.

    Scale guard: the query set is collected + broadcast, which is the
    right plan only while it is small. Above _QUERY_COLLECT_LIMIT_BYTES
    (Catalyst size estimate, no job run) the call transparently falls
    back to ivf_topk — same output contract, queries never leave the
    executors."""
    spark = corpus._df.sparkSession
    qsel = queries._df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<float>").alias("qv"),
    )
    try:
        qsize = int(qsel._jdf.queryExecution().optimizedPlan().stats()
                    .sizeInBytes())
    except Exception:
        qsize = 0  # stats unavailable: preserve old behavior
    if qsize > _SANE_ESTIMATE_CAP:
        # no real statistics — probe with a row-bounded count (one small
        # job over the query side only, stops scanning at the limit)
        probe = qsel.limit(_QUERY_COLLECT_LIMIT_ROWS + 1).count()
        too_big = probe > _QUERY_COLLECT_LIMIT_ROWS
    else:
        too_big = qsize > _QUERY_COLLECT_LIMIT_BYTES
    if too_big:
        # stay in the HNSW family: the both-sides-distributed IVF+HNSW
        # composition (round 7) — queries never leave the executors
        return ivf_hnsw_topk(corpus, queries, vec_col=vec_col,
                             id_col=id_col, k=k, metric=metric, m=m,
                             ef_construction=ef_construction,
                             ef_search=ef_search,
                             exclude_self=exclude_self)
    qpdf = qsel.toPandas()
    q_ids = qpdf["query_id"].to_numpy()
    q_mat = np.array([np.asarray(v, dtype=np.float32) for v in qpdf["qv"]])
    bq = spark.sparkContext.broadcast((q_ids, q_mat))

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids, qmat = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["nid"].to_numpy()
            mat = np.array([np.asarray(v, dtype=np.float32) for v in pdf["v"]])
            index = HnswIndex(mat, ids, m=m, ef_construction=ef_construction,
                              metric=metric)
            rows: list[tuple[int, int, float]] = []
            for qid, qv in zip(qids, qmat):
                # +1 headroom so self-hits don't shrink the local list
                for nid, score in index.search(qv, k + 1, ef_search=ef_search):
                    if exclude_self and nid == qid:
                        continue
                    rows.append((int(qid), int(nid), float(score)))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "score"])

    local = corpus._df.select(
        F.col(id_col).cast("long").alias("nid"),
        F.col(vec_col).cast("array<float>").alias("v"),
    ).mapInPandas(run, out_schema)
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    out = (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )
    return Table(out.withColumn(ID, F.xxhash64("query_id", "rank")))


def ivf_hnsw_topk(corpus: Table, queries: Table, *, vec_col: str = "embedding",
                  id_col: str = "vec_id", k: int = 10, metric: str = "cosine",
                  nlist: int = 16, nprobe: int = 4, m: int = 16,
                  ef_construction: int = 64, ef_search: int = 64,
                  exclude_self: bool = True) -> Table:
    """IVF-coarse + per-cell HNSW — the BOTH-SIDES-distributed scale
    path (FAISS's IVF+HNSW composition; reference `UsearchKnnFactory`
    wraps the same graph family).  Neither the corpus nor the query set
    ever reaches the driver:

    - a deterministic k-means-lite (shared with `ivf_topk`) assigns
      every corpus vector to its closest of `nlist` cells and every
      query to its `nprobe` closest cells;
    - `cogroup(...).applyInPandas` builds one in-memory HNSW graph PER
      CELL on the executors and beam-searches that cell's queries
      against it — per-task memory is one cell's slice, never the
      corpus;
    - the per-cell local top-k lists (≤ nprobe·k rows per query) merge
      with one window rank, exactly like `hnsw_topk`.

    Output schema matches brute_force_topk: (query_id, neighbor_id,
    rank, score).  Use `hnsw_topk` when the query set is small (its
    broadcast design spares the coarse quantizer); use THIS when both
    sides are large — recall is bounded by the IVF probe like
    `ivf_topk`, refined inside each cell by the graph search."""
    from .similarity import _assign_cells, _centroids_ex

    cdf = corpus._df.select(
        F.col(id_col).cast("long").alias("nid"),
        F.col(vec_col).cast("array<float>").alias("v"))
    qdf = queries._df.select(
        F.col(id_col).cast("long").alias("qid"),
        F.col(vec_col).cast("array<float>").alias("qv"))

    cex = cdf.select(
        F.col("nid").alias("vid"),
        F.posexplode(F.col("v").cast("array<double>")).alias("i", "x"))
    qex = qdf.select(
        F.col("qid").alias("vid"),
        F.posexplode(F.col("qv").cast("array<double>")).alias("i", "x"))
    cents = _centroids_ex(cex, nlist)
    c_cells = (_assign_cells(cex, cents, 1, "vid")
               .withColumnRenamed("vid", "nid").join(cdf, "nid"))
    q_cells = (_assign_cells(qex, cents, nprobe, "vid")
               .withColumnRenamed("vid", "qid").join(qdf, "qid"))

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ])

    def per_cell(cpdf: pd.DataFrame, qpdf: pd.DataFrame) -> pd.DataFrame:
        if cpdf.empty or qpdf.empty:
            return pd.DataFrame(columns=["query_id", "neighbor_id", "score"])
        ids = cpdf["nid"].to_numpy()
        mat = np.array([np.asarray(v, dtype=np.float32) for v in cpdf["v"]])
        index = HnswIndex(mat, ids, m=m, ef_construction=ef_construction,
                          metric=metric)
        rows: list[tuple[int, int, float]] = []
        for qid, qv in zip(qpdf["qid"].to_numpy(), qpdf["qv"]):
            qv = np.asarray(qv, dtype=np.float32)
            for nid, score in index.search(qv, k + 1, ef_search=ef_search):
                if exclude_self and nid == qid:
                    continue
                rows.append((int(qid), int(nid), float(score)))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "score"])

    local = (c_cells.groupby("cell")
             .cogroup(q_cells.groupby("cell"))
             .applyInPandas(lambda c, q: per_cell(c, q), out_schema))
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(),
                                          F.col("neighbor_id"))
    out = (local
           # a query probing several cells can see the same neighbor
           # through... it cannot (corpus rows live in ONE cell), but a
           # defensive distinct keeps the contract under future
           # multi-assignment tuning
           .groupBy("query_id", "neighbor_id").agg(F.max("score").alias("score"))
           .withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k)
           .select("query_id", "neighbor_id", "rank", "score"))
    return Table(out.withColumn(ID, F.xxhash64("query_id", "rank")))
