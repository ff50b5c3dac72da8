"""Live APPROXIMATE nearest neighbors — an incrementally-maintained
IVF index with freeze-at-arrival queries.

The reference serves as-of-now approximate vector queries from a
usearch (HNSW) index maintained over a changing corpus
(`python/pathway/stdlib/indexing/nearest_neighbors.py:65`,
`src/external_integration/usearch_integration.rs`).  The Spark-first
translation keeps the INDEX as differential state instead of a native
graph structure:

- every corpus vector is assigned to one IVF CELL — the sign pattern
  of `n_bits` deterministic hash-derived hyperplane projections,
  computed per row in integer arithmetic (the cross-engine fixed-point
  scheme of `operators/dedup.py`: quantize to floor(x·1e6),
  md5-derived plane components, exact integer sums — so an external
  SQL engine reproduces the assignment bit-for-bit);
- the cell → vectors map is an ordinary differential state store:
  inserts and RETRACTIONS of corpus vectors flow through it as ±1
  deltas, exactly like every other operator's state;
- a query expands to its own cell plus `multiprobe` single-bit-flip
  neighbor cells (Hamming-1 multiprobe — standard IVF probing), joins
  the cell store AS OF NOW (freeze-at-arrival: the reference's
  `asof_now` retrieval contract — later corpus changes never revise an
  already-served answer), and ranks its candidates by exact cosine,
  keeping the top k.

Contrast with `incremental_topk` (exact, LIVE-revising answers): this
is the approximate, frozen-answer family — O(|cell slice|) per query
instead of O(|corpus|), the 100 TB serving shape, at the cost of
recall < 1 exactly like the reference's usearch index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..operators.dedup import _dot, _norm
from .differential import DiffNode, _AsofNowNode, _KeyedRecomputeUnaryNode


def _plane_term(p: int):
    """Integer hyperplane component c(p, i) for use INSIDE a transform
    lambda — same formula as `operators/dedup.plane_component_cross`
    (md5(p·10007 + i) → 60-bit int → mod 2001 − 1000), here applied to
    a lambda-bound index Column."""
    def term(x: Column, i: Column) -> Column:
        key = (F.lit(p * 10_007) + i).cast("string")
        c = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long") \
            % 2001 - 1000
        xi = F.floor(x.cast("double") * F.lit(1_000_000.0)).cast("long")
        return xi * c
    return term


def cell_expr(vec: Column, n_bits: int, table: int = 0) -> Column:
    """IVF cell id of a vector in hash table `table`: bit p set iff
    the (table·n_bits + p)-th integer hyperplane projection is > 0,
    offset by table·2^n_bits so cells of different tables never
    collide.  Pure Column expression — one pass per plane over the
    array, no explode, no UDF."""
    cell = F.lit(table << n_bits).cast("long")
    for p in range(n_bits):
        proj = F.aggregate(
            F.transform(vec, _plane_term(table * n_bits + p)),
            F.lit(0).cast("long"), lambda acc, x: acc + x)
        cell = cell + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return cell


def incremental_ivf_topk(queries: DiffNode, docs: DiffNode, *,
                         vec_col: str, id_col: str, k: int,
                         n_bits: int = 6, tables: int = 4,
                         multiprobe: int | None = None) -> DiffNode:
    """Approximate top-k over a changing corpus with freeze-at-arrival
    queries.

    queries delta schema: (query_id, <vec_col>); docs delta schema:
    (<id_col>, <vec_col>).  Emits (query_id, neighbor_id, rank) — the
    top-k among the query's probed cells, ranked by exact cosine with
    id tiebreak.  `tables` independent hash tables × Hamming-1
    multiprobe control recall (classic LSH: miss ≈ (1−p^b)^L per
    neighbor); corpus inserts/retractions maintain the cell stores
    (state = tables × corpus rows); answers already emitted are never
    revised (retract the query to withdraw them).  Per query cost:
    O(|probed cells' vectors|), never O(|corpus|)."""
    multiprobe = n_bits if multiprobe is None else multiprobe
    g = queries.graph

    d_assign = F.array(*[cell_expr(F.col(vec_col), n_bits, t)
                         for t in range(tables)])
    d_cells = (docs.with_columns(__cells=d_assign)
               .select(F.col(id_col).alias("__nid"),
                       F.col(vec_col).alias("__dv"), F.col("__cells"))
               .flatten("__cells", "__cell"))
    probe_cols = []
    for t in range(tables):
        c = cell_expr(F.col(vec_col), n_bits, t)
        probe_cols.append(c)
        probe_cols += [c.bitwiseXOR(F.lit(1 << b))
                       for b in range(multiprobe)]
    q_probes = (queries
                .with_columns(__probes=F.array(*probe_cols))
                .select(F.col("query_id"), F.col(vec_col).alias("__qv"),
                        F.col("__probes"))
                .flatten("__probes", "__cell"))

    cand = _AsofNowNode(g, q_probes, d_cells, ["__cell"], ["__cell"])
    scored = cand.select(
        F.col("query_id"), F.col("__nid"),
        (_dot(F.col("__qv"), F.col("__dv"))
         / (_norm(F.col("__qv")) * _norm(F.col("__dv"))))
        .alias("__score"))

    def topk(plain: DataFrame) -> DataFrame:
        w = W.partitionBy("query_id").orderBy(F.col("__score").desc(),
                                              F.col("__nid"))
        # a doc found through several tables/probes is ONE candidate
        return (plain.dropDuplicates(["query_id", "__nid"])
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", F.col("__nid").alias("neighbor_id"),
                        "rank"))

    return _KeyedRecomputeUnaryNode(g, scored, ["query_id"], topk)
