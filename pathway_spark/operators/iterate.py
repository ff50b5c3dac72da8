"""Fixed-point iteration + graph algorithms.

Reference: `pw.iterate` (`internals/common.py:39-91`, engine graph.rs:931),
`stdlib/graphs/pagerank/impl.py:18`, `bellman_ford/impl.py`,
`louvain_communities/impl.py`.

Spark mapping (SURVEY §2.10): driver-side loop over DataFrames with
`localCheckpoint()` per iteration (truncates the lineage so plans don't
grow exponentially) and a single-job symmetric-difference convergence
test (±1-weighted union + residual check). This module is the BATCH
path; arbitrary iterate bodies also update incrementally under deltas
via the level cascade (`streaming/iterate_diff.py`, reference
`graph.rs:931` iterate scope).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import functions as F

from ..table import ID, Table


def _dfs_equal(da, db) -> bool:
    """Multiset equality in ONE Spark job: union the frames with +1/-1
    weights, aggregate per row, look for a nonzero residual. The previous
    two-`exceptAll` check paid the full fixed-point frame scan twice per
    table per step — at 100× scale that doubles every iteration's
    convergence cost; this is one shuffle + one action."""
    if len(da.columns) != len(db.columns) or set(da.columns) != set(db.columns):
        return False
    cols = sorted(da.columns)
    tagged = (
        da.select(cols).withColumn("__w", F.lit(1))
        .unionByName(db.select(cols).withColumn("__w", F.lit(-1)))
    )
    return (
        tagged.groupBy(cols).agg(F.sum("__w").alias("__s"))
        .filter(F.col("__s") != 0)
        .isEmpty()
    )


def _converged(a: Table, b: Table) -> bool:
    return _dfs_equal(a._df, b._df)


def iterate(func: Callable, iteration_limit: int | None = None, **tables: Table):
    """pw.iterate — apply `func(**tables) -> dict/tuple of Tables` until all
    returned tables stop changing (or iteration_limit)."""
    current = dict(tables)
    it = 0
    while True:
        it += 1
        out = func(**current)
        if isinstance(out, Table):
            out = {next(iter(current)): out}
        elif isinstance(out, tuple):
            out = dict(zip(current.keys(), out))
        out = {k: Table(v._df.localCheckpoint(eager=True)) if isinstance(v, Table) else v
               for k, v in out.items()}
        done = all(
            k not in current or _converged(out[k], current[k]) for k in out
        )
        merged = dict(current)
        merged.update(out)
        current = merged
        if done or (iteration_limit is not None and it >= iteration_limit):
            if len(out) == 1:
                return next(iter(out.values()))
            return out


def pagerank(edges: Table, steps: int = 5, damping: float = 0.85) -> Table:
    """stdlib/graphs/pagerank/impl.py:18 — iterative join/agg loop.

    `edges` needs columns (u, v). Returns (u, rank) with rank scaled like
    the reference (integer-ish float ranks)."""
    e = edges._df.select(F.col("u"), F.col("v"))
    verts = e.select(F.col("u").alias("w")).union(e.select("v")).distinct()
    outdeg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ranks = verts.select("w", F.lit(1.0).alias("rank"))
    for _ in range(steps):
        contrib = (
            e.join(ranks, e["u"] == ranks["w"], "inner")
            .join(outdeg, "u")
            .select(F.col("v").alias("w"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("w")
            .agg(F.sum("c").alias("in_rank"))
        )
        ranks = (
            verts.join(contrib, "w", "left")
            .select(
                "w",
                (F.lit(1 - damping) + F.lit(damping) * F.coalesce(F.col("in_rank"), F.lit(0.0))).alias("rank"),
            )
        ).localCheckpoint(eager=True)
    return Table(ranks.withColumn(ID, F.xxhash64("w")))


PAGERANK_SCALE = 1_000_000_000


def pagerank_exact(edges: Table, steps: int = 5, damping_pct: int = 85) -> Table:
    """PageRank in 10^-9 fixed-point integer arithmetic — bit-identical
    across engines (float summation order makes ordinary pagerank ranks
    engine-specific; integer floor-division and sums are not):

        r0(v)   = SCALE
        r_{k+1} = (100-d)% * SCALE / 100
                  + d * sum_{u→v}( r_k(u) // deg(u) ) // 100

    Same join/agg shuffle shape as ``pagerank``; use this variant when an
    external system must reproduce ranks exactly (e.g. the DuckDB oracle
    gate, which unrolls the same recurrence in SQL)."""
    def idiv(a, b):
        # exact integer floor-div for non-negative longs: subtracting the
        # mod first makes the double division land on an exact integer
        # (a bare cast-after-divide can round up at the 2^53 edge)
        return ((a - F.pmod(a, b)) / b).cast("long")

    e = edges._df.select(F.col("u"), F.col("v"))
    verts = e.select(F.col("u").alias("w")).union(e.select("v")).distinct()
    outdeg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    base = (100 - damping_pct) * PAGERANK_SCALE // 100
    ranks = verts.select("w", F.lit(PAGERANK_SCALE).cast("long").alias("rank"))
    for _ in range(steps):
        contrib = (
            e.join(ranks, e["u"] == ranks["w"], "inner")
            .join(outdeg, "u")
            .select(F.col("v").alias("w"),
                    idiv(F.col("rank"), F.col("deg")).alias("c"))
            .groupBy("w")
            .agg(F.sum("c").alias("in_rank"))
        )
        ranks = (
            verts.join(contrib, "w", "left")
            .select(
                "w",
                (F.lit(base) + idiv(
                    F.lit(damping_pct) * F.coalesce(F.col("in_rank"), F.lit(0)),
                    F.lit(100),
                )).alias("rank"),
            )
        ).localCheckpoint(eager=True)
    return Table(ranks.withColumn(ID, F.xxhash64("w")))


def bellman_ford(vertices: Table, edges: Table, start_vertex) -> Table:
    """stdlib/graphs/bellman_ford/impl.py — shortest paths via iterate.

    Relaxation is bounded by |V| passes (the Bellman-Ford guarantee:
    |V|−1 improving passes + one stability check); a graph still
    relaxing after that has a negative-weight cycle and raises instead
    of spinning forever."""
    e = edges._df.select("u", "v", "dist")
    dists = vertices._df.select(
        F.col(vertices.column_names[0]).alias("w"),
        F.when(F.col(vertices.column_names[0]) == F.lit(start_vertex), 0.0).alias("d"),
    )
    n_verts = dists.count()
    for _ in range(max(1, n_verts)):
        relaxed = (
            dists.join(e, dists["w"] == e["u"], "inner")
            .select(F.col("v").alias("w"), (F.col("d") + F.col("dist")).alias("nd"))
            .groupBy("w")
            .agg(F.min("nd").alias("nd"))
        )
        new = (
            dists.join(relaxed, "w", "left")
            .select("w", F.least(F.col("d"), F.col("nd")).alias("d"))
        ).localCheckpoint(eager=True)
        if _dfs_equal(new.select("w", "d"), dists.select("w", "d")):
            break
        dists = new
    else:
        raise ValueError(
            "bellman_ford: still relaxing after |V| passes — the edge "
            "set contains a negative-weight cycle")
    return Table(dists.withColumn(ID, F.xxhash64("w")))


def louvain_communities(edges: Table, *, max_iterations: int = 10) -> Table:
    """Community detection (reference `stdlib/graphs/louvain_communities/`).

    Spark-first approximation: synchronous label propagation weighted by
    edge weight (`weight` column, default 1) — each vertex adopts the
    label with the highest incident weight, iterated to a fixed point.
    LPA converges to the same communities as Louvain's local-move phase
    on well-separated graphs; documented divergence: no modularity-gain
    tie-breaking (ties break by smallest label for determinism).
    """
    cols = edges._df.columns
    e = edges._df.select(
        F.col("u"), F.col("v"),
        (F.col("weight") if "weight" in cols else F.lit(1.0)).alias("w"),
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"), F.col("w")))
    labels = sym.select(F.col("u").alias("n")).distinct().withColumn("label", F.col("n"))
    for _ in range(max_iterations):
        neigh = (
            sym.join(labels, sym["v"] == labels["n"])
            .groupBy("u", "label")
            .agg(F.sum("w").alias("lw"))
        )
        best = (
            neigh.groupBy("u")
            .agg(F.min_by(F.col("label"), F.struct((-F.col("lw")).alias("nw"),
                                                   F.col("label"))).alias("new_label"))
        )
        new = labels.join(best, labels["n"] == best["u"], "left").select(
            F.col("n"), F.coalesce(F.col("new_label"), F.col("label")).alias("label")
        ).localCheckpoint(eager=True)
        if _dfs_equal(new, labels):
            labels = new
            break
        labels = new
    return Table(labels.withColumn(ID, F.xxhash64("n")))


def connected_components(edges: Table) -> Table:
    """Label propagation to a fixed point — building block for
    session(predicate=...) windows (reference merges sessions via iterate
    connected-components, `_window.py:67-145`)."""
    e = edges._df.select("u", "v")
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = (
        sym.select(F.col("u").alias("w")).distinct().withColumn("label", F.col("w"))
    )
    while True:
        neigh = (
            sym.join(labels, sym["v"] == labels["w"], "inner")
            .select(F.col("u").alias("w"), F.col("label"))
        )
        new = (
            labels.select("w", "label").union(neigh)
            .groupBy("w").agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        if _dfs_equal(new, labels):
            break
        labels = new
    return Table(labels.withColumn(ID, F.xxhash64("w")))
