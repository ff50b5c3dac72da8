"""Live approximate ANN (round 8): incrementally-maintained IVF cells
with freeze-at-arrival queries — reference parity for the usearch
as-of-now retrieval surface (`stdlib/indexing/nearest_neighbors.py:65`,
`src/external_integration/usearch_integration.rs`)."""

import math

import pytest
from pyspark.sql import functions as F

from pathway_spark.streaming.differential import DIFF, DifferentialGraph
from pathway_spark.streaming.incremental_ann import (
    cell_expr, incremental_ivf_topk,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return (spark.read.parquet(f"{SF}/embeddings.parquet")
            .select("vec_id", "embedding"))


def _brute_topk(spark, corpus_df, queries, k):
    """Brute-force cosine top-k (driver-side oracle)."""
    corpus = [(r["vec_id"], r["embedding"]) for r in corpus_df.collect()]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    out = {}
    for qid, qv in queries:
        scored = sorted(((cos(qv, dv), did) for did, dv in corpus),
                        key=lambda t: (-t[0], t[1]))
        out[qid] = [did for _s, did in scored[:k]]
    return out


def test_live_ann_insert_insert_retract_and_recall(spark):
    emb = _emb(spark)
    k = 5
    qdf = (emb.filter(F.col("vec_id") < 12)
           .select((F.col("vec_id") + 1_000_000).alias("query_id"),
                   "embedding"))

    g = DifferentialGraph(spark)
    qsrc = g.source("q", qdf.limit(0))
    dsrc = g.source("d", emb.limit(0))
    ann = incremental_ivf_topk(qsrc, dsrc, vec_col="embedding",
                               id_col="vec_id", k=k, n_bits=6)
    ev = F.pmod(F.col("vec_id"), F.lit(2)) == 0
    (a1,) = g.step(ann, d=emb.filter(ev))
    (a2,) = g.step(ann, d=emb.filter(~ev))
    # tick 3: retract some docs AND the queries arrive — frozen against
    # the LIVE (post-retraction) corpus, exercising the cell store's
    # retraction path through the index
    retract = emb.filter(F.pmod(F.col("vec_id"), F.lit(5)) == 2) \
        .withColumn(DIFF, F.lit(-1))
    (a3,) = g.step(ann, d=retract, q=qdf)
    g.restore_session_confs()
    log = (a1.localCheckpoint(True).unionByName(a2.localCheckpoint(True))
           .unionByName(a3.localCheckpoint(True)))
    snap = DifferentialGraph.integrate(log)
    got = {}
    for r in snap.collect():
        got.setdefault(r["query_id"], {})[r["rank"]] = r["neighbor_id"]

    # every query answered with exactly k ranked neighbors, none of
    # them retracted docs
    assert set(got) == {1_000_000 + i for i in range(12)}
    live_ids = {r["vec_id"] for r in
                emb.filter(F.pmod(F.col("vec_id"), F.lit(5)) != 2)
                .collect()}
    for qid, ranked in got.items():
        assert sorted(ranked) == list(range(1, k + 1)), (qid, ranked)
        assert set(ranked.values()) <= live_ids

    # recall vs brute force over the LIVE corpus: the probed cells must
    # find most true neighbors (self-duplicate at rank 1 guaranteed —
    # identical vectors share a cell)
    queries = [(r["query_id"], r["embedding"]) for r in qdf.collect()]
    truth = _brute_topk(
        spark, emb.filter(F.pmod(F.col("vec_id"), F.lit(5)) != 2),
        queries, k)
    hits = total = 0
    for qid, ranked in got.items():
        hits += len(set(ranked.values()) & set(truth[qid]))
        total += k
    recall = hits / total
    assert recall >= 0.6, f"recall {recall:.2f} below floor"
    for qid in got:
        base = qid - 1_000_000
        if base in live_ids:
            assert got[qid][1] == base, "identical vector must be rank 1"


def test_live_ann_frozen_answers_survive_corpus_changes(spark):
    """Answers served at tick t never revise: corpus churn after the
    query only affects later queries (asof_now contract)."""
    emb = _emb(spark)
    qdf = (emb.filter(F.col("vec_id") == 3)
           .select(F.lit(7_000_000).alias("query_id"), "embedding"))
    g = DifferentialGraph(spark)
    qsrc = g.source("q", qdf.limit(0))
    dsrc = g.source("d", emb.limit(0))
    ann = incremental_ivf_topk(qsrc, dsrc, vec_col="embedding",
                               id_col="vec_id", k=3, n_bits=6)
    (a1,) = g.step(ann, d=emb.filter(F.col("vec_id") < 200))
    (a2,) = g.step(ann, q=qdf)
    a2 = a2.localCheckpoint(True)
    frozen = {(r["neighbor_id"], r["rank"]) for r in a2.collect()}
    assert len(frozen) == 3
    # corpus churn: retract one frozen neighbor + insert new docs
    some_id = sorted(frozen)[0][0]
    (a3,) = g.step(ann, d=emb.filter(F.col("vec_id") == some_id)
                   .withColumn(DIFF, F.lit(-1)))
    (a4,) = g.step(ann, d=emb.filter(F.col("vec_id") >= 200))
    g.restore_session_confs()
    assert a3.count() == 0 and a4.count() == 0, \
        "frozen answers must not revise on corpus changes"
    # retracting the QUERY withdraws its frozen rows
    (a5,) = g.step(ann, q=qdf.withColumn(DIFF, F.lit(-1)))
    gone = {(r["neighbor_id"], r["rank"]) for r in a5.collect()}
    assert gone == frozen
    assert all(r[DIFF] == -1 for r in a5.collect())
    g.restore_session_confs()


def test_cell_expr_matches_duckdb_fixed_point(spark):
    """The IVF cell assignment is integer-exact cross-engine: DuckDB
    reproduces every cell id bit-for-bit (the property the driver's
    ann_live oracle leg relies on)."""
    import duckdb

    emb = _emb(spark).limit(64)
    got = {r["vec_id"]: r["cell"] for r in
           emb.select("vec_id",
                      cell_expr(F.col("embedding"), 6).alias("cell"))
           .collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    plane_cols = ",\n".join(
        f"(('0x' || substr(md5(({p} * 10007 + i)::VARCHAR), 1, 15))::BIGINT"
        f" % 2001 - 1000) AS c{p}" for p in range(6))
    bits = " + ".join(
        f"CASE WHEN p{p} > 0 THEN {1 << p} ELSE 0 END" for p in range(6))
    want = dict(con.execute(f"""
        WITH ex AS (
            SELECT vec_id AS vid, generate_subscripts(embedding, 1) - 1 AS i,
                   CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE)
                              * CAST(1000000 AS DOUBLE)) AS BIGINT) AS xi
            FROM (SELECT * FROM embeddings LIMIT 64)
        ), planes AS (
            SELECT d.i AS i, {plane_cols}
            FROM (SELECT DISTINCT i FROM ex) d
        ), proj AS (
            SELECT vid,
                   {", ".join(f"CAST(SUM(xi * c{p}) AS BIGINT) AS p{p}"
                              for p in range(6))}
            FROM ex JOIN planes USING (i) GROUP BY vid
        )
        SELECT vid, {bits} AS cell FROM proj
    """).fetchall())
    assert got == want


def test_ann_topk_table_idiom(spark):
    """DiffTable.ann_topk — the Table-vocabulary face of the live ANN
    index, matching knn_topk/bm25_topk's surface."""
    from pathway_spark import this
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    emb = _emb(spark)
    qdf = (emb.filter(F.col("vec_id") < 4)
           .select((F.col("vec_id") + 1_000_000).alias("query_id"),
                   "embedding"))
    g = DifferentialTableGraph(spark)
    corpus = g.input("d", emb.limit(0))
    queries = g.input("q", qdf.limit(0))
    live = corpus.ann_topk(queries, this.embedding, this.vec_id, k=3)
    (a1,) = g.step(live.node, d=emb)
    (a2,) = g.step(live.node, q=qdf)
    g.restore_session_confs()
    snap = DifferentialGraph.integrate(
        a1.localCheckpoint(True).unionByName(a2.localCheckpoint(True)))
    got = {}
    for r in snap.collect():
        got.setdefault(r["query_id"], {})[r["rank"]] = r["neighbor_id"]
    assert set(got) == {1_000_000 + i for i in range(4)}
    for qid, ranked in got.items():
        assert sorted(ranked) == [1, 2, 3]
        assert ranked[1] == qid - 1_000_000   # identical vector: rank 1
