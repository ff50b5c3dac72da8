"""Live top-k similarity join (incremental KNN index) — prefix
equality vs `brute_force_topk` batch recompute through query inserts,
doc inserts, doc retractions (in and out of top-k sets), and query
retractions; plus the delta-proportionality guarantee (a doc that
beats nobody emits nothing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pathway_spark.streaming.differential import DifferentialGraph
from pathway_spark.streaming.incremental_topk import incremental_knn_topk


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _snap(df, cols, nd=6):
    out = []
    for r in df.collect():
        out.append(tuple(round(r[c], nd) if isinstance(r[c], float) else r[c]
                         for c in cols))
    return sorted(out)


# unit-ish vectors in 3d with well-separated cosine scores
_DOCS = {
    10: [1.0, 0.0, 0.0],
    11: [0.9, 0.1, 0.0],
    12: [0.0, 1.0, 0.0],
    13: [0.1, 0.9, 0.1],
    14: [0.0, 0.0, 1.0],
    15: [0.5, 0.5, 0.0],
}
_QUERIES = {
    1: [1.0, 0.05, 0.0],
    2: [0.0, 1.0, 0.05],
    3: [0.05, 0.0, 1.0],
}

# (query inserts, query dels, doc inserts, doc dels)
BATCHES = [
    ([1, 2], [], [10, 12, 14], []),
    ([3], [], [11, 13], []),          # inserts crack q1/q2 top-2
    ([], [], [15], []),
    ([], [], [], [11]),               # retract a doc inside q1's top-2
    ([], [2], [], [14]),              # retract a query + q3's best doc
]


def _delta(spark, table, ins, dels):
    parts = []
    if ins:
        parts.append(_vecs(spark, [(i, table[i]) for i in ins])
                     .withColumn("_pw_diff", F.lit(1)))
    if dels:
        parts.append(_vecs(spark, [(i, table[i]) for i in dels])
                     .withColumn("_pw_diff", F.lit(-1)))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def test_incremental_knn_prefix_equals_batch(spark):
    from pathway_spark.operators.similarity import brute_force_topk
    from pathway_spark.table import ID, Table

    g = DifferentialGraph(spark)
    q = g.source("q", _vecs(spark, []).filter(F.lit(False)))
    d = g.source("d", _vecs(spark, []).filter(F.lit(False)))
    out = incremental_knn_topk(q, d, k=2)

    live_q, live_d = set(), set()
    changelog = None
    for qi, qd, di, dd in BATCHES:
        feeds = {}
        dq = _delta(spark, _QUERIES, qi, qd)
        ddf = _delta(spark, _DOCS, di, dd)
        if dq is not None:
            feeds["q"] = dq
        if ddf is not None:
            feeds["d"] = ddf
        (delta,) = g.step(out, **feeds)
        delta = delta.localCheckpoint(eager=True)
        changelog = delta if changelog is None \
            else changelog.unionByName(delta)
        live_q |= set(qi); live_q -= set(qd)
        live_d |= set(di); live_d -= set(dd)

        got = _snap(DifferentialGraph.integrate(changelog),
                    ["query_id", "neighbor_id", "rank", "score"])
        want = _snap(
            brute_force_topk(
                Table(_vecs(spark, [(i, _DOCS[i]) for i in live_d])),
                Table(_vecs(spark, [(i, _QUERIES[i]) for i in live_q])),
                k=2, self_exclude=False)._df.drop(ID),
            ["query_id", "neighbor_id", "rank", "score"])
        assert got == want, f"after batch {qi} {qd} {di} {dd}"


def test_weak_doc_insert_emits_nothing(spark):
    """A doc that beats no query's k-th score must produce an EMPTY
    delta — the maintenance rule prunes, not recomputes."""
    g = DifferentialGraph(spark)
    q = g.source("q", _vecs(spark, []).filter(F.lit(False)))
    d = g.source("d", _vecs(spark, []).filter(F.lit(False)))
    out = incremental_knn_topk(q, d, k=1)

    (d0,) = g.step(out,
                   q=_delta(spark, _QUERIES, [1], []),
                   d=_delta(spark, _DOCS, [10, 11], []))
    assert d0.localCheckpoint(eager=True).count() > 0
    # doc 12 is orthogonal to q1 — cannot enter its top-1
    (d1,) = g.step(out, d=_delta(spark, _DOCS, [12], []))
    assert d1.isEmpty()
    # retracting it (never in any top-k) is also a no-op
    (d2,) = g.step(out, d=_delta(spark, _DOCS, [], [12]))
    assert d2.isEmpty()


def test_diff_table_knn_surface(spark):
    """Table-idiom bridge: DiffTable.knn_topk over live corpus +
    query streams."""
    from pathway_spark import this
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    tpl = spark.createDataFrame([], "vec_id long, embedding array<double>")
    g = DifferentialTableGraph(spark)
    corpus = g.input("d", tpl)
    queries = g.input("q", tpl)
    out = corpus.knn_topk(queries, this.embedding, this.vec_id, k=1)
    assert out.column_names == ["query_id", "neighbor_id", "rank", "score"]

    (d0,) = g.step([out.node],
                   q=_vecs(spark, [(1, _QUERIES[1])]),
                   d=_vecs(spark, [(10, _DOCS[10]), (12, _DOCS[12])]))
    rows = {(r.query_id, r.neighbor_id, r.rank)
            for r in DifferentialGraph.integrate(
                d0.localCheckpoint(eager=True)).collect()}
    assert rows == {(1, 10, 1)}


def test_incremental_topk_generic_score(spark):
    """Generic score function: rank docs by |doc_val - query_val|
    (closest value wins) via incremental_topk_join."""
    from pathway_spark.streaming.incremental_topk import incremental_topk_join

    g = DifferentialGraph(spark)
    q = g.source("q", spark.createDataFrame([], "query_id long, qv double")
                 .filter(F.lit(False)))
    d = g.source("d", spark.createDataFrame([], "neighbor_id long, dv double")
                 .filter(F.lit(False)))
    out = incremental_topk_join(
        q, d, lambda df: -F.abs(F.col("dv") - F.col("qv")), k=1)

    qd = spark.createDataFrame([(1, 5.0)], "query_id long, qv double") \
        .withColumn("_pw_diff", F.lit(1))
    dd = spark.createDataFrame([(100, 3.0), (101, 8.0)],
                               "neighbor_id long, dv double") \
        .withColumn("_pw_diff", F.lit(1))
    (d0,) = g.step(out, q=qd, d=dd)
    rows = {(r.query_id, r.neighbor_id, r.rank)
            for r in DifferentialGraph.integrate(
                d0.localCheckpoint(eager=True)).collect()}
    assert rows == {(1, 100, 1)}    # |3-5| = 2 beats |8-5| = 3
    # closer doc arrives: top-1 flips
    dd2 = spark.createDataFrame([(102, 5.5)],
                                "neighbor_id long, dv double") \
        .withColumn("_pw_diff", F.lit(1))
    (d1,) = g.step(out, d=dd2)
    chg = d0.unionByName(d1.localCheckpoint(eager=True))
    rows = {(r.query_id, r.neighbor_id, r.rank)
            for r in DifferentialGraph.integrate(chg).collect()}
    assert rows == {(1, 102, 1)}
