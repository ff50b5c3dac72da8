"""Live BM25 index — freeze-at-arrival parity: each query's answer
rows equal batch `tfidf_score` on the corpus AS OF the query's arrival
tick, stay frozen through later corpus growth, and withdraw on query
retraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from pathway_spark.streaming.differential import DifferentialGraph
from pathway_spark.streaming.incremental_bm25 import incremental_bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _qs(spark, rows):
    return spark.createDataFrame(rows, "query_id long, query string")


def _snap(df, nd=6):
    return sorted(
        (r["query_id"], r["doc_id"], r["rank"],
         round(r["score"], nd)) for r in df.collect())


_D = {
    1: "spark structured streaming keeps state in checkpoints",
    2: "differential dataflow maintains incremental views",
    3: "spark sql optimizes queries with catalyst",
    4: "incremental view maintenance over streams",
    5: "the catalyst optimizer rewrites spark plans",
}
_Q = {
    100: "incremental streams",
    101: "spark catalyst",
    102: "differential incremental maintenance",
}


def _batch_bm25(spark, doc_ids, q_ids, k):
    from pathway_spark.indexing import tfidf_score
    from pathway_spark.table import ID, Table

    return tfidf_score(
        Table(_docs(spark, [(i, _D[i]) for i in doc_ids])),
        Table(_qs(spark, [(i, _Q[i]) for i in q_ids])),
        k=k)._df.drop(ID)


def test_bm25_freeze_at_arrival_parity(spark):
    g = DifferentialGraph(spark)
    d = g.source("d", _docs(spark, []).filter(F.lit(False)))
    q = g.source("q", _qs(spark, []).filter(F.lit(False)))
    out = incremental_bm25_topk(d, q, k=3)

    # tick 1: corpus {1,2,3}, query 100 arrives
    (x1,) = g.step(out, d=_docs(spark, [(i, _D[i]) for i in (1, 2, 3)]),
                   q=_qs(spark, [(100, _Q[100])]))
    x1 = x1.localCheckpoint(eager=True)
    want1 = _snap(_batch_bm25(spark, (1, 2, 3), (100,), 3))
    assert _snap(DifferentialGraph.integrate(x1)) == want1

    # tick 2: corpus grows; queries 101, 102 arrive and see the NEW
    # corpus, while query 100's rows stay exactly as served at tick 1
    (x2,) = g.step(out, d=_docs(spark, [(i, _D[i]) for i in (4, 5)]),
                   q=_qs(spark, [(101, _Q[101]), (102, _Q[102])]))
    x2 = x2.localCheckpoint(eager=True)
    chg = x1.unionByName(x2)
    want2 = sorted(want1
                   + _snap(_batch_bm25(spark, (1, 2, 3, 4, 5),
                                       (101, 102), 3)))
    assert _snap(DifferentialGraph.integrate(chg)) == want2

    # tick 3: corpus-only change — NO deltas for frozen answers
    (x3,) = g.step(out, d=_docs(spark, [(2, _D[2])])
                   .withColumn("_pw_diff", F.lit(-1)))
    assert x3.isEmpty()

    # tick 4: retract query 100 — its frozen rows withdraw, others stay
    (x4,) = g.step(out, q=_qs(spark, [(100, _Q[100])])
                   .withColumn("_pw_diff", F.lit(-1)))
    x4 = x4.localCheckpoint(eager=True)
    chg = chg.unionByName(x4)
    want4 = sorted(_snap(_batch_bm25(spark, (1, 2, 3, 4, 5),
                                     (101, 102), 3)))
    assert _snap(DifferentialGraph.integrate(chg)) == want4


def test_bm25_query_probes_not_corpus_rescan(spark):
    """A query whose terms miss the corpus entirely returns nothing
    (and the step completes — the probe path tolerates empty joins)."""
    g = DifferentialGraph(spark)
    d = g.source("d", _docs(spark, []).filter(F.lit(False)))
    q = g.source("q", _qs(spark, []).filter(F.lit(False)))
    out = incremental_bm25_topk(d, q, k=2)

    (x1,) = g.step(out, d=_docs(spark, [(1, _D[1])]),
                   q=_qs(spark, [(9, "zebra quagga")]))
    assert x1.localCheckpoint(eager=True).isEmpty()
    # and a real query afterwards still works against the same state
    (x2,) = g.step(out, q=_qs(spark, [(10, "streaming checkpoints")]))
    rows = _snap(DifferentialGraph.integrate(x2.localCheckpoint(eager=True)))
    assert [r[:2] for r in rows] == [(10, 1)]


def test_pyop_debug_check_revokes_on_mismatch(spark):
    """The `_py_op` debug assert mode (r10): with PYOP_CHECK_EVERY=1
    every resident top-k tick is byte-compared against the Spark op —
    a healthy hook stays on and matches; a corrupted hook is REVOKED
    (node pinned to the Spark op) and the emitted rows stay correct."""
    from pathway_spark.streaming.resident import ResidentEngine

    def run(corrupt: bool):
        g = DifferentialGraph(spark)
        d = g.source("d", _docs(spark, []).filter(F.lit(False)))
        q = g.source("q", _qs(spark, []).filter(F.lit(False)))
        out = incremental_bm25_topk(d, q, k=3)
        (x1,) = g.step(out, d=_docs(spark, [(i, _D[i]) for i in (1, 2, 3)]),
                       q=_qs(spark, [(100, _Q[100])]))
        chunks = [x1.localCheckpoint(eager=True)]
        if corrupt:
            real = out._py_op

            def bad(rows, cols):
                res = real(rows, cols)
                if res is None:
                    return None
                c, r = res
                return c, [row[:-1] + (row[-1] + 1.0,) for row in r]
            out._py_op = bad
        (x2,) = g.step(out, q=_qs(spark, [(101, _Q[101]),
                                          (102, _Q[102])]))
        chunks.append(x2.localCheckpoint(eager=True))
        (x3,) = g.step(out, q=_qs(spark, [(100, _Q[100])])
                       .withColumn("_pw_diff", F.lit(-1)))
        chunks.append(x3.localCheckpoint(eager=True))
        g.restore_session_confs()
        trace = chunks[0]
        for c in chunks[1:]:
            trace = trace.unionByName(c)
        revoked = getattr(out, "_py_op_off", False)
        return _snap(DifferentialGraph.integrate(trace)), revoked

    want = sorted(_snap(_batch_bm25(spark, (1, 2, 3), (101, 102), 3)))
    old = ResidentEngine.PYOP_CHECK_EVERY
    ResidentEngine.PYOP_CHECK_EVERY = 1
    try:
        good, rev_good = run(False)
        bad, rev_bad = run(True)
    finally:
        ResidentEngine.PYOP_CHECK_EVERY = old
    assert good == bad == want      # output correct either way
    assert not rev_good
    assert rev_bad, "corrupted _py_op must be revoked by the check"
