"""LiveDocumentStore: serve-while-indexing parity — every query's
answer equals batch tfidf_score on the corpus as of its arrival, stays
frozen, and the store resumes serving after a durable commit."""

from __future__ import annotations

from pyspark.sql import functions as F

from pathway_spark.xpacks.llm import LiveDocumentStore


_D = {
    1: "spark structured streaming keeps state in checkpoints",
    2: "differential dataflow maintains incremental views",
    3: "spark sql optimizes queries with catalyst",
    4: "incremental view maintenance over streams",
    5: "the catalyst optimizer rewrites spark plans",
}


def _docs(spark, ids):
    return spark.createDataFrame([(i, _D[i]) for i in ids],
                                 "doc_id long, text string")


def _batch(spark, ids, qs, k):
    from pathway_spark.indexing import tfidf_score
    from pathway_spark.table import ID, Table

    qdf = spark.createDataFrame(list(enumerate(qs)),
                                "query_id long, query string")
    rows = tfidf_score(Table(_docs(spark, ids)), Table(qdf),
                       k=k)._df.drop(ID).collect()
    out = [[] for _ in qs]
    for r in rows:
        out[r["query_id"]].append(
            {"doc_id": r["doc_id"], "rank": r["rank"],
             "score": round(r["score"], 6)})
    for lst in out:
        lst.sort(key=lambda d: d["rank"])
    return out


def _round(hits):
    return [[{**h, "score": round(h["score"], 6)} for h in lst]
            for lst in hits]


def test_live_store_serves_snapshot_consistent_answers(spark):
    store = LiveDocumentStore(spark, k=3)
    store.add_documents(_docs(spark, [1, 2, 3]))
    a1 = _round(store.query(["incremental streams"]))
    assert a1 == _batch(spark, [1, 2, 3], ["incremental streams"], 3)

    # corpus grows; the SAME question now sees the new docs
    store.add_documents(_docs(spark, [4, 5]))
    a2 = _round(store.query(["incremental streams", "spark catalyst"]))
    assert a2 == _batch(spark, [1, 2, 3, 4, 5],
                        ["incremental streams", "spark catalyst"], 3)
    assert a2[0] != a1[0]      # the snapshot moved

    # retraction: doc 4 leaves; later queries stop seeing it
    store.remove_documents(_docs(spark, [4]))
    a3 = _round(store.query(["incremental streams"], k=2))
    want = _batch(spark, [1, 2, 3, 5], ["incremental streams"], 3)
    assert a3 == [want[0][:2]]
    store.close()


def test_live_store_durable_resume(spark, tmp_path):
    sd = str(tmp_path / "store_state")
    s1 = LiveDocumentStore(spark, k=2, state_dir=sd)
    s1.add_documents(_docs(spark, [1, 2, 3]))
    s1.commit()
    s1.close()

    s2 = LiveDocumentStore(spark, k=2, state_dir=sd)
    got = _round(s2.query(["catalyst optimizer"]))
    assert got == _batch(spark, [1, 2, 3], ["catalyst optimizer"], 2)
    s2.close()
