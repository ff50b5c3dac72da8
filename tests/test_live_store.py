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


def test_live_store_resume_after_serving(spark, tmp_path):
    """Round-6 advisor regression: a store committed AFTER serving
    queries must restore cleanly AND answer correctly.  Two traps:
    (a) the restored query-id counter reset to 0, colliding with
    persisted query-keyed state — the distinct() arrangement then
    suppressed (query_id, term) deltas and old queries' frozen scores
    leaked into new answers; (b) every restored store's bucketed base
    paid a probe-collect job per get() per tick, blowing up serving.
    In-process variant here; the true process boundary is
    test_live_store_cross_process_resume."""
    sd = str(tmp_path / "store_state")
    s1 = LiveDocumentStore(spark, k=2, state_dir=sd)
    s1.add_documents(_docs(spark, [1, 2, 3]))
    a1 = _round(s1.query(["catalyst optimizer"]))
    assert a1 == _batch(spark, [1, 2, 3], ["catalyst optimizer"], 2)
    s1.commit()
    s1.close()

    s2 = LiveDocumentStore(spark, k=2, state_dir=sd)
    assert s2._next_qid == 1, "query-id counter must persist via commit"
    # the old process's query searched 'catalyst optimizer'; with a
    # colliding id space doc 3 (the catalyst doc) leaked into THIS
    # answer — batch parity proves the id spaces are disjoint
    a2 = _round(s2.query(["incremental views"]))
    assert a2 == _batch(spark, [1, 2, 3], ["incremental views"], 2)
    a3 = _round(s2.query(["spark state", "differential dataflow"]))
    assert a3 == _batch(spark, [1, 2, 3],
                        ["spark state", "differential dataflow"], 2)
    # serving keeps working after corpus changes post-restore
    s2.add_documents(_docs(spark, [4, 5]))
    a4 = _round(s2.query(["incremental streams"]))
    assert a4 == _batch(spark, [1, 2, 3, 4, 5], ["incremental streams"], 2)
    s2.close()


def test_live_store_cross_process_resume(tmp_path):
    """The advisor's exact scenario across a REAL process boundary:
    process 1 adds docs, serves a query, commits; process 2 restores
    and serves — answers must match the batch oracle computed in
    process 2 (no qid collision, no unbounded restored plan)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sd = str(tmp_path / "state")
    child = _XPROC_CHILD.format(repo=repo)

    def run(phase, out_name):
        out = str(tmp_path / out_name)
        r = subprocess.run([sys.executable, "-c", child, phase, sd, out],
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, f"{phase} failed:\n{r.stderr[-3000:]}"
        with open(out) as f:
            return json.load(f)

    p1 = run("first", "p1.json")
    p2 = run("second", "p2.json")
    assert p1["q"] == p1["want"], p1
    assert p2["q"] == p2["want"], p2
    assert p2["next_qid_at_start"] == 1


_XPROC_CHILD = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = "4"
from pathway_spark.session import get_spark
from pathway_spark.xpacks.llm import LiveDocumentStore

phase, sd, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
spark = get_spark("live-store-xproc-" + phase, cpus="4")
spark.sparkContext.setLogLevel("ERROR")

D = {{1: "spark structured streaming keeps state",
     2: "differential dataflow maintains incremental views",
     3: "spark sql optimizes queries with catalyst"}}

def docs(ids):
    return spark.createDataFrame([(i, D[i]) for i in ids],
                                 "doc_id long, text string")

def batch_oracle(ids, qs, k):
    from pathway_spark.indexing import tfidf_score
    from pathway_spark.table import ID, Table
    qdf = spark.createDataFrame(list(enumerate(qs)),
                                "query_id long, query string")
    rows = tfidf_score(Table(docs(ids)), Table(qdf), k=k)._df \
        .drop(ID).collect()
    res = [[] for _ in qs]
    for r in rows:
        res[r["query_id"]].append(
            [r["doc_id"], r["rank"], round(r["score"], 6)])
    for lst in res:
        lst.sort(key=lambda h: h[1])
    return res

def served(hits):
    return [[[h["doc_id"], h["rank"], round(h["score"], 6)] for h in lst]
            for lst in hits]

if phase == "first":
    s = LiveDocumentStore(spark, k=2, state_dir=sd)
    s.add_documents(docs([1, 2, 3]))
    q = served(s.query(["catalyst optimizer"]))
    want = batch_oracle([1, 2, 3], ["catalyst optimizer"], 2)
    s.commit()
    with open(out_path, "w") as f:
        json.dump({{"q": q, "want": want}}, f)
    os._exit(0)
else:
    s = LiveDocumentStore(spark, k=2, state_dir=sd)
    nq = s._next_qid
    q = served(s.query(["incremental views"])
               + s.query(["spark state"]))
    want = (batch_oracle([1, 2, 3], ["incremental views"], 2)
            + batch_oracle([1, 2, 3], ["spark state"], 2))
    with open(out_path, "w") as f:
        json.dump({{"q": q, "want": want, "next_qid_at_start": nq}}, f)
    spark.stop()
"""
