"""Incremental MinHash-LSH / SimHash dedup vs batch recompute — prefix
equality after document inserts AND retractions.

Same done-criterion as the incremental graph suite: at every batch
prefix, the integrated changelog equals the batch dedup operator run
on the live corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from pathway_spark.streaming.differential import DifferentialGraph
from pathway_spark.streaming.incremental_dedup import (
    incremental_minhash_pairs, incremental_simhash_pairs)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _snap(df, cols, nd=9):
    out = []
    for r in df.collect():
        t = tuple(round(r[c], nd) if isinstance(r[c], float) else r[c]
                  for c in cols)
        out.append(t)
    return sorted(out)


# near-dup clusters: 1/2/5 share most bigrams; 3/4 distinct; 6 is a
# late near-dup of 3; retractions remove a cluster member and a loner
_T1 = "the quick brown fox jumps over the lazy dog today"
_T2 = "the quick brown fox jumps over the lazy cat today"
_T3 = "incremental view maintenance keeps derived state consistent"
_T4 = "completely unrelated text about parquet file compaction"
_T5 = "the quick brown fox leaps over the lazy dog today"
_T6 = "incremental view maintenance keeps derived results consistent"

BATCHES = [
    ([(1, _T1), (2, _T2), (3, _T3)], []),
    ([(4, _T4), (5, _T5)], []),
    ([(6, _T6)], []),
    ([], [(2, _T2), (4, _T4)]),          # retract a cluster member + loner
    ([(7, _T2)], []),                     # same text, new id
]

_KW = dict(n=2, num_hashes=8, bands=4, threshold=0.3)


def _run_prefix_check(spark, make_node, batch_fn, cols):
    g = DifferentialGraph(spark)
    src = g.source("docs", _docs(spark, [(0, "x")]).filter(F.lit(False)))
    out = make_node(src)

    live: list[tuple] = []
    changelog = None
    for ins, dels in BATCHES:
        parts = []
        if ins:
            parts.append(_docs(spark, ins).withColumn("_pw_diff", F.lit(1)))
        if dels:
            parts.append(_docs(spark, dels).withColumn("_pw_diff",
                                                       F.lit(-1)))
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        (d,) = g.step(out, docs=delta)
        d = d.localCheckpoint(eager=True)
        changelog = d if changelog is None else changelog.unionByName(d)
        live.extend(ins)
        for r in dels:
            live.remove(r)
        got = _snap(DifferentialGraph.integrate(changelog), cols)
        want = _snap(batch_fn(live), cols)
        assert got == want, f"after batch ins={ins} dels={dels}"


def test_incremental_minhash_verified_prefix_equals_batch(spark):
    from pathway_spark.operators.dedup import minhash_lsh_pairs
    from pathway_spark.table import ID, Table

    def batch(live):
        return minhash_lsh_pairs(
            Table(_docs(spark, live)), "text", "doc_id", **_KW)._df.drop(ID)

    _run_prefix_check(
        spark,
        lambda src: incremental_minhash_pairs(src, "text", "doc_id", **_KW),
        batch, ["id_a", "id_b", "jaccard"])


def test_incremental_minhash_candidates_prefix_equals_batch(spark):
    from pathway_spark.operators.dedup import minhash_lsh_pairs
    from pathway_spark.table import ID, Table

    def batch(live):
        return minhash_lsh_pairs(
            Table(_docs(spark, live)), "text", "doc_id",
            verify=False, **_KW)._df.drop(ID)

    _run_prefix_check(
        spark,
        lambda src: incremental_minhash_pairs(src, "text", "doc_id",
                                              verify=False, **_KW),
        batch, ["id_a", "id_b"])


def test_incremental_simhash_prefix_equals_batch(spark):
    from pathway_spark.operators.dedup import simhash_pairs
    from pathway_spark.table import ID, Table

    def batch(live):
        return simhash_pairs(Table(_docs(spark, live)), "text", "doc_id",
                             n=2, max_hamming=16)._df.drop(ID)

    _run_prefix_check(
        spark,
        lambda src: incremental_simhash_pairs(src, "text", "doc_id",
                                              n=2, max_hamming=16),
        batch, ["id_a", "id_b", "hamming"])


def test_diff_table_dedup_surface(spark):
    """Pathway-syntax bridge: DiffTable.minhash_dedup_pairs /
    simhash_dedup_pairs over a live document stream with a
    retraction."""
    from pathway_spark import this
    from pathway_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs
    from pathway_spark.streaming.diff_table import DifferentialTableGraph
    from pathway_spark.table import ID, Table

    tpl = spark.createDataFrame([], "doc_id long, text string")
    g = DifferentialTableGraph(spark)
    docs = g.input("d", tpl)
    mh = docs.minhash_dedup_pairs(this.text, this.doc_id, **_KW)
    sh = docs.simhash_dedup_pairs(this.text, this.doc_id,
                                  n=2, max_hamming=16)

    b1 = spark.createDataFrame(
        [(1, _T1), (2, _T2), (3, _T3), (5, _T5)], tpl.schema)
    b2 = (spark.createDataFrame([(2, _T2)], tpl.schema)
          .withColumn("_pw_diff", F.lit(-1)))
    d1m, d1s = (d.localCheckpoint(eager=True)
                for d in g.step([mh.node, sh.node], d=b1))
    d2m, d2s = (d.localCheckpoint(eager=True)
                for d in g.step([mh.node, sh.node], d=b2))

    live = _docs(spark, [(1, _T1), (3, _T3), (5, _T5)])
    want_mh = _snap(minhash_lsh_pairs(Table(live), "text", "doc_id",
                                      **_KW)._df.drop(ID),
                    ["id_a", "id_b", "jaccard"])
    got_mh = _snap(DifferentialGraph.integrate(d1m.unionByName(d2m)),
                   ["id_a", "id_b", "jaccard"])
    assert got_mh == want_mh
    assert mh.column_names == ["id_a", "id_b", "jaccard"]

    want_sh = _snap(simhash_pairs(Table(live), "text", "doc_id",
                                  n=2, max_hamming=16)._df.drop(ID),
                    ["id_a", "id_b", "hamming"])
    got_sh = _snap(DifferentialGraph.integrate(d1s.unionByName(d2s)),
                   ["id_a", "id_b", "hamming"])
    assert got_sh == want_sh


def test_incremental_minhash_empty_delta_is_empty(spark):
    g = DifferentialGraph(spark)
    src = g.source("docs", _docs(spark, [(0, "x")]).filter(F.lit(False)))
    out = incremental_minhash_pairs(src, "text", "doc_id", **_KW)
    (d0,) = g.step(out, docs=_docs(spark, [(1, _T1), (2, _T2)]))
    assert DifferentialGraph.integrate(
        d0.localCheckpoint(eager=True)).count() > 0
    (d1,) = g.step(out)          # nothing changed
    assert d1.isEmpty()


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


# three near-dup clusters in 4-d: (1,2,6) along e1-ish, (3,5) along
# e2-ish, 4 alone; retraction removes a cluster member
_V = {
    1: [1.0, 0.02, 0.0, 0.0],
    2: [0.98, 0.05, 0.01, 0.0],
    3: [0.0, 1.0, 0.03, 0.0],
    4: [0.5, 0.5, 0.5, 0.5],
    5: [0.01, 0.97, 0.05, 0.0],
    6: [0.99, 0.0, 0.02, 0.01],
    7: [0.98, 0.05, 0.01, 0.0],     # same vector as 2, new id
}

_VBATCHES = [
    ([1, 2, 3], []),
    ([4, 5], []),
    ([6], []),
    ([], [2, 4]),
    ([7], []),
]

_VKW = dict(threshold=0.9, num_planes=16, bands=4)


def test_incremental_embedding_prefix_equals_batch_bit_exact(spark):
    """Integer-exact hyperplane LSH: the incremental per-row folds
    equal the batch explode+SUM bit-for-bit (integer addition
    commutes), so prefix equality holds with NO float caveat."""
    from pathway_spark.operators.dedup import embedding_neardup_pairs
    from pathway_spark.streaming.incremental_dedup import (
        incremental_embedding_pairs)
    from pathway_spark.table import ID, Table

    def batch(live_ids):
        t = Table(_vecs(spark, [(i, _V[i]) for i in live_ids]))
        return embedding_neardup_pairs(
            t, "embedding", "vec_id", cross_engine=True,
            **_VKW)._df.drop(ID)

    g = DifferentialGraph(spark)
    src = g.source("docs", _vecs(spark, []).filter(F.lit(False)))
    out = incremental_embedding_pairs(src, "embedding", "vec_id", **_VKW)

    live: list[int] = []
    changelog = None
    for ins, dels in _VBATCHES:
        parts = []
        if ins:
            parts.append(_vecs(spark, [(i, _V[i]) for i in ins])
                         .withColumn("_pw_diff", F.lit(1)))
        if dels:
            parts.append(_vecs(spark, [(i, _V[i]) for i in dels])
                         .withColumn("_pw_diff", F.lit(-1)))
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        (d,) = g.step(out, docs=delta)
        d = d.localCheckpoint(eager=True)
        changelog = d if changelog is None else changelog.unionByName(d)
        live.extend(ins)
        for i in dels:
            live.remove(i)
        got = _snap(DifferentialGraph.integrate(changelog),
                    ["id_a", "id_b"])
        want = _snap(batch(live), ["id_a", "id_b"])
        assert got == want, f"after ins={ins} dels={dels}: {got} != {want}"
    assert got, "fixture must end with at least one verified pair"


def test_diff_table_embedding_surface(spark):
    from pathway_spark import this
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    g = DifferentialTableGraph(spark)
    t = g.input("docs", _vecs(spark, []))
    out = t.embedding_dup_pairs(this.embedding, this.vec_id, **_VKW)
    (d0,) = g.step(out.node, docs=_vecs(
        spark, [(i, _V[i]) for i in (1, 2, 3, 5)]))
    rows = _snap(DifferentialGraph.integrate(
        d0.localCheckpoint(eager=True)), ["id_a", "id_b"])
    assert (1, 2) in rows and (3, 5) in rows


def test_incremental_dedup_clusters_prefix_equals_batch(spark):
    """End-to-end live dedup: (doc -> canonical min-id of its near-dup
    cluster) prefix-equal to batch pairs + batch CC at every step,
    through inserts, a cluster-member retraction, and re-insertion."""
    from pathway_spark.operators.dedup import minhash_lsh_pairs
    from pathway_spark.operators.iterate import connected_components
    from pathway_spark.streaming.incremental_dedup import (
        incremental_dedup_clusters)
    from pathway_spark.table import ID, Table

    def batch(live):
        docs = _docs(spark, live)
        pairs = minhash_lsh_pairs(
            Table(docs), "text", "doc_id", **_KW)._df.drop(ID)
        edges = (pairs.select(F.col("id_a").alias("u"),
                              F.col("id_b").alias("v"))
                 .unionByName(docs.select(F.col("doc_id").alias("u"),
                                          F.col("doc_id").alias("v"))))
        return (connected_components(Table(edges))._df.drop(ID)
                .select(F.col("w").alias("doc_id"),
                        F.col("label").alias("canonical")))

    g = DifferentialGraph(spark)
    src = g.source("docs", _docs(spark, [(0, "x")]).filter(F.lit(False)))
    out = incremental_dedup_clusters(src, "text", "doc_id", **_KW)

    live: list[tuple] = []
    changelog = None
    for ins, dels in BATCHES:
        parts = []
        if ins:
            parts.append(_docs(spark, ins).withColumn("_pw_diff", F.lit(1)))
        if dels:
            parts.append(_docs(spark, dels).withColumn("_pw_diff",
                                                       F.lit(-1)))
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        (d,) = g.step(out, docs=delta)
        d = d.localCheckpoint(eager=True)
        changelog = d if changelog is None else changelog.unionByName(d)
        live.extend(ins)
        for r in dels:
            live.remove(r)
        got = _snap(DifferentialGraph.integrate(changelog),
                    ["doc_id", "canonical"])
        want = _snap(batch(live), ["doc_id", "canonical"])
        assert got == want, f"after ins={ins} dels={dels}: {got} != {want}"
    # the final state must be non-trivial: survivors AND mapped dups
    assert any(a != b for a, b in got) and any(a == b for a, b in got)


def test_diff_table_dedup_clusters_surface(spark):
    from pathway_spark import this
    from pathway_spark.streaming.diff_table import DifferentialTableGraph

    g = DifferentialTableGraph(spark)
    t = g.input("docs", _docs(spark, []))
    out = t.dedup_clusters(this.text, this.doc_id, method="minhash",
                           **_KW)
    (d0,) = g.step(out.node, docs=_docs(
        spark, [(1, _T1), (2, _T2), (3, _T3)]))
    rows = _snap(DifferentialGraph.integrate(
        d0.localCheckpoint(eager=True)), ["doc_id", "canonical"])
    assert (1, 1) in rows and (2, 1) in rows and (3, 3) in rows
