"""Golden tests for temporal/ordered/dedup/similarity/text/graph/index
operators — reference test style (tests/temporal/, stdlib tests)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

import pathway_spark as pw
from pathway_spark import this
from pathway_spark import reducers as R
from pathway_spark.table import ID, Table

from tests.test_table_api import rows


def T(spark, data, schema, id_cols=None):
    return Table.from_spark(spark.createDataFrame(data, schema), id_columns=id_cols)


# ---------------------------------------------------------------- temporal


@pytest.fixture(scope="module")
def ticks(spark):
    # (key, t, v) numeric time axis
    data = [("a", 0, 1.0), ("a", 10, 2.0), ("a", 25, 3.0), ("a", 31, 4.0),
            ("b", 5, 10.0), ("b", 47, 20.0)]
    return T(spark, data, "k string, t long, v double", ["k", "t"])


def test_tumbling_window(ticks):
    wt = ticks.windowby(this.t, window=pw.temporal.tumbling(10))
    out = wt.reduce(ws=this._pw_window_start, n=R.count())
    assert rows(out) == sorted(
        [(0, 2), (10, 1), (20, 1), (30, 1), (40, 1)],
        key=lambda t: tuple(repr(x) for x in t),
    )


def test_sliding_window(ticks):
    wt = ticks.windowby(this.t, window=pw.temporal.sliding(hop=10, duration=20))
    out = wt.reduce(ws=this._pw_window_start, n=R.count())
    got = dict(rows(out))
    # verify against brute force
    pts = [0, 10, 25, 31, 5, 47]
    expect = {}
    for p in pts:
        for ws in range(((p // 10) - 1) * 10, p + 1, 10):
            if ws <= p < ws + 20:
                expect[ws] = expect.get(ws, 0) + 1
    assert got == expect


def test_session_window(ticks):
    wt = ticks.windowby(
        this.t, window=pw.temporal.session(max_gap=10), instance=this.k
    )
    out = wt.reduce(k=this._pw_instance, start=this._pw_window_start, n=R.count())
    # a: 0,10 gap10 ok |25,31 one session (gap 15>10 splits at 25)
    assert rows(out) == sorted(
        [("a", 0, 2), ("a", 25, 2), ("b", 5, 1), ("b", 47, 1)],
        key=lambda t: tuple(repr(x) for x in t),
    )


def test_intervals_over(spark, ticks):
    at = T(spark, [(10,), (30,)], "t long")
    wt = ticks.windowby(
        this.t, window=pw.temporal.intervals_over(at=at, lower_bound=-10, upper_bound=5)
    )
    out = wt.reduce(at_t=this._pw_window_start, n=R.count())
    # at 10: t in [0,15] → 0,10,5 → 3 ; at 30: t in [20,35] → 25,31 → 2
    assert rows(out) == [(10, 3), (30, 2)]


def test_interval_join(spark):
    l = T(spark, [(1, 10), (2, 30)], "lid int, lt long", ["lid"])
    r = T(spark, [(101, 8), (102, 12), (103, 40)], "rid int, rt long", ["rid"])
    jr = pw.temporal.interval_join(
        l, r, this.lt, this.rt, (-3, 3), []
    )
    out = jr.select(lid=pw.left.lid, rid=pw.right.rid)
    assert rows(out) == [(1, 101), (1, 102)]


def test_window_join(spark):
    l = T(spark, [(1, 5), (2, 15)], "lid int, lt long", ["lid"])
    r = T(spark, [(11, 7), (12, 19)], "rid int, rt long", ["rid"])
    jr = pw.temporal.window_join(l, r, this.lt, this.rt, pw.temporal.tumbling(10), [])
    out = jr.select(lid=pw.left.lid, rid=pw.right.rid)
    assert rows(out) == [(1, 11), (2, 12)]


def test_asof_join_directions(spark):
    trades = T(spark, [(1, 10, "t1"), (2, 25, "t2")], "tid int, t long, tag string", ["tid"])
    quotes = T(spark, [(5, 1.0), (9, 2.0), (20, 3.0)], "qt long, px double", ["qt"])
    back = trades.asof_join(
        quotes, pw.left.t, pw.right.qt, how="inner", direction="backward"
    ).select(this.tid, this.px)
    assert rows(back) == [(1, 2.0), (2, 3.0)]
    fwd = trades.asof_join(
        quotes, pw.left.t, pw.right.qt, how="left", direction="forward"
    ).select(this.tid, this.px)
    assert rows(fwd) == [(1, 3.0), (2, None)]


def test_asof_join_keys_and_defaults(spark):
    l = T(spark, [("a", 10), ("b", 10)], "k string, t long", ["k", "t"])
    r = T(spark, [("a", 5, 100.0)], "k string, t long, v double")
    out = l.asof_join(
        r, pw.left.t, pw.right.t, pw.left.k == pw.right.k,
        how="left", defaults={"v": -1.0},
    ).select(this.k, this.v)
    assert rows(out) == [("a", 100.0), ("b", -1.0)]


def test_asof_now_join(spark):
    from pathway_spark.operators.asof import asof_now_join

    l = T(spark, [(1, "x")], "k int, a string", ["k"])
    r = T(spark, [(1, "y")], "k int, b string", ["k"])
    out = asof_now_join(l, r, pw.left.k == pw.right.k)
    assert rows(out, "a", "b") == [("x", "y")]


# ---------------------------------------------------------------- ordered


def test_sort_prev_next(spark):
    t = T(spark, [(1, 30), (2, 10), (3, 20)], "k int, v int", ["k"])
    out = t.sort(this.v)
    got = {r["k"]: (r["prev"], r["next"]) for r in out._df.collect()}
    ids = {r["k"]: r[ID] for r in t._df.collect()}
    assert got[2] == (None, ids[3])
    assert got[3] == (ids[2], ids[1])
    assert got[1] == (ids[3], None)


def test_diff(spark):
    t = T(spark, [(1, 10, 5.0), (2, 20, 8.0), (3, 30, 2.0)], "k int, t long, v double", ["k"])
    out = t.diff(this.t, this.v)
    assert rows(out, "k", "diff_v") == [(1, None), (2, 3.0), (3, -6.0)]


def test_interpolate(spark):
    t = T(spark, [(0, 0.0), (10, None), (20, 10.0), (30, None)],
          "t long, v double", ["t"])
    out = pw.interpolate(t, this.t, this.v)
    assert rows(out, "t", "v") == [(0, 0.0), (10, 5.0), (20, 10.0), (30, 10.0)]


# ---------------------------------------------------------------- dedup


@pytest.fixture(scope="module")
def docs(spark):
    data = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog"),   # near dup
        (4, "completely different text about spark engines"),
    ]
    return T(spark, data, "doc_id long, text string", ["doc_id"])


def test_exact_dedup(docs):
    from pathway_spark.operators.dedup import exact_dedup, exact_dup_groups

    kept = exact_dedup(docs, "text", "doc_id")
    assert sorted(r["doc_id"] for r in kept._df.collect()) == [1, 3, 4]
    pairs = exact_dup_groups(docs, "text", "doc_id")
    assert rows(pairs, "canonical_id", "dup_id") == [(1, 2)]


def test_ngram_jaccard(docs):
    from pathway_spark.operators.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.4)
    got = {(r["id_a"], r["id_b"]) for r in out._df.collect()}
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert not any(4 in p for p in got)


def test_minhash_lsh(docs):
    from pathway_spark.operators.dedup import minhash_lsh_pairs

    out = minhash_lsh_pairs(docs, "text", "doc_id", n=2, threshold=0.4)
    got = {(r["id_a"], r["id_b"]) for r in out._df.collect()}
    assert (1, 2) in got  # exact dups always collide
    assert not any(4 in p for p in got)


def test_simhash(docs):
    from pathway_spark.operators.dedup import simhash_pairs

    out = simhash_pairs(docs, "text", "doc_id", n=2, max_hamming=8)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in out._df.collect()}
    assert got.get((1, 2)) == 0


def test_embedding_neardup(spark):
    from pathway_spark.operators.dedup import embedding_neardup_pairs

    vecs = T(spark, [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ], "vec_id long, embedding array<double>", ["vec_id"])
    out = embedding_neardup_pairs(vecs, "embedding", "vec_id", threshold=0.99, exact=True)
    got = {(r["id_a"], r["id_b"]) for r in out._df.collect()}
    assert got == {(1, 2)}


def test_embedding_neardup_exact_tasks_match_cells(spark):
    """The blocked-gram stage must schedule one mapInPandas partition
    per (bi ≤ bj) block-pair cell, not a fixed floor: a cell is the
    unsplittable unit of gram work, so extra partitions are pure empty
    Python-worker round trips (r11: the old max(32, nb) floor cost 31
    empty tasks per run at one cell — 12.4 s executorRunTime for
    0.27 s of CPU).  With n < block_size there is exactly 1 cell."""
    from pathway_spark.operators.dedup import embedding_neardup_pairs

    vecs = T(spark, [
        (i, [float(i == j) for j in range(4)]) for i in range(20)
    ], "vec_id long, embedding array<double>", ["vec_id"])
    out = embedding_neardup_pairs(vecs, "embedding", "vec_id",
                                  threshold=0.99, exact=True)
    assert out._df.rdd.getNumPartitions() == 1


# ---------------------------------------------------------------- similarity


def test_brute_force_topk(spark):
    from pathway_spark.operators.similarity import brute_force_topk

    corpus = T(spark, [
        (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0]),
    ], "vec_id long, embedding array<double>", ["vec_id"])
    queries = corpus.filter(this.vec_id == 1)
    out = brute_force_topk(corpus, queries, k=2)
    got = [(r["neighbor_id"], r["rank"]) for r in out._df.collect()]
    assert sorted(got, key=lambda x: x[1]) == [(2, 1), (3, 2)]


def test_ivf_topk_returns_k(spark):
    from pathway_spark.operators.similarity import ivf_topk

    import random

    rnd = random.Random(7)
    data = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    corpus = T(spark, data, "vec_id long, embedding array<double>", ["vec_id"])
    queries = corpus.filter(this.vec_id < 3)
    out = ivf_topk(corpus, queries, k=5, nlist=4, nprobe=2)
    counts = out._df.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in counts)


def test_hnsw_recall_vs_brute_force(spark):
    """USearchKnn-parity HNSW must reach ≥0.9 recall@10 against the
    exact brute-force result on a random corpus."""
    import random

    from pathway_spark.operators.hnsw import hnsw_topk
    from pathway_spark.operators.similarity import brute_force_topk

    rnd = random.Random(42)
    data = [(i, [rnd.gauss(0, 1) for _ in range(16)]) for i in range(600)]
    corpus = T(spark, data, "vec_id long, embedding array<double>", ["vec_id"])
    queries = corpus.filter(this.vec_id < 10)

    exact = brute_force_topk(corpus, queries, k=10)
    approx = hnsw_topk(corpus, queries, k=10, m=16, ef_construction=80,
                       ef_search=80)
    ex = {(r.query_id, r.neighbor_id) for r in exact._df.collect()}
    ap = {(r.query_id, r.neighbor_id) for r in approx._df.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.9, f"HNSW recall too low: {recall}"
    # scores must agree with the exact metric on the overlap
    exs = {(r.query_id, r.neighbor_id): r.score for r in exact._df.collect()}
    aps = {(r.query_id, r.neighbor_id): r.score for r in approx._df.collect()}
    for key in ex & ap:
        assert abs(exs[key] - aps[key]) < 1e-5


def test_hnsw_large_query_set_routes_to_ivf(spark, monkeypatch):
    """Scale guard: above the collect limit the query set must NOT be
    collected to the driver — hnsw_topk transparently delegates to the
    both-sides-distributed IVF+HNSW composition (round 7; previously
    plain ivf_topk), so queries stay on the executors and the HNSW
    graph family stays in play at scale."""
    import random

    import pathway_spark.operators.hnsw as hnsw_mod

    rnd = random.Random(1)
    data = [(i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(200)]
    corpus = T(spark, data, "vec_id long, embedding array<double>", ["vec_id"])

    calls = []
    real = hnsw_mod.ivf_hnsw_topk

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(hnsw_mod, "ivf_hnsw_topk", spy)
    monkeypatch.setattr(hnsw_mod, "_QUERY_COLLECT_LIMIT_ROWS", 50)
    out = hnsw_mod.hnsw_topk(corpus, corpus, k=3)
    assert calls, "large query set did not fall back to ivf_hnsw_topk"
    assert out._df.select("query_id").distinct().count() > 100


def test_usearch_factory_parity(spark):
    from pathway_spark.indexing import UsearchKnnFactory

    corpus = T(spark, [
        (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0]),
    ], "vec_id long, embedding array<double>", ["vec_id"])
    queries = corpus.filter(this.vec_id == 1)
    out = UsearchKnnFactory().query(corpus, queries, k=2)
    got = [(r["neighbor_id"], r["rank"]) for r in out._df.collect()]
    assert sorted(got, key=lambda x: x[1]) == [(2, 1), (3, 2)]


# ---------------------------------------------------------------- text


def test_text_analysis(spark):
    from pathway_spark.operators.text import (
        detect_language, quality_score, subword_count, token_count,
    )

    t = spark.createDataFrame(
        [("the cat and the dog in the house",),
         ("el perro y la casa es de un gato",)],
        "text string",
    )
    out = t.select(
        token_count(F.col("text")).alias("n"),
        subword_count(F.col("text")).alias("s"),
        detect_language(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("q"),
    ).collect()
    assert out[0]["n"] == 8 and out[0]["lang"] == "en"
    assert out[1]["lang"] == "es"
    assert 0.0 <= out[0]["q"] <= 1.0


def test_fingerprint_deterministic(spark):
    from pathway_spark.operators.text import fingerprint64

    t = spark.createDataFrame([("some document text here",)] * 2, "text string")
    fps = [r["fp"] for r in t.select(fingerprint64(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


# ---------------------------------------------------------------- graphs


def test_pagerank(spark):
    from pathway_spark.operators.iterate import pagerank

    edges = T(spark, [(1, 2), (2, 3), (3, 1), (4, 3)], "u long, v long")
    out = pagerank(edges, steps=20)
    ranks = {r["w"]: r["rank"] for r in out._df.collect()}
    assert ranks[3] > ranks[2] > ranks[4]


def test_connected_components(spark):
    from pathway_spark.operators.iterate import connected_components

    edges = T(spark, [(1, 2), (2, 3), (10, 11)], "u long, v long")
    out = connected_components(edges)
    comp = {r["w"]: r["label"] for r in out._df.collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10


def test_bellman_ford(spark):
    from pathway_spark.operators.iterate import bellman_ford

    verts = T(spark, [(1,), (2,), (3,)], "w long")
    edges = T(spark, [(1, 2, 1.0), (2, 3, 2.0), (1, 3, 10.0)], "u long, v long, dist double")
    out = bellman_ford(verts, edges, 1)
    d = {r["w"]: r["d"] for r in out._df.collect()}
    assert d[3] == 3.0


def test_iterate_fixpoint(spark):
    t = Table(spark.createDataFrame([(1,), (5,), (30,)], "v int"))

    def halve(state):
        return Table(
            state._df.select(
                F.when(F.col("v") > 2, (F.col("v") / 2).cast("int")).otherwise(F.col("v")).alias("v")
            )
        )

    out = pw.iterate(halve, state=t)
    assert sorted(r["v"] for r in out._df.collect()) == [1, 1, 2]


# ---------------------------------------------------------------- indexing / ml


def test_bm25(spark):
    from pathway_spark.indexing import tfidf_score

    docs = T(spark, [
        (1, "spark streaming engine"),
        (2, "cats and dogs"),
        (3, "spark catalyst optimizer engine"),
    ], "doc_id long, text string", ["doc_id"])
    qs = Table(spark.createDataFrame([(100, "spark engine")], "query_id long, query string"))
    out = tfidf_score(docs, qs, k=2)
    got = sorted((r["rank"], r["doc_id"]) for r in out._df.collect())
    assert {d for _, d in got} == {1, 3}


def test_data_index_knn(spark):
    from pathway_spark.indexing import BruteForceKnnFactory, DataIndex

    corpus = T(spark, [
        (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7]),
    ], "vec_id long, embedding array<double>", ["vec_id"])
    idx = DataIndex(corpus, BruteForceKnnFactory())
    res = idx.query(corpus.filter(this.vec_id == 1), number_of_matches=1)
    assert [r["neighbor_id"] for r in res._df.collect()] == [3]


def test_fuzzy_match(spark):
    from pathway_spark.ml import fuzzy_match_tables, smart_fuzzy_join

    l = T(spark, [(1, "apple iphone 12"), (2, "samsung galaxy")],
          "k long, name string", ["k"])
    r = T(spark, [(10, "iphone 12 pro apple"), (20, "pixel phone")],
          "k long, name string", ["k"])
    m = fuzzy_match_tables(l, r, left_col="name", right_col="name", threshold=0.3)
    assert m._df.count() == 1
    best = smart_fuzzy_join(l, r, left_col="name", right_col="name", threshold=0.1)
    assert best._df.count() >= 1


# ---------------------------------------------------------------- multimodal


def test_multimodal_features(spark):
    from pathway_spark.operators.multimodal import extract_features

    t = Table(spark.createDataFrame(
        [(1, bytearray(b"fake-image-bytes")), (2, bytearray(b"other"))],
        "media_id long, content binary",
    ))
    out = extract_features(t, dim=16)
    got = out._df.select("media_id", "features").collect()
    assert all(len(r["features"]) == 16 for r in got)
    # deterministic: same content → same features
    again = extract_features(t, dim=16)._df.select("features").collect()
    assert sorted(map(str, [r["features"] for r in got])) == sorted(
        map(str, [r["features"] for r in again])
    )


def test_multimodal_decoders_real(spark):
    """Round-4: WAV and PNG decode are REAL (pure stdlib); only video
    frame sampling stays gated."""
    import numpy as np

    from pathway_spark.operators.multimodal import (
        DecoderUnavailable, decode_png, encode_png, encode_wav,
        extract_image_features, extract_wav_features, resize_images,
        sample_frames,
    )

    # WAV: encode -> Spark-side decode -> integer features
    s = ((np.arange(120) * 104729 + 7) % 20001) - 10000
    wav = encode_wav(s, sample_rate=16000, channels=2)
    t = Table(spark.createDataFrame([(1, bytearray(wav))],
                                    "media_id long, content binary"))
    row = extract_wav_features(t)._df.collect()[0]
    assert row.sample_rate == 16000 and row.channels == 2
    assert row.n_frames == 60 and row.peak == int(np.abs(s).max())
    assert row.energy == int((s.astype(np.int64) ** 2).sum())

    # PNG: encode -> resize (real decode+NN resample+re-encode) -> features
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    img = Table(spark.createDataFrame([(2, bytearray(encode_png(px)))],
                                      "media_id long, content binary"))
    small = resize_images(img, 15, 10)
    out = small._df.collect()[0]
    rpx = decode_png(bytes(out.content))
    assert rpx.shape == (10, 15, 3)
    feat = extract_image_features(img)._df.collect()[0]
    assert (feat.width, feat.height, feat.channels) == (30, 20, 3)
    assert feat.sum_px == int(px.astype(np.int64).sum())

    # Y4M video: encode -> distributed frame sampling -> PNG frames
    from pathway_spark.operators.multimodal import decode_y4m, encode_y4m

    frames = np.stack([np.full((8, 12), i * 5, dtype=np.uint8)
                       for i in range(50)])
    y4m = encode_y4m(frames, fps_num=25)          # 2 s of video
    assert len(list(decode_y4m(y4m))) == 50
    vid = Table(spark.createDataFrame([(3, bytearray(y4m))],
                                      "media_id long, content binary"))
    sampled = sample_frames(vid, every_ms=500)._df.collect()
    assert sorted(r.frame_ms for r in sampled) == [0, 520, 1040, 1560]
    f0 = next(bytes(r.frame_png) for r in sampled if r.frame_index == 0)
    assert decode_png(f0).shape == (8, 12, 1)
    # non-video bytes still fail with the gated error, at decode time
    with pytest.raises(Exception, match="YUV4MPEG2"):
        list(decode_y4m(b"not a video"))


# ---------------------------------------------------------------- io / debug


def test_io_roundtrip_csv_json(spark, tmp_path):
    t = T(spark, [(1, "a"), (2, "b")], "k int, s string", ["k"])
    csv_dir = str(tmp_path / "csv")
    pw.io.csv.write(t, csv_dir, header=True)
    back = pw.io.csv.read(csv_dir, csv_settings={"inferSchema": "true"}, spark=spark)
    assert rows(back, "k", "s") == [(1, "a"), (2, "b")]
    j_dir = str(tmp_path / "json")
    pw.io.jsonlines.write(t, j_dir)
    backj = pw.io.jsonlines.read(j_dir, spark=spark)
    assert rows(backj, "k", "s") == [(1, "a"), (2, "b")]


def test_subscribe_batch(spark):
    t = T(spark, [(1,), (2,)], "k int", ["k"])
    seen = []
    pw.io.subscribe(
        t, on_change=lambda key, row, time, is_addition: seen.append((row["k"], is_addition))
    )
    assert sorted(seen) == [(1, True), (2, True)]


def test_python_connector(spark):
    class Subject(pw.io.python.ConnectorSubject):
        def run(self):
            self.next(k=1, s="x")
            self.next(k=2, s="y")

    schema = pw.schema_from_types(k=int, s=str)
    t = Subject().to_table(schema, spark=spark)
    assert rows(t, "k", "s") == [(1, "x"), (2, "y")]


# ---------------------------------------------------------------- streaming


def test_streaming_windowed_counts(spark, tmp_path):
    import pathway_spark.streaming as st

    src = str(tmp_path / "stream")
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, 0, i)) for i in range(10)], "k int, ts timestamp"
    )
    df.coalesce(2).write.parquet(src)
    t = st.stream_from_directory(spark, src, "k int, ts timestamp")
    agg = t._df.withWatermark("ts", "1 minute").groupBy(
        F.window("ts", "5 minutes")
    ).count()
    res = st.run_to_memory(agg, "win_counts", output_mode="append")
    got = sorted(r["count"] for r in res.collect())
    assert sum(got) <= 10 and len(got) >= 1


def test_streaming_dedup(spark, tmp_path):
    import pathway_spark.streaming as st

    src = str(tmp_path / "dstream")
    spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 1)), (1, "a", dt.datetime(2024, 1, 1, 0, 1)),
         (2, "b", dt.datetime(2024, 1, 1))],
        "k int, v string, ts timestamp",
    ).write.parquet(src)
    t = st.stream_from_directory(spark, src, "k int, v string, ts timestamp")
    out = st.deduplicate_stream(t, ["k"], time_col="ts", within=dt.timedelta(hours=1))
    res = st.run_to_memory(out.to_df(), "dedup_out", output_mode="append")
    ks = sorted(r["k"] for r in res.collect())
    assert ks == [1, 2]


def test_asof_join_right_outer(spark):
    trades = T(spark, [(1, 10)], "tid int, t long", ["tid"])
    quotes = T(spark, [(5, 1.0), (20, 3.0)], "qt long, px double", ["qt"])
    right = trades.asof_join_right(quotes, pw.left.t, pw.right.qt)
    # match: trade@10 ↔ quote@5; quote@20 unused → padded with NULL left
    got = rows(right, "tid", "px")
    assert got == sorted([(1, 1.0), (None, 3.0)],
                         key=lambda t: tuple(repr(x) for x in t))
    outer = trades.filter(this.tid < 0).asof_join_outer(
        quotes, pw.left.t, pw.right.qt
    )
    assert len(rows(outer)) == 2  # no left rows: both quotes padded


def test_dt_duration_accessors_exact(spark):
    big = 1_704_067_798_778_549_829  # ns — would lose precision as double
    t = Table(spark.createDataFrame([(big,)], "d long"))
    out = t.select(
        s=this.d.dt.seconds(), m=this.d.dt.minutes(), h=this.d.dt.hours()
    )
    assert rows(out) == [(big // 10**9, big // (60 * 10**9), big // (3600 * 10**9))]


def test_dt_round_floor(spark):
    import datetime as dt

    t = Table(spark.createDataFrame(
        [(dt.datetime(2024, 3, 15, 10, 31, 29),)], "ts timestamp"))
    out = t.select(
        fl=this.ts.dt.floor("h"), rd=this.ts.dt.round("h"), rm=this.ts.dt.round("min")
    )
    r = out.to_df().collect()[0]
    assert r["fl"].hour == 10 and r["fl"].minute == 0
    assert r["rd"].hour == 11 and r["rd"].minute == 0
    assert (r["rm"].minute, r["rm"].second) == (31, 0)


def test_try_divide_null_error_model(spark):
    t = Table(spark.createDataFrame([(1.0, 0), (4.0, 2)], "a double, b int"))
    out = t.select(r=pw.fill_error(this.a / this.b, -1.0))
    assert rows(out) == [(-1.0,), (2.0,)]


def test_session_predicate(spark):
    # merge adjacent readings while the value doesn't jump by more than 2
    t = T(spark, [(0, 1.0), (1, 2.0), (2, 10.0), (3, 11.0)], "t long, v double", ["t"])
    wt = t.windowby(
        this.t,
        window=pw.temporal.session(
            predicate=lambda prev, cur: (cur.v - prev.v) <= 2
        ),
    )
    out = wt.reduce(start=this._pw_window_start, n=R.count())
    assert rows(out) == [(0, 2), (2, 2)]


def test_async_transformer(spark):
    class Upper(pw.AsyncTransformer):
        output_schema = pw.schema_from_types(up=str)

        async def invoke(self, **row):
            if row["s"] == "bad":
                raise ValueError("boom")
            await asyncio_sleep0()
            return {"up": row["s"].upper()}

    async def _noop():
        return None

    def asyncio_sleep0():
        import asyncio
        return asyncio.sleep(0)

    t = T(spark, [(1, "a"), (2, "bad"), (3, "c")], "k int, s string", ["k"])
    tr = Upper(t)
    ok = sorted(r["up"] for r in tr.successful._df.collect())
    assert ok == ["A", "C"]
    assert tr.failed._df.count() == 1


def test_pandas_transformer(spark):
    @pw.pandas_transformer(output_schema=pw.schema_from_types(double=int))
    def double_col(pdf):
        import pandas as pd
        return pd.DataFrame({"double": pdf["v"] * 2})

    t = T(spark, [(1,), (2,)], "v int")
    out = double_col(t)
    assert sorted(r["double"] for r in out._df.collect()) == [2, 4]


def test_universes_promises(spark):
    a = T(spark, [(1,), (2,)], "k int", ["k"])
    b = T(spark, [(1,), (2,), (3,)], "k int", ["k"])
    pw.universes.promise_is_subset_of(a, b, validate=True)
    c = T(spark, [(9,)], "k int", ["k"])
    pw.universes.promise_are_pairwise_disjoint(a, c, validate=True)
    with pytest.raises(AssertionError):
        pw.universes.promise_is_subset_of(b, a, validate=True)


def test_persistence_config(tmp_path):
    cfg = pw.persistence.Config(pw.persistence.Backend.filesystem(str(tmp_path / "chk")))
    assert cfg.checkpoint_location.endswith("chk")


def test_salted_aggregate(spark):
    from pathway_spark.operators.skew import key_skew_report, salted_aggregate

    data = [("hot", float(i)) for i in range(1000)] + [("cold", 7.0)]
    t = T(spark, data, "k string, v double")
    out = salted_aggregate(
        t, ["k"],
        {"total": ("sum", "v"), "n": ("count", "v"), "mean": ("avg", "v"),
         "lo": ("min", "v"), "hi": ("max", "v")},
        salt_buckets=8,
    )
    got = {r["k"]: (r["total"], r["n"], r["mean"], r["lo"], r["hi"])
           for r in out._df.collect()}
    assert got["hot"] == (499500.0, 1000, 499.5, 0.0, 999.0)
    assert got["cold"] == (7.0, 1, 7.0, 7.0, 7.0)
    rep = key_skew_report(t, ["k"]).collect()
    assert rep[0]["k"] == "hot" and rep[0]["max_n"] == 1000


def test_token_splitter(spark):
    from pathway_spark.ml.splitters import TokenCountSplitter, split_documents

    text = " ".join(f"w{i}" for i in range(10))
    t = T(spark, [(1, text)], "doc_id long, text string", ["doc_id"])
    out = split_documents(t, max_tokens=4, overlap=1)
    chunks = [r["chunk_text"] for r in
              out._df.orderBy("chunk_pos").collect()]
    assert chunks[0] == "w0 w1 w2 w3"
    assert chunks[1] == "w3 w4 w5 w6"          # 1-token overlap
    assert chunks[-1].split()[-1] == "w9"       # tail covered
    splitter = TokenCountSplitter(min_tokens=2, max_tokens=4, overlap=1)
    out2 = splitter(t)
    assert all(len(r["chunk_text"].split()) >= 2 for r in out2._df.collect())


def test_streaming_interval_join(spark, tmp_path):
    """stream-stream inner join with range condition + watermarks —
    Spark's canonical interval join (SURVEY §2.3 interval_join)."""
    import pathway_spark.streaming as st

    base = dt.datetime(2024, 1, 1)
    lsrc, rsrc = str(tmp_path / "ljoin"), str(tmp_path / "rjoin")
    spark.createDataFrame(
        [(1, 7, base + dt.timedelta(minutes=1)), (2, 7, base + dt.timedelta(minutes=30))],
        "lid int, k int, lts timestamp",
    ).write.parquet(lsrc)
    spark.createDataFrame(
        [(10, 7, base + dt.timedelta(minutes=2)), (20, 7, base + dt.timedelta(minutes=50))],
        "rid int, k int, rts timestamp",
    ).write.parquet(rsrc)
    l = spark.readStream.schema("lid int, k int, lts timestamp").parquet(lsrc).withWatermark("lts", "10 minutes")
    r = (spark.readStream.schema("rid int, k int, rts timestamp").parquet(rsrc)
         .withColumnRenamed("k", "rk").withWatermark("rts", "10 minutes"))
    j = l.join(
        r,
        (F.col("k") == F.col("rk"))
        & (F.col("rts") >= F.col("lts"))
        & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 5 MINUTES")),
        "inner",
    )
    res = st.run_to_memory(j, "ssjoin")
    got = [(r["lid"], r["rid"]) for r in res.collect()]
    assert got == [(1, 10)]


def test_streaming_stream_static_join(spark, tmp_path):
    """asof_now in streaming == stream-static join (SURVEY §2.3)."""
    import pathway_spark.streaming as st

    src = str(tmp_path / "ss_left")
    spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string").write.parquet(src)
    stream = spark.readStream.schema("k int, v string").parquet(src)
    dim = spark.createDataFrame([(1, "ONE")], "k int, name string")
    j = stream.join(dim, "k", "inner")
    res = st.run_to_memory(j, "ss_static")
    assert [(r["k"], r["name"]) for r in res.collect()] == [(1, "ONE")]


def test_document_store(spark):
    from pathway_spark.ml.document_store import DocumentStore
    from pathway_spark.ml.splitters import TokenCountSplitter

    docs = T(spark, [
        (1, "spark engine " * 30 + "catalyst optimizer"),
        (2, "cats and dogs playing fetch " * 20),
    ], "doc_id long, text string", ["doc_id"])
    store = DocumentStore(docs, splitter=TokenCountSplitter(max_tokens=20))
    assert store.chunks._df.count() > 2  # both docs split into chunks
    qs = Table(spark.createDataFrame([(1, "catalyst optimizer")],
                                     "query_id long, query string"))
    hits = store.retrieve(qs, k=2)._df.collect()
    assert hits and all(h["doc_id"] == 1 for h in hits)


def test_embedding_lsh_planted_neardups(spark):
    """LSH path must find planted near-duplicates (high-cosine pairs)."""
    import random

    from pathway_spark.operators.dedup import embedding_neardup_pairs

    rnd = random.Random(3)
    base = [[rnd.gauss(0, 1) for _ in range(16)] for _ in range(30)]
    rows_ = []
    for i, v in enumerate(base):
        rows_.append((i, v))
        # planted near-dup: tiny perturbation of vector i
        rows_.append((100 + i, [x + rnd.gauss(0, 0.01) for x in v]))
    t = T(spark, rows_, "vec_id long, embedding array<double>", ["vec_id"])
    out = embedding_neardup_pairs(t, "embedding", "vec_id", threshold=0.99,
                                  num_planes=32, bands=4)
    got = {(r["id_a"], r["id_b"]) for r in out._df.collect()}
    planted = {(i, 100 + i) for i in range(30)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.9, f"LSH recall too low: {recall}"


def test_louvain_communities(spark):
    from pathway_spark.operators.iterate import louvain_communities

    # two dense triangles joined by one weak edge
    edges = T(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)],
              "u long, v long")
    out = louvain_communities(edges)
    comm = {r["n"]: r["label"] for r in out._df.collect()}
    assert comm[1] == comm[2] == comm[3]
    assert comm[10] == comm[11] == comm[12]


def test_hybrid_retrieve(spark):
    from pathway_spark.indexing import hybrid_retrieve

    docs = T(spark, [
        (1, "spark catalyst engine", [1.0, 0.0]),
        (2, "cats and dogs", [0.0, 1.0]),
    ], "doc_id long, text string, embedding array<double>", ["doc_id"])
    qs = Table(spark.createDataFrame(
        [(100, "catalyst engine", [0.9, 0.1])],
        "query_id long, query string, embedding array<double>"))
    out = hybrid_retrieve(docs, qs, k=2)
    ranked = sorted(((r["rank"], r["doc_id"]) for r in out._df.collect()))
    assert ranked[0] == (1, 1)  # wins both text and vector rank


def test_changelog_roundtrip(spark):
    from pathway_spark.debug import table_from_markdown

    t = table_from_markdown(
        """
        a | __time__ | __diff__
        1 | 2        | 1
        2 | 2        | 1
        1 | 4        | -1
        """,
        spark=spark,
    )
    snap = t.stream_to_table()
    assert rows(snap, "a") == [(2,)]
    back = snap.table_to_stream()
    assert "_pw_diff" in back._df.columns
    back.assert_append_only()
    with pytest.raises(AssertionError):
        t.assert_append_only()
    assert rows(t.remove_retractions(), "a") == [(1,), (2,)]


def test_join_instances_and_id(spark):
    l = T(spark, [(1, "i1", "a"), (2, "i2", "b")], "k int, inst string, lv string", ["k"])
    r = T(spark, [(1, "i1", "A"), (1, "i2", "AX")], "k int, inst string, rv string")
    out = l.join(
        r, pw.left.k == pw.right.k,
        left_instance=pw.left.inst, right_instance=pw.right.inst,
    ).select(k=pw.left.k, rv=pw.right.rv)
    assert rows(out) == [(1, "A")]  # instance co-partitioning filters i2


def test_ix_ref(spark):
    dim = T(spark, [(1, "one"), (2, "two")], "k int, name string", ["k"])
    ctx = T(spark, [(10, 2)], "e int, fk int", ["e"])
    out = (ctx + dim.ix_ref(this.fk, context=ctx))
    assert rows(out, "e", "name") == [(10, "two")]


def test_deduplicate_acceptor(spark):
    t = T(spark, [(1, 5), (2, 9), (3, 7)], "k int, v int", ["k"])
    # accept a new row only if its value is higher than the current one
    out = t.deduplicate(value=this.v, instance=this.k % 1,
                        acceptor=lambda new, old: new > old)
    vals = [r["v"] for r in out._df.collect()]
    assert vals == [9]


def test_dt_timestamp_and_from_timestamp(spark):
    import datetime as dtm

    t = T(spark, [(dtm.datetime(2024, 1, 1, 0, 0, 1),)], "ts timestamp")
    out = t.select(s=this.ts.dt.timestamp("s"))
    assert rows(out) == [(1704067201.0,)]
    t2 = T(spark, [(1_704_067_201,)], "e long")
    out2 = t2.select(ts=this.e.dt.from_timestamp("s"))
    assert out2.to_df().collect()[0]["ts"] == dtm.datetime(2024, 1, 1, 0, 0, 1)


def test_num_fill_na(spark):
    t = T(spark, [(1.0,), (float("nan"),), (None,)], "v double")
    out = t.select(f=this.v.num.fill_na(0.0))
    assert rows(out) == [(0.0,), (0.0,), (1.0,)]


def test_knn_classifier(spark):
    """stdlib.ml KNN classifier — majority vote over engine KNN
    (reference _knn_lsh.py:64). Self-classification on the labeled
    embeddings fixture must agree with neighbors' labels."""
    import pathway_spark as pw
    from pathway_spark.stdlib.ml import knn_classify, knn_lsh_classifier_train
    from tests.conftest import SF_DIR

    emb = pw.io.parquet.read(f"{SF_DIR}/embeddings.parquet", spark=spark)
    queries = emb.filter(pw.this.vec_id < 5)
    # classifying the table against itself -> leave-one-out exclusion
    out = knn_classify(emb, queries, vec_col="embedding", label_col="label",
                       id_col="vec_id", k=5, metric="cosine",
                       self_exclude=True)
    rows = {r["query_id"]: r["predicted"] for r in out.to_df().collect()}
    assert len(rows) == 5
    # exactness oracle: majority label of the true 5 cosine neighbors,
    # ties to the smallest label (fixture labels are random, so verify
    # the vote, not label recovery)
    import duckdb

    oracle = dict(duckdb.connect().execute(f"""
        WITH e AS (SELECT vec_id, embedding, label
                   FROM read_parquet('{SF_DIR}/embeddings.parquet')),
        nn AS (
          SELECT q.vec_id AS qid, c.label AS nlabel,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                     ORDER BY list_cosine_similarity(q.embedding, c.embedding)
                         DESC, c.vec_id) AS rn
          FROM e q JOIN e c ON q.vec_id <> c.vec_id
          WHERE q.vec_id < 5
        ), votes AS (
          SELECT qid, nlabel, COUNT(*) AS n FROM nn WHERE rn <= 5
          GROUP BY qid, nlabel
        )
        SELECT qid, nlabel FROM votes
        QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY n DESC, nlabel) = 1
    """).fetchall())
    assert rows == oracle

    clf = knn_lsh_classifier_train(emb, L=8, type="cosine",
                                   vec_col="embedding", label_col="label",
                                   id_col="vec_id")
    out2 = clf(queries, k=5)
    assert out2.to_df().count() == 5


def test_hmm_reducer(spark):
    """stdlib.ml create_hmm_reducer — Viterbi decode per group on the
    Arrow custom-reducer path (reference hmm.py:15)."""
    import pathway_spark as pw
    from pathway_spark.stdlib.ml import create_hmm_reducer

    T = {"HUNGRY": {"HUNGRY": 0.4, "FULL": 0.6},
         "FULL": {"HUNGRY": 0.4, "FULL": 0.6}}
    E = {"HUNGRY": {"GRUMPY": 0.9, "HAPPY": 0.1},
         "FULL": {"GRUMPY": 0.2, "HAPPY": 0.8}}
    I = {"HUNGRY": 0.5, "FULL": 0.5}
    dec = create_hmm_reducer(transitions=T, emissions=E, initial=I)

    rows = [(1, i, o) for i, o in enumerate(
        ["HAPPY", "HAPPY", "GRUMPY", "GRUMPY", "HAPPY"])]
    t = pw.debug.table_from_rows(
        pw.schema_from_types(key=int, ts=int, obs=str), rows, spark=spark)
    out = t.groupby(pw.this.key).reduce(
        key=pw.this.key, decoded=dec(pw.this.ts, pw.this.obs))
    decoded = out.to_df().collect()[0]["decoded"]
    assert list(decoded) == ["FULL", "FULL", "HUNGRY", "HUNGRY", "FULL"]

    # beam + tail truncation
    dec2 = create_hmm_reducer(transitions=T, emissions=E, initial=I,
                              beam_size=1, num_results_kept=2)
    out2 = t.groupby(pw.this.key).reduce(
        key=pw.this.key, decoded=dec2(pw.this.ts, pw.this.obs))
    assert len(out2.to_df().collect()[0]["decoded"]) == 2


def test_ivf_hnsw_recall_and_no_driver_collect(spark):
    """Round-7 scale path: IVF-coarse + per-cell HNSW with BOTH sides
    distributed — building the plan runs no query-side driver collect
    (the centroid jobs are corpus-side k-means, bounded), and recall@10
    vs brute force stays high on clustered data."""
    import numpy as np

    from pathway_spark.operators.hnsw import ivf_hnsw_topk
    from pathway_spark.operators.similarity import brute_force_topk
    from pathway_spark.table import ID, Table

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 16))
    rows = []
    for i in range(800):
        c = centers[i % 8]
        rows.append((i, (c + 0.15 * rng.normal(size=16)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    corpus = Table(emb)
    queries = Table(emb.filter(F.col("vec_id") < 40))

    approx = ivf_hnsw_topk(corpus, queries, k=10, nlist=8, nprobe=3,
                           ef_construction=80, ef_search=96)._df
    exact = brute_force_topk(corpus, queries, k=10)._df

    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.drop(ID).collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.85, f"recall {recall:.3f}"
    # per-query result discipline: exactly <= k ranked rows, rank dense
    import collections
    cnt = collections.Counter(q for q, _ in a)
    assert max(cnt.values()) <= 10
