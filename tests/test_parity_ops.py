"""Behavioral tests for the round-4 parity operators: edge-level fuzzy
matching, pw.utils.col / filtering, and the temporal time-utils batch
forms — driven on the driver's parquet testdata, mirrored in DuckDB
where the semantics are relational.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

import pathway_spark as pw
from pathway_spark.table import ID, Table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nation(spark):
    return pw.io.parquet.read(f"{SF}/nation.parquet", spark=spark)


@pytest.fixture(scope="module")
def orders(spark):
    return pw.io.parquet.read(f"{SF}/orders.parquet", spark=spark)


def test_fuzzy_match_edge_level(spark):
    # two node sets sharing discriminative features; one heavy feature
    # (above threshold) must only rescore, never generate candidates
    rows = []
    # left nodes 1..3, right nodes 11..13; feature f is shared by the
    # matching pair only; feature 99 is heavy (on everything)
    for l, f in [(1, 101), (2, 102), (3, 103)]:
        rows.append((l, f, 1.0))
        rows.append((l, 99, 1.0))
    for r, f in [(11, 101), (12, 102), (13, 103)]:
        rows.append((r, f, 1.0))
        rows.append((r, 99, 1.0))
    el = Table.from_spark(
        spark.createDataFrame([r for r in rows if r[0] < 10],
                              "node long, feature long, weight double"))
    er = Table.from_spark(
        spark.createDataFrame([r for r in rows if r[0] >= 10],
                              "node long, feature long, weight double"))
    feats = Table(
        spark.createDataFrame(
            [(f, 1.0, 1) for f in (101, 102, 103, 99)],
            "id long, weight double, normalization_type int",
        ).withColumnRenamed("id", ID))
    out = pw.ml.fuzzy_match(el, er, feats, HEAVY_LIGHT_THRESHOLD=4)
    got = sorted((r.left, r.right) for r in out.to_df().collect())
    assert got == [(1, 11), (2, 12), (3, 13)]
    # weights include the heavy-feature contribution for candidate pairs
    w = {(r.left, r.right): r.weight for r in out.to_df().collect()}
    assert all(v > 0.5 for v in w.values())


def test_fuzzy_match_by_hand_override(spark):
    el = Table.from_spark(spark.createDataFrame(
        [(1, 101, 1.0), (2, 102, 1.0)], "node long, feature long, weight double"))
    er = Table.from_spark(spark.createDataFrame(
        [(11, 101, 1.0), (12, 102, 1.0)], "node long, feature long, weight double"))
    feats = Table(spark.createDataFrame(
        [(101, 1.0, 1), (102, 1.0, 1)],
        "id long, weight double, normalization_type int",
    ).withColumnRenamed("id", ID))
    by_hand = Table.from_spark(spark.createDataFrame(
        [(1, 12, 9.0)], "left long, right long, weight double"))
    out = pw.ml.fuzzy_match(el, er, feats, by_hand_match=by_hand)
    got = sorted((r.left, r.right, r.weight) for r in out.to_df().collect())
    # node 1 is forced to 12; (2,102)-(12,102) can't use 12?? the
    # reference only bans by-hand LEFT nodes on the left side and RIGHT
    # nodes on the right side: so 2 can only match 11 via no shared
    # feature -> only the by-hand pair plus no (2,*) pair
    assert (1, 12, 9.0) in got
    assert not any(l == 1 and r != 12 for l, r, _ in got)


def test_unpack_col(spark, nation):
    t = nation.select(pw.this.n_nationkey,
                      packed=pw.make_tuple(pw.this.n_name, pw.this.n_regionkey))
    out = pw.utils.col.unpack_col(t.packed, "name", "regionkey")
    got = out.to_df().orderBy("name").limit(2).collect()
    assert got[0].name is not None and "regionkey" in out.column_names


def test_groupby_reduce_majority(spark, orders):
    out = pw.utils.col.groupby_reduce_majority(
        orders.o_orderpriority, orders.o_orderstatus)
    got = {r.o_orderpriority: r.majority for r in out.to_df().collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    exp = {r[0]: r[1] for r in con.sql("""
        SELECT o_orderpriority, o_orderstatus FROM (
          SELECT o_orderpriority, o_orderstatus,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY count(*) DESC, o_orderstatus ASC) rn
          FROM orders GROUP BY o_orderpriority, o_orderstatus)
        WHERE rn = 1""").fetchall()}
    assert got == exp


def test_apply_all_rows(spark):
    t = Table.from_spark(spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "colA long, colB long"))
    out = pw.utils.col.apply_all_rows(
        t.colA, t.colB,
        fun=lambda a, b: [x + sum(a) + sum(b) for x in a],
        result_col_name="res")
    got = sorted(r.res for r in out.to_df().collect())
    assert got == [67, 68, 69]


def test_argmax_rows(spark, orders):
    out = pw.utils.filtering.argmax_rows(
        orders, orders.o_orderpriority, what=orders.o_totalprice)
    rows = out.to_df().collect()
    # one row per group, each carrying the group max
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    exp = dict(con.sql(
        "SELECT o_orderpriority, max(o_totalprice) FROM orders GROUP BY 1"
    ).fetchall())
    assert {r.o_orderpriority: r.o_totalprice for r in rows} == exp


def test_inactivity_detection_batch(spark):
    base = datetime.datetime(2026, 1, 1)
    rows = [(1, base + datetime.timedelta(seconds=s))
            for s in (0, 10, 20, 200, 210, 500)]
    t = Table.from_spark(spark.createDataFrame(rows, "g long, ts timestamp"))
    out = pw.temporal.inactivity_detection(
        t, datetime.timedelta(seconds=60), time_column="ts")
    got = sorted((r.inactivity_timestamp_utc, r.resumed_activity_timestamp_utc)
                 for r in out.to_df().collect())
    assert len(got) == 2
    assert got[0][0] == base + datetime.timedelta(seconds=20)
    assert got[1][0] == base + datetime.timedelta(seconds=210)


def test_add_update_timestamp(spark, nation):
    out = pw.temporal.add_update_timestamp_utc(nation)
    assert "updated_timestamp_utc" in out.column_names
    r = out.to_df().limit(1).collect()[0]
    assert r.updated_timestamp_utc is not None


def test_classifier_accuracy(spark):
    pred = Table.from_spark(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "k long, predicted_label string"))
    exact = Table(pred._df.select(
        ID, F.when(F.col(ID).isNotNull(), F.lit("a")).alias("label")))
    out = pw.ml.utils.classifier_accuracy(pred, exact)
    got = {r.value: r.cnt for r in out.to_df().collect()}
    assert got == {True: 2, False: 1}


def test_free_function_temporal_joins(spark, orders, nation):
    li = pw.io.parquet.read(f"{SF}/lineitem.parquet", spark=spark)
    j = pw.temporal.asof_join(
        li, orders, li.l_shipdate, orders.o_orderdate,
        how="inner", direction=pw.temporal.Direction.BACKWARD)
    assert j.to_df().count() > 0


def test_indexing_build_index(spark):
    emb = pw.io.parquet.read(f"{SF}/embeddings.parquet", spark=spark)
    idx = pw.indexing.BruteForceKnnFactory(metric="cosine").build_index(
        emb, vec_col="embedding", id_col="vec_id")
    res = idx.query(emb, number_of_matches=2)
    assert res.to_df().count() > 0
    bm = pw.indexing.TantivyBM25Factory().build_index(
        pw.io.parquet.read(f"{SF}/documents.parquet", spark=spark),
        text_col="text", id_col="doc_id")
    qs = Table.from_spark(spark.createDataFrame(
        [(1, "the quick")], "query_id long, query string"))
    assert bm.query(qs, number_of_matches=3).to_df().count() >= 0


def test_table_parity_methods(spark):
    t = Table.from_spark(spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"))
    assert t.keys() == ["k", "v"]
    assert t.typehints() == {"k": int, "v": int}
    assert t.eval_type(pw.this.v + 1.5) is float
    assert Table.empty(age=float, pet=str).count_rows() == 0
    fc = Table.from_columns(t.v, doubled=t.v)
    assert fc.keys() == ["v", "doubled"] and fc.count_rows() == 3
    assert t.to_stream().keys() == ["k", "v", "is_upsert"]
    assert t.is_append_only and t.C.v._name == "v"
    # watermark family, batch forms
    assert sorted(r.v for r in t.ignore_late(pw.this.v, 15).to_df().collect()) == [20, 30]
    fg = t.forget(pw.this.v, 15, mark_forgetting_records=True)
    assert "_pw_forgotten" in fg.keys()
    assert fg.filter_out_results_of_forgetting().keys() == ["k", "v"]
    assert t.buffer(pw.this.v, 5).count_rows() == 3


def test_changelog_snapshots(spark):
    t = Table.from_spark(spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"))
    log = Table(t._df.withColumn("_pw_diff", F.lit(1))
                     .withColumn("_pw_time", F.col("k")))
    # snapshots at times 1,2,3 contain 1,2,3 alive rows -> 6 total
    assert log.unpack_snapshots().count_rows() == 6
    dels = Table(log._df.filter(F.col("k") == 2).select(ID))
    assert log.from_streams(dels).count_rows() == 2


def test_json_get_as_methods(spark):
    t = Table.from_spark(spark.createDataFrame(
        [('{"a": 3, "b": "x", "n": {"c": 5}}',)], "j string"))
    out = t.select(
        a=pw.this.j.get("a").as_int(),
        b=pw.this.j.get("b").as_str(),
        c=pw.this.j.get("missing").as_int(default=7),
        d=pw.this.j.get("n").get("c").as_int(),
    )
    r = out.to_df().collect()[0]
    assert (r.a, r.b, r.c, r.d) == (3, "x", 7, 5)
    # struct columns still take getField
    t2 = Table.from_spark(spark.createDataFrame(
        [((1, "y"),)], "s struct<p:long,q:string>"))
    assert t2.select(p=pw.this.s.get("p")).to_df().collect()[0].p == 1


def test_inactivity_detection_streaming(spark, tmp_path):
    """Streaming form: applyInPandasWithState + processing-time timeout.
    The timer firing emits the inactivity row; the next arrival emits
    the completed (resumed) row."""
    import time

    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from pathway_spark.streaming import stream_from_directory

    d = str(tmp_path / "inact")
    import os
    os.makedirs(d)
    pd.DataFrame({"g": [1], "v": [1]}).to_parquet(os.path.join(d, "a.parquet"))
    t = stream_from_directory(
        spark, d, StructType([StructField("g", LongType()),
                              StructField("v", LongType())]))
    out = pw.temporal.inactivity_detection(
        t, datetime.timedelta(seconds=2), instance="g")
    q = (out._df.writeStream.format("memory").queryName("inact_t")
         .outputMode("append").trigger(processingTime="500 milliseconds")
         .start())
    try:
        deadline = time.time() + 25
        # phase 1: wait for the timeout-driven inactivity row
        while time.time() < deadline:
            rows = spark.sql("select * from inact_t").collect()
            if rows:
                break
            time.sleep(0.5)
        assert rows and rows[0].resumed_activity_timestamp_utc is None
        # phase 2: new activity closes the period
        pd.DataFrame({"g": [1], "v": [2]}).to_parquet(
            os.path.join(d, "b.parquet"))
        while time.time() < deadline:
            rows = spark.sql("select * from inact_t").collect()
            if any(r.resumed_activity_timestamp_utc is not None for r in rows):
                break
            time.sleep(0.5)
        assert any(r.resumed_activity_timestamp_utc is not None for r in rows)
        assert q.exception() is None
    finally:
        q.stop()


def test_fs_read_json_field_paths(spark, tmp_path):
    d = str(tmp_path / "j")
    import os
    os.makedirs(d)
    with open(os.path.join(d, "a.jsonl"), "w") as f:
        f.write('{"name":"x","payload":{"value":7}}\n'
                '{"name":"y","payload":{"value":9}}\n')
    with open(os.path.join(d, "skip.csv"), "w") as f:
        f.write("junk\n")

    class S(pw.Schema):
        name: str
        value: int

    t = pw.io.fs.read(d, format="json", schema=S,
                      json_field_paths={"value": "/payload/value"},
                      object_pattern="*.jsonl", spark=spark)
    got = sorted((r.name, r.value)
                 for r in t.to_df().select("name", "value").collect())
    assert got == [("x", 7), ("y", 9)]


def test_csv_parser_settings(spark, tmp_path):
    d = str(tmp_path / "c")
    import os
    os.makedirs(d)
    with open(os.path.join(d, "t.csv"), "w") as f:
        f.write("a;b\n# comment\n1;x\n2;y\n")
    t = pw.io.csv.read(
        d, csv_settings=pw.io.CsvParserSettings(delimiter=";",
                                                comment_character="#"),
        mode="static", autocommit_duration_ms=1500, spark=spark)
    got = sorted((int(r.a), r.b) for r in t.to_df().select("a", "b").collect())
    assert got == [(1, "x"), (2, "y")]
