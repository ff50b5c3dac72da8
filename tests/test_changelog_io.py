"""Retraction-envelope sinks: write a differential output stream to a
sink per batch (blind appends), re-read, merge -> equals the snapshot
(the round-trip criterion for diff-carrying output connectors)."""

import pytest
from pyspark.sql import functions as F

from pathway_spark.io.changelog import (
    from_envelope, merge_streams_to_table, read, to_envelope, write)
from pathway_spark.streaming.differential import (
    DIFF, TIME, DifferentialGraph)


def _changelog(spark):
    """3-batch join+reduce run: inserts, an update (retract+insert),
    and a key disappearing entirely."""
    g = DifferentialGraph(spark)
    t = g.source("t", spark.createDataFrame([], "user string, amount long"))
    out = t.reduce(["user"], total=("sum", "amount"), n=("count",))
    b1 = spark.createDataFrame([("a", 10), ("b", 7)], "user string, amount long")
    b2 = spark.createDataFrame([("a", 5)], "user string, amount long")
    b3 = (spark.createDataFrame([("b", 7)], "user string, amount long")
          .withColumn(DIFF, F.lit(-1)))
    deltas = [g.step(out, t=b)[0].localCheckpoint(eager=True)
              for b in (b1, b2, b3)]
    return deltas


def _snapshot_rows(table):
    return sorted(tuple(r) for r in
                  table._df.select("user", "total", "n").collect())


WANT = [("a", 15, 2)]   # b retracted entirely; a = 10+5 over 2 rows


@pytest.mark.parametrize("envelope,format",
                         [("pathway", "parquet"), ("cdf", "parquet"),
                          ("debezium", "json")])
def test_roundtrip_per_batch_appends(spark, tmp_path, envelope, format):
    path = str(tmp_path / f"sink_{envelope}")
    deltas = _changelog(spark)
    for d in deltas:                      # one append per micro-batch
        write(d, path, format=format, envelope=envelope)
    back = read(path, format=format, envelope=envelope,
                schema="user string, total long, n long", spark=spark)
    assert set(back.columns) == {"user", "total", "n", DIFF, TIME}
    got = _snapshot_rows(merge_streams_to_table(back))
    assert got == WANT


def test_pathway_envelope_uses_reference_special_fields(spark):
    (d1, *_rest) = _changelog(spark)
    env = to_envelope(d1, "pathway")
    assert env.columns == ["user", "total", "n", "time", "diff"]
    back = from_envelope(env, "pathway")
    assert sorted(tuple(r) for r in back.collect()) == \
        sorted(tuple(r) for r in d1.select(*back.columns).collect())


def test_cdf_envelope_replicates_weights(spark):
    d = (spark.createDataFrame([("x", 3), ("y", -2)], "k string, w int")
         .select("k", F.col("w").cast("long").alias(DIFF),
                 F.lit(7).alias(TIME)))
    env = to_envelope(d, "cdf")
    rows = sorted((r["k"], r["_change_type"]) for r in env.collect())
    assert rows == [("x", "insert")] * 3 + [("y", "delete")] * 2
    back = from_envelope(env, "cdf")
    agg = {r["k"]: r["s"] for r in back.groupBy("k")
           .agg(F.sum(DIFF).alias("s")).collect()}
    assert agg == {"x": 3, "y": -2}


def test_debezium_envelope_parses_with_existing_parser(spark):
    from pathway_spark.io.connectors import parse_debezium
    (d1, *_rest) = _changelog(spark)
    env = to_envelope(d1, "debezium")
    parsed = parse_debezium(env, "value")
    ops = sorted(r["op"] for r in parsed.collect())
    assert ops == ["c", "c"]
    assert all(r[DIFF] == 1 for r in parsed.collect())


def test_subscribe_write_end_to_end(spark, tmp_path):
    """Live stream -> differential graph -> envelope sink appends ->
    re-read + merge == the batch answer (no rows cross the driver)."""
    import pathway_spark as pw
    import pathway_spark.streaming  # noqa: F401  (FrameSink wiring)
    from pathway_spark.io.changelog import subscribe_write

    src = tmp_path / "stream_src"
    src.mkdir()
    (src / "f1.csv").write_text("k,v\na,2\nb,6\na,3\n")
    sink = str(tmp_path / "sink")
    schema = pw.schema_from_types(k=str, v=int)
    t = pw.demo.replay_csv(str(src), schema=schema, mode="streaming",
                           spark=spark)
    q = subscribe_write(
        t,
        lambda s: s.reduce(["k"], total=("sum", "v"), n=("count",)),
        sink, format="parquet", envelope="pathway")
    q.processAllAvailable()
    # second file triggers an update: the sink must carry the
    # retraction of a's old aggregate
    (src / "f2.csv").write_text("k,v\na,5\n")
    q.processAllAvailable()
    q.stop()

    back = read(sink, format="parquet", envelope="pathway", spark=spark)
    snap = sorted(tuple(r) for r in merge_streams_to_table(back)._df
                  .select("k", "total", "n").collect())
    assert snap == [("a", 10, 3), ("b", 6, 1)]
    # the envelope really carries a retraction row for a's old value
    assert back.filter((F.col("k") == "a") & (F.col(DIFF) < 0)).count() >= 1


def test_envelopes_drop_weight_zero_rows(spark):
    """A net-zero changelog row must emit NOTHING: F.sequence(1, 0) is
    the descending [1, 0], so an unguarded replicate would turn a
    weight-0 row into TWO 'insert' rows (net +2) — silent corruption
    for any unconsolidated user-supplied changelog."""
    chg = spark.createDataFrame(
        [(1, "dead", 0, 7), (2, "live", 1, 7)],
        f"id long, s string, {DIFF} long, {TIME} long")
    for envelope in ("cdf", "debezium"):
        env = to_envelope(chg, envelope)
        assert env.count() == 1, envelope
    # and the cdf round trip integrates to exactly the live row
    back = from_envelope(to_envelope(chg, "cdf"), "cdf")
    assert [(r["id"], r["s"], r[DIFF]) for r in back.collect()] \
        == [(2, "live", 1)]
