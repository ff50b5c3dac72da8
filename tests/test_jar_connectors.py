"""Jar-gated connector smoke tests (round 8, verdict task #9).

The deltalake and kafka connectors are REAL code paths that this
sandbox cannot execute (no delta-spark / spark-sql-kafka jars, no
broker).  These tests make them stop being dead code the moment an
environment supplies the dependencies:

    pytest -m jars tests/test_jar_connectors.py

Availability is probed by JVM class lookup (never by swallowing the
test body's own failures): with the jars PRESENT, a real bug in the
connector fails the test; without them, the test skips with the
missing dependency named.  Kafka additionally needs a broker, supplied
via PW_KAFKA_BOOTSTRAP=host:port.
"""

import os
import uuid

import pytest
from pyspark.sql import functions as F


def _has_class(spark, name: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(name)
        return True
    except Exception:
        return False


@pytest.mark.jars
def test_deltalake_write_read_roundtrip(spark, tmp_path):
    if not _has_class(spark, "io.delta.sql.DeltaSparkSessionExtension"):
        pytest.skip("delta-spark jars not on the classpath")
    import pathway_spark as pw

    path = str(tmp_path / "dl")
    src = pw.Table.from_spark(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"),
        id_columns=["id"])
    pw.io.deltalake.write(src, path, mode="overwrite")
    back = pw.io.deltalake.read(path, spark=spark)
    got = sorted((r["id"], r["s"]) for r in back.to_df().collect())
    assert got == [(1, "a"), (2, "b")]
    # append (delta transaction log, not parquet overwrite semantics)
    more = pw.Table.from_spark(
        spark.createDataFrame([(3, "c")], "id long, s string"),
        id_columns=["id"])
    pw.io.deltalake.write(more, path, mode="append")
    got2 = sorted((r["id"], r["s"])
                  for r in pw.io.deltalake.read(path, spark=spark)
                  .to_df().collect())
    assert got2 == [(1, "a"), (2, "b"), (3, "c")]


@pytest.mark.jars
def test_kafka_json_envelope_roundtrip(spark):
    if not _has_class(
            spark, "org.apache.spark.sql.kafka010.KafkaSourceProvider"):
        pytest.skip("spark-sql-kafka jars not on the classpath")
    bootstrap = os.environ.get("PW_KAFKA_BOOTSTRAP")
    if not bootstrap:
        pytest.skip("set PW_KAFKA_BOOTSTRAP=host:port to run the "
                    "kafka round trip")
    import pathway_spark as pw

    topic = f"pw_smoke_{uuid.uuid4().hex[:8]}"
    settings = {"bootstrap.servers": bootstrap}
    src = pw.Table.from_spark(
        spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string"),
        id_columns=["id"])
    pw.io.kafka.write(src, settings, topic)
    back = pw.io.kafka.read(
        settings, topic, format="json",
        schema=pw.schema_from_types(id=int, v=str),
        mode="static", spark=spark,
        **{"startingOffsets": "earliest"})
    got = sorted((r["id"], r["v"]) for r in back.to_df()
                 .select("id", "v").collect())
    assert got == [(1, "x"), (2, "y")]


@pytest.mark.jars
def test_kafka_shard_worker_wire(spark, tmp_path):
    """The one piece the always-on protocol-parity test can't reach:
    KafkaShardFeed's real fetch + write_kafka_feed_batch through a
    broker.  Needs the kafka jars AND PW_KAFKA_BOOTSTRAP."""
    if not _has_class(
            spark, "org.apache.spark.sql.kafka010.KafkaSourceProvider"):
        pytest.skip("spark-sql-kafka jars not on the classpath")
    bootstrap = os.environ.get("PW_KAFKA_BOOTSTRAP")
    if not bootstrap:
        pytest.skip("PW_KAFKA_BOOTSTRAP not set")
    from pathway_spark.streaming.shard_worker import (
        KafkaShardFeed, run_shard_worker, write_kafka_feed_batch)

    topic = f"pwshard_{uuid.uuid4().hex[:8]}"
    root = str(tmp_path)
    with open(f"{root}/program.py", "w") as f:
        f.write(
            "from pyspark.sql import functions as F\n"
            "def build(g):\n"
            "    tpl = g.spark.createDataFrame([], 'user long, amount long')\n"
            "    src = g.source('t', tpl)\n"
            "    return src.reduce(['user'], total=('sum', 'amount'))\n")
    for t, rows in enumerate([[(1, 10), (2, 5)], [(1, 3), (3, 7)]], start=1):
        write_kafka_feed_batch(
            spark, spark.createDataFrame(rows, "user long, amount long"),
            bootstrap_servers=bootstrap, topic=topic, t=t,
            shards=2, key=["user"])
    total = 0
    for shard in (0, 1):
        feed = KafkaShardFeed(bootstrap_servers=bootstrap,
                              topic_of=lambda s: topic)
        total += run_shard_worker(
            spark, f"{root}/program.py", shard_id=shard, shards=2,
            key=["user"], state_root=f"{root}/state",
            transport=feed, out_dir=f"{root}/out",
            poll_interval=0.5, stop_after_time=2, idle_timeout=60)
    assert total == 4      # 2 batches x 2 shards
