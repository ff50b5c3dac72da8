"""Real object-store smoke tests for the durable-state protocol.

The always-on `file://` suite (test_state_backend.py) drives the
rename-free protocol through the same HadoopStoreBackend code path; what
it CANNOT exercise are s3a's consistency quirks — multipart upload
visibility, list-after-write latency, missing directory semantics.
These tests run the identical scenarios against a REAL S3 API when the
environment provides one (minio or AWS), and skip cleanly otherwise.
Reference bar: the engine's S3 persistence backend
(src/persistence/backends/s3.rs).

Setup (minio example):

    export PW_SPARK_OBJECTSTORE_URI=s3a://state-bucket/pw-tests
    export PW_SPARK_OBJECTSTORE_ENDPOINT=http://localhost:9000
    export AWS_ACCESS_KEY_ID=minioadmin AWS_SECRET_ACCESS_KEY=minioadmin
    pytest -m objectstore tests/test_objectstore.py

The s3a filesystem needs the hadoop-aws + aws-sdk jars on the Spark
classpath (spark.jars.packages=org.apache.hadoop:hadoop-aws:<ver>).
"""

import os
import threading
import uuid

import pytest

from pathway_spark.streaming.differential import DIFF, DifferentialGraph
from pathway_spark.streaming.state_backend import (
    HadoopMetaBackend, HadoopStoreBackend,
)

URI = os.environ.get("PW_SPARK_OBJECTSTORE_URI")

pytestmark = [
    pytest.mark.objectstore,
    pytest.mark.skipif(
        not URI, reason="PW_SPARK_OBJECTSTORE_URI not set — see pytest.ini"),
]


@pytest.fixture()
def store_uri(spark):
    """A unique prefix under the configured bucket, with the s3a conf
    (endpoint/path-style for minio) applied to the live session."""
    ep = os.environ.get("PW_SPARK_OBJECTSTORE_ENDPOINT")
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    if ep:
        conf.set("fs.s3a.endpoint", ep)
        conf.set("fs.s3a.path.style.access", "true")
        conf.set("fs.s3a.connection.ssl.enabled",
                 "true" if ep.startswith("https") else "false")
    ak = os.environ.get("AWS_ACCESS_KEY_ID")
    sk = os.environ.get("AWS_SECRET_ACCESS_KEY")
    if ak and sk:
        conf.set("fs.s3a.access.key", ak)
        conf.set("fs.s3a.secret.key", sk)
    yield f"{URI.rstrip('/')}/{uuid.uuid4().hex[:12]}"


def _build(g, tpl):
    return g.source("t", tpl).reduce(["k"], mx=("max", "v"), n=("count",))


def test_s3_commit_restore_roundtrip(spark, store_uri):
    """commit -> a fresh graph restores the committed snapshot and the
    continued stream matches an uninterrupted run, with state behind a
    real S3 API (multipart writes, list-after-write)."""
    tpl = spark.createDataFrame([], "k long, v long")
    batches = [[(1, 10), (2, 20)], [(1, 30)], [(2, 5), (3, 7)]]

    g0 = DifferentialGraph(spark)
    q0 = _build(g0, tpl)
    full = [g0.step(q0, t=spark.createDataFrame(b, tpl.schema))[0]
            .collect() for b in batches]

    g1 = DifferentialGraph(spark, state_dir=store_uri)
    q1 = _build(g1, tpl)
    for b in batches[:2]:
        g1.step(q1, t=spark.createDataFrame(b, tpl.schema))
    g1.commit()
    g1.restore_session_confs()

    g2 = DifferentialGraph(spark, state_dir=store_uri)
    q2 = _build(g2, tpl)
    (d3,) = g2.step(q2, t=spark.createDataFrame(batches[2], tpl.schema))

    def norm(rows):
        return sorted((r["k"], r["mx"], r["n"], r[DIFF]) for r in rows)
    assert norm(d3.collect()) == norm(full[2])
    g2.restore_session_confs()


def test_s3_meta_log_latest_wins(spark, store_uri):
    tpl = spark.createDataFrame([], "k long, v long")
    g = DifferentialGraph(spark, state_dir=store_uri)
    q = _build(g, tpl)
    for i in range(3):
        g.step(q, t=spark.createDataFrame([(1, i)], tpl.schema))
        g.commit()
    meta = HadoopMetaBackend(spark, store_uri).load()
    assert meta["t"] == g._t
    g.restore_session_confs()


def test_s3_commit_racing_concurrent_compaction(spark, store_uri):
    """uuid-unique version names keep concurrent publication collision-
    free on a store with NO atomic rename at all."""
    tpl = spark.createDataFrame([], "k long, v long")
    g = DifferentialGraph(spark, state_dir=store_uri)
    out = _build(g, tpl)
    (d0,) = g.step(out, t=spark.createDataFrame(
        [(i % 10, i) for i in range(200)], tpl.schema))
    d0.localCheckpoint(eager=True).count()
    g.commit()

    stop = threading.Event()
    errs: list = []

    def compactor():
        while not stop.is_set():
            try:
                for st in list(g._stores):
                    st.compact_versions()
            except Exception as e:      # pragma: no cover
                errs.append(e)
                return

    th = threading.Thread(target=compactor, daemon=True)
    th.start()
    try:
        for i in range(3):
            (d,) = g.step(out, t=spark.createDataFrame(
                [(i % 10, 1000 + i)], tpl.schema))
            d.localCheckpoint(eager=True).count()
            g.commit()
    finally:
        stop.set()
        th.join(timeout=120)
    assert not errs, errs
    g.restore_session_confs()

    g2 = DifferentialGraph(spark, state_dir=store_uri)
    out2 = _build(g2, tpl)
    (d2,) = g2.step(out2, t=spark.createDataFrame([(3, 10**9)], tpl.schema))
    rows = {(r["k"], r["mx"], r["n"], r[DIFF]) for r in d2.collect()}
    assert (3, 10**9, 21, 1) in rows, rows
    g2.restore_session_confs()


def test_s3_torn_version_invisible(spark, store_uri):
    """A version prefix without its _SUCCESS witness never resolves —
    written through the backend itself so the test also exercises
    multipart-upload visibility of the parquet files."""
    bk = HadoopStoreBackend(spark, f"{store_uri}/torn")
    df = spark.createDataFrame([(1, 2)], "a long, b long")

    def write_no_witness(dest: str) -> None:
        df.write.mode("overwrite").parquet(dest)

    # publish normally, then fabricate a torn sibling (no _SUCCESS)
    bk.publish(1, write_no_witness)
    vers = bk.list_versions()
    assert len(vers) == 1 and vers[0][0] == 1
    torn = f"{store_uri}/torn/v00000002-{uuid.uuid4().hex[:12]}"
    df.write.mode("overwrite").parquet(torn)
    # the parquet writer drops a _SUCCESS of its own at the job level —
    # remove it to model a torn writer that died before the witness
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(f"{torn}/_SUCCESS")
    fs = p.getFileSystem(conf)
    fs.delete(p, False)
    assert [v for v, _ in bk.list_versions()] == [1]
