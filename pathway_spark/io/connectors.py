"""Extended connector namespaces mirroring the reference's `pw.io.*` tree
(reference python/pathway/io/ — one subpackage per system).

Design rule: every connector that Spark can express natively gets the REAL
code path (format + options wiring, partitioned reads, streaming writes),
gated at runtime on the jar/service being reachable; pure-driver systems
(duckdb, http) are implemented outright. Nothing here shuffles: sources
produce partitioned scans, sinks stream via foreachBatch/format writers.
"""

from __future__ import annotations

import json as _json
from types import SimpleNamespace
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import Schema
from ..table import ID, Table


def _spark() -> SparkSession:
    from ..session import get_spark

    return get_spark()


def _finish(df: DataFrame, schema: type[Schema] | None) -> Table:
    if schema is not None:
        df = df.select(*[F.col(f.name).cast(f.dataType)
                         for f in schema.to_struct_type().fields])
    return Table(df)


def _gated(ns: str, why: str):
    def stub(*_a, **_kw):
        raise NotImplementedError(
            f"io.{ns} requires {why}; the Spark code path is exercised on "
            f"provisioned clusters (see pathway_spark/io/connectors.py)."
        )

    return stub


# ---------------------------------------------------------------- duckdb
# Fully functional: DuckDB runs in-process on the driver; Arrow is the
# exchange format both ways. Meant for control/dimension tables — big
# facts should land in parquet and be read by executors directly.

def _duckdb_read(query_or_table: str, *, database: str | None = None,
                 schema: type[Schema] | None = None,
                 spark: SparkSession | None = None) -> Table:
    import duckdb

    spark = spark or _spark()
    con = duckdb.connect(database or ":memory:")
    try:
        q = query_or_table
        if " " not in q.strip():
            q = f"SELECT * FROM {q}"
        arrow = con.execute(q).arrow()
    finally:
        con.close()
    df = spark.createDataFrame(arrow.to_pandas())
    return _finish(df, schema)


def _duckdb_write(table: Table, database: str, table_name: str, *,
                  mode: str = "create") -> None:
    import duckdb

    pdf = table.to_df().toPandas()  # noqa: F841 - registered by name below
    con = duckdb.connect(database)
    try:
        con.register("_pw_out", pdf)
        if mode == "create":
            con.execute(f"CREATE OR REPLACE TABLE {table_name} AS SELECT * FROM _pw_out")
        else:
            con.execute(f"INSERT INTO {table_name} SELECT * FROM _pw_out")
    finally:
        con.close()


duckdb_ns = SimpleNamespace(read=_duckdb_read, write=_duckdb_write)


# ---------------------------------------------------------------- http
# reference io/http: REST source (polling) + sink (per-row POST).

def _http_read(url: str, *, format: str = "json", schema: type[Schema] | None = None,
               headers: dict | None = None, spark: SparkSession | None = None,
               n_retries: int = 0, **_kw) -> Table:
    """One-shot GET → rows. json: object→1 row, array→N rows;
    plaintext: one row per line. (Streaming-poll variant: wrap in
    demo.replay / ConnectorSubject.)"""
    import urllib.request

    spark = spark or _spark()
    req = urllib.request.Request(url, headers=headers or {})
    last: Exception | None = None
    for _ in range(n_retries + 1):
        try:
            with urllib.request.urlopen(req) as resp:
                body = resp.read()
            last = None
            break
        except Exception as exc:  # retry then surface
            last = exc
    if last is not None:
        raise last
    if format == "json":
        data = _json.loads(body)
        rows = data if isinstance(data, list) else [data]
        st = schema.to_struct_type() if schema else None
        df = spark.createDataFrame(rows, st) if st else spark.createDataFrame(rows)
    else:
        lines = body.decode().splitlines()
        df = spark.createDataFrame([(ln,) for ln in lines], T.StructType(
            [T.StructField("data", T.StringType())]))
    return _finish(df, schema)


def _http_write(table: Table, url: str, *, method: str = "POST",
                headers: dict | None = None, **_kw) -> None:
    """Per-row JSON POST. Streaming: foreachBatch drives the same path per
    micro-batch. Rows serialize driver-side (sink fan-in is inherent to a
    single-endpoint REST sink — not a scale path by construction)."""
    import urllib.request

    hdrs = {"Content-Type": "application/json", **(headers or {})}

    def post_rows(df: DataFrame):
        for row in df.collect():
            d = row.asDict()
            d.pop(ID, None)
            req = urllib.request.Request(
                url, data=_json.dumps(d, default=str).encode(), method=method,
                headers=hdrs)
            urllib.request.urlopen(req).read()

    df = table.to_df()
    if df.isStreaming:
        return (df.writeStream
                .foreachBatch(lambda bdf, _bid: post_rows(bdf)).start())
    post_rows(table._df)


def _rest_connector(*args, **kwargs):
    # real inbound webserver source (reference io/http/_server.py:723)
    from .http_server import rest_connector as _rc

    return _rc(*args, **kwargs)


def _webserver(*args, **kwargs):
    from .http_server import PathwayWebserver

    return PathwayWebserver(*args, **kwargs)


class RetryPolicy:
    """reference io/http/_common.py RetryPolicy — fixed/exponential
    backoff for the http writer's per-request retries."""

    def __init__(self, n_retries: int = 3, backoff_factor: float = 2.0,
                 first_delay_ms: int = 100):
        self.n_retries = n_retries
        self.backoff_factor = backoff_factor
        self.first_delay_ms = first_delay_ms

    @classmethod
    def default(cls) -> "RetryPolicy":
        return cls()

    def delays_ms(self):
        d = self.first_delay_ms
        for _ in range(self.n_retries):
            yield d
            d = int(d * self.backoff_factor)


def _http_endpoint_docs(*args, **kwargs):
    from .http_server import EndpointDocumentation
    return EndpointDocumentation(*args, **kwargs)


def _http_endpoint_examples(*args, **kwargs):
    from .http_server import EndpointExamples
    return EndpointExamples(*args, **kwargs)


http = SimpleNamespace(
    read=_http_read, write=_http_write,
    rest_connector=_rest_connector, PathwayWebserver=_webserver,
    RetryPolicy=RetryPolicy,
    EndpointDocumentation=_http_endpoint_docs,
    EndpointExamples=_http_endpoint_examples,
)


# ---------------------------------------------------------------- null sink
# Fully functional: Spark's noop source — materializes the whole plan,
# writes nothing (exactly the reference's pw.io.null semantics).

def _null_write(table: Table, **_kw) -> None:
    df = table.to_df()
    if df.isStreaming:
        return df.writeStream.format("noop").start()
    df.write.format("noop").mode("overwrite").save()


null = SimpleNamespace(write=_null_write)


# ---------------------------------------------------------------- s3 / minio
# Real code path: s3a:// URIs + hadoop conf wiring; needs hadoop-aws jar
# at runtime (standard on real clusters, absent in this container).

class AwsCredentials:
    def __init__(self, access_key: str = "", secret_access_key: str = "",
                 region: str | None = None, endpoint: str | None = None):
        self.access_key = access_key
        self.secret_access_key = secret_access_key
        self.region = region
        self.endpoint = endpoint


def _apply_s3_conf(spark: SparkSession, creds: AwsCredentials | None):
    if creds is None:
        return
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    if creds.access_key:
        hconf.set("fs.s3a.access.key", creds.access_key)
    if creds.secret_access_key:
        hconf.set("fs.s3a.secret.key", creds.secret_access_key)
    if creds.endpoint:
        hconf.set("fs.s3a.endpoint", creds.endpoint)
        hconf.set("fs.s3a.path.style.access", "true")


def _s3_read(path: str, *, format: str = "csv", aws_credentials=None,
             schema: type[Schema] | None = None, mode: str = "static",
             spark: SparkSession | None = None, **kw) -> Table:
    from . import _fs_read

    spark = spark or _spark()
    _apply_s3_conf(spark, aws_credentials)
    uri = path if "://" in path else f"s3a://{path}"
    return _fs_read(uri, format, schema, mode, spark=spark, **kw)


def _s3_write(table: Table, path: str, *, format: str = "json",
              aws_credentials=None, **kw):
    from . import _write_table

    _apply_s3_conf(_spark(), aws_credentials)
    uri = path if "://" in path else f"s3a://{path}"
    return _write_table(table, uri, format, **kw)


s3 = SimpleNamespace(read=_s3_read, write=_s3_write, AwsCredentials=AwsCredentials)
s3_csv = SimpleNamespace(read=lambda path, **kw: _s3_read(path, format="csv", **kw))
minio = SimpleNamespace(
    read=lambda path, minio_settings=None, **kw: _s3_read(
        path, aws_credentials=minio_settings, **kw),
    write=lambda table, path, minio_settings=None, **kw: _s3_write(
        table, path, aws_credentials=minio_settings, **kw),
    MinIOSettings=AwsCredentials,
)


# ---------------------------------------------------------------- debezium
# Envelope parsing is real and unit-tested on static frames; the transport
# is the kafka source (jar-gated).

def parse_debezium(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Decode a Debezium JSON envelope into (op, before, after, ts_ms) with
    `_pw_diff` = -1 for deletes, +1 for creates/updates (reference
    io/debezium semantics: updates are retract+insert; Spark carries the
    final state, so updates surface as upserts)."""
    v = F.col(value_col).cast("string")
    payload = F.get_json_object(v, "$.payload")
    return df.select(
        F.get_json_object(payload, "$.op").alias("op"),
        F.get_json_object(payload, "$.before").alias("before"),
        F.get_json_object(payload, "$.after").alias("after"),
        F.get_json_object(payload, "$.ts_ms").cast("long").alias("ts_ms"),
    ).withColumn(
        "_pw_diff",
        F.when(F.col("op") == "d", F.lit(-1)).otherwise(F.lit(1)),
    )


def _debezium_read(rdkafka_settings: dict, topic_name: str, *,
                   schema: type[Schema] | None = None, mode: str = "streaming",
                   **kw) -> Table:
    from . import _kafka_read

    raw = _kafka_read(rdkafka_settings, topic_name, format="raw", mode=mode, **kw)
    out = parse_debezium(raw._df, "data")
    if schema is not None:
        st = schema.to_struct_type()
        cols = [F.from_json(F.col("after"), st).getField(f.name).alias(f.name)
                for f in st.fields]
        out = out.select(*cols, "_pw_diff")
    return Table(out)


debezium = SimpleNamespace(read=_debezium_read, parse=parse_debezium)


# ---------------------------------------------------------------- jdbc family
def _jdbc_ns(driver_hint: str):
    from . import _jdbc_read, _jdbc_write

    return SimpleNamespace(read=_jdbc_read, write=_jdbc_write)


clickhouse = _jdbc_ns("clickhouse")
questdb = _jdbc_ns("questdb")
mssql = _jdbc_ns("mssql")


# ------------------------------------------------- native-format connectors
# Real option plumbing; the datasource jar ships on real clusters.

def _format_read(fmt: str, jar: str):
    def read(*, schema: type[Schema] | None = None, mode: str = "static",
             spark: SparkSession | None = None, **options) -> Table:
        spark = spark or _spark()
        reader = (spark.readStream if mode == "streaming" else spark.read)
        try:
            df = reader.format(fmt).options(
                **{k: str(v) for k, v in options.items()}).load()
        except Exception as exc:
            raise NotImplementedError(
                f"{fmt} datasource unavailable (needs {jar}): {exc}") from exc
        return _finish(df, schema)

    return read


def _format_write(fmt: str, jar: str):
    def write(table: Table, **options) -> None:
        df = table.to_df()
        try:
            if df.isStreaming:
                return (df.writeStream.format(fmt)
                        .options(**{k: str(v) for k, v in options.items()})
                        .start())
            df.write.format(fmt).options(
                **{k: str(v) for k, v in options.items()}).mode("append").save()
        except Exception as exc:
            raise NotImplementedError(
                f"{fmt} datasource unavailable (needs {jar}): {exc}") from exc

    return write


mongodb = SimpleNamespace(
    read=_format_read("mongodb", "mongo-spark-connector"),
    write=_format_write("mongodb", "mongo-spark-connector"),
)
bigquery = SimpleNamespace(
    write=_format_write("bigquery", "spark-bigquery-connector"),
)
elasticsearch = SimpleNamespace(
    read=_format_read("org.elasticsearch.spark.sql", "elasticsearch-spark"),
    write=_format_write("org.elasticsearch.spark.sql", "elasticsearch-spark"),
)
dynamodb = SimpleNamespace(
    write=_format_write("dynamodb", "spark-dynamodb"),
)
kinesis = SimpleNamespace(
    read=_format_read("aws-kinesis", "spark-sql-kinesis"),
    write=_format_write("aws-kinesis", "spark-sql-kinesis"),
)
pubsub = SimpleNamespace(
    write=_format_write("pubsub", "spark-pubsub"),
)


# ---------------------------------------------------------- message buses
# No Spark datasource exists for the transport (the reference talks to
# these via its Rust connectors: src/connectors/data_storage/nats.rs,
# mqtt.rs, rabbitmq.rs); the TRANSPORT stays gated, but the message
# envelope layer — raw (key, payload, topic) records → typed rows — is
# real, shared with the kafka path, and unit-tested offline. A bridge
# (e.g. nats-kafka) or a custom v2 datasource plugs into the same parse.

def parse_message_envelope(df, schema, *, format: str = "json",
                           value_col: str = "value", key_col: str | None = None,
                           topic_col: str | None = None,
                           include_metadata: bool = False) -> Table:
    """Decode a frame of raw bus messages into a typed Table.

    Reference semantics (nats.rs / mqtt.rs / rabbitmq.rs payload
    handling): ``json`` parses the payload against the schema (missing
    fields -> NULL, bad documents -> all-NULL row, matching the
    reference's error-value model); ``raw`` yields a single ``data``
    binary column; ``plaintext`` yields ``data`` string. Metadata
    (key/topic) is carried through when requested. Works identically on
    batch and streaming frames (whole-stage codegen from_json — no UDF).
    """
    v = F.col(value_col)
    if format == "json":
        struct = schema.to_struct_type()
        parsed = df.withColumn("__pw_parsed",
                               F.from_json(v.cast("string"), struct))
        cols = [F.col(f"__pw_parsed.{f.name}").alias(f.name)
                for f in struct.fields]
    elif format == "raw":
        cols = [v.cast("binary").alias("data")]
    elif format == "plaintext":
        cols = [v.cast("string").alias("data")]
    else:
        raise ValueError(f"unknown message format: {format!r}")
    if include_metadata:
        if key_col and key_col in df.columns:
            cols.append(F.col(key_col).cast("string").alias("_pw_key"))
        if topic_col and topic_col in df.columns:
            cols.append(F.col(topic_col).cast("string").alias("_pw_topic"))
    sel = df.select(*cols) if format != "json" else parsed.select(*cols)
    return Table(sel.withColumn(ID, F.xxhash64(*[F.col(c) for c in sel.columns])))


def _bus_ns(name: str, bridge: str) -> SimpleNamespace:
    return SimpleNamespace(
        read=_gated(f"{name}.read", bridge),
        write=_gated(f"{name}.write", bridge),
        parse=parse_message_envelope,
    )


nats = _bus_ns("nats", "a NATS bridge (e.g. nats-kafka)")
mqtt = _bus_ns("mqtt", "an MQTT→Kafka bridge")
rabbitmq = _bus_ns("rabbitmq", "a RabbitMQ bridge")
# object-store sync connectors — real incremental list→diff→download
# protocol with the hosted transport injected (see io/filesync.py)
from .filesync import (  # noqa: E402
    GDriveClient,
    LocalDirClient,
    SharePointClient,
    SyncClient,
    gdrive_read as _gdrive_read,
    pyfilesystem_read as _pyfilesystem_read,
    sharepoint_read as _sharepoint_read,
)

gdrive = SimpleNamespace(read=_gdrive_read, GDriveClient=GDriveClient)
sharepoint = SimpleNamespace(read=_sharepoint_read,
                             SharePointClient=SharePointClient)


def _airbyte_read(source: Any = None, *, streams: list[str] | None = None,
                  spark: SparkSession | None = None, **_kw) -> Table:
    """Airbyte-protocol consumption (reference python/pathway/io/airbyte).

    The protocol is public JSONL: ``{"type": "RECORD", "record":
    {"stream", "data", "emitted_at"}}`` interleaved with ``STATE``
    messages. ``source`` may be a path to a protocol capture, an
    iterable of lines, or a zero-arg callable returning one (an injected
    connector runner); actually RUNNING a connector needs a PyAirbyte /
    docker runtime, which this container lacks."""
    if source is None:
        raise NotImplementedError(
            "io.airbyte.read requires a local Airbyte/PyAirbyte runtime "
            "to execute connectors; pass a protocol-JSONL path, line "
            "iterable, or runner callable to consume captured output.")
    if callable(source):
        lines = source()
    elif isinstance(source, str):
        lines = open(source, encoding="utf-8")
    else:
        lines = source
    rows = []
    try:
        for line in lines:
            line = line.strip()
            if not line:
                continue
            msg = _json.loads(line)
            if msg.get("type") != "RECORD":
                continue  # STATE/LOG/TRACE are control-plane
            rec = msg["record"]
            if streams and rec.get("stream") not in streams:
                continue
            rows.append((rec.get("stream"), _json.dumps(rec.get("data")),
                         int(rec.get("emitted_at", 0))))
    finally:
        if hasattr(lines, "close"):
            lines.close()
    spark = spark or _spark()
    df = spark.createDataFrame(
        rows, "stream string, data string, emitted_at long")
    return Table(df.withColumn(ID, F.xxhash64("stream", "data", "emitted_at")))


airbyte = SimpleNamespace(read=_airbyte_read)
logstash = SimpleNamespace(write=lambda table, endpoint, **kw: _http_write(table, endpoint, **kw))
def _send_slack_alert(message: str, slack_channel_id: str, slack_token: str):
    """reference io/slack/__init__.py send_slack_alert — one-shot alert."""
    import json as _json
    import urllib.request

    req = urllib.request.Request(
        "https://slack.com/api/chat.postMessage",
        data=_json.dumps({"channel": slack_channel_id,
                          "text": message}).encode(),
        headers={"Authorization": f"Bearer {slack_token}",
                 "Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.read()


slack = SimpleNamespace(
    send_slack_alert=_send_slack_alert,
    send_alerts=lambda table, slack_channel_id, slack_token: _http_write(
        table, "https://slack.com/api/chat.postMessage",
        headers={"Authorization": f"Bearer {slack_token}"}),
)
pyfilesystem = SimpleNamespace(read=_pyfilesystem_read,
                               LocalDirClient=LocalDirClient)

# vector-store sinks — real foreachPartition/foreachBatch REST writers
# (payloads per the public service APIs; offline-tested against a local
# HTTP fixture). See io/vector_store.py for the scale design.
from .vector_store import (  # noqa: E402
    chroma_write as _chroma_write,
    leann_write as _leann_write,
    milvus_write as _milvus_write,
    pinecone_write as _pinecone_write,
    qdrant_write as _qdrant_write,
    weaviate_write as _weaviate_write,
)

chroma = SimpleNamespace(write=_chroma_write)
leann = SimpleNamespace(write=_leann_write)
milvus = SimpleNamespace(write=_milvus_write)
pinecone = SimpleNamespace(write=_pinecone_write)
qdrant = SimpleNamespace(write=_qdrant_write)
weaviate = SimpleNamespace(write=_weaviate_write)
