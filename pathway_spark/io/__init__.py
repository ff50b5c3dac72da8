"""Connectors — `pw.io.*` surface (reference `python/pathway/io/`).

Every `read` takes mode="static"|"streaming" (io/csv/__init__.py:23):
static -> `spark.read`, streaming -> `spark.readStream` (file-source
streaming gives the reference's "watch a directory" semantics).
`autocommit_duration_ms` maps to the trigger interval, applied at
`write`/`subscribe` time (SURVEY §2.1).

Connectors needing jars absent from this environment (kafka, delta,
iceberg, jdbc drivers) are real code paths behind capability checks —
they raise a clear error locally and work on a provisioned cluster.
"""

from __future__ import annotations

import dataclasses as _dc
from types import SimpleNamespace
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import Schema
from ..table import ID, Table


def _reader(spark: SparkSession, mode: str):
    return spark.readStream if mode == "streaming" else spark.read


def _finish(df: DataFrame, schema: type[Schema] | None) -> Table:
    if schema is not None:
        pk = schema.primary_key_columns()
        if pk:
            return Table.from_spark(df, id_columns=pk)
    return Table.from_spark(df)


def _spark() -> SparkSession:
    from ..session import get_spark
    return get_spark()


# ---------------------------------------------------------------- fs family
def _fs_read(path: str, format: str, schema: type[Schema] | None = None,
             mode: str = "static", csv_settings: dict | None = None,
             with_metadata: bool = False, spark: SparkSession | None = None,
             **options: Any) -> Table:
    spark = spark or _spark()
    # reference-only kwargs (engine commit pacing, backlog, debug seeds)
    # have no Spark counterpart: micro-batch triggers pace commits, and
    # backpressure is the scheduler's job. Accepted and dropped.
    for ref_only in ("autocommit_duration_ms", "name", "max_backlog_size",
                     "debug_data", "persistent_id"):
        options.pop(ref_only, None)
    # object_pattern maps exactly onto Spark's pathGlobFilter
    pattern = options.pop("object_pattern", None)
    if pattern and pattern != "*":
        options["pathGlobFilter"] = pattern
    json_field_paths = options.pop("json_field_paths", None)
    r = _reader(spark, mode)
    st = schema.to_struct_type() if schema is not None else None
    if format in ("csv", "dsv"):
        if hasattr(csv_settings, "to_spark_options"):
            csv_settings = csv_settings.to_spark_options()
        opts = {"header": "true", **(csv_settings or {}), **options}
        df = (r.schema(st) if st is not None else r.option("inferSchema", "true")) \
            .options(**opts).csv(path)
    elif format in ("json", "jsonlines"):
        if json_field_paths:
            # reference json_field_paths: column ← JSONPointer into the
            # raw object. Read lines raw, extract with get_json_object.
            raw = r.options(**options).text(path)
            cols = []
            for name, ptr in json_field_paths.items():
                jpath = "$" + ptr.replace("/", ".")
                c = F.get_json_object(F.col("value"), jpath)
                if st is not None and name in [f.name for f in st.fields]:
                    c = c.cast(st[name].dataType)
                cols.append(c.alias(name))
            if st is not None:
                mapped = set(json_field_paths)
                for f_ in st.fields:
                    if f_.name not in mapped:
                        cols.append(
                            F.get_json_object(F.col("value"), f"$.{f_.name}")
                            .cast(f_.dataType).alias(f_.name))
            df = raw.select(*cols)
        else:
            df = (r.schema(st) if st is not None else r).options(**options).json(path)
    elif format == "parquet":
        df = (r.schema(st) if st is not None else r).options(**options).parquet(path)
    elif format in ("plaintext", "raw"):
        df = r.text(path).withColumnRenamed("value", "data")
    elif format in ("plaintext_by_file", "plaintext_by_object"):
        # one row per file, full contents decoded as UTF-8
        df = r.format("binaryFile").load(path).select(
            F.decode(F.col("content"), "UTF-8").alias("data"),
            F.col("path"), F.col("length"), F.col("modificationTime"),
        )
    elif format == "binary":
        df = r.format("binaryFile").load(path).select(
            F.col("content").alias("data"), F.col("path"), F.col("length"),
            F.col("modificationTime"),
        )
    elif format == "only_metadata":
        df = r.format("binaryFile").load(path).select(
            F.col("path"), F.col("length"), F.col("modificationTime"),
        )
    else:
        raise ValueError(f"unknown format {format!r}")
    if with_metadata and format not in ("binary", "only_metadata"):
        df = df.withColumn("_metadata_path", F.input_file_name())
    return _finish(df, schema)


def _write_table(table: Table, path: str, format: str, mode_: str = "append", **options):
    df = table.to_df()
    if df.isStreaming:
        return (df.writeStream.format(format).options(**options)
                .option("checkpointLocation", options.get("checkpoint", path + "/_chk"))
                .start(path))
    w = df.write.mode(options.pop("savemode", "overwrite"))
    getattr(w.options(**options), "parquet" if format == "parquet" else format)(path)
    return None


fs = SimpleNamespace(
    read=lambda path, format="csv", **kw: _fs_read(path, format, **kw),
    write=lambda table, filename, format="json", **kw: _write_table(table, filename, format, **kw),
)

csv = SimpleNamespace(
    read=lambda path, schema=None, mode="static", csv_settings=None, **kw:
        _fs_read(path, "csv", schema, mode, csv_settings, **kw),
    write=lambda table, filename, **kw: _write_table(table, filename, "csv", **kw),
)

jsonlines = SimpleNamespace(
    read=lambda path, schema=None, mode="static", **kw: _fs_read(path, "json", schema, mode, **kw),
    write=lambda table, filename, **kw: _write_table(table, filename, "json", **kw),
)

plaintext = SimpleNamespace(
    read=lambda path, mode="static", **kw: _fs_read(path, "plaintext", None, mode, **kw),
)

def _write_bucketed(table: Table, name: str, bucket_by: list[str], *,
                    num_buckets: int = 64, sort_by: list[str] | None = None) -> None:
    """Bucketed managed table — co-locates join/agg keys at write time so
    later equi-joins on `bucket_by` read both sides pre-partitioned and
    skip the shuffle entirely (the 100 TB repeated-join pattern)."""
    w = table.to_df().write.mode("overwrite").bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(name)


def _read_table(name: str, spark: SparkSession | None = None) -> Table:
    spark = spark or _spark()
    return Table.from_spark(spark.table(name))


parquet = SimpleNamespace(
    read=lambda path, schema=None, mode="static", **kw: _fs_read(path, "parquet", schema, mode, **kw),
    write=lambda table, filename, **kw: _write_table(table, filename, "parquet", **kw),
    write_bucketed=_write_bucketed,
    read_table=_read_table,
)


# ------------------------------------------------------------ kafka family
def _kafka_read(rdkafka_settings: dict, topic: str | None = None, *, format: str = "json",
                schema: type[Schema] | None = None, mode: str = "streaming",
                spark: SparkSession | None = None, **kw) -> Table:
    """reference io/kafka — maps to Spark's native kafka source. Requires the
    spark-sql-kafka package on the classpath (provisioned clusters)."""
    spark = spark or _spark()
    servers = rdkafka_settings.get("bootstrap.servers", "")
    r = _reader(spark, mode).format("kafka") \
        .option("kafka.bootstrap.servers", servers) \
        .option("subscribe", topic or rdkafka_settings.get("topic", ""))
    for opt, val in kw.items():        # startingOffsets, maxOffsetsPerTrigger...
        r = r.option(opt, val)
    df = r.load()
    val = F.col("value").cast("string")
    if format == "json" and schema is not None:
        df = df.select(F.from_json(val, schema.to_struct_type()).alias("v")).select("v.*")
    elif format == "raw":
        df = df.select(F.col("value").alias("data"))
    else:
        df = df.select(val.alias("data"))
    return _finish(df, schema)


def _kafka_write(table: Table, rdkafka_settings: dict, topic_name: str, *,
                 format: str = "json", **kw):
    """Serialize rows to JSON and write through Spark's kafka sink (real
    code path; needs spark-sql-kafka on the classpath at runtime)."""
    df = table.to_df()
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    servers = rdkafka_settings.get("bootstrap.servers", "")
    try:
        if payload.isStreaming:
            return (payload.writeStream.format("kafka")
                    .option("kafka.bootstrap.servers", servers)
                    .option("topic", topic_name)
                    .option("checkpointLocation", kw.get("checkpoint", "/tmp/pw_kafka_chk"))
                    .start())
        payload.write.format("kafka") \
            .option("kafka.bootstrap.servers", servers) \
            .option("topic", topic_name).save()
    except Exception as e:
        raise NotImplementedError(f"kafka sink unavailable: {e}") from e


kafka = SimpleNamespace(read=_kafka_read, write=_kafka_write)
redpanda = kafka


def _unavailable(name: str):
    raise NotImplementedError(
        f"io.{name} requires connector jars/services not present in this "
        f"environment; the code path is exercised on provisioned clusters."
    )


# ------------------------------------------------------------ lakehouse / jdbc
def _deltalake_read(path, schema=None, mode="static", spark=None, **kw) -> Table:
    spark = spark or _spark()
    try:
        df = _reader(spark, mode).format("delta").load(path)
    except Exception as e:  # delta jars absent locally
        raise NotImplementedError(f"delta format unavailable: {e}") from e
    return _finish(df, schema)


deltalake = SimpleNamespace(
    read=_deltalake_read,
    write=lambda table, path, **kw: _write_table(table, path, "delta", **kw),
)
iceberg = SimpleNamespace(
    read=lambda *a, **kw: _unavailable("iceberg.read"),
    write=lambda *a, **kw: _unavailable("iceberg.write"),
)


def _jdbc_read(url: str, table_name: str, *, schema=None, spark=None,
               partition_column: str | None = None, num_partitions: int = 32, **options) -> Table:
    """postgres/mysql/... batch read via Spark JDBC; `partition_column`
    enables parallel range reads (scale path for large tables)."""
    spark = spark or _spark()
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table_name)
    if partition_column:
        bounds = spark.read.format("jdbc").option("url", url).option(
            "query", f"select min({partition_column}) mn, max({partition_column}) mx from {table_name}"
        ).load().collect()[0]
        r = (r.option("partitionColumn", partition_column)
             .option("numPartitions", str(num_partitions))
             .option("lowerBound", str(bounds["mn"])).option("upperBound", str(bounds["mx"])))
    for k, v in options.items():
        r = r.option(k, v)
    return _finish(r.load(), schema)


def _jdbc_write(table: Table, url: str, table_name: str, *,
                mode: str = "append", max_batch_size: int = 10_000,
                **options) -> None:
    """postgres/mysql/sqlite/... write via Spark JDBC (df.write.jdbc);
    the driver jar is resolved at runtime. Batched inserts, one
    connection per partition — the distributed write path."""
    df = table.to_df()
    w = (df.write.format("jdbc").mode(mode)
         .option("url", url).option("dbtable", table_name)
         .option("batchsize", str(max_batch_size)))
    for k, v in options.items():
        w = w.option(k, v)
    w.save()


postgres = SimpleNamespace(read=_jdbc_read, write=_jdbc_write)
mysql = SimpleNamespace(read=_jdbc_read, write=_jdbc_write)
sqlite = SimpleNamespace(read=_jdbc_read, write=_jdbc_write)


# ------------------------------------------------------------ python / debug
class ConnectorSubject:
    """reference io/python/__init__.py:49 — push-based custom source.
    Batch shim: `next(**values)` accumulates rows; `to_table` materializes.
    Streaming: use Spark 4 python streaming data source API."""

    def __init__(self):
        self._rows: list[dict] = []

    def next(self, **values):
        self._rows.append(values)

    def next_json(self, obj):
        self._rows.append(dict(obj))

    def next_str(self, s):
        self._rows.append({"data": s})

    def next_bytes(self, b):
        self._rows.append({"data": b})

    def run(self):  # override in subclass
        raise NotImplementedError

    def to_table(self, schema: type[Schema], spark: SparkSession | None = None) -> Table:
        spark = spark or _spark()
        self.run()
        df = spark.createDataFrame(self._rows, schema.to_struct_type())
        return _finish(df, schema)


python = SimpleNamespace(
    read=lambda subject, schema, **kw: subject.to_table(schema),
    ConnectorSubject=ConnectorSubject,
)


@_dc.dataclass(frozen=True)
class SynchronizedColumn:
    """reference io/_synchronization.py:20 — one column's settings in a
    synchronization group. ``priority``/``idle_duration`` are accepted for
    API parity; Spark's watermark mechanism has no per-source priority,
    so they are recorded but not enforced (documented divergence)."""

    column: object  # ColumnReference or column name
    priority: int = 0
    idle_duration: object = None
    table: "Table | None" = None


_SYNC_GROUPS: dict[str, list] = {}


def register_input_synchronization_group(*columns, max_difference,
                                         name: str = "default"):
    """reference io/_synchronization.py:59 — keep a set of input sources'
    time-like columns within ``max_difference`` of each other.

    Spark mapping: the engine-native equivalent is event-time watermark
    alignment — each streaming input gets ``withWatermark(col,
    max_difference)`` and the session is pinned to
    ``multipleWatermarkPolicy=min`` — note this is a SESSION-WIDE conf
    mutation affecting every multi-watermark query in the session, not
    just this group — so the global event-time frontier is
    the MINIMUM across the group: a lagging source holds back every
    other source's window/join emission, which is the reference
    guarantee ("continue reading from the other sources only after the
    lagging one has caught up"). Batch tables validate the column and
    pass through unchanged.

    Divergence from the reference (documented): our tables are
    immutable, so the synchronized tables are RETURNED (use them
    downstream) instead of the registration mutating the input graph.

    Accepts ``(table, column_name)`` tuples or ``SynchronizedColumn``
    with ``table=`` set; returns the tables in argument order.
    """
    import datetime as _dt

    if len(columns) < 2:
        raise ValueError("a synchronization group needs at least two columns")
    if isinstance(max_difference, _dt.timedelta):
        delay = f"{max_difference.total_seconds()} seconds"
    elif isinstance(max_difference, (int, float)):
        # int columns carry epoch-us in this engine's temporal operators
        delay = f"{max_difference / 1_000_000} seconds"
    else:
        delay = str(max_difference)

    out, group = [], []
    for c in columns:
        if isinstance(c, SynchronizedColumn):
            table, col = c.table, c.column
        elif isinstance(c, tuple):
            table, col = c
        else:
            raise TypeError(
                "pass (table, column_name) tuples or SynchronizedColumn"
                " with table=… — bare column references carry no table"
                " in this engine"
            )
        col_name = getattr(col, "_name", col)
        df = table._df
        if col_name not in df.columns:
            raise ValueError(f"no column {col_name!r} in synchronized table")
        if df.isStreaming:
            df.sparkSession.conf.set(
                "spark.sql.streaming.multipleWatermarkPolicy", "min"
            )
            ts = F.col(col_name)
            if dict(df.dtypes)[col_name] in ("bigint", "int"):
                # epoch-us long -> timestamp for the watermark clock.
                # The helper column is dropped right away: the
                # EventTimeWatermark node stays in the plan (it drives
                # the global frontier), and the returned schema matches
                # the input exactly.
                df = (df.withColumn("__pw_sync_ts", F.timestamp_micros(ts))
                        .withWatermark("__pw_sync_ts", delay)
                        .drop("__pw_sync_ts"))
            else:
                df = df.withWatermark(col_name, delay)
        group.append((col_name, delay))
        out.append(Table(df))
    _SYNC_GROUPS[name] = group
    return tuple(out)


def subscribe(table: Table, on_change, on_time_end=None, on_end=None):
    """reference io/_subscribe.py:17 — per-row callbacks.

    Batch: one pass, every row is an insert at time 0. Streaming:
    foreachBatch drives the same callbacks per micro-batch."""
    df = table._df
    if df.isStreaming:
        def batch_fn(bdf: DataFrame, batch_id: int):
            # toLocalIterator: one partition in driver memory at a time —
            # per-row callbacks are inherently driver-side (same contract
            # as the reference), but the batch need not be
            for row in bdf.toLocalIterator():
                d = row.asDict()
                key = d.pop(ID, None)
                on_change(key=key, row=d, time=batch_id, is_addition=True)
            if on_time_end:
                on_time_end(batch_id)

        q = df.writeStream.foreachBatch(batch_fn).start()
        return q
    for row in df.toLocalIterator():
        d = row.asDict()
        key = d.pop(ID, None)
        on_change(key=key, row=d, time=0, is_addition=True)
    if on_time_end:
        on_time_end(0)
    if on_end:
        on_end()
    return None


# ---------------------------------------------------------------- extended
# connector namespaces (reference python/pathway/io/* tree) — real Spark
# code paths where the engine can express them, jar/service-gated stubs
# elsewhere. See connectors.py for the per-system notes.
from .connectors import (  # noqa: E402,F401
    airbyte, bigquery, chroma, clickhouse, debezium, dynamodb,
    elasticsearch, gdrive, http, kinesis, leann, logstash, milvus, minio,
    mongodb, mqtt, mssql, nats, null, pinecone, pubsub, pyfilesystem,
    qdrant, questdb, rabbitmq, s3, s3_csv, sharepoint, slack, weaviate,
)
from .connectors import duckdb_ns as duckdb  # noqa: E402,F401
from .changelog import changelog  # noqa: E402,F401  (retraction envelopes)


@_dc.dataclass
class CsvParserSettings:
    """CSV parser settings (reference `io/_utils.py:197`) — mapped onto
    the Spark csv reader options by `fs.read(format="csv")`."""

    delimiter: str = ","
    quote: str = '"'
    escape: str | None = None
    enable_double_quote_escapes: bool = True
    enable_quoting: bool = True
    comment_character: str | None = None

    def to_spark_options(self) -> dict:
        opts = {"sep": self.delimiter, "quote": self.quote if self.enable_quoting else ""}
        if self.escape is not None:
            opts["escape"] = self.escape
        elif self.enable_double_quote_escapes:
            opts["escape"] = '"'
        if self.comment_character:
            opts["comment"] = self.comment_character
        return opts


@_dc.dataclass
class TLSSettings:
    """TLS settings for encrypted connectors (reference
    `internals/_io_helpers.py:18`) — carried into JDBC/kafka option maps
    by the respective connectors."""

    mode: str = "prefer"
    root_cert_path: str | None = None
    client_cert_path: str | None = None
    client_key_path: str | None = None

    def to_jdbc_params(self) -> dict:
        p = {"sslmode": self.mode}
        if self.root_cert_path:
            p["sslrootcert"] = self.root_cert_path
        if self.client_cert_path:
            p["sslcert"] = self.client_cert_path
        if self.client_key_path:
            p["sslkey"] = self.client_key_path
        return p
