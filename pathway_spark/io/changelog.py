"""Retraction-envelope output connectors: carry the diff stream to sinks.

The reference threads the diff column through every output formatter
(`src/connectors/mod.rs:57-58` SPECIAL_FIELD_TIME/SPECIAL_FIELD_DIFF;
`src/connectors/data_format/mod.rs:40-48`): data-lake writers append
`time`/`diff` columns (`src/connectors/data_storage/data_lake/`), the
postgres/mssql/duckdb snapshot writers require them, and the Kafka
formatters emit Debezium-style envelopes.  Spark translation: a
changelog DataFrame (`_pw_diff`/`_pw_time` columns, as produced by the
differential engine) maps to one of three wire envelopes and back:

- ``pathway``  — data columns + ``time``/``diff`` longs (the reference's
  special output fields, weight-preserving);
- ``cdf``      — Delta-CDF style ``_change_type`` (insert/delete) +
  ``_commit_version``; |weight| > 1 replicates rows, so any CDF-aware
  reader integrates correctly;
- ``debezium`` — one JSON ``value`` string per row
  (``payload.op``/``payload.after``/``payload.ts_ms``), parseable by
  :func:`pathway_spark.io.connectors.parse_debezium`.

Writes are plain appends — each micro-batch's delta lands as an
immutable append, so the sink is a valid event log at every prefix and
the writer needs no transactional upsert support (the 100 TB path:
blind appends partition-parallel, compaction is the reader's
`merge_streams_to_table`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from types import SimpleNamespace

from ..streaming.differential import DIFF, TIME, as_delta, consolidate
from ..table import Table


def _data_cols(df: DataFrame) -> list[str]:
    return [c for c in df.columns
            if c not in (DIFF, TIME, "time", "diff", "_change_type",
                         "_commit_version")]


def _replicate(df: DataFrame) -> DataFrame:
    """One row per unit of |weight| (keeps the sign in `__sgn`).
    Weight-0 rows are dropped FIRST: `F.sequence(1, 0)` is the
    descending [1, 0] — not empty — so an unconsolidated changelog
    carrying a net-zero row would otherwise emit two 'insert'
    envelope rows (net weight +2) for a row whose true weight is 0."""
    return (df.filter(F.col(DIFF) != 0)
              .withColumn("__sgn", F.signum(DIFF).cast("long"))
              .withColumn("__n", F.abs(F.col(DIFF)))
              .withColumn("__i", F.explode(F.sequence(
                  F.lit(1), F.col("__n"))))
              .drop("__n", "__i", DIFF))


def to_envelope(changelog: DataFrame, envelope: str = "pathway"
                ) -> DataFrame:
    d = as_delta(changelog)
    cols = _data_cols(d)
    if envelope == "pathway":
        return d.select(*cols,
                        F.col(TIME).cast("long").alias("time"),
                        F.col(DIFF).cast("long").alias("diff"))
    if envelope == "cdf":
        r = _replicate(d)
        return r.select(
            *cols,
            F.when(F.col("__sgn") < 0, F.lit("delete"))
             .otherwise(F.lit("insert")).alias("_change_type"),
            F.col(TIME).cast("long").alias("_commit_version"))
    if envelope == "debezium":
        r = _replicate(d)
        payload = F.to_json(F.struct(
            F.when(F.col("__sgn") < 0, F.lit("d"))
             .otherwise(F.lit("c")).alias("op"),
            F.to_json(F.struct(*[F.col(c) for c in cols])).alias("after"),
            F.col(TIME).cast("long").alias("ts_ms")))
        return r.select(F.to_json(F.struct(
            payload.alias("payload"))).alias("value"))
    raise ValueError(f"unknown envelope: {envelope!r}")


def from_envelope(df: DataFrame, envelope: str = "pathway",
                  schema=None) -> DataFrame:
    """Inverse of `to_envelope` — restores `_pw_diff`/`_pw_time`.
    `schema` (StructType or DDL string) is required for `debezium`
    (the payload is opaque JSON)."""
    if envelope == "pathway":
        cols = _data_cols(df)
        return df.select(*cols,
                         F.col("diff").cast("long").alias(DIFF),
                         F.col("time").cast("long").alias(TIME))
    if envelope == "cdf":
        cols = _data_cols(df)
        return df.select(
            *cols,
            F.when(F.col("_change_type") == "delete", F.lit(-1))
             .otherwise(F.lit(1)).cast("long").alias(DIFF),
            F.col("_commit_version").cast("long").alias(TIME))
    if envelope == "debezium":
        if schema is None:
            raise ValueError("debezium envelope needs schema= to decode")
        if isinstance(schema, str):
            from pyspark.sql.types import _parse_datatype_string
            schema = _parse_datatype_string(schema)
        payload = F.get_json_object(F.col("value"), "$.payload")
        after = F.from_json(
            F.get_json_object(payload, "$.after"), schema)
        return df.select(
            *[after.getField(f.name).alias(f.name)
              for f in schema.fields],
            F.when(F.get_json_object(payload, "$.op") == "d",
                   F.lit(-1)).otherwise(F.lit(1))
             .cast("long").alias(DIFF),
            F.get_json_object(payload, "$.ts_ms")
             .cast("long").alias(TIME))
    raise ValueError(f"unknown envelope: {envelope!r}")


def write(changelog: DataFrame, path: str, *, format: str = "parquet",
          envelope: str = "pathway", **options) -> None:
    """Append one (or many) batches of a retraction stream to a sink.
    Call per micro-batch (e.g. from `subscribe_differential`) or once
    with a whole changelog — appends compose either way."""
    env = to_envelope(changelog, envelope)
    w = env.write.mode("append").options(**options)
    if format == "parquet":
        w.parquet(path)
    elif format == "json":
        w.json(path)
    elif format == "csv":
        w.option("header", True).csv(path)
    else:                        # delta/iceberg ride the jar-gated path
        w.format(format).save(path)


def read(path: str, *, format: str = "parquet",
         envelope: str = "pathway", schema=None,
         spark: SparkSession | None = None) -> DataFrame:
    spark = spark or SparkSession.active()
    if format == "parquet":
        df = spark.read.parquet(path)
    elif format == "json":
        df = spark.read.json(path)
    elif format == "csv":
        df = spark.read.option("header", True).option(
            "inferSchema", True).csv(path)
    else:
        df = spark.read.format(format).load(path)
    return from_envelope(df, envelope, schema=schema)


def merge_streams_to_table(changelog: DataFrame) -> Table:
    """Fold a (re-read) retraction stream to its final snapshot — the
    reader-side compaction matching the blind-append writer.  Weight-
    aware: Σ diffs per row value, rows with positive net multiplicity
    replicated."""
    from ..streaming.differential import _expand
    d = changelog.drop(TIME) if TIME in changelog.columns else changelog
    return Table(_expand(consolidate(d)).drop(DIFF))


def subscribe_write(stream, build, path, *, format: str = "parquet",
                    envelope: str = "pathway", **subscribe_kw):
    """End-to-end retraction pipeline to a sink: feed a live stream
    through a differential graph (`build(source_node)`), append each
    emitted delta to `path` in the chosen envelope.  The sink is a
    valid changelog at every prefix; `read` + `merge_streams_to_table`
    recover the snapshot.  Returns the StreamingQuery."""
    from ..streaming import FrameSink, subscribe_differential

    return subscribe_differential(
        stream, build,
        FrameSink(lambda d, t: write(d, path, format=format,
                                     envelope=envelope)),
        **subscribe_kw)


changelog = SimpleNamespace(
    write=write, read=read, to_envelope=to_envelope,
    from_envelope=from_envelope,
    merge_streams_to_table=merge_streams_to_table,
    subscribe_write=subscribe_write)
