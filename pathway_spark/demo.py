"""`pw.demo` — stream generators for examples/tests.

Reference: `python/pathway/demo/__init__.py` (`range_stream` 118,
`noisy_linear` 165, `generate_custom_stream` 29, `replay_csv` 212).

Static mode materializes the same rows as a batch table; streaming mode
uses the `rate` source (range/noisy/custom) or file-watch with
`maxFilesPerTrigger` (replay_csv) so replays are deterministic.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import functions as F

from .schema import Schema
from .table import ID, Table


def _spark():
    from .session import get_spark
    return get_spark()


def range_stream(nb_rows: int = 30, offset: int = 0, *, mode: str = "static",
                 input_rate: float = 1.0, spark=None) -> Table:
    """demo/__init__.py:118 — single `value` column 0+offset..nb_rows+offset."""
    spark = spark or _spark()
    if mode == "static":
        df = spark.range(offset, offset + nb_rows).select(F.col("id").alias("value"))
        return Table.from_spark(df, id_columns=["value"])
    df = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", max(1, int(input_rate)))
        .load()
        .select((F.col("value") + F.lit(offset)).alias("value"))
    )
    return Table(df.withColumn(ID, F.xxhash64("value")))


def noisy_linear(nb_rows: int = 10, *, mode: str = "static",
                 input_rate: float = 1.0, spark=None) -> Table:
    """demo/__init__.py:165 — (x, y≈x) with deterministic hash noise."""
    t = range_stream(nb_rows, mode=mode, input_rate=input_rate, spark=spark)
    noise = (F.pmod(F.xxhash64(F.col("value")), F.lit(1000)) / 1000.0 - 0.5)
    df = t._df.select(
        F.col(ID),
        F.col("value").cast("double").alias("x"),
        (F.col("value") + noise).alias("y"),
    )
    return Table(df)


def generate_custom_stream(value_generators: dict[str, Callable[[int], object]],
                           *, schema: type[Schema], nb_rows: int = 10,
                           mode: str = "static", input_rate: float = 1.0,
                           spark=None) -> Table:
    """demo/__init__.py:29 — per-column python generators over row index.

    Static: rows built on the driver (bounded). Streaming: a rate source
    drives the index and generators run in a pandas UDF."""
    spark = spark or _spark()
    if mode == "static":
        rows = [
            tuple(gen(i) for gen in value_generators.values())
            for i in range(nb_rows)
        ]
        df = spark.createDataFrame(rows, schema.to_struct_type())
        pk = schema.primary_key_columns()
        return Table.from_spark(df, id_columns=pk or None)
    import pandas as pd

    base = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", max(1, int(input_rate)))
        .load()
    )
    cols = []
    for name, gen in value_generators.items():
        dtype = schema.to_struct_type()[name].dataType

        def make(gen=gen):
            @F.pandas_udf(dtype)
            def run(idx: pd.Series) -> pd.Series:
                return idx.map(gen)
            return run

        cols.append(make()(F.col("value")).alias(name))
    df = base.select(*cols)
    return Table(df.withColumn(ID, F.xxhash64(*[F.col(c) for c in df.columns])))


def replay_csv(path: str, *, schema: type[Schema], mode: str = "streaming",
               input_rate: float = 1.0, spark=None) -> Table:
    """demo/__init__.py:212 — replay a CSV directory as a stream
    (one file per trigger for deterministic tests)."""
    spark = spark or _spark()
    st = schema.to_struct_type()
    if mode == "static":
        df = spark.read.schema(st).option("header", "true").csv(path)
    else:
        df = (
            spark.readStream.schema(st).option("header", "true")
            .option("maxFilesPerTrigger", 1).csv(path)
        )
    pk = schema.primary_key_columns()
    if pk:
        return Table(df.withColumn(ID, F.xxhash64(*[F.col(c) for c in pk])))
    return Table(df.withColumn(ID, F.xxhash64(*[F.col(c) for c in df.columns])))


replay_csv_with_time = replay_csv
