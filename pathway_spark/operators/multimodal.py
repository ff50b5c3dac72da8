"""Multimodal (image/audio/video) column plumbing.

Design (per build spec): media are opaque `binary` columns + typed
metadata structs. The Spark-side plumbing — schemas, partition-sized
Arrow batches via mapInPandas, UDF signatures — is real and tested; the
actual codec step is stubbed (decode libs are not in this container)
behind `DecoderUnavailable` or a deterministic fake for tests.

At 100 TB: binaryFile sources give per-file parallelism; decode runs in
mapInPandas so each task streams Arrow batches (bounded memory), and
feature columns come back as plain arrays usable by the similarity ops.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..table import ID, Table


class DecoderUnavailable(NotImplementedError):
    pass


MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ])),
])


def read_media_dir(spark, path: str, media_type: str = "image") -> Table:
    """binaryFile source -> media table (scales: one task per file split)."""
    df = (
        spark.read.format("binaryFile").load(path)
        .select(
            F.xxhash64("path").alias("media_id"),
            F.col("content"),
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast(MEDIA_SCHEMA["meta"].dataType).alias("meta"),
        )
    )
    return Table(df.withColumn(ID, F.col("media_id")))


def _fake_decode(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: content-hash-seeded
    feature vector. Replaces image/audio lib output in this container."""
    h = hashlib.sha256(content or b"").digest()
    return [((h[i % 32] * 31 + i) % 256) / 255.0 for i in range(dim)]


def extract_features(table: Table, *, dim: int = 64, real_decoder=None) -> Table:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    `real_decoder(bytes)->list[float]` plugs in an actual codec on a
    provisioned cluster; default uses the deterministic fake."""
    decoder = real_decoder or (lambda b: _fake_decode(b, dim))
    in_schema = table._df.schema
    out_schema = T.StructType(list(in_schema.fields) + [
        T.StructField("features", T.ArrayType(T.DoubleType()))
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = pdf["content"].map(lambda b: decoder(bytes(b) if b is not None else b""))
            yield pdf

    return Table(table._df.mapInPandas(run, out_schema))


def resize_images(table: Table, width: int, height: int) -> Table:
    """Image resize — codec not present in this container."""
    raise DecoderUnavailable(
        "image resize requires a codec library (e.g. Pillow) not present in "
        "this container; plug into extract_features(real_decoder=...) plumbing"
    )


def sample_frames(table: Table, every_ms: int) -> Table:
    """Video frame sampling — codec not present in this container."""
    raise DecoderUnavailable(
        "video frame sampling requires a codec library not present in this "
        "container; the mapInPandas plumbing is extract_features()"
    )
