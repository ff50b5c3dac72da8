"""SparkSession factory with scale-aware defaults.

Design notes (100 TB target):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast-join conversion replace hand-tuned plans.
- shuffle.partitions defaults to cores locally; on a real cluster this is
  overridden (AQE coalesces down from a high initial number anyway).
- Arrow enabled for every pandas interchange (UDF slow paths).
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle and are cluster-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable session configs to an
    externally-created SparkSession (e.g. a test driver's): ns-parquet
    reads, UTC semantics, AQE. Safe to call repeatedly."""
    for k, v in [
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.shuffle.partitions", _DEFAULT_CPUS),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable in this deployment: keep going
    return spark


def get_spark(app_name: str = "pathway-spark", cpus: str | int | None = None) -> SparkSession:
    """Return (or create) the singleton SparkSession with engine defaults."""
    cpus = str(cpus or _DEFAULT_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.default.parallelism", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # nanosecond parquet timestamps (reference datetimes are ns —
        # SURVEY §1.2): read as LongType ns; expr.dt.from_timestamp('ns')
        # converts to TimestampType when µs precision suffices
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    return builder.getOrCreate()
