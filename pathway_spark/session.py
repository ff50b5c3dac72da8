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
        ("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"),
        # mirror get_spark's join-strategy split (guide §3.1) on
        # externally-created sessions: static estimates only for tiny
        # sides, AQE-measured sizes for the rest
        ("spark.sql.autoBroadcastJoinThreshold",
         os.environ.get("SPARK_GRAFT_BROADCAST_STATIC", str(1 * 1024 * 1024))),
        ("spark.sql.adaptive.autoBroadcastJoinThreshold",
         os.environ.get("SPARK_GRAFT_BROADCAST_ADAPTIVE",
                        str(64 * 1024 * 1024))),
        ("spark.sql.join.preferSortMergeJoin", "false"),
        ("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
         str(64 * 1024 * 1024)),
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
        # Join strategy (guide §3.1): trust SIZE ESTIMATES only when the
        # side is provably tiny (1 MB static threshold — true dims), and
        # let AQE decide the rest from MEASURED runtime sizes (64 MB
        # adaptive threshold).  A single static 64 MB threshold made the
        # planner broadcast FACT-table scans: a join output's no-CBO
        # estimate is a sizeL×sizeR product (always over threshold), so
        # the projected fact scan "sneaks under" and the plan collects
        # the big side to the driver for a single-threaded hash build
        # (q03: 600 k-row lineitem broadcast, A/B −35% after the split).
        # Same values are sane on a real cluster: AQE-measured ≤64 MB
        # broadcasts and AQE-gated shuffled-hash joins are scale-safe.
        .config("spark.sql.autoBroadcastJoinThreshold",
                os.environ.get("SPARK_GRAFT_BROADCAST_STATIC",
                               str(1 * 1024 * 1024)))
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
                os.environ.get("SPARK_GRAFT_BROADCAST_ADAPTIVE",
                               str(64 * 1024 * 1024)))
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # nanosecond parquet timestamps (reference datetimes are ns —
        # SURVEY §1.2): read as LongType ns; expr.dt.from_timestamp('ns')
        # converts to TimestampType when µs precision suffices
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # let AQE coalesce the output partitioning of cached plans: a
        # persisted arrangement (e.g. a BM25 inverted index) otherwise
        # pins shuffle.partitions partitions forever, and every stage
        # reading the cache pays that task count even when the cached
        # data is tiny (measured: 32-task stages at 8.2 s scheduler time
        # for 0.17 s of CPU).  At scale AQE targets the advisory
        # partition size instead, which is what a real cluster wants too
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
    )
    return builder.getOrCreate()
