"""Wall-clock time utilities — reference
`python/pathway/stdlib/temporal/time_utils.py` (utc_now :42,
inactivity_detection :72, add_update_timestamp_utc :191).

Spark mapping: `utc_now` is the `rate` streaming source (each emitted
row's event `timestamp` IS the UTC wall clock at emission — no custom
thread/subject needed); `inactivity_detection` is
`applyInPandasWithState` with a processing-time timeout (the engine's
timer service replaces the reference's polling subject); the batch form
flags gaps between consecutive event timestamps with sort+lag — pure
window functions, one shuffle, fully oracle-able.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import functions as F

from ..table import ID, Table

__all__ = ["utc_now", "inactivity_detection", "add_update_timestamp_utc"]


def utc_now(refresh_rate: _dt.timedelta = _dt.timedelta(seconds=60),
            initial_delay: _dt.timedelta = _dt.timedelta(0),
            spark=None) -> Table:
    """Continuously updating stream of the current UTC time
    (time_utils.py:42).

    The Spark `rate` source emits rows on the driver clock; each row's
    `timestamp` column is the UTC emission time, so one row per
    `refresh_rate` gives exactly the reference's TimestampSubject feed
    without a Python thread.
    """
    if spark is None:
        from ..session import get_spark
        spark = get_spark()
    rps = 1.0 / max(refresh_rate.total_seconds(), 1e-6)
    df = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rps)
        .load()
        .select(F.col("timestamp").alias("timestamp_utc"))
    )
    if initial_delay.total_seconds() > 0:
        cutoff = F.current_timestamp() - F.expr(
            f"INTERVAL {int(initial_delay.total_seconds() * 1e6)} MICROSECOND")
        df = df.filter(F.col("timestamp_utc") >= cutoff)
    return Table(df.withColumn(ID, F.xxhash64(F.col("timestamp_utc").cast("string"))))


def add_update_timestamp_utc(table: Table,
                             refresh_rate: _dt.timedelta = _dt.timedelta(seconds=1),
                             update_timestamp_column_name: str = "updated_timestamp_utc",
                             ) -> Table:
    """Add a column with the UTC time each row was (last) processed
    (time_utils.py:191).

    `current_timestamp()` is evaluated once per micro-batch in streaming
    plans — exactly "time of the update that produced this row"; on
    batch tables every row gets the single processing time, matching the
    reference's one-shot run. `refresh_rate` bounds staleness in the
    reference's polling design; the micro-batch clock is always current,
    so it is accepted for parity and unused.
    """
    del refresh_rate
    return Table(table._df.withColumn(update_timestamp_column_name,
                                      F.current_timestamp()))


def inactivity_detection(table: Table,
                         allowed_inactivity_period: _dt.timedelta,
                         refresh_rate: _dt.timedelta = _dt.timedelta(seconds=1),
                         instance=None,
                         *,
                         time_column: str | None = None) -> Table:
    """Detect inactivity periods (gaps with no new rows) longer than
    `allowed_inactivity_period`, per `instance` (time_utils.py:72).

    Streaming tables: `applyInPandasWithState` keeps per-instance
    last-activity state with a processing-time timeout; the timer firing
    emits the inactivity row (`resumed_activity_timestamp_utc` NULL), and
    the next arrival emits the completed row — the reference's polling
    loop becomes the engine's timer service.

    Batch tables need an explicit `time_column` (wall-clock arrival
    order doesn't exist after the fact): consecutive-row gaps above the
    threshold are found with lag() over (instance, time) — one shuffle,
    no state. Documented divergence: the reference only supports the
    streaming form.
    """
    gap_us = int(allowed_inactivity_period.total_seconds() * 1_000_000)
    df = table._df
    inst_col = None
    if instance is not None:
        inst_col = instance if isinstance(instance, str) else instance._name

    if not df.isStreaming:
        if time_column is None:
            raise ValueError(
                "inactivity_detection on a batch table needs time_column= "
                "(wall-clock arrival times don't exist after the fact)")
        from pyspark.sql import Window as W

        part = W.partitionBy(inst_col) if inst_col else W.partitionBy(F.lit(1))
        w = part.orderBy(F.col(time_column))
        t = F.col(time_column)
        is_ts = dict(df.dtypes)[time_column].startswith("timestamp")
        t_us = (t.cast("double") * 1_000_000).cast("long") if is_ts else t.cast("long")
        lagged = df.select(
            *([F.col(inst_col).alias("instance")] if inst_col else []),
            t.alias("_t"),
            (t_us - F.lag(t_us).over(w)).alias("_gap_us"),
            F.lag(t).over(w).alias("_prev_t"),
        )
        out = lagged.filter(F.col("_gap_us") > gap_us).select(
            *(["instance"] if inst_col else []),
            F.col("_prev_t").alias("inactivity_timestamp_utc"),
            F.col("_t").alias("resumed_activity_timestamp_utc"),
        )
        keys = (["instance"] if inst_col else []) + ["inactivity_timestamp_utc"]
        return Table(out.withColumn(
            ID, F.xxhash64(*[F.col(k).cast("string") for k in keys])))

    # streaming: per-instance state + processing-time timeout
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType, TimestampType)

    grouped = df.withColumn(
        "_pw_inst",
        F.col(inst_col).cast("string") if inst_col else F.lit("")
    ).groupBy("_pw_inst")

    out_schema = StructType([
        StructField("instance", StringType()),
        StructField("inactivity_timestamp_utc", TimestampType()),
        StructField("resumed_activity_timestamp_utc", TimestampType()),
    ])
    state_schema = StructType([
        StructField("last_seen_us", LongType()),
        StructField("flagged", LongType()),
    ])
    timeout_ms = max(int(allowed_inactivity_period.total_seconds() * 1000), 1)

    def track(key, pdf_iter, state):
        inst = key[0]
        now = _dt.datetime.now(tz=_dt.timezone.utc)
        if state.hasTimedOut:
            (last_us, flagged) = state.get
            if not flagged:
                state.update((last_us, 1))
                state.setTimeoutDuration(timeout_ms)
                yield pd.DataFrame({
                    "instance": [inst],
                    "inactivity_timestamp_utc":
                        [_dt.datetime.fromtimestamp(last_us / 1e6,
                                                    tz=_dt.timezone.utc)],
                    "resumed_activity_timestamp_utc": [None],
                })
            return
        rows = sum(len(p) for p in pdf_iter)
        del rows
        prev = state.get if state.exists else None
        now_us = int(now.timestamp() * 1e6)
        state.update((now_us, 0))
        state.setTimeoutDuration(timeout_ms)
        if prev is not None and prev[1]:
            yield pd.DataFrame({
                "instance": [inst],
                "inactivity_timestamp_utc":
                    [_dt.datetime.fromtimestamp(prev[0] / 1e6,
                                                tz=_dt.timezone.utc)],
                "resumed_activity_timestamp_utc": [now],
            })

    out = grouped.applyInPandasWithState(
        track, out_schema, state_schema, "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
    return Table(out.withColumn(
        ID, F.xxhash64("instance", F.col("inactivity_timestamp_utc").cast("string"))))
