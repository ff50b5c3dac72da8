"""Ordered operators — reference `table.py:2409` (sort → prev/next
pointers), `stdlib/ordered/diff.py:10`, `stdlib/statistical/_interpolate.py:56`.

Spark mapping (SURVEY §2.6): one `Window.partitionBy(instance).orderBy(key)`
per operator — a single range-shuffle; lag/lead/last are O(1) per row.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..expressions import to_col
from ..table import ID, Table


def sort(table: Table, key, instance=None) -> Table:
    """Adds `prev` / `next` pointer (id) columns; reference builds a
    doubly-linked order (`src/engine/dataflow/operators/prev_next.rs`)."""
    ctx = table._ctx()
    k = to_col(key, ctx)
    part = [to_col(instance, ctx)] if instance is not None else [F.lit(0)]
    w = W.partitionBy(*part).orderBy(k, F.col(ID))
    df = table._df.withColumn("prev", F.lag(ID).over(w)).withColumn(
        "next", F.lead(ID).over(w)
    )
    return Table(df)


def diff(table: Table, timestamp, values, instance=None) -> Table:
    """value − previous value in timestamp order (diff.py:10); output
    columns `diff_<name>`."""
    ctx = table._ctx()
    t = to_col(timestamp, ctx)
    part = [to_col(instance, ctx)] if instance is not None else [F.lit(0)]
    w = W.partitionBy(*part).orderBy(t, F.col(ID))
    df = table._df
    for v in values:
        c = to_col(v, ctx)
        name = getattr(v, "_name", "value")
        df = df.withColumn(f"diff_{name}", c - F.lag(c).over(w))
    return Table(df)


def interpolate(table: Table, timestamp, *values, mode: str = "linear",
                instance=None) -> Table:
    """Linear interpolation of NULL gaps (_interpolate.py:56):
    prev/next non-null neighbors via last/first(ignorenulls) windows.

    Scale note: without `instance` the interpolation needs one global
    time order (single range partition) — pass `instance` (e.g. the
    series key) to parallelize across series like the reference's
    per-key ordering."""
    ctx = table._ctx()
    t = to_col(timestamp, ctx)
    part = [to_col(instance, ctx)] if instance is not None else []
    wb = W.partitionBy(*part).orderBy(t).rowsBetween(W.unboundedPreceding, 0) \
        if part else W.orderBy(t).rowsBetween(W.unboundedPreceding, 0)
    wf = W.partitionBy(*part).orderBy(t).rowsBetween(0, W.unboundedFollowing) \
        if part else W.orderBy(t).rowsBetween(0, W.unboundedFollowing)
    df = table._df.withColumn("__pw_t", t.cast("double"))
    for v in values:
        c = to_col(v, ctx)
        name = getattr(v, "_name", "value")
        pv = F.last(c, ignorenulls=True).over(wb)
        pt = F.last(F.when(c.isNotNull(), F.col("__pw_t")), ignorenulls=True).over(wb)
        nv = F.first(c, ignorenulls=True).over(wf)
        nt = F.first(F.when(c.isNotNull(), F.col("__pw_t")), ignorenulls=True).over(wf)
        interp = F.when(c.isNotNull(), c).otherwise(
            F.when(pv.isNull(), nv).otherwise(
                F.when(nv.isNull(), pv).otherwise(
                    pv + (nv - pv) * (F.col("__pw_t") - pt) / F.nullif(nt - pt, F.lit(0))
                )
            )
        )
        df = df.withColumn(name, interp)
    return Table(df.drop("__pw_t"))
