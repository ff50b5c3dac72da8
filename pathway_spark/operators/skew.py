"""Skew-aware aggregation — the 100 TB path for power-law keys.

AQE splits skewed JOIN partitions automatically
(`spark.sql.adaptive.skewJoin.enabled`), but a groupBy on a hot key
still funnels that key's rows through one reducer task. Classic fix:
two-phase salted aggregation — phase 1 aggregates (key, salt) partials
across `salt_buckets` tasks, phase 2 merges the partials per key.
Correct for any algebraic aggregate (sum/count/min/max → same op;
avg → sum+count merged).

Reference counterpart: timely exchanges by key hash and has the same
hot-key bottleneck; no in-engine salting exists there — this is a
Spark-first addition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..table import ID, Table

# (phase1 partial agg, phase2 merge agg) per algebraic aggregate
_MERGES = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(table: Table, keys: list[str], aggs: dict[str, tuple[str, str]],
                     *, salt_buckets: int = 64) -> Table:
    """Two-phase aggregation: ``aggs`` maps output name -> (op, column)
    with op in {sum,count,min,max,avg}.

    Example: salted_aggregate(t, ["k"], {"total": ("sum", "v"),
    "n": ("count", "v"), "mean": ("avg", "v")}, salt_buckets=64)
    """
    df = table._df
    salt = F.pmod(F.xxhash64(F.col(ID), F.lit(0x5417)), F.lit(salt_buckets))

    phase1_cols: list[Column] = []
    phase2_cols: list[Column] = []
    finals: list[Column] = []
    for name, (op, col) in aggs.items():
        if op == "avg":  # decompose: avg = merged sum / merged count
            phase1_cols += [F.sum(col).alias(f"__s_{name}"),
                            F.count(col).alias(f"__c_{name}")]
            phase2_cols += [F.sum(f"__s_{name}").alias(f"__s_{name}"),
                            F.sum(f"__c_{name}").alias(f"__c_{name}")]
            finals.append((F.col(f"__s_{name}") / F.col(f"__c_{name}")).alias(name))
            continue
        p1, p2 = _MERGES[op]
        phase1_cols.append(p1(F.col(col)).alias(f"__p_{name}"))
        phase2_cols.append(p2(F.col(f"__p_{name}")).alias(f"__p_{name}"))
        finals.append(F.col(f"__p_{name}").alias(name))

    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*phase1_cols)
    merged = partial.groupBy(*keys).agg(*phase2_cols)
    out = merged.select(*[F.col(k) for k in keys], *finals)
    return Table(out.withColumn(ID, F.xxhash64(*[F.col(k) for k in keys])))


def key_skew_report(table: Table, keys: list[str], *, top: int = 10) -> DataFrame:
    """Diagnostic: row counts of the hottest keys vs the mean — decide
    whether salting / AQE skew thresholds need tuning."""
    df = table._df
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(
        F.avg("n").alias("mean_n"), F.max("n").alias("max_n"),
        F.expr("percentile_approx(n, 0.99)").alias("p99_n"),
    )
    return counts.orderBy(F.col("n").desc()).limit(top).crossJoin(stats)
