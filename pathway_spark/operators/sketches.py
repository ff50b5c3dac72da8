"""Portable sketches — deterministic across engines.

`approx_count_distinct_portable` is a K-Minimum-Values estimator whose
every step is exactly specified — 60-bit md5 hash, distinct hashes,
k-th smallest by integer order, one final correctly-rounded IEEE
division — so any engine that can run SQL reproduces the estimate
BIT-FOR-BIT.  Native HLL implementations (Spark's HLL++, DuckDB's
approx_count_distinct, the reference's `reduce.rs:30`
count_distinct_approximate) differ across engines by design; this
variant exists so an external oracle can verify the pipeline, and is
also EXACT whenever a group has fewer than k distinct values (KMV
degrades gracefully into plain distinct-count below its threshold —
no small-range correction needed, which is what forces engine-specific
ln() into HLL).

Estimator: with h_k the k-th smallest distinct hash in [0, 2^60),
E = (k−1) · 2^60 / h_k;  rsd ≈ 1/√(k−2) (≈3.2 % at k=1024).

Scale shape: distinct on (group, hash) — one shuffle — then a
per-group ordered rank (one shuffle + sort of the distinct hashes).
Heavier than a register sketch at extreme cardinalities; the
production path stays `count_distinct_approximate` (Spark HLL++),
this is the oracle-verifiable variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import hash64_cross

K = 1024
# (k−1) · 2^60 as a double literal — embed the SAME constant in oracles
PORTABLE_KMV_C = float((K - 1) * (1 << 60))


def approx_count_distinct_portable(df: DataFrame, group_cols: list[str],
                                   value_col: str,
                                   out_name: str = "approx_count"
                                   ) -> DataFrame:
    """Per-group portable-KMV distinct estimate of `value_col`
    (exact below k distinct values)."""
    # NULL values are ignored (count_distinct semantics) — they also
    # sort differently across engines (Spark NULLS FIRST vs DuckDB
    # NULLS LAST), which would shift the k-th smallest hash and break
    # the bit-exact oracle contract
    h = hash64_cross(F.col(value_col).cast("string"))
    d = (df.filter(F.col(value_col).isNotNull())
         .select(*group_cols, h.alias("__h")).distinct())
    w = Window.partitionBy(*group_cols).orderBy("__h")
    ranked = (d.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= K))
    per = ranked.groupBy(*group_cols).agg(
        F.max(F.when(F.col("__rn") == K, F.col("__h"))).alias("__hk"),
        F.count(F.lit(1)).alias("__nd"))
    est = F.when(F.col("__nd") < K, F.col("__nd").cast("double")) \
        .otherwise(F.lit(PORTABLE_KMV_C) / F.col("__hk").cast("double"))
    return per.select(*group_cols, est.alias(out_name))


PORTABLE_KMV_ORACLE = """
WITH __d AS (
    SELECT DISTINCT {group_cols},
           ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT
             AS h
    FROM {table} WHERE {value_col} IS NOT NULL
), __r AS (
    SELECT {group_cols}, h,
           ROW_NUMBER() OVER (PARTITION BY {group_cols} ORDER BY h) AS rn
    FROM __d
)
SELECT {group_cols},
       CASE WHEN COUNT(*) < 1024 THEN COUNT(*)::DOUBLE
            ELSE 1.1794386992128045e+21
                 / CAST(MAX(CASE WHEN rn = 1024 THEN h END) AS DOUBLE)
       END AS {out_name}
FROM __r WHERE rn <= 1024
GROUP BY {group_cols}
"""
