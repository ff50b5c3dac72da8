"""Row filters — reference `stdlib/utils/filtering.py` (argmax_rows :8,
argmin_rows :21): keep, per group, the single row extremizing `what`.

Spark mapping: the reference reduces to argmax ids then restricts; we
compile the same thing to one window-rank pass — groupBy keys become a
window partition, so there is exactly one shuffle and no join back.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ...table import Table


def _extreme_rows(table: Table, on, what, desc: bool) -> Table:
    keys = [c._name if hasattr(c, "_name") else str(c) for c in on]
    val = what._name if hasattr(what, "_name") else str(what)
    order = F.col(val).desc() if desc else F.col(val).asc()
    w = W.partitionBy(*[F.col(k) for k in keys]).orderBy(order)
    df = (table._df.withColumn("_pw_rn", F.row_number().over(w))
          .filter(F.col("_pw_rn") == 1).drop("_pw_rn"))
    return Table(df)


def argmax_rows(table: Table, *on, what) -> Table:
    """filtering.py:8 — the row with the max `what` per `on` group."""
    return _extreme_rows(table, on, what, desc=True)


def argmin_rows(table: Table, *on, what) -> Table:
    """filtering.py:21 — the row with the min `what` per `on` group."""
    return _extreme_rows(table, on, what, desc=False)
