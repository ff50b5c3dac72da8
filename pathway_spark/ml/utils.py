"""`pw.ml.utils` — reference `stdlib/ml/utils.py` (classifier_accuracy :13)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..table import ID, Table


def classifier_accuracy(predicted_labels: Table, exact_labels: Table) -> Table:
    """Count matches/mismatches between predicted and exact labels
    (utils.py:13): join on row id, group by match flag.

    One broadcast-able equi-join on the id plus a 2-group aggregate —
    the reference's restrict+groupby compiled to the same shuffle."""
    pred = predicted_labels._df.select(
        F.col(ID), F.col("predicted_label"))
    exact = exact_labels._df.select(F.col(ID), F.col("label"))
    joined = pred.join(exact, ID)
    out = (
        joined.withColumn("match",
                          F.col("predicted_label") == F.col("label"))
        .groupBy("match")
        .agg(F.count("*").alias("cnt"))
        .select("cnt", F.col("match").alias("value"))
    )
    return Table(out.withColumn(ID, F.xxhash64(F.col("value").cast("string"))))


__all__ = ["classifier_accuracy"]
