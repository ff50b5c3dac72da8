"""`pw.ml.datasets.classification` — reference
`stdlib/ml/datasets/classification/__init__.py` (load_mnist_sample :11).

The reference downloads MNIST over the network; this container has no
network access, so the loader is gated: pass `path=` to a local IDX/CSV
copy, else a clear error names what to fetch.
"""

from __future__ import annotations


def load_mnist_sample(sample_size: int = 70000, *, path: str | None = None,
                      spark=None):
    """Load an MNIST sample as (train_table, train_labels, test_table,
    test_labels). Network-gated: supply `path` to a local CSV with
    columns (label, p0..p783)."""
    if path is None:
        raise RuntimeError(
            "load_mnist_sample needs a local copy: pass path= to a CSV "
            "with columns (label, p0..p783); the reference downloads "
            "openml mnist_784, which needs network access")
    from ...session import get_spark
    from ...table import Table
    from pyspark.sql import functions as F

    spark = spark or get_spark()
    df = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    df = df.limit(sample_size)
    pix = [c for c in df.columns if c != "label"]
    data = df.select(F.array(*[F.col(c).cast("double") for c in pix]).alias("data"),
                     F.col("label").cast("string").alias("label"))
    n_test = max(1, int(df.count() * 0.1))
    test = data.limit(n_test)
    train = data.subtract(test)
    t_train = Table.from_spark(train)
    t_test = Table.from_spark(test)
    return (t_train, t_train, t_test, t_test)


__all__ = ["load_mnist_sample"]
