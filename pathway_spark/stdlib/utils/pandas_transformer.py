"""pandas_transformer — reference `stdlib/utils/pandas_transformer.py`."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from ...schema import Schema
from ...table import Table


def pandas_transformer(output_schema: type[Schema], **kw):
    """Decorator: a function over pandas DataFrames becomes a Table
    operator (reference `pandas_transformer.py`). The whole table is
    brought to the driver — a small-table utility by design, like the
    reference (its engine also materializes the input)."""

    def wrap(fn):
        def run(*tables: Table) -> Table:
            import pandas as pd  # noqa

            pdfs = [t.to_df().toPandas() for t in tables]
            out = fn(*pdfs)
            spark = tables[0]._df.sparkSession
            df = spark.createDataFrame(out, output_schema.to_struct_type())
            return Table.from_spark(df)

        return run

    return wrap
