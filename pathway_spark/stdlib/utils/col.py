"""Column utilities — reference `stdlib/utils/col.py` (unpack_col :29,
unpack_col_dict :97, multiapply_all_rows :194, apply_all_rows :259,
groupby_reduce_majority :309).

Spark mapping: unpack is pure projection (element_at / struct-field
access — codegen, no shuffle); the all-rows applies are whole-column
Python functions and therefore driver-side by contract, exactly like the
reference ("meant to be run infrequently on relatively small tables");
majority is one groupBy-count + window-rank — two shuffles on the same
key, which AQE coalesces.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ...schema import Schema
from ...table import ID, Table


def _owning_table(column) -> Table:
    return column.table


def unpack_col(column, *unpacked_columns, schema: type[Schema] | None = None
               ) -> Table:
    """Unpack a tuple/array column into named columns (col.py:29).
    Exactly one of `unpacked_columns` / `schema` must be given."""
    if (schema is None) == (len(unpacked_columns) == 0):
        raise ValueError(
            "exactly one of the parameters `schema` or `unpacked_columns` "
            "must be provided")
    table = _owning_table(column)
    if schema is not None:
        names = list(schema.to_struct_type().fieldNames())
        types = {f.name: f.dataType for f in schema.to_struct_type().fields}
    else:
        names = [c if isinstance(c, str) else c._name for c in unpacked_columns]
        types = {}
    src = column._name
    dt = dict(table._df.dtypes)[src]
    cols = []
    for i, n in enumerate(names):
        if dt.startswith("struct"):
            c = F.col(f"`{src}`.`{table._df.schema[src].dataType.fieldNames()[i]}`")
        else:
            c = F.element_at(F.col(f"`{src}`"), i + 1)
        if n in types:
            c = c.cast(types[n])
        cols.append(c.alias(n))
    return Table(table._df.select(F.col(ID), *cols))


def unpack_col_dict(column, schema: type[Schema]) -> Table:
    """Unpack a JSON-object column into typed columns (col.py:97)."""
    table = _owning_table(column)
    src = column._name
    struct = schema.to_struct_type()
    dt = dict(table._df.dtypes)[src]
    cols = []
    for f in struct.fields:
        if dt.startswith("struct"):
            c = F.col(f"`{src}`.`{f.name}`")
        elif dt.startswith("map"):
            c = F.element_at(F.col(f"`{src}`"), f.name)
        else:  # JSON string
            c = F.get_json_object(F.col(f"`{src}`"), f"$.{f.name}")
        cols.append(c.cast(f.dataType).alias(f.name))
    return Table(table._df.select(F.col(ID), *cols))


def multiapply_all_rows(*cols, fun: Callable[..., Sequence],
                        result_col_names: list) -> Table:
    """Apply `fun` to entire columns at once, producing several result
    columns aligned with the input rows (col.py:194). Whole-column
    Python — driver-side by contract, like the reference (which gathers
    all rows into one reducer cell before applying)."""
    assert cols, "need at least one column"
    table = _owning_table(cols[0])
    names = [c._name for c in cols]
    out_names = [n if isinstance(n, str) else n._name for n in result_col_names]
    pdf = (table._df.select(ID, *[F.col(f"`{n}`") for n in names])
           .sort(ID).toPandas())
    results = fun(*[pdf[n].tolist() for n in names])
    spark = table._df.sparkSession
    out = {ID: pdf[ID]}
    for rn, series in zip(out_names, results):
        out[rn] = list(series)
    import pandas as pd
    res = spark.createDataFrame(pd.DataFrame(out))
    return Table(res)


def apply_all_rows(*cols, fun: Callable[..., Sequence],
                   result_col_name) -> Table:
    """Single-result-column form of multiapply_all_rows (col.py:259)."""

    def wrapped(*column_values):
        return [fun(*column_values)]

    return multiapply_all_rows(*cols, fun=wrapped,
                               result_col_names=[result_col_name])


def groupby_reduce_majority(column_group, column_val) -> Table:
    """Majority value of `column_val` per `column_group` (col.py:309).
    groupBy-count then window-rank over the counts: ties break toward
    the smaller value (deterministic, matching the reference's min-id
    argmax tie-break being stable per run)."""
    table = _owning_table(column_group)
    g, v = column_group._name, column_val._name
    counts = (table._df.groupBy(F.col(f"`{g}`"), F.col(f"`{v}`"))
              .agg(F.count("*").alias("_pw_cnt")))
    w = W.partitionBy(F.col(f"`{g}`")).orderBy(
        F.col("_pw_cnt").desc(), F.col(f"`{v}`").asc())
    df = (counts.withColumn("_pw_rn", F.row_number().over(w))
          .filter(F.col("_pw_rn") == 1)
          .select(F.col(f"`{g}`"),
                  F.col(f"`{v}`").alias("majority")))
    return Table(df.withColumn(ID, F.xxhash64(F.col(f"`{g}`").cast("string"))))
