"""pathway_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of pathwaycom/pathway.

Public surface mirrors `import pathway as pw` (reference
`python/pathway/__init__.py`): Table, Schema, this/left/right, reducers,
io, debug, sql, udf, temporal, indexing — all compiled to Spark
DataFrame / Structured Streaming plans so Catalyst+Tungsten+AQE handle
physical optimization.
"""

from __future__ import annotations

from . import debug, demo, io, persistence, reducers, streaming, universes
from .expressions import (
    ColumnExpression,
    ColumnReference,
    apply,
    apply_async,
    apply_with_type,
    cast,
    coalesce,
    declare_type,
    fill_error,
    if_else,
    left,
    make_tuple,
    require,
    right,
    this,
    unwrap,
)
from .schema import (
    Schema,
    column_definition,
    schema_builder,
    schema_from_dict,
    schema_from_pandas,
    schema_from_types,
)
from .session import get_spark
from .sql import sql
from .table import GroupedTable, JoinResult, Table
from .stdlib.utils import AsyncTransformer, pandas_transformer
from .udfs import UDF, udf
from .operators import iterate as _iterate_mod
from .operators import temporal
from .operators.iterate import iterate
from .operators.sort import interpolate

# namespaced stdlib mirrors
from . import ml  # noqa: E402
from . import indexing  # noqa: E402
from . import stdlib  # noqa: E402


def run(*args, **kwargs):
    """pw.run() — batch plans are lazy; streaming queries are started at
    write/subscribe time. Provided for API parity: awaits all active
    streaming queries."""
    spark = get_spark()
    for q in spark.streams.active:
        q.processAllAvailable()


def run_all(*args, **kwargs):
    run()


__all__ = [
    "Table", "Schema", "this", "left", "right", "reducers", "io", "debug",
    "sql", "udf", "UDF", "apply", "apply_with_type", "apply_async", "cast",
    "coalesce", "if_else", "require", "unwrap", "fill_error", "make_tuple",
    "declare_type", "iterate", "temporal", "run", "get_spark", "demo",
    "streaming",
    "schema_from_types", "schema_from_dict", "schema_from_pandas",
    "schema_builder", "column_definition", "interpolate",
]
