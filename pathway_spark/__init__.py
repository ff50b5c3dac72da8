"""pathway_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of pathwaycom/pathway.

Public surface mirrors `import pathway as pw` (reference
`python/pathway/__init__.py`): Table, Schema, this/left/right, reducers,
io, debug, sql, udf, temporal, indexing — all compiled to Spark
DataFrame / Structured Streaming plans so Catalyst+Tungsten+AQE handle
physical optimization.
"""

from __future__ import annotations

from . import compat, debug, demo, io, persistence, reducers, streaming, universes
from . import monitoring
from . import udfs
from .compat import (
    DateTimeNaive,
    DateTimeUtc,
    Duration,
    JoinMode,
    Json,
    MonitoringLevel,
    PersistenceMode,
    Pointer,
    PyObjectWrapper,
    SchemaProperties,
    TableSlice,
    Type,
    assert_table_has_schema,
    enable_interactive_mode,
    global_error_log,
    load_yaml,
    local_error_log,
    schema_from_csv,
    set_license_key,
    set_monitoring_config,
    table_transformer,
    wrap_py_object,
)
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
from .stdlib import graphs, statistical, viz  # noqa: E402
from .stdlib import utils  # noqa: E402
from . import xpacks  # noqa: E402

from .stdlib import stateful  # noqa: E402
from .reducers import BaseCustomAccumulator  # noqa: E402

# `pw.window` appears in the reference's __all__ (no binding there — a
# stale entry); we resolve it to the window-constructor namespace, the
# only meaning a user could intend.
from types import SimpleNamespace as _SNS  # noqa: E402

window = _SNS(
    tumbling=temporal.tumbling,
    sliding=temporal.sliding,
    session=temporal.session,
    intervals_over=temporal.intervals_over,
)

# reference aliases: `pw.asynchronous` is the deprecated name of `pw.udfs`
asynchronous = udfs

# join-result/type aliases (reference exports these for isinstance checks /
# annotations; our temporal joins all flow through JoinResult → Table)
Joinable = Table
TableLike = Table
LiveTable = Table
AsofJoinResult = JoinResult
IntervalJoinResult = JoinResult
OuterJoinResult = JoinResult
WindowJoinResult = JoinResult
GroupedJoinResult = GroupedTable

# free-function forms of Table methods (reference __init__.py exports these)
def join(left_table, right_table, *on, how: str = "inner", **kw):
    return left_table.join(right_table, *on, how=how, **kw)


def join_inner(left_table, right_table, *on, **kw):
    return left_table.join_inner(right_table, *on, **kw)


def join_left(left_table, right_table, *on, **kw):
    return left_table.join_left(right_table, *on, **kw)


def join_right(left_table, right_table, *on, **kw):
    return left_table.join_right(right_table, *on, **kw)


def join_outer(left_table, right_table, *on, **kw):
    return left_table.join_outer(right_table, *on, **kw)


def groupby(table, *args, **kw):
    return table.groupby(*args, **kw)


def iterate_universe(func, **tables):
    return iterate(func, **tables)


__version__ = "0.1.0"


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
    "declare_type", "iterate", "temporal", "run", "run_all", "get_spark",
    "demo", "streaming",
    "schema_from_types", "schema_from_dict", "schema_from_pandas",
    "schema_builder", "column_definition", "interpolate",
    # API-parity surface (reference python/pathway/__init__.py __all__)
    "ColumnExpression", "ColumnReference", "GroupedTable", "JoinResult",
    "GroupedJoinResult", "AsofJoinResult", "IntervalJoinResult",
    "OuterJoinResult", "WindowJoinResult", "Joinable", "TableLike",
    "LiveTable", "TableSlice", "JoinMode", "MonitoringLevel",
    "PersistenceMode", "Type", "Pointer", "Json", "PyObjectWrapper",
    "wrap_py_object", "DateTimeNaive", "DateTimeUtc", "Duration",
    "SchemaProperties", "assert_table_has_schema", "table_transformer",
    "schema_from_csv", "load_yaml", "set_license_key",
    "set_monitoring_config", "enable_interactive_mode", "global_error_log",
    "local_error_log", "join", "join_inner", "join_left", "join_right",
    "join_outer", "groupby", "iterate_universe", "udfs", "asynchronous",
    "universes", "persistence", "indexing", "ml", "graphs", "statistical",
    "viz", "utils", "stateful", "AsyncTransformer", "pandas_transformer",
    "BaseCustomAccumulator", "compat", "__version__",
]
