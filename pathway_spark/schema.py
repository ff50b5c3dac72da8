"""Schema system: class-declared schemas -> Spark StructType.

Mirrors the reference (`python/pathway/internals/schema.py:1008` class Schema,
builders at 112/134/830/858/927) with Spark-native type mapping per SURVEY §1.2.
"""

from __future__ import annotations

import datetime as _dt
import typing
from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import types as T

# python / pathway-style type -> Spark type (SURVEY §1.2 table)
_SIMPLE = {
    int: T.LongType(),
    bool: T.BooleanType(),
    str: T.StringType(),
    bytes: T.BinaryType(),
    float: T.DoubleType(),
    "int": T.LongType(),
    "bool": T.BooleanType(),
    "str": T.StringType(),
    "bytes": T.BinaryType(),
    "float": T.DoubleType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "date": T.DateType(),
    _dt.datetime: T.TimestampType(),
    _dt.date: T.DateType(),
    "timestamp": T.TimestampType(),
    # DATE_TIME_NAIVE (dtype.py:552) -> TimestampNTZ; DATE_TIME_UTC (579) -> Timestamp
    "datetime_naive": T.TimestampNTZType(),
    "datetime_utc": T.TimestampType(),
    # DURATION (dtype.py:606) carried as ns in a long
    "duration": T.LongType(),
    "json": T.StringType(),
    Any: T.StringType(),
}


def to_spark_type(tp) -> T.DataType:
    """Map a python/pathway/Spark type spec to a Spark DataType."""
    if isinstance(tp, T.DataType):
        return tp
    if tp in _SIMPLE:
        return _SIMPLE[tp]
    origin = typing.get_origin(tp)
    if origin is not None:
        args = typing.get_args(tp)
        if origin in (list, typing.List):
            return T.ArrayType(to_spark_type(args[0]) if args else T.StringType())
        if origin in (tuple, typing.Tuple):
            if len(args) == 2 and args[1] is Ellipsis:
                return T.ArrayType(to_spark_type(args[0]))
            return T.StructType(
                [T.StructField(f"_{i}", to_spark_type(a)) for i, a in enumerate(args)]
            )
        if origin is typing.Union:
            non_none = [a for a in args if a is not type(None)]
            if len(non_none) == 1:
                return to_spark_type(non_none[0])  # Optional[T]: nullability implied
    if isinstance(tp, str) and tp.lower() in _SIMPLE:
        return _SIMPLE[tp.lower()]
    if isinstance(tp, str):
        # allow Spark DDL strings ("array<double>", "decimal(10,2)"...)
        return T.DataType.fromDDL(tp)
    raise TypeError(f"cannot map {tp!r} to a Spark type")


@dataclass
class ColumnDefinition:
    """Per-column spec (reference `schema.py:756` column_definition)."""

    dtype: Any = str
    primary_key: bool = False
    default_value: Any = None
    name: str | None = None


def column_definition(*, dtype=str, primary_key=False, default_value=None, name=None):
    return ColumnDefinition(dtype, primary_key, default_value, name)


class SchemaMeta(type):
    def __new__(mcls, name, bases, ns):
        cls = super().__new__(mcls, name, bases, ns)
        cols: dict[str, ColumnDefinition] = {}
        for base in reversed(bases):
            cols.update(getattr(base, "_columns", {}))
        annots = ns.get("__annotations__", {})
        for cname, tp in annots.items():
            if cname == "_columns":  # internal registry, never a column
                continue
            default = ns.get(cname)
            if isinstance(default, ColumnDefinition):
                cd = default
                cd.dtype = tp
            else:
                cd = ColumnDefinition(dtype=tp, default_value=default)
            cols[cd.name or cname] = cd
        cls._columns = cols
        return cls

    def __or__(cls, other):  # schema composition A | B
        return schema_from_dict({**{k: c.dtype for k, c in cls._columns.items()},
                                 **{k: c.dtype for k, c in other._columns.items()}})

    # --- reference SchemaMetaclass surface (schema.py:390-740) ---

    def columns(cls) -> dict:
        """name → ColumnDefinition (reference returns ColumnSchema)."""
        return dict(cls._columns)

    def keys(cls) -> list[str]:
        return list(cls._columns.keys())

    def typehints(cls) -> dict:
        return {n: c.dtype for n, c in cls._columns.items()}

    def default_values(cls) -> dict:
        return {n: c.default_value for n, c in cls._columns.items()
                if c.default_value is not None}

    def with_types(cls, **kwargs) -> type:
        """Copy of this schema with some column types replaced."""
        merged = {n: c.dtype for n, c in cls._columns.items()}
        for k, v in kwargs.items():
            if k not in merged:
                raise ValueError(f"schema has no column {k!r}")
            merged[k] = v
        return schema_from_dict(merged)

    def without(cls, *columns) -> type:
        names = {c if isinstance(c, str) else c._name for c in columns}
        unknown = names - set(cls._columns)
        if unknown:
            raise ValueError(f"schema has no columns {sorted(unknown)!r}")
        return schema_from_dict({n: c.dtype for n, c in cls._columns.items()
                                 if n not in names})

    def update_properties(cls, **kwargs) -> type:
        """Column/universe properties (append_only etc.) don't change
        the Spark plan — declarative no-op returning an equivalent
        schema, as `pw.universes.promise_*` are."""
        del kwargs
        return cls

    def id_type(cls):
        return int  # ids are xxhash64 longs

    def with_id_type(cls, id_type, **kwargs):
        del id_type, kwargs
        return cls

    def assert_matches_schema(cls, other: type) -> None:
        a = {n: to_spark_type(c.dtype) for n, c in cls._columns.items()}
        b = {n: to_spark_type(c.dtype) for n, c in other._columns.items()}
        assert a == b, f"schema mismatch: {a} != {b}"


class Schema(metaclass=SchemaMeta):
    """Declare like the reference:

    class InputSchema(pw.Schema):
        owner: str
        pet: str = pw.column_definition(primary_key=True)
    """

    _columns = {}  # no annotation: must not be picked up as a column

    @classmethod
    def to_struct_type(cls) -> T.StructType:
        return T.StructType(
            [T.StructField(n, to_spark_type(c.dtype), True) for n, c in cls._columns.items()]
        )

    @classmethod
    def primary_key_columns(cls) -> list[str]:
        return [n for n, c in cls._columns.items() if c.primary_key]

    @classmethod
    def column_names(cls) -> list[str]:
        return list(cls._columns.keys())


def schema_from_types(**kwargs) -> type[Schema]:
    """Reference `schema.py:134`."""
    return schema_from_dict(kwargs)


def schema_from_dict(columns: dict, name: str = "AnonymousSchema") -> type[Schema]:
    """Reference `schema.py:858`."""
    ns: dict[str, Any] = {"__annotations__": {}}
    for cname, spec in columns.items():
        if isinstance(spec, ColumnDefinition):
            ns["__annotations__"][cname] = spec.dtype
            ns[cname] = spec
        else:
            ns["__annotations__"][cname] = spec
    return SchemaMeta(name, (Schema,), ns)


def schema_from_pandas(df, *, id_from=None, name="PandasSchema") -> type[Schema]:
    """Reference `schema.py:112`."""
    import pandas as pd  # noqa

    mapping = {"int64": int, "float64": float, "bool": bool, "object": str}
    cols = {}
    for cname in df.columns:
        cols[cname] = mapping.get(str(df[cname].dtype), str)
    if id_from:
        out = {}
        for cname, tp in cols.items():
            out[cname] = column_definition(dtype=tp, primary_key=cname in id_from)
        cols = out
    return schema_from_dict(cols, name)


def schema_builder(columns: dict, *, name="BuiltSchema") -> type[Schema]:
    """Reference `schema.py:830`."""
    return schema_from_dict(columns, name)
