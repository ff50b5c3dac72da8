"""JSON value access — reference `python/pathway/internals/json.py:31`
(`as_int` 101, `as_str` 124, `as_float` 147, `as_bool` 173) and `get`/`[]`
on Json cells. JSON carried as StringType + `get_json_object` (SURVEY §1.2)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..expressions import ColumnExpression, SparkFunc, _wrap


def get(expr, key, default=None):
    """`json_col.get('field')` — returns JSON string of the field."""
    key = key if isinstance(key, str) else key
    path = f"$.{key}" if isinstance(key, str) else key

    def fn(c: Column) -> Column:
        out = F.get_json_object(c, path)
        if default is not None:
            return F.coalesce(out, F.lit(default))
        return out

    return SparkFunc(f"json.get({key})", fn, _wrap(expr))


def as_int(expr):
    return SparkFunc("json.as_int", lambda c: c.try_cast("long"), _wrap(expr))


def as_float(expr):
    return SparkFunc("json.as_float", lambda c: c.try_cast("double"), _wrap(expr))


def as_str(expr):
    # strip surrounding quotes if the JSON value was a string
    return SparkFunc(
        "json.as_str", lambda c: F.regexp_replace(c, '^"|"$', ""), _wrap(expr)
    )


def as_bool(expr):
    return SparkFunc("json.as_bool", lambda c: c.try_cast("boolean"), _wrap(expr))
