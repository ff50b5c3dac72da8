"""Scalar function namespaces (`expr.str.*`, `expr.dt.*`, `expr.num.*`)
and JSON helpers — all compiled to built-in pyspark functions (JVM-side)."""

from . import strings, datetimes, numerical, json_ops  # noqa: F401
