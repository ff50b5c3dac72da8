"""`expr.num.*` — reference `python/pathway/internals/expressions/numerical.py`."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..expressions import ColumnExpression, SparkFunc, _wrap


class NumericalNamespace:
    def __init__(self, expr: ColumnExpression):
        self._e = expr

    def _f(self, name, fn, *args):
        return SparkFunc(f"num.{name}", fn, self._e, *args)

    def abs(self):  # numerical.py:30
        return self._f("abs", F.abs)

    def round(self, decimals=0):  # numerical.py:66
        return self._f("round", lambda c, d: F.round(c, d), _wrap(decimals))

    def fill_na(self, default):  # numerical.py:144
        def fn(c: Column, d: Column) -> Column:
            return F.when(c.isNull() | F.isnan(c.cast("double")), d).otherwise(c)

        return self._f("fill_na", fn, _wrap(default))
