"""`expr.str.*` — reference `python/pathway/internals/expressions/string.py`.

Every method maps to built-in Spark string functions so the expression
stays in whole-stage codegen (no python UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..expressions import ColumnExpression, SparkFunc, _wrap


class StringNamespace:
    def __init__(self, expr: ColumnExpression):
        self._e = expr

    def _f(self, name, fn, *args):
        return SparkFunc(f"str.{name}", fn, self._e, *args)

    def lower(self):  # string.py:33
        return self._f("lower", F.lower)

    def upper(self):  # string.py:74
        return self._f("upper", F.upper)

    def reversed(self):  # string.py:115
        return self._f("reversed", F.reverse)

    def len(self):  # string.py:156
        return self._f("len", lambda c: F.length(c).cast("long"))

    def replace(self, old, new):  # string.py:195
        return self._f("replace", lambda c, o, n: F.replace(c, o, n), _wrap(old), _wrap(new))

    def startswith(self, prefix):  # string.py:274
        return self._f("startswith", lambda c, p: c.startswith(p), _wrap(prefix))

    def endswith(self, suffix):  # string.py:316
        return self._f("endswith", lambda c, s: c.endswith(s), _wrap(suffix))

    def swapcase(self):  # string.py:358 — no builtin; char-wise via HOF
        def fn(c: Column) -> Column:
            chars = F.split(c, "")
            swapped = F.transform(
                chars,
                lambda ch: F.when(ch == F.lower(ch), F.upper(ch)).otherwise(F.lower(ch)),
            )
            return F.array_join(swapped, "")

        return self._f("swapcase", fn)

    def strip(self, chars=None):  # string.py:396
        if chars is None:
            return self._f("strip", F.trim)
        return self._f("strip", lambda c, ch: F.btrim(c, ch), _wrap(chars))

    def title(self):  # string.py:439
        return self._f("title", F.initcap)

    def count(self, sub):  # string.py:473 — non-overlapping occurrence count
        def fn(c: Column, s: Column) -> Column:
            return F.when(F.length(s) == 0, F.length(c) + 1).otherwise(
                ((F.length(c) - F.length(F.replace(c, s, F.lit("")))) / F.length(s)).cast("long")
            )

        return self._f("count", fn, _wrap(sub))

    def find(self, sub):  # string.py:526 — python semantics: 0-based, -1 missing
        return self._f(
            "find",
            lambda c, s: (F.call_function("instr", c, s) - 1).cast("long"),
            _wrap(sub),
        )

    def rfind(self, sub):  # string.py:580
        def fn(c: Column, s: Column) -> Column:
            pos_rev = F.call_function("instr", F.reverse(c), F.reverse(s))
            return F.when(pos_rev == 0, F.lit(-1)).otherwise(
                F.length(c) - pos_rev - F.length(s) + 1
            ).cast("long")

        return self._f("rfind", fn, _wrap(sub))

    def removeprefix(self, prefix):  # string.py:634
        def fn(c: Column, p: Column) -> Column:
            return F.when(c.startswith(p), F.substring(c, F.length(p) + 1, F.length(c))).otherwise(c)

        return self._f("removeprefix", fn, _wrap(prefix))

    def removesuffix(self, suffix):  # string.py:693
        def fn(c: Column, s: Column) -> Column:
            return F.when(
                c.endswith(s), F.substring(c, F.lit(1), F.length(c) - F.length(s))
            ).otherwise(c)

        return self._f("removesuffix", fn, _wrap(suffix))

    def slice(self, start, end):  # string.py:752 — python [start:end)
        def fn(c: Column, a: Column, b: Column) -> Column:
            return F.substring(c, a + 1, F.greatest(b - a, F.lit(0)))

        return self._f("slice", fn, _wrap(start), _wrap(end))

    def parse_int(self):  # string.py:801
        return self._f("parse_int", lambda c: c.try_cast("long"))

    def parse_float(self):  # string.py:835
        return self._f("parse_float", lambda c: c.try_cast("double"))

    def parse_bool(self):  # string.py:872
        return self._f("parse_bool", lambda c: F.lower(c).try_cast("boolean"))

    def split(self, sep):  # convenience (pathway exposes via apply)
        return self._f("split", lambda c, s: F.split(c, s), _wrap(sep))
