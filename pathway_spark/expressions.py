"""Expression tree for the Pathway-compatible API, compiled to pyspark Columns.

Mirrors the surface of the reference's expression layer
(`python/pathway/internals/expression.py`, `internals/expressions/{string,
date_time,numerical}.py`) but every node compiles to a built-in
`pyspark.sql.Column` so the whole expression stays inside Catalyst /
whole-stage codegen — no Python in the hot path.

Sentinels ``this``, ``left``, ``right`` play the role of ``pw.this`` /
``pw.left`` / ``pw.right`` (reference: `python/pathway/internals/thisclass.py`).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# Evaluation context
# ---------------------------------------------------------------------------


class EvalContext:
    """Resolves column references / reducer atoms into Spark Columns."""

    def ref(self, ref: "ColumnReference") -> Column:
        raise NotImplementedError

    def reducer(self, red: "ReducerExpression") -> Column:
        raise TypeError(
            f"reducer {red._name!r} used outside of a groupby/reduce context"
        )


class RowContext(EvalContext):
    """Rowwise evaluation: {'this': df} or {'left': df, 'right': df} aliases."""

    def __init__(self, frames: dict[str, Any], alias: dict[str, str] | None = None):
        self.frames = frames
        self.alias = alias or {}

    def ref(self, ref: "ColumnReference") -> Column:
        side = ref._side
        if side not in self.frames:
            if side in ("left", "right") and "this" in self.frames:
                side = "this"
            elif side == "this" and len(self.frames) == 1:
                side = next(iter(self.frames))
            elif side == "this":
                # two-sided context: disambiguate by column membership
                owners = [s for s, df in self.frames.items() if ref._name in df.columns]
                if len(owners) != 1:
                    raise KeyError(
                        f"pw.this.{ref._name} is ambiguous here; use pw.left/pw.right"
                    )
                side = owners[0]
            else:
                raise KeyError(f"no table bound for pw.{ref._side} in this context")
        if side in self.alias:
            return F.col(f"{self.alias[side]}.`{ref._name}`")
        return self.frames[side][ref._name]

    def dtype_of(self, ref: "ColumnReference") -> str | None:
        """Spark dtype string of a referenced column, when resolvable."""
        for df in self.frames.values():
            if hasattr(df, "dtypes") and ref._name in df.columns:
                return dict(df.dtypes)[ref._name]
        return None


# ---------------------------------------------------------------------------
# Expression nodes
# ---------------------------------------------------------------------------


def _wrap(value: Any) -> "ColumnExpression":
    if isinstance(value, ColumnExpression):
        return value
    return Literal(value)


def to_col(value: Any, ctx: EvalContext) -> Column:
    """Compile an expression (or python literal) to a Spark Column."""
    return _wrap(value)._to_col(ctx)


class ColumnExpression:
    """Base expression node. Supports python operators like the reference
    (`internals/expression.py:88` ColumnExpression)."""

    def _to_col(self, ctx: EvalContext) -> Column:
        raise NotImplementedError

    def _key(self) -> str:
        raise NotImplementedError

    # --- arithmetic ---
    def __add__(self, o): return BinaryOp("+", self, _wrap(o))
    def __radd__(self, o): return BinaryOp("+", _wrap(o), self)
    def __sub__(self, o): return BinaryOp("-", self, _wrap(o))
    def __rsub__(self, o): return BinaryOp("-", _wrap(o), self)
    def __mul__(self, o): return BinaryOp("*", self, _wrap(o))
    def __rmul__(self, o): return BinaryOp("*", _wrap(o), self)
    def __truediv__(self, o): return BinaryOp("/", self, _wrap(o))
    def __rtruediv__(self, o): return BinaryOp("/", _wrap(o), self)
    def __floordiv__(self, o): return BinaryOp("//", self, _wrap(o))
    def __rfloordiv__(self, o): return BinaryOp("//", _wrap(o), self)
    def __mod__(self, o): return BinaryOp("%", self, _wrap(o))
    def __rmod__(self, o): return BinaryOp("%", _wrap(o), self)
    def __pow__(self, o): return BinaryOp("**", self, _wrap(o))
    def __rpow__(self, o): return BinaryOp("**", _wrap(o), self)
    def __neg__(self): return UnaryOp("-", self)
    def __abs__(self): return UnaryOp("abs", self)

    # --- comparison ---
    def __eq__(self, o): return BinaryOp("==", self, _wrap(o))  # type: ignore[override]
    def __ne__(self, o): return BinaryOp("!=", self, _wrap(o))  # type: ignore[override]
    def __lt__(self, o): return BinaryOp("<", self, _wrap(o))
    def __le__(self, o): return BinaryOp("<=", self, _wrap(o))
    def __gt__(self, o): return BinaryOp(">", self, _wrap(o))
    def __ge__(self, o): return BinaryOp(">=", self, _wrap(o))

    # --- boolean / bitwise (int operands -> bitwise, engine
    # expression.rs:218-222) ---
    def __and__(self, o): return BinaryOp("&", self, _wrap(o))
    def __rand__(self, o): return BinaryOp("&", _wrap(o), self)
    def __or__(self, o): return BinaryOp("|", self, _wrap(o))
    def __ror__(self, o): return BinaryOp("|", _wrap(o), self)
    def __xor__(self, o): return BinaryOp("^", self, _wrap(o))
    def __invert__(self): return UnaryOp("~", self)
    def __lshift__(self, o): return BinaryOp("<<", self, _wrap(o))
    def __rlshift__(self, o): return BinaryOp("<<", _wrap(o), self)
    def __rshift__(self, o): return BinaryOp(">>", self, _wrap(o))
    def __rrshift__(self, o): return BinaryOp(">>", _wrap(o), self)

    def __hash__(self):
        return hash(self._key())

    def __getitem__(self, item):
        return GetItem(self, _wrap(item), strict=True)

    def get(self, item, default=None):
        """Tuple/array/json element access (reference `expression.py:1090`)."""
        return GetItem(self, _wrap(item), strict=False, default=_wrap(default))

    def is_none(self):
        return IsNone(self)

    def is_not_none(self):
        return UnaryOp("not_null", self)

    def to_string(self):
        return CastExpr(self, T.StringType())

    # JSON conversion methods (reference expression.py:461-640); the
    # implementations live in functions/json_ops.py
    def as_int(self, *, default=None, unwrap=False):
        from .functions.json_ops import as_int
        out = as_int(self)
        return out if default is None else Coalesce(out, _wrap(default))

    def as_float(self, *, default=None, unwrap=False):
        from .functions.json_ops import as_float
        out = as_float(self)
        return out if default is None else Coalesce(out, _wrap(default))

    def as_str(self, *, default=None, unwrap=False):
        from .functions.json_ops import as_str
        out = as_str(self)
        return out if default is None else Coalesce(out, _wrap(default))

    def as_bool(self, *, default=None, unwrap=False):
        from .functions.json_ops import as_bool
        out = as_bool(self)
        return out if default is None else Coalesce(out, _wrap(default))

    # namespaces (constructed lazily to avoid import cycles)
    @property
    def str(self):
        from .functions.strings import StringNamespace
        return StringNamespace(self)

    @property
    def dt(self):
        from .functions.datetimes import DateTimeNamespace
        return DateTimeNamespace(self)

    @property
    def num(self):
        from .functions.numerical import NumericalNamespace
        return NumericalNamespace(self)


class Literal(ColumnExpression):
    def __init__(self, value: Any):
        self._value = value

    def _to_col(self, ctx: EvalContext) -> Column:
        v = self._value
        if isinstance(v, (list, tuple)):
            return F.array(*[to_col(x, ctx) for x in v])
        return F.lit(v)

    def _key(self) -> str:
        return f"lit({self._value!r}:{type(self._value).__name__})"


class ColumnReference(ColumnExpression):
    def __init__(self, side: str, name: str, table=None):
        self._side = side
        self._name = name
        self._table = table

    @property
    def name(self) -> str:
        return self._name

    @property
    def table(self):
        """The Table this reference was taken from (reference
        `expression.ColumnReference.table`) — bound when created via
        `table.col` / `table[col]`; unbound `pw.this` refs have none."""
        if self._table is None:
            raise AttributeError(
                f"column reference {self._name!r} is not bound to a table "
                "(use table.column, not pw.this.column, where an owning "
                "table is required)")
        return self._table

    def _to_col(self, ctx: EvalContext) -> Column:
        return ctx.ref(self)

    def _key(self) -> str:
        return f"ref({self._side}.{self._name})"

    def __repr__(self) -> str:
        return f"<{self._side}>.{self._name}"


def _floormod(a: Column, b: Column) -> Column:
    """Python floor-modulo: result takes the DIVISOR's sign. Spark's %
    truncates (sign of dividend) and pmod forces non-negative — both
    wrong for negative divisors (pmod(1,-2)=1, python 1%-2=-1). b=0
    poisons to NULL per the engine error model."""
    r = F.try_mod(a, b)
    return F.when(r.isNotNull() & (r != 0) & ((r < 0) != (b < 0)), r + b) \
            .otherwise(r)


def _floordiv(a: Column, b: Column) -> Column:
    m = _floormod(a, b)
    return ((a - m).cast("decimal(38,0)") / b).cast("long")


_BINOPS: dict[str, Callable[[Column, Column], Column]] = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    # NULL-on-/0 matches the engine error model (Value::Error -> NULL cell)
    "/": lambda a, b: F.try_divide(a, b),
    # floor-div must stay exact for 64-bit ints (ns timestamps exceed
    # double's 53-bit mantissa): a - floormod(a,b) is exactly divisible,
    # and decimal division of it is exact — no double rounding anywhere.
    "//": lambda a, b: _floordiv(a, b),
    "%": lambda a, b: _floormod(a, b),
    "**": lambda a, b: F.pow(a, b),
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "&": lambda a, b: a & b,
    "|": lambda a, b: a | b,
    "^": lambda a, b: a != b,
}


class BinaryOp(ColumnExpression):
    def __init__(self, op: str, lhs: ColumnExpression, rhs: ColumnExpression):
        self._op = op
        self._lhs = lhs
        self._rhs = rhs

    @staticmethod
    def _dtype_hint(e: "ColumnExpression", ctx: EvalContext) -> str | None:
        """Best-effort static type of an operand (column refs + literals);
        None where unknown — callers then assume numeric."""
        if isinstance(e, Literal):
            v = e._value
            if isinstance(v, str):
                return "string"
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, int):
                return "bigint"
            if isinstance(v, float):
                return "double"
            return None
        if isinstance(e, ColumnReference) and hasattr(ctx, "dtype_of"):
            return ctx.dtype_of(e)
        return None

    def _to_col(self, ctx: EvalContext) -> Column:
        lhs = self._lhs._to_col(ctx)
        rhs = self._rhs._to_col(ctx)
        lt = self._dtype_hint(self._lhs, ctx)
        rt = self._dtype_hint(self._rhs, ctx)
        if self._op == "+" and ("string" in (lt, rt)):
            # str + str concatenates (engine expression.rs string Add);
            # also covers array ++ via Spark's concat overload
            return F.concat(lhs, rhs)
        if self._op == "+" and lt is not None and rt is not None \
                and lt.startswith("array") and rt.startswith("array"):
            return F.concat(lhs, rhs)
        if self._op == "*" and ("string" in (lt, rt)):
            # str * int repeats (engine expression.rs string Mul)
            s, n = (lhs, rhs) if lt == "string" else (rhs, lhs)
            return F.repeat(s, n.cast("int"))
        if self._op == "**" and lt in (None, "bigint", "int", "smallint",
                                       "tinyint") \
                and rt in ("bigint", "int", "smallint", "tinyint") \
                and lt is not None:
            # int ** int stays integer (engine expression.rs:1077
            # l.pow(r as u32)); exact up to 2^53 via double pow
            return F.pow(lhs, rhs).cast("long")
        floats = ("double", "float")
        if self._op == "//" and (lt in floats or rt in floats):
            # float floordiv returns FLOAT (engine expression.rs:1161
            # (l/r).floor()); /0 poisons to NULL. Spark's floor() yields
            # BIGINT (clamps |q| ≥ 2^63, loses ±inf); above 2^53 every
            # double is already integral, so pass q through there.
            q = F.try_divide(lhs, rhs)
            return (
                F.when(F.isnan(q) | (F.abs(q) >= F.lit(2.0 ** 53)), q)
                .otherwise(F.floor(q).cast("double"))
            )
        if self._op == "%" and (lt in floats or rt in floats):
            # CPython float mod (expression.rs:1175 mirrors floatobject.c):
            # sign follows the divisor; exact-zero result copies r's sign
            base = F.when(rhs != 0, lhs % rhs)
            return (
                F.when(base.isNull(), F.lit(None).cast("double"))
                .when((base != 0) & ((base < 0) != (rhs < 0)), base + rhs)
                .when(base == 0, F.signum(rhs) * F.lit(0.0))
                .otherwise(base)
            )
        ints = ("bigint", "int", "smallint", "tinyint")
        if self._op in ("&", "|", "^") and (lt in ints or rt in ints):
            # int operands take BITWISE semantics (expression.rs:220-222)
            fn = {"&": Column.bitwiseAND, "|": Column.bitwiseOR,
                  "^": Column.bitwiseXOR}[self._op]
            return fn(lhs, rhs)
        if self._op == "<<":
            # wrapping shl isn't expressible without UDFs; a * 2^b with
            # overflow -> NULL follows the error model instead
            return F.try_multiply(
                lhs.cast("long"),
                F.pow(F.lit(2.0), rhs.cast("int")).cast("long"))
        if self._op == ">>":
            # python/engine >> is ARITHMETIC (floor) shift
            return _floordiv(lhs.cast("long"),
                             F.pow(F.lit(2.0), rhs.cast("int")).cast("long"))
        return _BINOPS[self._op](lhs, rhs)

    def _key(self) -> str:
        return f"({self._lhs._key()}{self._op}{self._rhs._key()})"


class UnaryOp(ColumnExpression):
    def __init__(self, op: str, arg: ColumnExpression):
        self._opname = op
        self._arg = arg

    def _to_col(self, ctx: EvalContext) -> Column:
        c = self._arg._to_col(ctx)
        if self._opname == "-":
            return -c
        if self._opname == "~":
            return ~c
        if self._opname == "not_null":
            return c.isNotNull()
        if self._opname == "abs":
            return F.abs(c)
        raise ValueError(self._opname)

    def _key(self) -> str:
        return f"{self._opname}({self._arg._key()})"


class IsNone(ColumnExpression):
    def __init__(self, arg: ColumnExpression):
        self._arg = arg

    def _to_col(self, ctx: EvalContext) -> Column:
        return self._arg._to_col(ctx).isNull()

    def _key(self) -> str:
        return f"isnone({self._arg._key()})"


class IfElse(ColumnExpression):
    """`pw.if_else(cond, then, else_)` (reference `internals/common.py:328`)."""

    def __init__(self, cond, then, else_):
        self._cond = _wrap(cond)
        self._then = _wrap(then)
        self._else = _wrap(else_)

    def _to_col(self, ctx: EvalContext) -> Column:
        return F.when(self._cond._to_col(ctx), self._then._to_col(ctx)).otherwise(
            self._else._to_col(ctx)
        )

    def _key(self) -> str:
        return f"ifelse({self._cond._key()},{self._then._key()},{self._else._key()})"


class Coalesce(ColumnExpression):
    def __init__(self, *args):
        self._args = [_wrap(a) for a in args]

    def _to_col(self, ctx: EvalContext) -> Column:
        return F.coalesce(*[a._to_col(ctx) for a in self._args])

    def _key(self) -> str:
        return "coalesce(" + ",".join(a._key() for a in self._args) + ")"


class MakeTuple(ColumnExpression):
    def __init__(self, *args):
        self._args = [_wrap(a) for a in args]

    def _to_col(self, ctx: EvalContext) -> Column:
        return F.struct(*[a._to_col(ctx).alias(f"_{i}") for i, a in enumerate(self._args)])

    def _key(self) -> str:
        return "tuple(" + ",".join(a._key() for a in self._args) + ")"


class GetItem(ColumnExpression):
    def __init__(self, base, item, strict: bool, default=None):
        self._base = _wrap(base)
        self._item = _wrap(item)
        self._strict = strict
        self._default = default

    def _base_is_struct(self, ctx: EvalContext) -> bool:
        if isinstance(self._base, MakeTuple):
            return True
        if isinstance(self._base, ColumnReference) and hasattr(ctx, "dtype_of"):
            dt = ctx.dtype_of(self._base)
            return dt is not None and dt.startswith("struct")
        return False

    def _is_json_base(self, ctx: EvalContext) -> bool:
        # our Json cells are JSON text (string columns); struct/map cells
        # take getField. A nested get() on a JSON column yields JSON text
        # again, so the flag propagates through chained gets.
        if getattr(self._base, "_compiled_json", False):
            return True
        if isinstance(self._base, ColumnReference) and hasattr(ctx, "dtype_of"):
            return ctx.dtype_of(self._base) == "string"
        return False

    def _to_col(self, ctx: EvalContext) -> Column:
        base = self._base._to_col(ctx)
        item = self._item
        if isinstance(item, Literal) and isinstance(item._value, str):
            if self._is_json_base(ctx):
                self._compiled_json = True
                out = F.get_json_object(base, f"$.{item._value}")
            else:
                out = base.getField(item._value)
        elif isinstance(item, Literal) and isinstance(item._value, int) \
                and self._base_is_struct(ctx):
            # make_tuple compiles to struct<_0,_1,...>: integer index →
            # positional field (heterogeneous tuples can't be arrays)
            out = base.getField(f"_{item._value}")
        else:
            idx = item._to_col(ctx)
            # pathway tuples are 0-indexed; element_at is 1-indexed.
            # non-strict get() tolerates out-of-bounds (NULL + default).
            one_based = (idx + F.lit(1)).cast("int")
            out = (
                F.element_at(base, one_based)
                if self._strict
                else F.try_element_at(base, one_based)
            )
        if not self._strict and self._default is not None:
            out = F.coalesce(out, self._default._to_col(ctx))
        return out

    def _key(self) -> str:
        return f"get({self._base._key()},{self._item._key()},{self._strict})"


class CastExpr(ColumnExpression):
    def __init__(self, arg, dtype, try_: bool = False):
        self._arg = _wrap(arg)
        self._dtype = dtype
        self._try = try_

    def _to_col(self, ctx: EvalContext) -> Column:
        from .schema import to_spark_type
        st = to_spark_type(self._dtype)
        c = self._arg._to_col(ctx)
        return c.try_cast(st) if self._try else c.cast(st)

    def _key(self) -> str:
        return f"cast({self._arg._key()},{self._dtype},{self._try})"


class SparkFunc(ColumnExpression):
    """Escape hatch: apply a pyspark Column->Column function to sub-expressions.

    Used by all scalar namespaces — keeps everything JVM-side.
    """

    def __init__(self, name: str, fn: Callable[..., Column], *args):
        self._fname = name
        self._fn = fn
        self._args = [_wrap(a) for a in args]

    def _to_col(self, ctx: EvalContext) -> Column:
        return self._fn(*[a._to_col(ctx) for a in self._args])

    def _key(self) -> str:
        return f"{self._fname}(" + ",".join(a._key() for a in self._args) + ")"


class ApplyExpression(ColumnExpression):
    """`pw.apply(f, *args)` — python UDF applied rowwise
    (reference `internals/common.py:96`). Compiled to an Arrow-batched
    pandas UDF when `vectorized=True` (callable takes pandas Series),
    else a scalar python UDF (the slow path, kept for parity)."""

    _counter = 0

    def __init__(self, fn, result_type, *args, vectorized=False):
        self._fn = fn
        self._result_type = result_type
        self._args = [_wrap(a) for a in args]
        self._vectorized = vectorized
        ApplyExpression._counter += 1
        self._id = ApplyExpression._counter

    def _to_col(self, ctx: EvalContext) -> Column:
        from .schema import to_spark_type
        st = to_spark_type(self._result_type) if self._result_type else T.StringType()
        if self._vectorized:
            udf = F.pandas_udf(self._fn, st)
        else:
            udf = F.udf(self._fn, st)
        return udf(*[a._to_col(ctx) for a in self._args])

    def _key(self) -> str:
        return f"apply#{self._id}(" + ",".join(a._key() for a in self._args) + ")"


class ReducerExpression(ColumnExpression):
    """An aggregation atom, e.g. `pw.reducers.sum(pw.this.x)`.

    Only valid inside `GroupedTable.reduce` / `WindowedTable.reduce`
    (reference `internals/reducers.py`). `agg_fn` maps arg Columns to a
    single aggregate Column.
    """

    def __init__(self, name: str, agg_fn: Callable[..., Column], *args,
                 needs_id: bool = False, is_pandas_agg: bool = False):
        self._name = name
        self._agg_fn = agg_fn
        self._args = [_wrap(a) for a in args]
        self._needs_id = needs_id
        # pandas GROUPED_AGG UDFs can't share a .agg() with plain
        # aggregates — GroupedTable.reduce splits on this flag
        self._is_pandas_agg = is_pandas_agg

    def _to_col(self, ctx: EvalContext) -> Column:
        return ctx.reducer(self)

    def _agg_col(self, row_ctx: EvalContext) -> Column:
        return self._agg_fn(*[a._to_col(row_ctx) for a in self._args])

    def _key(self) -> str:
        return f"red:{self._name}(" + ",".join(a._key() for a in self._args) + ")"


# ---------------------------------------------------------------------------
# this / left / right sentinels
# ---------------------------------------------------------------------------


class _ThisLike:
    def __init__(self, side: str):
        object.__setattr__(self, "_side", side)

    def __getattr__(self, name: str) -> ColumnReference:
        if name.startswith("__"):
            raise AttributeError(name)
        return ColumnReference(self._side, name)

    def __getitem__(self, name: str) -> ColumnReference:
        return ColumnReference(self._side, name)

    @property
    def id(self) -> ColumnReference:
        return ColumnReference(self._side, "_pw_id")


this = _ThisLike("this")
left = _ThisLike("left")
right = _ThisLike("right")


# ---------------------------------------------------------------------------
# free functions (pw.* surface; reference `internals/common.py`)
# ---------------------------------------------------------------------------


def if_else(cond, then, else_):
    return IfElse(cond, then, else_)


def coalesce(*args):
    return Coalesce(*args)


def require(value, *conds):
    """NULL unless all conds are non-null (reference `common.py:302`)."""
    out = _wrap(value)
    cond: ColumnExpression | None = None
    for c in conds:
        c = UnaryOp("not_null", _wrap(c))
        cond = c if cond is None else BinaryOp("&", cond, c)
    if cond is None:
        return out
    return IfElse(cond, out, Literal(None))


def unwrap(value):
    """Assert non-null (reference `common.py:399`); errors on NULL."""
    v = _wrap(value)
    return SparkFunc(
        "unwrap",
        lambda c: F.when(c.isNotNull(), c).otherwise(
            F.raise_error(F.lit("unwrap() on None value"))
        ),
        v,
    )


def fill_error(value, fallback):
    """Reference `common.py:438`: replace error cells. Our error model is
    NULL-based (see SURVEY §1.2 note), so fill_error == coalesce."""
    return Coalesce(value, fallback)


def make_tuple(*args):
    return MakeTuple(*args)


def cast(dtype, value):
    return CastExpr(value, dtype)


def declare_type(dtype, value):
    return CastExpr(value, dtype)


def apply(fn, *args):
    return ApplyExpression(fn, None, *args)


def apply_with_type(fn, result_type, *args):
    return ApplyExpression(fn, result_type, *args)


def apply_async(fn, *args):
    """Async UDF: resolved within the batch (SURVEY §2.9) — we wrap the
    coroutine function and run it synchronously per row-batch."""
    import asyncio

    def sync_fn(*a):
        return asyncio.run(fn(*a))

    return ApplyExpression(sync_fn, None, *args)
