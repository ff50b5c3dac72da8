"""Reducers (aggregation functions) — `pw.reducers.*`.

Mirrors the reference (`python/pathway/internals/reducers.py`; engine enum
`src/engine/reduce.rs:27-45`). Every reducer compiles to a built-in Spark
aggregate so partial (map-side) aggregation and codegen apply; custom folds
go through `stateful_many` / `udf_reducer` -> `applyInPandas`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .expressions import ColumnExpression, ReducerExpression, this


def sum(expr, strict: bool = False) -> ReducerExpression:  # noqa: A001
    """reducers.py:350. Array-valued sums: use `array_sum`.

    `strict` mirrors the reference's float-sum switch
    (`src/engine/reduce.rs:31` FloatSum{strict}): the default keeps a
    RUNNING Neumaier-compensated sum in the differential engine (O(δ)
    per batch, reference `FloatSumState`); `strict=True` recomputes the
    group's sum from its full multiset every update (reference
    `FloatSumReducer`), trading throughput for recompute-grade floats.
    Batch (non-differential) reduces always recompute, so the flag only
    changes incremental behavior."""
    return ReducerExpression("sum_strict" if strict else "sum",
                             F.sum, expr)


def min(expr) -> ReducerExpression:  # noqa: A001
    return ReducerExpression("min", F.min, expr)


def max(expr) -> ReducerExpression:  # noqa: A001
    return ReducerExpression("max", F.max, expr)


def count(*args) -> ReducerExpression:
    if args:
        return ReducerExpression("count", F.count, args[0])
    return ReducerExpression("count", lambda: F.count(F.lit(1)))


def avg(expr) -> ReducerExpression:
    """reducers.py:675 (sugar for sum/count)."""
    return ReducerExpression("avg", F.avg, expr)


def argmin(value, arg=None) -> ReducerExpression:
    """reducers.py:406 — id (or `arg`) of the row minimizing `value`."""
    if arg is None:
        arg = this.id
    return ReducerExpression("argmin", lambda a, v: F.min_by(a, v), arg, value)


def argmax(value, arg=None) -> ReducerExpression:
    """reducers.py:463."""
    if arg is None:
        arg = this.id
    return ReducerExpression("argmax", lambda a, v: F.max_by(a, v), arg, value)


def unique(expr) -> ReducerExpression:
    """reducers.py:520 — errors if more than one distinct value per group."""

    def agg(c: Column) -> Column:
        return F.when(
            F.count_distinct(c) <= 1, F.any_value(c, ignoreNulls=True)
        ).otherwise(F.raise_error(F.lit("unique(): more than one distinct value")))

    return ReducerExpression("unique", agg, expr)


def any(expr) -> ReducerExpression:  # noqa: A001
    """reducers.py:551 — an arbitrary (deterministic-ish) element; we pick
    min for cross-run determinism (reference picks an engine-dependent one)."""
    return ReducerExpression("any", F.min, expr)


def sorted_tuple(expr, *, skip_nones: bool = False) -> ReducerExpression:
    """reducers.py:579."""
    return ReducerExpression("sorted_tuple", lambda c: F.sort_array(F.collect_list(c)), expr)


class OrderedReducer(ReducerExpression):
    """Order-sensitive collector: with `groupby(sort_by=...)` the values
    are collected as (sort_key, value) structs, sorted post-agg, and
    unwrapped — deterministic regardless of partitioning. Without
    sort_by, falls back to partition-order collect_list."""

    def _agg_col_sorted(self, row_ctx, sort_col: Column) -> Column:
        val = self._args[0]._to_col(row_ctx)
        collected = F.collect_list(F.struct(sort_col.alias("k"), val.alias("v")))
        return F.transform(F.array_sort(collected), lambda s: s["v"])


def tuple(expr, *, skip_nones: bool = False) -> OrderedReducer:  # noqa: A001
    """reducers.py:610 — collect in input order (use groupby(sort_by=...)
    for a deterministic order; bare collect_list order is
    partition-dependent)."""
    return OrderedReducer("tuple", F.collect_list, expr)


def ndarray(expr) -> OrderedReducer:
    """reducers.py:700 — same as tuple, numpy semantics on the client."""
    return OrderedReducer("ndarray", F.collect_list, expr)


def earliest(expr, time=None) -> ReducerExpression:
    """reducers.py:735 — value of the first-arriving row. Batch: min by the
    time column (arrival order == event order in replayed batch)."""
    t = time if time is not None else this._pw_time
    return ReducerExpression("earliest", lambda c, tc: F.min_by(c, tc), expr, t)


def latest(expr, time=None) -> ReducerExpression:
    """reducers.py:769."""
    t = time if time is not None else this._pw_time
    return ReducerExpression("latest", lambda c, tc: F.max_by(c, tc), expr, t)


def count_distinct(expr) -> ReducerExpression:
    """reducers.py:808."""
    return ReducerExpression("count_distinct", F.count_distinct, expr)


def count_distinct_approximate(expr, precision: int = 12) -> ReducerExpression:
    """reducers.py:837 (engine reduce.rs:30) — HLL-based approximate count.
    rsd ~= 1.04 / sqrt(2^precision)."""
    rsd = 1.04 / (2.0 ** (precision / 2.0))
    return ReducerExpression(
        "count_distinct_approx", lambda c: F.approx_count_distinct(c, rsd), expr
    )


def array_sum(expr) -> ReducerExpression:
    """Elementwise sum of array-typed column (reducers.py:350 array case)."""

    def agg(c: Column) -> Column:
        return F.reduce(
            F.collect_list(c),
            F.lit(None).cast("array<double>"),
            lambda acc, x: F.when(acc.isNull(), x).otherwise(
                F.zip_with(acc, x, lambda a, b: a + b)
            ),
        )

    return ReducerExpression("array_sum", agg, expr)


def _grouped_python_fold(name: str, fold, result_type, args) -> ReducerExpression:
    """Shared compile path for python custom reducers: a pandas
    GROUPED_AGG UDF — the group's column values arrive as Arrow-batched
    pandas Series (no collect_list array materialization, no per-row
    python calls), folded once per group. Same non-distributed-within-
    group semantics as the reference's python reducers
    (`custom_reducers.py`); GroupedTable.reduce runs these in a separate
    aggregation joined back on the group keys when a reduce also uses
    built-in reducers (Spark disallows mixing them in one agg)."""
    from pyspark.sql import types as T

    from .schema import to_spark_type

    rt = to_spark_type(result_type) if result_type is not None else T.StringType()

    def agg(*cols: Column) -> Column:
        import inspect

        import pandas as pd

        def run(*series) -> object:
            rows = [list(t) for t in zip(*[s.tolist() for s in series])]
            return fold(rows)

        run.__name__ = "pw_custom_reducer"
        # pandas_udf infers GROUPED_AGG from the signature — pin an
        # exact-arity (Series, ..., Series) -> scalar one on the varargs fn
        params = [
            inspect.Parameter(f"s{i}", inspect.Parameter.POSITIONAL_OR_KEYWORD,
                              annotation=pd.Series)
            for i in range(len(cols))
        ]
        run.__signature__ = inspect.Signature(params, return_annotation=float)
        run.__annotations__ = {f"s{i}": pd.Series for i in range(len(cols))}
        run.__annotations__["return"] = float
        pudf = F.pandas_udf(run, rt)
        return pudf(*cols)

    return ReducerExpression(name, agg, *args, is_pandas_agg=True)


def stateful_many(fn, *args, result_type=None) -> ReducerExpression:
    """reference `internals/custom_reducers.py:36` — arbitrary python fold
    over all of a group's rows: fn(state=None, rows) -> state."""
    rt = result_type or fn.__annotations__.get("return")

    def fold(rows):
        return fn(None, rows)

    return _grouped_python_fold("stateful_many", fold, rt, args)


def stateful_single(fn, *args, result_type=None) -> ReducerExpression:
    """reference `custom_reducers.py:111` — per-row fold:
    fn(state, *values) -> state, applied row by row."""
    rt = result_type or fn.__annotations__.get("return")

    def fold(rows):
        state = None
        for r in rows:
            state = fn(state, *r)
        return state

    return _grouped_python_fold("stateful_single", fold, rt, args)


class BaseCustomAccumulator:
    """reference `custom_reducers.py:177` — subclass with from_row /
    update / compute_result (retract unused in batch; snapshots replace
    diff streams)."""

    @classmethod
    def from_row(cls, row):
        raise NotImplementedError

    def update(self, other) -> None:
        raise NotImplementedError

    def compute_result(self):
        raise NotImplementedError


def udf_reducer(accumulator_cls, *, result_type=None):
    """reference `custom_reducers.py:282` — accumulator-class reducer:
    ``reducer = pw.reducers.udf_reducer(MyAcc)``, then ``reducer(cols…)``
    inside a reduce."""

    def make(*exprs) -> ReducerExpression:
        rt = result_type or accumulator_cls.compute_result.__annotations__.get("return")

        def fold(rows):
            acc = None
            for r in rows:
                nxt = accumulator_cls.from_row(r)
                if acc is None:
                    acc = nxt
                else:
                    acc.update(nxt)
            return None if acc is None else acc.compute_result()

        return _grouped_python_fold(
            f"udf_reducer:{accumulator_cls.__name__}", fold, rt, exprs
        )

    return make
