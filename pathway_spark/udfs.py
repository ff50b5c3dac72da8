"""`pw.udf` — reference `python/pathway/internals/udfs/__init__.py:68`.

Compiled to Arrow-batched pandas UDFs when possible (executor='auto' with
a scalar python function wraps it elementwise inside a pandas UDF — one
GIL crossing per batch, not per row). `cache_strategy` memoizes within
the process (executor-local LRU); `deterministic` marks the Spark UDF.
"""

from __future__ import annotations

import asyncio
import functools
import hashlib
import os
import pickle
import random
import tempfile
import time
from typing import Any, Callable

from .expressions import ApplyExpression, ColumnExpression


# ---------------------------------------------------------------------------
# cache strategies (reference udfs.py exports: CacheStrategy, DefaultCache,
# DiskCache, InMemoryCache). Caches are EXECUTOR-LOCAL by design: on a real
# cluster each executor process keeps its own memo table, which is the only
# cache locality that avoids a shuffle/coordination cost.
# ---------------------------------------------------------------------------

class CacheStrategy:
    """Base class. Subclasses wrap a scalar function in a memo layer."""

    def wrap(self, fn: Callable) -> Callable:  # pragma: no cover - abstract
        return fn


class InMemoryCache(CacheStrategy):
    def __init__(self, max_size: int | None = 100_000):
        self.max_size = max_size

    def wrap(self, fn: Callable) -> Callable:
        # dict-based memo (not functools.lru_cache: its C wrapper can't be
        # cloudpickled around a closure when Spark ships the UDF to workers)
        cache: dict = {}
        max_size = self.max_size

        @functools.wraps(fn)
        def wrapped(*args):
            if args in cache:
                return cache[args]
            out = fn(*args)
            if max_size is not None and len(cache) >= max_size:
                cache.pop(next(iter(cache)))
            cache[args] = out
            return out

        return wrapped


class DiskCache(CacheStrategy):
    """Pickle-per-key cache in a local directory (executor-local scratch —
    on a cluster this lands on the executor's local disk, never on the
    driver)."""

    def __init__(self, name: str | None = None, size_limit: int | None = None):
        self.name = name
        self.size_limit = size_limit

    def wrap(self, fn: Callable) -> Callable:
        base = os.path.join(
            tempfile.gettempdir(),
            f"pw_udf_cache_{self.name or getattr(fn, '__name__', 'udf')}",
        )
        os.makedirs(base, exist_ok=True)

        @functools.wraps(fn)
        def wrapped(*args):
            key = hashlib.sha256(pickle.dumps(args)).hexdigest()
            path = os.path.join(base, key)
            if os.path.exists(path):
                with open(path, "rb") as f:
                    return pickle.load(f)
            out = fn(*args)
            with open(path, "wb") as f:
                pickle.dump(out, f)
            return out

        return wrapped


class DefaultCache(DiskCache):
    """reference: DefaultCache engages the persistence-backed cache; here
    the executor-local disk cache is the equivalent durable layer."""


# ---------------------------------------------------------------------------
# retry strategies (reference udfs.py: AsyncRetryStrategy family)
# ---------------------------------------------------------------------------

class AsyncRetryStrategy:
    async def invoke(self, fn: Callable, /, *args, **kwargs):  # pragma: no cover
        return await fn(*args, **kwargs)


class NoRetryStrategy(AsyncRetryStrategy):
    async def invoke(self, fn, /, *args, **kwargs):
        return await fn(*args, **kwargs)


class FixedDelayRetryStrategy(AsyncRetryStrategy):
    def __init__(self, max_retries: int = 3, delay_ms: int = 1000):
        self._max_retries = max_retries
        self._delay = delay_ms / 1000

    def _next_delay(self, delay: float) -> float:
        return delay

    async def invoke(self, fn, /, *args, **kwargs):
        delay = self._delay
        for attempt in range(self._max_retries + 1):
            try:
                return await fn(*args, **kwargs)
            except Exception:
                if attempt == self._max_retries:
                    raise
                await asyncio.sleep(delay)
                delay = self._next_delay(delay)


class ExponentialBackoffRetryStrategy(FixedDelayRetryStrategy):
    def __init__(self, max_retries: int = 3, initial_delay_ms: int = 1000,
                 backoff_factor: float = 2.0, jitter_ms: int = 300):
        super().__init__(max_retries, initial_delay_ms)
        self._factor = backoff_factor
        self._jitter = jitter_ms / 1000

    def _next_delay(self, delay: float) -> float:
        return delay * self._factor + random.random() * self._jitter


# ---------------------------------------------------------------------------
# executors (reference udfs.py: auto/sync/async/fully_async executors).
# Async execution happens WITHIN an Arrow batch: the pandas UDF gathers all
# coroutines of the batch on one event loop, so concurrency = batch size
# (capped by `capacity`) with zero extra serialization.
# ---------------------------------------------------------------------------

class Executor:
    kind = "auto"


class SyncExecutor(Executor):
    kind = "sync"


class AsyncExecutor(Executor):
    kind = "async"

    def __init__(self, *, capacity: int | None = None,
                 timeout: float | None = None,
                 retry_strategy: AsyncRetryStrategy | None = None):
        self.capacity = capacity
        self.timeout = timeout
        self.retry_strategy = retry_strategy


class FullyAsyncExecutor(AsyncExecutor):
    kind = "fully_async"


def auto_executor() -> Executor:
    return Executor()


def sync_executor() -> Executor:
    return SyncExecutor()


def async_executor(*, capacity=None, timeout=None, retry_strategy=None) -> Executor:
    return AsyncExecutor(capacity=capacity, timeout=timeout,
                         retry_strategy=retry_strategy)


def fully_async_executor(*, capacity=None, timeout=None, retry_strategy=None) -> Executor:
    """Reference returns futures resolved later; Spark resolves within the
    batch (`Table.await_futures` is then a no-op)."""
    return FullyAsyncExecutor(capacity=capacity, timeout=timeout,
                              retry_strategy=retry_strategy)


def _run_async_batch(fn, arg_rows, *, capacity=None, timeout=None,
                     retry_strategy=None):
    """Gather fn(*row) for every row of the batch on one event loop."""

    async def runner():
        sem = asyncio.Semaphore(capacity) if capacity else None
        strategy = retry_strategy or NoRetryStrategy()

        async def one(row):
            async def call():
                coro = fn(*row)
                if timeout is not None:
                    return await asyncio.wait_for(coro, timeout)
                return await coro

            if sem is None:
                return await strategy.invoke(call)
            async with sem:
                return await strategy.invoke(call)

        return await asyncio.gather(*[one(r) for r in arg_rows])

    return asyncio.run(runner())


# ---------------------------------------------------------------------------
# function combinators (reference udfs.py: coerce_async, async_options, …)
# ---------------------------------------------------------------------------

def coerce_async(fn: Callable) -> Callable:
    """Wrap a sync function as async (runs inline; reference semantics)."""
    if asyncio.iscoroutinefunction(fn):
        return fn

    @functools.wraps(fn)
    async def wrapped(*args, **kwargs):
        return fn(*args, **kwargs)

    return wrapped


def with_timeout(fn: Callable, timeout: float) -> Callable:
    fn = coerce_async(fn)

    @functools.wraps(fn)
    async def wrapped(*args, **kwargs):
        return await asyncio.wait_for(fn(*args, **kwargs), timeout)

    return wrapped


def with_retry_strategy(fn: Callable, retry_strategy: AsyncRetryStrategy) -> Callable:
    fn = coerce_async(fn)

    @functools.wraps(fn)
    async def wrapped(*args, **kwargs):
        return await retry_strategy.invoke(fn, *args, **kwargs)

    return wrapped


def with_capacity(fn: Callable, capacity: int) -> Callable:
    fn = coerce_async(fn)
    sem = asyncio.Semaphore(capacity)

    @functools.wraps(fn)
    async def wrapped(*args, **kwargs):
        async with sem:
            return await fn(*args, **kwargs)

    return wrapped


def with_cache_strategy(fn: Callable, cache_strategy: CacheStrategy) -> Callable:
    return cache_strategy.wrap(fn)


def async_options(*, capacity=None, timeout=None, retry_strategy=None,
                  cache_strategy=None) -> Callable:
    def decorate(fn):
        if retry_strategy is not None:
            fn = with_retry_strategy(fn, retry_strategy)
        if timeout is not None:
            fn = with_timeout(fn, timeout)
        if capacity is not None:
            fn = with_capacity(fn, capacity)
        if cache_strategy is not None:
            fn = with_cache_strategy(fn, cache_strategy)
        return fn

    return decorate


class UDF:
    def __init__(self, fn: Callable, return_type: Any = None, *,
                 deterministic: bool = True, cache_strategy=None,
                 executor: "Executor | str" = "auto", **kw):
        self._fn = fn
        self._return_type = return_type or fn.__annotations__.get("return")
        self._deterministic = deterministic
        self._cache = cache_strategy
        self._executor = executor
        functools.update_wrapper(self, fn)

    def __call__(self, *args) -> ColumnExpression:
        fn = self._fn
        if isinstance(self._cache, CacheStrategy):
            fn = self._cache.wrap(fn)
        elif self._cache is not None:
            fn = InMemoryCache().wrap(fn)

        import pandas as pd

        ex = self._executor if isinstance(self._executor, Executor) else None
        if asyncio.iscoroutinefunction(self._fn) or isinstance(ex, AsyncExecutor):
            afn = coerce_async(fn)
            capacity = getattr(ex, "capacity", None)
            timeout = getattr(ex, "timeout", None)
            retry = getattr(ex, "retry_strategy", None)

            def run_batch(rows):
                return _run_async_batch(afn, rows, capacity=capacity,
                                        timeout=timeout, retry_strategy=retry)
        else:
            def run_batch(rows):
                return [fn(*r) for r in rows]

        # pandas_udf requires a fixed-arity signature — synthesize one
        params = ", ".join(f"s{i}" for i in range(len(args)))
        vec = eval(  # noqa: S307 - generated from arity only
            f"lambda {params}: pd.Series(run_batch(list(zip({params}))))",
            {"pd": pd, "run_batch": run_batch},
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
