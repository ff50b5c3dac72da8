"""`pw.utils` parity — reference `python/pathway/stdlib/utils/__init__.py`
exports the submodules async_transformer, bucketing, col, filtering,
pandas_transformer; the AsyncTransformer class and pandas_transformer
callable are re-exported at the package top level (as the reference's
`pathway/__init__.py:88-89` does).
"""

from __future__ import annotations

from . import async_transformer, bucketing, col, filtering
from .async_transformer import AsyncTransformer
from .pandas_transformer import pandas_transformer

# `pw.utils.pandas_transformer` is the MODULE in the reference; the
# callable reaches users via `pw.pandas_transformer`. Both resolve here:
# attribute access on this package finds the module; calling the name
# imported above finds the function.
__all__ = [
    "async_transformer", "bucketing", "col", "filtering",
    "pandas_transformer", "AsyncTransformer",
]
