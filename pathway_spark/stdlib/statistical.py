"""`pw.statistical` — reference `python/pathway/stdlib/statistical/__init__.py`."""

from ..operators.sort import interpolate

__all__ = ["interpolate"]
