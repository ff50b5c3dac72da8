"""`pw.ml.datasets` — reference `stdlib/ml/datasets/__init__.py`."""

from __future__ import annotations

from . import classification

__all__ = ["classification"]
