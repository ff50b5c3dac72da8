"""`pw.xpacks` — extension packs (reference `python/pathway/xpacks/`)."""

from . import llm

__all__ = ["llm"]
