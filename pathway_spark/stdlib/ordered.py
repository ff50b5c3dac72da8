"""`pw.stdlib.ordered` — reference `python/pathway/stdlib/ordered/__init__.py`."""

from __future__ import annotations

from ..table import Table


def diff(table: Table, timestamp, *values, instance=None) -> Table:
    """Function form of Table.diff (reference stdlib/ordered/diff.py)."""
    return table.diff(timestamp, *values, instance=instance)


__all__ = ["diff"]
