"""`pw.stdlib.stateful` — reference `python/pathway/stdlib/stateful/__init__.py`."""

from __future__ import annotations

from ..table import Table


def deduplicate(table: Table, *, value=None, instance=None, acceptor=None,
                name=None) -> Table:
    """Function form of Table.deduplicate (reference stdlib/stateful/deduplicate.py)."""
    return table.deduplicate(value=value, instance=instance,
                             acceptor=acceptor, name=name)


__all__ = ["deduplicate"]
