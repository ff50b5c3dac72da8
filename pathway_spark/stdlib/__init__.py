"""`pw.stdlib` namespace parity (reference `python/pathway/stdlib/`)."""

from types import SimpleNamespace

from ..operators import temporal
from ..operators.iterate import bellman_ford, connected_components, pagerank
from ..operators.sort import diff, interpolate
from . import graphs
from . import utils
from .utils import AsyncTransformer, pandas_transformer
ordered = SimpleNamespace(diff=diff)
statistical = SimpleNamespace(interpolate=interpolate)


def _deduplicate(table, *, value=None, instance=None, acceptor=None, name=None):
    return table.deduplicate(value=value, instance=instance, acceptor=acceptor, name=name)


stateful = SimpleNamespace(deduplicate=_deduplicate)
