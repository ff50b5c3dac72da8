"""`pw.graphs` — reference `python/pathway/stdlib/graphs/__init__.py`
(bellman_ford, pagerank, louvain_communities, Vertex/Edge/Graph classes).

Algorithms live in `operators/iterate.py` as driver-side fixed-point loops
over DataFrame steps (each step is pure Spark: join + groupBy, with
localCheckpoint to cut lineage — the pattern that scales to a cluster)."""

from __future__ import annotations

from typing import Any

from ..operators.iterate import (
    bellman_ford,
    connected_components,
    louvain_communities,
    pagerank,
)
from ..schema import Schema
from ..table import Table


class Vertex(Schema):
    pass


class Edge(Schema):
    """Endpoints carried as id-hash longs (reference graphs/common.py:14
    uses Pointer columns u, v)."""

    u: int
    v: int


class Weight(Schema):
    weight: float


class Cluster(Schema):
    pass


class Clustering(Schema):
    cluster: int


class Graph:
    """reference graphs/graph.py — a (V, E) pair of tables."""

    def __init__(self, V: Table, E: Table):
        self.V = V
        self.E = E

    def without_self_loops(self) -> "Graph":
        return Graph(self.V, self.E.filter(self.E.u != self.E.v))


class WeightedGraph(Graph):
    def __init__(self, V: Table, WE: Table):
        super().__init__(V, WE)
        self.WE = WE


__all__ = [
    "bellman_ford", "pagerank", "louvain_communities",
    "connected_components", "Edge", "Graph", "Vertex", "Weight",
    "Cluster", "Clustering", "WeightedGraph",
]
