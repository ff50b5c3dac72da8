"""`pw.universes` — key-set relation promises.

Reference: `python/pathway/universes.py:36-43`. The reference's universe
solver uses these promises to replace joins with column zips; on Spark,
Catalyst plans the id-join and dedups common lineage itself, so promises
only perform (optional, sampled) runtime validation and return the
table unchanged.
"""

from __future__ import annotations

from .table import ID, Table


def promise_is_subset_of(subset: Table, superset: Table, *, validate: bool = False) -> Table:
    if validate:
        extra = subset._df.select(ID).join(superset._df.select(ID), ID, "left_anti")
        assert extra.isEmpty(), "promise_is_subset_of violated"
    return subset

def promise_are_pairwise_disjoint(*tables: Table, validate: bool = False) -> tuple:
    if validate:
        for i, a in enumerate(tables):
            for b in tables[i + 1:]:
                dup = a._df.select(ID).join(b._df.select(ID), ID, "left_semi")
                assert dup.isEmpty(), "promise_are_pairwise_disjoint violated"
    return tables


def promise_are_equal(*tables: Table, validate: bool = False) -> tuple:
    if validate:
        for a in tables[1:]:
            da, db = tables[0]._df.select(ID), a._df.select(ID)
            assert da.exceptAll(db).isEmpty() and db.exceptAll(da).isEmpty(), \
                "promise_are_equal violated"
    return tables
