"""TPC-H suite (pathway_spark API) vs DuckDB oracles.

Strict on integers/strings/decimals; float columns compare with 1e-9
relative tolerance (avg/ratio columns are double in both engines but
summation order differs)."""

from __future__ import annotations

import decimal
import math

import pytest

from pathway_spark.benchmarks import tpch
from tests.conftest import SF_DIR


def _tol_eq(a, b):
    if isinstance(a, decimal.Decimal):
        a = float(a)
    if isinstance(b, decimal.Decimal):
        b = float(b)
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_matches_duckdb(name, spark, duck):
    sdf = tpch.QUERIES[name](spark, SF_DIR).to_df()
    scols = sorted(sdf.columns)
    srows = sorted(
        (tuple(r[c] for c in scols) for r in (row.asDict() for row in sdf.collect())),
        key=lambda t: tuple((x is None, str(x)) for x in t))

    res = duck.execute(tpch.ORACLE_SQL[name])
    dcols = [d[0] for d in res.description]
    assert sorted(dcols) == scols, f"{name}: columns {dcols} vs {scols}"
    idx = [dcols.index(c) for c in scols]
    drows = sorted(
        (tuple(r[i] for i in idx) for r in res.fetchall()),
        key=lambda t: tuple((x is None, str(x)) for x in t))

    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)} rows"
    for i, (sr, dr) in enumerate(zip(srows, drows)):
        for c, (x, y) in zip(scols, zip(sr, dr)):
            assert _tol_eq(x, y), f"{name} row {i} col {c}: {x!r} != {y!r}"
