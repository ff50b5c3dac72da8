"""TPC-H extension suite (synthesized partsupp + ext columns) vs
DuckDB oracles — completes all 22 TPC-H queries together with
tests/test_tpch.py.

The oracle connection registers views over the SAME generated parquet
files Spark reads (pathway_spark.benchmarks.tpch_ext.ensure_ext), so
the comparison is engine-only."""

from __future__ import annotations

import decimal
import math

import pytest

from pathway_spark.benchmarks import tpch_ext
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


@pytest.fixture(scope="module")
def duck_ext():
    import duckdb

    ext = tpch_ext.ensure_ext(SF_DIR)
    con = duckdb.connect()
    for t in ("region", "nation", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    for t in tpch_ext.EXT_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{ext}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(tpch_ext.QUERIES))
def test_tpch_ext_matches_duckdb(name, spark, duck_ext):
    sdf = tpch_ext.QUERIES[name](spark, SF_DIR).to_df()
    scols = sorted(sdf.columns)
    srows = sorted(
        (tuple(r[c] for c in scols)
         for r in (row.asDict() for row in sdf.collect())),
        key=lambda t: tuple((x is None, str(x)) for x in t))

    res = duck_ext.execute(tpch_ext.ORACLE_SQL[name])
    dcols = [d[0] for d in res.description]
    assert sorted(dcols) == scols, f"{name}: columns {dcols} vs {scols}"
    idx = [dcols.index(c) for c in scols]
    drows = sorted(
        (tuple(r[i] for i in idx) for r in res.fetchall()),
        key=lambda t: tuple((x is None, str(x)) for x in t))

    assert len(srows) == len(drows), \
        f"{name}: {len(srows)} vs {len(drows)} rows"
    # structurally-guaranteed-nonempty queries must return rows even at
    # sf0.001; selective point queries (q2/q19/q20) may legitimately be
    # empty there — the engine match above is the real gate
    if name in ("tpch_q4", "tpch_q5", "tpch_q9", "tpch_q11", "tpch_q12",
                "tpch_q13", "tpch_q16", "tpch_q21"):
        assert len(srows) > 0, f"{name}: empty result"
    for i, (sr, dr) in enumerate(zip(srows, drows)):
        for c, (x, y) in zip(scols, zip(sr, dr)):
            assert _tol_eq(x, y), f"{name} row {i} col {c}: {x!r} != {y!r}"
