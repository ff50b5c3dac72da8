"""Property-based semantics tests (hypothesis): expression compilation
must match the reference's Python-value semantics on arbitrary inputs —
especially the places where Spark's defaults differ (truncating int
division vs Python floor division, sign of modulo, division by zero
poisoning to NULL).

Each property generates a batch of rows and runs ONE Spark job over the
whole batch (not one job per example) to keep runtime bounded.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pathway_spark as pw
from pathway_spark.table import Table

ints = st.integers(min_value=-(2**31), max_value=2**31 - 1)
small_strings = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                           max_codepoint=0x7F),
    max_size=12)

SET = settings(max_examples=5, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(st.lists(st.tuples(ints, ints.filter(lambda v: v != 0)),
                min_size=1, max_size=60))
@SET
def test_int_arithmetic_matches_python(spark, pairs):
    t = Table.from_spark(spark.createDataFrame(pairs, "a long, b long"))
    out = t.select(
        add=pw.this.a + pw.this.b, sub=pw.this.a - pw.this.b,
        mul=pw.this.a * pw.this.b,
        fdiv=pw.this.a // pw.this.b, mod=pw.this.a % pw.this.b,
        a=pw.this.a, b=pw.this.b,
    ).to_df().collect()
    for r in out:
        assert r.add == r.a + r.b
        assert r.sub == r.a - r.b
        assert r.mul == r.a * r.b
        # Python FLOOR division/modulo — the reference's semantics; Spark's
        # native div truncates, which the // compilation must not do
        assert r.fdiv == r.a // r.b, (r.a, r.b, r.fdiv)
        assert r.mod == r.a % r.b, (r.a, r.b, r.mod)


@given(st.lists(st.tuples(ints, ints), min_size=1, max_size=60))
@SET
def test_division_by_zero_is_null(spark, pairs):
    t = Table.from_spark(spark.createDataFrame(pairs, "a long, b long"))
    out = t.select(q=pw.this.a / pw.this.b, a=pw.this.a, b=pw.this.b) \
        .to_df().collect()
    for r in out:
        if r.b == 0:
            assert r.q is None          # Value::Error -> NULL cell
        else:
            assert r.q == pytest.approx(r.a / r.b)


@given(st.lists(small_strings, min_size=1, max_size=40))
@SET
def test_string_ops_match_python(spark, strings):
    rows = [(s,) for s in strings]
    t = Table.from_spark(spark.createDataFrame(rows, "s string"))
    out = t.select(
        up=pw.this.s.str.upper(), lo=pw.this.s.str.lower(),
        n=pw.this.s.str.len(), rev=pw.this.s.str.reversed(),
        s=pw.this.s,
    ).to_df().collect()
    for r in out:
        assert r.up == r.s.upper()
        assert r.lo == r.s.lower()
        assert r.n == len(r.s)
        assert r.rev == r.s[::-1]


@given(st.lists(st.tuples(small_strings, small_strings),
                min_size=1, max_size=40))
@SET
def test_string_find_matches_python(spark, pairs):
    t = Table.from_spark(spark.createDataFrame(pairs, "s string, sub string"))
    out = t.select(f=pw.this.s.str.find(pw.this.sub),
                   s=pw.this.s, sub=pw.this.sub).to_df().collect()
    for r in out:
        assert r.f == r.s.find(r.sub), (r.s, r.sub, r.f)


@given(st.lists(st.one_of(ints, st.none()), min_size=1, max_size=60))
@SET
def test_coalesce_if_else(spark, vals):
    rows = [(v,) for v in vals]
    t = Table.from_spark(spark.createDataFrame(rows, "v long"))
    out = t.select(
        c=pw.coalesce(pw.this.v, -1),
        pos=pw.if_else(pw.coalesce(pw.this.v, 0) > 0, 1, 0),
        v=pw.this.v,
    ).to_df().collect()
    for r in out:
        assert r.c == (r.v if r.v is not None else -1)
        assert r.pos == (1 if (r.v or 0) > 0 else 0)


@given(st.lists(st.tuples(ints, small_strings), min_size=1, max_size=40))
@SET
def test_make_tuple_get_roundtrip(spark, pairs):
    t = Table.from_spark(spark.createDataFrame(pairs, "a long, s string"))
    packed = t.select(tup=pw.make_tuple(pw.this.a, pw.this.s),
                      a=pw.this.a, s=pw.this.s)
    out = packed.select(x=pw.this.tup[0], y=pw.this.tup[1],
                        a=pw.this.a, s=pw.this.s).to_df().collect()
    for r in out:
        assert int(r.x) == r.a and r.y == r.s
