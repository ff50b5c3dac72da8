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


times = st.integers(min_value=0, max_value=1000)


@given(st.lists(times, min_size=1, max_size=30, unique=True),
       st.lists(times, min_size=1, max_size=30, unique=True))
@SET
def test_asof_join_matches_merge_asof(spark, lts, rts):
    import pandas as pd

    lt = Table.from_spark(spark.createDataFrame([(t,) for t in lts], "lt long"))
    rt = Table.from_spark(spark.createDataFrame([(t,) for t in rts], "rt long"))
    out = lt.asof_join(rt, pw.this.lt, pw.this.rt, how="left",
                       direction="backward").to_df() \
        .select("lt", "rt").collect()
    got = {r.lt: r.rt for r in out}
    exp_df = pd.merge_asof(
        pd.DataFrame({"lt": sorted(lts)}), pd.DataFrame({"rt": sorted(rts)}),
        left_on="lt", right_on="rt", direction="backward")
    exp = {int(r.lt): (None if pd.isna(r.rt) else int(r.rt))
           for r in exp_df.itertuples()}
    assert got == exp


@given(st.lists(times, min_size=1, max_size=25, unique=True),
       st.lists(times, min_size=1, max_size=25, unique=True),
       st.integers(min_value=-50, max_value=0),
       st.integers(min_value=0, max_value=50))
@SET
def test_interval_join_matches_bruteforce(spark, lts, rts, lb, ub):
    lt = Table.from_spark(spark.createDataFrame([(t,) for t in lts], "lt long"))
    rt = Table.from_spark(spark.createDataFrame([(t,) for t in rts], "rt long"))
    out = lt.interval_join(rt, pw.this.lt, pw.this.rt,
                           pw.temporal.interval(lb, ub)) \
        .select(lt=pw.left.lt, rt=pw.right.rt).to_df().collect()
    got = sorted((r.lt, r.rt) for r in out)
    exp = sorted((a, b) for a in lts for b in rts if b + lb <= a <= b + ub)
    assert got == exp


@given(st.lists(times, min_size=1, max_size=40),
       st.integers(min_value=1, max_value=60))
@SET
def test_tumbling_window_matches_bruteforce(spark, ts, dur):
    from pathway_spark import reducers as r

    t = Table.from_spark(spark.createDataFrame([(x,) for x in ts], "t long"))
    out = t.windowby(pw.this.t, window=pw.temporal.tumbling(dur)) \
        .reduce(start=pw.this._pw_window_start, n=r.count()) \
        .to_df().collect()
    got = {row.start: row.n for row in out}
    exp: dict = {}
    for x in ts:
        exp[(x // dur) * dur] = exp.get((x // dur) * dur, 0) + 1
    assert got == exp


@given(st.lists(st.integers(min_value=-10**15, max_value=10**15),
                min_size=1, max_size=50))
@SET
def test_duration_accessors_truncate_like_chrono(spark, ns_vals):
    """chrono num_seconds()/num_minutes() truncate toward zero
    (reference src/engine/time.rs:400) — NOT floor."""
    t = Table.from_spark(spark.createDataFrame(
        [(v,) for v in ns_vals], "d long"))
    out = t.select(s=pw.this.d.dt.seconds(), m=pw.this.d.dt.minutes(),
                   h=pw.this.d.dt.hours(), d=pw.this.d).to_df().collect()
    for r in out:
        assert r.s == int(r.d / 10**9), (r.d, r.s)
        assert r.m == int(r.d / (60 * 10**9))
        assert r.h == int(r.d / (3600 * 10**9))


@given(st.lists(st.tuples(small_strings, small_strings,
                          st.integers(min_value=0, max_value=5)),
                min_size=1, max_size=30))
@SET
def test_string_add_mul_match_python(spark, rows):
    t = Table.from_spark(spark.createDataFrame(rows, "a string, b string, k long"))
    out = t.select(cat=pw.this.a + pw.this.b, rep=pw.this.a * pw.this.k,
                   a=pw.this.a, b=pw.this.b, k=pw.this.k).to_df().collect()
    for r in out:
        assert r.cat == r.a + r.b
        assert (r.rep or "") == r.a * r.k


@given(st.lists(st.tuples(ints, ints, st.integers(min_value=0, max_value=20)),
                min_size=1, max_size=40))
@SET
def test_bitwise_and_shifts_match_python(spark, rows):
    t = Table.from_spark(spark.createDataFrame(rows, "a long, b long, s long"))
    out = t.select(
        band=pw.this.a & pw.this.b, bor=pw.this.a | pw.this.b,
        bxor=pw.this.a ^ pw.this.b, shl=pw.this.a << pw.this.s,
        shr=pw.this.a >> pw.this.s,
        a=pw.this.a, b=pw.this.b, s=pw.this.s,
    ).to_df().collect()
    for r in out:
        assert r.band == r.a & r.b
        assert r.bor == r.a | r.b
        assert r.bxor == r.a ^ r.b
        if abs(r.a) < 2**40:          # << overflow poisons to NULL
            assert r.shl == r.a << r.s, (r.a, r.s)
        assert r.shr == r.a >> r.s, (r.a, r.s, r.shr)


floats = st.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False)


@given(st.lists(st.tuples(floats, floats), min_size=1, max_size=40))
@SET
def test_float_floordiv_mod_match_python(spark, pairs):
    t = Table.from_spark(spark.createDataFrame(pairs, "a double, b double"))
    out = t.select(fd=pw.this.a // pw.this.b, md=pw.this.a % pw.this.b,
                   a=pw.this.a, b=pw.this.b).to_df().collect()
    for r in out:
        if r.b == 0:
            assert r.fd is None and r.md is None
        else:
            # engine float floordiv is floor(l/r) (expression.rs:1161) —
            # CPython's a//b differs on denormal underflow; follow engine
            import math
            q = r.a / r.b
            exp_fd = q if (q != q or abs(q) >= 2.0**53) else float(math.floor(q))
            assert r.fd == pytest.approx(exp_fd), (r.a, r.b, r.fd)
            assert r.md == pytest.approx(r.a % r.b), (r.a, r.b, r.md)
