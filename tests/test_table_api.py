"""Golden unit tests for the core Table / expression API — the
reference's test style (tests/test_common.py): tiny literal tables,
exact-match collect."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import pathway_spark as pw
from pathway_spark import this
from pathway_spark import reducers as R
from pathway_spark.debug import table_from_markdown
from pathway_spark.table import ID, Table


def rows(table, *cols, sort=True):
    df = table.to_df() if isinstance(table, Table) else table
    if cols:
        df = df.select(*cols)
    out = [tuple(r) for r in df.collect()]
    if sort:
        out.sort(key=lambda t: tuple(repr(x) for x in t))
    return out


@pytest.fixture(scope="module")
def t1(spark):
    return table_from_markdown(
        """
        a | b  | g
        1 | 10 | x
        2 | 20 | x
        3 | 30 | y
        4 | 40 | y
        """,
        spark=spark,
    )


# ---------------------------------------------------------------- projection


def test_select(t1):
    out = t1.select(this.a, double=this.b * 2)
    assert rows(out) == [(1, 20), (2, 40), (3, 60), (4, 80)]


def test_with_columns_keeps_others(t1):
    out = t1.with_columns(c=this.a + this.b)
    assert sorted(out.column_names) == ["a", "b", "c", "g"]
    assert rows(out, "a", "c") == [(1, 11), (2, 22), (3, 33), (4, 44)]


def test_filter_and_split(t1):
    hi, lo = t1.split(this.b >= 25)
    assert rows(hi, "a") == [(3,), (4,)]
    assert rows(lo, "a") == [(1,), (2,)]
    assert rows(t1.filter(this.g == "x"), "a") == [(1,), (2,)]


def test_rename_without_prefix_suffix(t1):
    assert "aa" in t1.rename({"aa": "a"}).column_names
    assert t1.without("a").column_names == ["b", "g"]
    assert t1.with_prefix("p_").column_names == ["p_a", "p_b", "p_g"]
    assert t1.with_suffix("_s").column_names == ["a_s", "b_s", "g_s"]


def test_cast_to_types(t1):
    out = t1.cast_to_types(a=float)
    assert dict(out.to_df().dtypes)["a"] == "double"


def test_flatten_with_origin(spark):
    t = Table(spark.createDataFrame([(1, [10, 11]), (2, [20])], "k int, v array<int>"))
    out = t.flatten(this.v)
    assert rows(out, "k", "v") == [(1, 10), (1, 11), (2, 20)]


# ---------------------------------------------------------------- ids / sets


def test_pointer_stability(spark, t1):
    h1 = t1.with_id_from(this.a)._df.select(ID).collect()
    h2 = t1.with_id_from(this.a)._df.select(ID).collect()
    assert sorted(h1) == sorted(h2)


def test_zip_same_universe(t1):
    l = t1.select(this.a)
    r = t1.select(this.b)
    assert rows(l + r) == [(1, 10), (2, 20), (3, 30), (4, 40)]


def test_concat_and_reindex(t1):
    a = t1.filter(this.a <= 2)
    b = t1.filter(this.a > 2)
    assert len(rows(a.concat(b))) == 4
    # same table twice: reindex makes ids distinct so nothing collapses
    dup = a.concat_reindex(a)
    assert len(rows(dup)) == 4
    assert dup._df.select(ID).distinct().count() == 4


def test_update_rows_and_cells(spark):
    base = Table.from_spark(
        spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], "k int, s string, v double"),
        id_columns=["k"],
    )
    patch = Table.from_spark(
        spark.createDataFrame([(2, "B", 20.0), (3, "C", 30.0)], "k int, s string, v double"),
        id_columns=["k"],
    )
    up = base.update_rows(patch)
    assert rows(up) == [(1, "a", 1.0), (2, "B", 20.0), (3, "C", 30.0)]
    cells = base.update_cells(
        Table.from_spark(spark.createDataFrame([(2, 99.0)], "k int, v double"), id_columns=["k"])
    )
    assert rows(cells) == [(1, "a", 1.0), (2, "b", 99.0)]


def test_update_prefers_other_even_when_null(spark):
    """reference internals/table.py:1692 — conflicts resolve preferring
    other's values, INCLUDING explicit NULL patch cells (not coalesce)."""
    base = Table.from_spark(
        spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], "k int, s string, v double"),
        id_columns=["k"],
    )
    null_patch = Table.from_spark(
        spark.createDataFrame([(2, None)], "k int, v double"), id_columns=["k"]
    )
    cells = base.update_cells(null_patch)
    assert rows(cells) == [(1, "a", 1.0), (2, "b", None)]

    row_patch = Table.from_spark(
        spark.createDataFrame([(2, None, None), (3, "C", None)],
                              "k int, s string, v double"),
        id_columns=["k"],
    )
    up = base.update_rows(row_patch)
    assert rows(up) == [(1, "a", 1.0), (2, None, None), (3, "C", None)]


def test_intersect_difference_restrict(spark):
    a = Table.from_spark(spark.createDataFrame([(1,), (2,), (3,)], "k int"), id_columns=["k"])
    b = Table.from_spark(spark.createDataFrame([(2,), (3,), (4,)], "k int"), id_columns=["k"])
    assert rows(a.intersect(b)) == [(2,), (3,)]
    assert rows(a.difference(b)) == [(1,)]
    assert rows(a.restrict(b)) == [(2,), (3,)]


def test_ix_lookup(spark):
    ctx = Table.from_spark(spark.createDataFrame([(10, 1), (20, 2), (30, 9)], "e int, fk int"),
                           id_columns=["e"])
    dim = Table.from_spark(spark.createDataFrame([(1, "one"), (2, "two")], "k int, name string"),
                           id_columns=["k"])
    hit = (ctx + dim.ix(dim.pointer_from(this.fk), context=ctx))
    assert rows(hit, "e", "name") == [(10, "one"), (20, "two")]
    opt = dim.ix(dim.pointer_from(this.fk), context=ctx, optional=True)
    assert len(rows(opt)) == 3  # unmatched row kept with NULLs


# ---------------------------------------------------------------- groupby


def test_reducers_basic(t1):
    out = t1.groupby(this.g).reduce(
        this.g,
        s=R.sum(this.a),
        mn=R.min(this.b),
        mx=R.max(this.b),
        av=R.avg(this.b),
        n=R.count(),
    )
    assert rows(out) == [("x", 3, 10, 20, 15.0, 2), ("y", 7, 30, 40, 35.0, 2)]


def test_reduce_global(t1):
    out = t1.reduce(total=R.sum(this.b))
    assert rows(out) == [(100,)]


def test_argmin_argmax(t1):
    out = t1.groupby(this.g).reduce(
        this.g, lo=R.argmin(this.b, this.a), hi=R.argmax(this.b, this.a)
    )
    assert rows(out) == [("x", 1, 2), ("y", 3, 4)]


def test_tuple_reducers(t1):
    out = t1.groupby(this.g).reduce(this.g, xs=R.sorted_tuple(this.a))
    assert rows(out) == [("x", [1, 2]), ("y", [3, 4])]


def test_count_distinct(t1):
    out = t1.groupby(this.g).reduce(this.g, n=R.count_distinct(this.b))
    assert rows(out) == [("x", 2), ("y", 2)]


def test_unique_raises_on_conflict(spark, t1):
    ok = t1.groupby(this.g).reduce(this.g, u=R.unique(this.g))
    assert rows(ok) == [("x", "x"), ("y", "y")]
    with pytest.raises(Exception):
        t1.groupby(this.g).reduce(this.g, u=R.unique(this.b)).to_df().collect()


def test_reduce_compound_expression(t1):
    out = t1.groupby(this.g).reduce(this.g, ratio=R.sum(this.a) / R.count())
    assert rows(out) == [("x", 1.5), ("y", 3.5)]


def test_deduplicate_default(spark):
    t = Table.from_spark(
        spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "k int, v string"),
        id_columns=["k"],
    )
    out = t.deduplicate(value=this.v)
    assert len(rows(out)) == 2


# ---------------------------------------------------------------- joins


def test_join_select_sides(spark):
    l = Table.from_spark(spark.createDataFrame([(1, "a"), (2, "b")], "k int, lv string"),
                         id_columns=["k"])
    r = Table.from_spark(spark.createDataFrame([(1, "A"), (3, "C")], "k int, rv string"),
                         id_columns=["k"])
    inner = l.join(r, pw.left.k == pw.right.k).select(
        k=pw.left.k, lv=pw.left.lv, rv=pw.right.rv
    )
    assert rows(inner) == [(1, "a", "A")]
    left = l.join_left(r, pw.left.k == pw.right.k).select(k=pw.left.k, rv=pw.right.rv)
    assert rows(left) == [(1, "A"), (2, None)]
    outer = l.join_outer(r, pw.left.k == pw.right.k).select(
        lk=pw.left.k, rk=pw.right.k
    )
    assert rows(outer, sort=False).__len__() == 3


def test_join_groupby(spark):
    l = Table.from_spark(spark.createDataFrame([(1, 5), (1, 7), (2, 9)], "k int, v int"),
                         id_columns=["k", "v"])
    r = Table.from_spark(spark.createDataFrame([(1, "a"), (2, "b")], "k int, tag string"),
                         id_columns=["k"])
    out = l.join(r, pw.left.k == pw.right.k).groupby(pw.right.tag).reduce(
        tag=pw.right.tag, s=R.sum(pw.left.v)
    )
    assert rows(out) == [("a", 12), ("b", 9)]


# ---------------------------------------------------------------- expressions


def test_arith_exact_bigint_floordiv(spark):
    big = 1_704_067_798_778_549_829  # ns timestamp beyond double precision
    t = Table(spark.createDataFrame([(big,)], "ts long"))
    out = t.select(us=this.ts // 1000, rem=this.ts % 1000)
    assert rows(out) == [(big // 1000, big % 1000)]


def test_if_else_coalesce_require(spark):
    t = table_from_markdown(
        """
        a | b
        1 | None
        2 | 5
        """,
        spark=spark,
    )
    out = t.select(
        c=pw.if_else(this.a == 1, "one", "other"),
        d=pw.coalesce(this.b, this.a),
        e=pw.require(this.a, this.b),
    )
    assert rows(out) == [("one", 1, None), ("other", 5, 2)]


def test_unwrap_raises(spark):
    t = table_from_markdown("a\nNone\n1", spark=spark)
    with pytest.raises(Exception):
        t.select(u=pw.unwrap(this.a)).to_df().collect()


def test_make_tuple_getitem(spark):
    t = table_from_markdown("a | b\n1 | 2", spark=spark)
    out = t.select(t=pw.make_tuple(this.a, this.b))
    assert rows(out) == [((1, 2),)]
    arr = Table(spark.createDataFrame([([7, 8, 9],)], "v array<int>"))
    assert rows(arr.select(x=this.v[1])) == [(8,)]
    assert rows(arr.select(x=this.v.get(9, default=-1))) == [(-1,)]


def test_apply_udf(spark):
    t = table_from_markdown("a\n1\n2", spark=spark)

    @pw.udf
    def square(x: int) -> int:
        return x * x

    out = t.select(sq=square(this.a), ap=pw.apply_with_type(lambda x: x + 1, int, this.a))
    assert rows(out) == [(1, 2), (4, 3)]


def test_apply_async(spark):
    t = table_from_markdown("a\n3", spark=spark)

    async def f(x):
        return x * 10

    out = t.select(v=pw.apply_async(f, this.a))
    assert rows(out.cast_to_types(v=int)) == [(30,)]


# ---------------------------------------------------------------- namespaces


def test_str_namespace(spark):
    t = Table(spark.createDataFrame([("Hello World",)], "s string"))
    out = t.select(
        lo=this.s.str.lower(),
        up=this.s.str.upper(),
        ln=this.s.str.len(),
        rev=this.s.str.reversed(),
        sw=this.s.str.swapcase(),
        st=this.s.str.startswith("Hello"),
        rep=this.s.str.replace("World", "There"),
        sl=this.s.str.slice(0, 5),
    )
    assert rows(out) == [
        ("hello world", "HELLO WORLD", 11, "dlroW olleH", "hELLO wORLD",
         True, "Hello There", "Hello")
    ]


def test_str_parse(spark):
    t = table_from_markdown('s\n"42"', spark=spark)
    out = t.select(i=this.s.str.parse_int(), f=this.s.str.parse_float())
    assert rows(out) == [(42, 42.0)]


def test_dt_namespace(spark):
    import datetime as dt

    t = Table(spark.createDataFrame(
        [(dt.datetime(2024, 3, 15, 10, 30, 45),)], "ts timestamp_ntz"))
    out = t.select(
        y=this.ts.dt.year(), m=this.ts.dt.month(), d=this.ts.dt.day(),
        h=this.ts.dt.hour(), wd=this.ts.dt.weekday(),
        s=this.ts.dt.strftime("%Y-%m-%d %H:%M:%S"),
    )
    assert rows(out) == [(2024, 3, 15, 10, 4, "2024-03-15 10:30:45")]


def test_num_namespace(spark):
    t = table_from_markdown("v\n-2.5\n3.456", spark=spark)
    out = t.select(a=this.v.num.abs(), r=this.v.num.round(1))
    assert rows(out) == [(2.5, -2.5), (3.456, 3.5)]


# ---------------------------------------------------------------- sql / debug


def test_sql_frontend(spark):
    t = table_from_markdown("a | b\n1 | 2\n3 | 4", spark=spark)
    out = pw.sql("SELECT a + b AS s FROM t", t=t)
    assert rows(out) == [(3,), (7,)]


def test_markdown_time_diff_columns(spark):
    t = table_from_markdown(
        """
        a | __time__ | __diff__
        1 | 2        | 1
        1 | 4        | -1
        """,
        spark=spark,
    )
    assert "_pw_time" in t._df.columns and "_pw_diff" in t._df.columns
    assert t.column_names == ["a"]


def test_schema_builders(spark):
    s = pw.schema_from_types(a=int, b=str, c=float)
    st = s.to_struct_type()
    assert [f.dataType.simpleString() for f in st.fields] == ["bigint", "string", "double"]


def test_stateful_reducers(spark, t1):
    def fold_many(state, rows) -> int:
        return sum(v[0] for v in rows)

    out = t1.groupby(this.g).reduce(
        this.g, s=R.stateful_many(fold_many, this.a)
    )
    assert rows(out) == [("x", 3), ("y", 7)]

    def fold_one(state, v) -> int:
        return (state or 0) + v * v

    out2 = t1.groupby(this.g).reduce(
        this.g, ss=R.stateful_single(fold_one, this.a)
    )
    assert rows(out2) == [("x", 5), ("y", 25)]


def test_udf_reducer(spark, t1):
    class MeanAcc(R.BaseCustomAccumulator):
        def __init__(self, s, n):
            self.s, self.n = s, n

        @classmethod
        def from_row(cls, row):
            return cls(row[0], 1)

        def update(self, other) -> None:
            self.s += other.s
            self.n += other.n

        def compute_result(self) -> float:
            return self.s / self.n

    mean = R.udf_reducer(MeanAcc)
    out = t1.groupby(this.g).reduce(this.g, m=mean(this.b))
    assert rows(out) == [("x", 15.0), ("y", 35.0)]
