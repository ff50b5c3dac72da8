"""Reference-style golden tests on the canonical `pets` fixture
(FIXTURES.md F1; reference tests/test_common.py idioms)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import pathway_spark as pw
from pathway_spark import this
from pathway_spark import reducers as R
from pathway_spark.debug import table_from_markdown, table_from_pandas
from pathway_spark.table import ID, Table

from tests.test_table_api import rows


@pytest.fixture(scope="module")
def pets(spark):
    return table_from_markdown(
        """
        age | owner | pet
        10  | Alice | dog
        9   | Bob   | dog
        8   | Alice | cat
        7   | Bob   | dog
        """,
        spark=spark,
    )


@pytest.fixture(scope="module")
def pets2(spark):
    return table_from_markdown(
        """
        owner | pet | size
        Alice | dog | M
        Bob   | dog | L
        Tom   | cat | S
        """,
        spark=spark,
    )


def test_select_star(pets):
    out = pets.select(this)
    assert sorted(out.column_names) == ["age", "owner", "pet"]
    assert len(rows(out)) == 4


def test_groupby_owner(pets):
    out = pets.groupby(this.owner).reduce(
        this.owner, total_age=R.sum(this.age), n=R.count()
    )
    assert rows(out) == [("Alice", 18, 2), ("Bob", 16, 2)]


def test_join_on_two_keys(pets, pets2):
    j = pets.join(
        pets2,
        pw.left.owner == pw.right.owner,
        pw.left.pet == pw.right.pet,
    ).select(age=pw.left.age, owner=pw.left.owner, size=pw.right.size)
    assert rows(j) == [(10, "Alice", "M"), (7, "Bob", "L"), (9, "Bob", "L")]


def test_join_this_resolution(pets, pets2):
    # pw.this resolves unambiguous columns across sides
    j = pets.join(pets2, pw.left.owner == pw.right.owner,
                  pw.left.pet == pw.right.pet).select(
        age=this.age, size=this.size
    )
    assert len(rows(j)) == 3


def test_join_result_filter(pets, pets2):
    j = pets.join(pets2, pw.left.owner == pw.right.owner,
                  pw.left.pet == pw.right.pet)
    out = j.filter(pw.left.age >= 9).select(age=pw.left.age)
    assert sorted(r[0] for r in rows(out)) == [9, 10]


def test_having(pets):
    # keep rows whose recomputed key is in the indexer expression set
    keyed = pets.with_id_from(this.owner, this.pet)
    out = keyed.having(keyed.pointer_from(this.owner, this.pet))
    assert len(rows(out)) == len(rows(pets))


def test_copy_and_universe(pets):
    c = pets.copy().with_universe_of(pets)
    assert rows(c) == rows(pets)


def test_split_then_concat_identity(pets):
    old, young = pets.split(this.age >= 9)
    back = old.concat(young)
    assert sorted(rows(back)) == sorted(rows(pets))


def test_sql_union_intersect(pets, spark):
    u = pw.sql(
        """
        SELECT owner FROM t WHERE age >= 9
        UNION
        SELECT owner FROM t WHERE pet = 'cat'
        """,
        t=pets,
    )
    assert rows(u) == [("Alice",), ("Bob",)]
    w = pw.sql(
        "WITH old AS (SELECT * FROM t WHERE age >= 9) SELECT COUNT(*) AS n FROM old",
        t=pets,
    )
    assert rows(w) == [(2,)]


def test_table_from_pandas(spark):
    import pandas as pd

    pdf = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    t = table_from_pandas(pdf, spark=spark)
    assert rows(t) == [(1, "x"), (2, "y")]


def test_schema_from_pandas(spark):
    import pandas as pd

    pdf = pd.DataFrame({"k": [1], "v": [1.5], "s": ["a"]})
    s = pw.schema_from_pandas(pdf, id_from=["k"])
    assert s.primary_key_columns() == ["k"]
    st = s.to_struct_type()
    assert st["v"].dataType.simpleString() == "double"


def test_compute_and_print(pets, capsys):
    pw.debug.compute_and_print(pets)
    out = capsys.readouterr().out
    assert "Alice" in out and "dog" in out


def test_str_more_methods(spark):
    t = Table(spark.createDataFrame([("banana",)], "s string"))
    out = t.select(
        c=t.s.str.count("an"),
        e=t.s.str.endswith("na"),
        rs=t.s.str.removesuffix("ana"),
        ti=t.s.str.title(),
    )
    assert rows(out) == [(2, True, "ban", "Banana")]


def test_table_getattr_column_reference(pets):
    # t.colname returns a reference usable in expressions
    out = pets.filter(pets.age > 8).select(pets.owner)
    assert rows(out) == [("Alice",), ("Bob",)]


def test_json_ops(spark):
    from pathway_spark.functions import json_ops

    t = Table(spark.createDataFrame(
        [('{"a": {"b": 3}, "xs": [1, 2]}',)], "js string"))
    out = t.select(
        ab=json_ops.as_int(json_ops.get(this.js, "a.b")),
        x0=json_ops.as_int(json_ops.get(this.js, "xs[0]")),
    )
    assert rows(out) == [(3, 1)]


def test_io_plaintext_and_metadata(spark, tmp_path):
    p = tmp_path / "texts"
    p.mkdir()
    (p / "f1.txt").write_text("hello\nworld\n")
    t = pw.io.plaintext.read(str(p), spark=spark)
    assert sorted(r[0] for r in rows(t, "data")) == ["hello", "world"]
    meta = pw.io.fs.read(str(p), format="only_metadata", spark=spark)
    got = meta.to_df().collect()
    assert len(got) == 1 and got[0]["length"] == 12


def test_io_binary(spark, tmp_path):
    p = tmp_path / "bins"
    p.mkdir()
    (p / "b.bin").write_bytes(b"\x00\x01\x02")
    t = pw.io.fs.read(str(p), format="binary", spark=spark)
    got = t.to_df().collect()
    assert bytes(got[0]["data"]) == b"\x00\x01\x02"


def test_update_cells_lshift_sugar(spark):
    base = Table.from_spark(spark.createDataFrame([(1, "a")], "k int, v string"),
                            id_columns=["k"])
    patch = Table.from_spark(spark.createDataFrame([(1, "A")], "k int, v string"),
                             id_columns=["k"])
    out = base << patch
    assert rows(out) == [(1, "A")]


def test_iterate_multiple_tables(spark):
    a = Table(spark.createDataFrame([(8,)], "v int"))
    b = Table(spark.createDataFrame([(3,)], "w int"))

    def step(x, y):
        nx = Table(x._df.select(
            F.when(F.col("v") > 1, F.col("v") - 1).otherwise(F.col("v")).alias("v")))
        return {"x": nx, "y": y}

    out = pw.iterate(step, x=a, y=b)
    assert out["x"]._df.collect()[0]["v"] == 1
    assert out["y"]._df.collect()[0]["w"] == 3
