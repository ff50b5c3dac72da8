"""API-parity surface tests: the symbols `import pathway as pw` exports
(reference python/pathway/__init__.py __all__) exist here and behave."""

from __future__ import annotations

import pytest

import pathway_spark as pw


@pytest.fixture(scope="module")
def pets(spark):
    return pw.debug.table_from_markdown(
        """
        age | owner | pet
        10  | Alice | dog
        9   | Bob   | dog
        8   | Alice | cat
        7   | Bob   | dog
        """
    )


# the reference's public __all__ (python/pathway/__init__.py), minus
# documented out-of-scope items (SURVEY §4): interactive viz internals.
REFERENCE_ALL = [
    "Table", "Schema", "this", "left", "right", "reducers", "io", "debug",
    "sql", "udf", "UDF", "apply", "apply_async", "cast", "coalesce",
    "if_else", "require", "unwrap", "fill_error", "make_tuple",
    "declare_type", "iterate", "run", "run_all", "schema_from_types",
    "schema_from_dict", "schema_from_pandas", "schema_builder",
    "column_definition", "ColumnExpression", "ColumnReference",
    "GroupedTable", "JoinResult", "GroupedJoinResult", "AsofJoinResult",
    "IntervalJoinResult", "OuterJoinResult", "WindowJoinResult", "Joinable",
    "TableLike", "LiveTable", "TableSlice", "JoinMode", "MonitoringLevel",
    "PersistenceMode", "Type", "Pointer", "Json", "PyObjectWrapper",
    "wrap_py_object", "DateTimeNaive", "DateTimeUtc", "Duration",
    "SchemaProperties", "assert_table_has_schema", "table_transformer",
    "schema_from_csv", "load_yaml", "set_license_key",
    "set_monitoring_config", "global_error_log", "local_error_log", "join",
    "join_inner", "join_left", "join_right", "join_outer", "groupby",
    "iterate_universe", "udfs", "asynchronous", "universes", "persistence",
    "indexing", "ml", "graphs", "statistical", "viz", "utils", "stateful",
    "AsyncTransformer", "pandas_transformer", "BaseCustomAccumulator",
    "__version__",
]


def test_public_surface_complete():
    missing = [n for n in REFERENCE_ALL if not hasattr(pw, n)]
    assert missing == []


def test_json_wrapper():
    j = pw.Json.parse('{"a": [1, 2, {"b": "x"}]}')
    assert j["a"][0].as_int() == 1
    assert j["a"][2]["b"].as_str() == "x"
    assert j.get("nope", "d") == "d"
    with pytest.raises(ValueError):
        j["a"].as_int()
    assert pw.Json.dumps(j["a"][2]) == '{"b": "x"}'
    assert pw.Json(True).as_bool() is True
    with pytest.raises(ValueError):
        pw.Json(True).as_int()
    assert pw.Json.NULL.value is None


def test_py_object_wrapper_roundtrip():
    w = pw.wrap_py_object({"k": (1, 2)})
    assert pw.PyObjectWrapper.from_bytes(w.to_bytes()).value == {"k": (1, 2)}


def test_type_enum_maps_to_spark():
    from pyspark.sql import types as T

    assert pw.Type.INT.to_spark() == T.LongType()
    assert pw.Type.STRING.to_spark() == T.StringType()
    assert pw.Type.DATE_TIME_UTC.to_spark() == T.TimestampType()


def test_datetime_aliases():
    import pandas as pd

    ts = pw.DateTimeNaive("2026-01-01T12:00:00")
    assert isinstance(ts, pd.Timestamp)
    assert pw.Duration("1h") == pd.Timedelta(hours=1)


def test_table_slice(pets):
    s = pets.slice
    assert set(s.keys()) == {"age", "owner", "pet"}
    sliced = s.without("age").with_suffix("_col")
    assert list(sliced.keys()) == ["owner_col", "pet_col"]
    out = pets.select(**dict(sliced.items()))
    assert set(out.column_names) == {"owner_col", "pet_col"}
    # getitem by str and rename
    assert s["owner"].name == "owner"
    assert list(s.rename({"age": "years"}).keys())[0] in {"years", "owner", "pet"}


def test_assert_table_has_schema(pets):
    schema = pw.schema_from_dict({"age": int, "owner": str, "pet": str})
    pw.assert_table_has_schema(pets, schema)
    with pytest.raises(AssertionError):
        pw.assert_table_has_schema(
            pets, pw.schema_from_dict({"age": int, "owner": str})
        )
    pw.assert_table_has_schema(
        pets, pw.schema_from_dict({"age": int, "owner": str}),
        allow_superset=True,
    )
    with pytest.raises(AssertionError):
        pw.assert_table_has_schema(pets, pw.schema_from_dict({"age": str}))


def test_schema_from_csv(tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("a,b,c\n1,2.5,hello\n3,4.5,world\n")
    schema = pw.schema_from_csv(str(p))
    st = schema.to_struct_type()
    types = {f.name: f.dataType.simpleString() for f in st.fields}
    assert types == {"a": "bigint", "b": "double", "c": "string"}


def test_error_log_capture():
    from pathway_spark.compat import _log_error

    with pw.local_error_log() as log:
        _log_error("op1", "boom")
        t = log.table()
        rows = t.to_df().collect()
    assert [(r.operator, r.message) for r in rows] == [("op1", "boom")]
    assert "message" in pw.global_error_log().column_names


def test_free_function_joins(pets, spark):
    owners = pw.debug.table_from_markdown(
        """
        owner | city
        Alice | NYC
        Bob   | SF
        """
    )
    out = pw.join_inner(pets, owners, pw.left.owner == pw.right.owner).select(
        pw.left.pet, pw.right.city
    )
    assert out.to_df().count() == 4


def test_join_mode_and_enums():
    assert pw.JoinMode.LEFT.value == "left"
    assert pw.MonitoringLevel.NONE.name == "NONE"
    assert pw.PersistenceMode.PERSISTING.name == "PERSISTING"
    pw.set_license_key(None)
    pw.set_monitoring_config(server_endpoint=None)


def test_table_transformer_decorator(pets):
    @pw.table_transformer
    def double_age(t: pw.Table) -> pw.Table:
        return t.select(age2=t.age * 2)

    assert "age2" in double_age(pets).column_names


def test_stdlib_namespaces(pets):
    assert callable(pw.graphs.pagerank)
    assert callable(pw.statistical.interpolate)
    assert callable(pw.stateful.deduplicate)
    assert callable(pw.viz.show)
    assert pw.asynchronous is pw.udfs
    # function-form stateful deduplicate matches the method
    d = pw.stateful.deduplicate(pets, value=pets.age)
    assert d.to_df().count() >= 1


def test_load_yaml_with_pw_tags():
    pytest.importorskip("yaml")
    cfg = pw.load_yaml("threshold: 5\nmode: !pw.JoinMode LEFT\n")
    assert cfg["threshold"] == 5
    # tag resolved against the package namespace
    assert cfg["mode"] == pw.JoinMode["LEFT"] or cfg["mode"] == pw.JoinMode("left")


def test_udf_cache_and_async(spark, pets):
    calls = []

    @pw.udf(cache_strategy=pw.udfs.InMemoryCache())
    def slow_double(x: int) -> int:
        calls.append(x)
        return x * 2

    out = pets.select(d=slow_double(pw.this.age))
    vals = sorted(r.d for r in out.to_df().collect())
    assert vals == [14, 16, 18, 20]

    @pw.udf(executor=pw.udfs.async_executor(capacity=4))
    async def aplus(x: int) -> int:
        return x + 1

    out2 = pets.select(p=aplus(pw.this.age))
    assert sorted(r.p for r in out2.to_df().collect()) == [8, 9, 10, 11]


def test_udf_combinators():
    import asyncio

    async def f(x):
        return x * 10

    g = pw.udfs.with_timeout(pw.udfs.coerce_async(lambda x: x + 1), 5)
    assert asyncio.run(g(1)) == 2
    h = pw.udfs.with_retry_strategy(
        f, pw.udfs.ExponentialBackoffRetryStrategy(max_retries=2,
                                                   initial_delay_ms=1)
    )
    assert asyncio.run(h(3)) == 30


def test_disk_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    calls = []

    def fn(x):
        calls.append(x)
        return x * 3

    wrapped = pw.udfs.DiskCache(name="t1").wrap(fn)
    assert wrapped(2) == 6 and wrapped(2) == 6
    assert calls == [2]
    tempfile.tempdir = None
