"""Debug helpers — reference `python/pathway/debug/__init__.py`
(table_from_markdown 446, table_from_pandas 358, table_from_rows 327,
compute_and_print 222). The correctness-test workhorse (SURVEY §3.2)."""

from __future__ import annotations

import re
from typing import Any

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .schema import Schema, schema_from_dict
from .table import ID, Table


def _spark() -> SparkSession:
    from .session import get_spark
    return get_spark()


def _parse_cell(s: str) -> Any:
    s = s.strip()
    if s in ("", "None"):
        return None
    if s == "True":
        return True
    if s == "False":
        return False
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s.strip('"')


def table_from_markdown(md: str, *, spark: SparkSession | None = None,
                        id_from=None, **kw) -> Table:
    """Parse the reference's markdown/whitespace table format, including
    optional `__time__` / `__diff__` columns (debug/__init__.py:446)."""
    spark = spark or _spark()
    lines = [ln.strip() for ln in md.strip().splitlines() if ln.strip()]
    lines = [ln for ln in lines if not re.match(r"^[|\s:-]+$", ln)]
    split = (lambda ln: [c for c in ln.strip("|").split("|")]) if "|" in lines[0] \
        else (lambda ln: ln.split())
    header = [h.strip() for h in split(lines[0])]
    rows = [[_parse_cell(c) for c in split(ln)] for ln in lines[1:]]
    data = [dict(zip(header, r)) for r in rows]

    # rename engine columns like the reference does
    rename = {"__time__": "_pw_time", "__diff__": "_pw_diff"}
    data = [{rename.get(k, k): v for k, v in row.items()} for row in data]
    cols = [rename.get(h, h) for h in header]

    # infer python types per column from first non-null
    coltypes: dict[str, Any] = {}
    for c in cols:
        tp = str
        for row in data:
            v = row.get(c)
            if v is not None:
                tp = type(v)
                break
        coltypes[c] = tp
    # promote int -> float if any float appears
    for c in cols:
        if coltypes[c] is int and any(isinstance(r.get(c), float) for r in data):
            coltypes[c] = float
            for r in data:
                if r.get(c) is not None:
                    r[c] = float(r[c])
    schema = schema_from_dict(coltypes)
    df = spark.createDataFrame(data, schema.to_struct_type())
    if id_from:
        return Table.from_spark(df, id_columns=list(id_from))
    # changelog tables: key by data columns only, so a retraction hashes
    # to the same id as the insert it cancels (reference keys rows by
    # content, not by (time, diff))
    data_cols = [c for c in df.columns if c not in ("_pw_time", "_pw_diff")]
    return Table.from_spark(df, id_columns=data_cols)


# alias used heavily in the reference's tests (tests/utils.py:629)
T = table_from_markdown


def table_from_pandas(pdf: pd.DataFrame, *, spark: SparkSession | None = None,
                      id_from=None, **kw) -> Table:
    spark = spark or _spark()
    df = spark.createDataFrame(pdf)
    return Table.from_spark(df, id_columns=list(id_from) if id_from else None)


def table_from_rows(schema: type[Schema], rows: list[tuple], *, spark=None, **kw) -> Table:
    spark = spark or _spark()
    df = spark.createDataFrame(rows, schema.to_struct_type())
    pk = schema.primary_key_columns()
    return Table.from_spark(df, id_columns=pk or None)


def table_to_pandas(table: Table, include_id: bool = True) -> pd.DataFrame:
    df = table._df if include_id else table.to_df()
    pdf = df.toPandas()
    if include_id and ID in pdf.columns:
        pdf = pdf.set_index(ID)
    return pdf


def compute_and_print(table: Table, *, include_id: bool = True, sort_by_id: bool = True,
                      n_rows: int | None = None) -> None:
    """debug/__init__.py:222 — collect, sort by key, print."""
    pdf = table_to_pandas(table, include_id=include_id)
    if sort_by_id and include_id:
        pdf = pdf.sort_index()
    if n_rows is not None:
        pdf = pdf.head(n_rows)
    print(pdf.to_string())


def compute_and_print_update_stream(table: Table, **kw) -> None:
    """Batch: every row is a single +1 diff at time 0."""
    pdf = table_to_pandas(table)
    pdf["__time__"] = 0
    pdf["__diff__"] = 1
    print(pdf.to_string())


def assert_stream_equality(changelog, expected, *,
                           exact_times: bool = True) -> None:
    """Reference `tests/utils.py:304-420` `assert_stream_equality`: the
    emitted `(row, time, diff)` stream must equal the expected one.

    `changelog`: DataFrame (or Table) carrying `_pw_time`/`_pw_diff` —
    e.g. the return of `DifferentialGraph.replay`.  `expected`: a
    markdown string with `__time__`/`__diff__` columns (or a Table/
    DataFrame already carrying `_pw_time`/`_pw_diff`).  Comparison is
    per-time multisets of rows after cancelling +/- pairs within a
    time (differential consolidation), which is exactly the
    reference's notion of stream equality.  `exact_times=False`
    compares only the ORDER of times, not their values (the
    reference's `assert_stream_equality_wo_times`)."""
    from pyspark.sql import DataFrame

    def norm(obj, data_order=None):
        if isinstance(obj, str):
            obj = table_from_markdown(obj)
        df = obj._df if isinstance(obj, Table) else obj
        assert isinstance(df, DataFrame)
        cols = [c for c in df.columns if c not in (ID,)]
        if "_pw_time" not in cols:
            raise ValueError("stream comparison needs a _pw_time column")
        if "_pw_diff" not in cols:
            df = df.withColumn("_pw_diff", F.lit(1))
            cols.append("_pw_diff")
        # key rows in ONE shared column order: keying each frame by its
        # own order would both fail equal streams and pass transposed
        # unequal ones when the declared column order differs
        data = data_order or [c for c in cols
                              if c not in ("_pw_time", "_pw_diff")]
        out: dict[int, dict[tuple, int]] = {}
        for r in df.select(*data, "_pw_time", "_pw_diff").collect():
            t, w = int(r["_pw_time"]), int(r["_pw_diff"])
            key = tuple(r[c] for c in data)
            bucket = out.setdefault(t, {})
            bucket[key] = bucket.get(key, 0) + w
        return {t: {k: w for k, w in b.items() if w != 0}
                for t, b in out.items()
                if any(w != 0 for w in b.values())}, data

    got, got_cols = norm(changelog)
    # validate the expected frame's own column SET before forcing the
    # shared key order (a missing column must raise, not KeyError)
    exp = expected
    if isinstance(exp, str):
        exp = table_from_markdown(exp)
    exp_df = exp._df if isinstance(exp, Table) else exp
    exp_cols = {c for c in exp_df.columns
                if c not in (ID, "_pw_time", "_pw_diff")}
    assert set(got_cols) == exp_cols, \
        f"column mismatch: {got_cols} vs {sorted(exp_cols)}"
    want, _ = norm(exp_df, data_order=got_cols)
    if not exact_times:
        got = {i: got[t] for i, t in enumerate(sorted(got))}
        want = {i: want[t] for i, t in enumerate(sorted(want))}
    assert got == want, (
        f"stream mismatch:\n  got  = {got}\n  want = {want}")
