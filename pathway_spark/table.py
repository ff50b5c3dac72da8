"""Table — the Pathway-compatible core abstraction, backed by a Spark DataFrame.

Reference: `python/pathway/internals/table.py:53` (class Table),
`internals/groupbys.py`, `internals/joins.py`. Every method compiles to
declarative DataFrame operations so Catalyst handles pushdown, pruning,
join strategy and AQE handles skew/coalescing at scale.

Key convention (SURVEY §1.1): every table carries a synthetic `_pw_id`
LongType column — `xxhash64` of the primary-key columns (or of row
content for sourceless tables). Universe relations (same key set) become
joins on `_pw_id`; Catalyst dedups common lineage.
"""

from __future__ import annotations

import itertools
from typing import Any, Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .expressions import (
    BinaryOp,
    ColumnExpression,
    ColumnReference,
    EvalContext,
    Literal,
    ReducerExpression,
    RowContext,
    _wrap,
    this,
    to_col,
)

ID = "_pw_id"
_ctr = itertools.count()


def _walk(expr: ColumnExpression):
    """Yield expr and all sub-expressions (generic structural walk)."""
    yield expr
    for v in vars(expr).values():
        if isinstance(v, ColumnExpression):
            yield from _walk(v)
        elif isinstance(v, (list, tuple)):
            for x in v:
                if isinstance(x, ColumnExpression):
                    yield from _walk(x)


def _collect_reducers(exprs: Iterable[ColumnExpression]) -> dict[str, ReducerExpression]:
    out: dict[str, ReducerExpression] = {}
    for e in exprs:
        for node in _walk(e):
            if isinstance(node, ReducerExpression):
                out.setdefault(node._key(), node)
    return out


class _AggContext(EvalContext):
    """Post-aggregation context: reducer atoms and group keys are columns
    of the aggregated frame."""

    def __init__(self, reducer_alias: dict[str, str], key_names: set[str],
                 extras: dict[str, Column] | None = None):
        self._reducer_alias = reducer_alias
        self._key_names = key_names
        self._extras = extras or {}

    def ref(self, ref: ColumnReference) -> Column:
        if ref._name in self._extras:
            return self._extras[ref._name]
        if ref._name in self._key_names or ref._name == ID:
            return F.col(f"`{ref._name}`")
        raise KeyError(
            f"column {ref._name!r} is not a groupby key; aggregate it with a reducer"
        )

    def reducer(self, red: ReducerExpression) -> Column:
        return F.col(self._reducer_alias[red._key()])


class Table:
    """A schema'd keyed collection == Spark DataFrame + `_pw_id`."""

    def __init__(self, df: DataFrame):
        if ID not in df.columns:
            df = df.withColumn(ID, F.xxhash64(*[F.col(f"`{c}`") for c in df.columns]))
        self._df = df

    # ------------------------------------------------------------------
    # constructors / accessors
    # ------------------------------------------------------------------

    @classmethod
    def from_spark(cls, df: DataFrame, id_columns: Sequence[str] | None = None) -> "Table":
        """Wrap a Spark DataFrame; id = xxhash64(id_columns) (reference
        `table.py:1942` with_id_from semantics) or of all columns."""
        cols = list(id_columns) if id_columns else list(df.columns)
        return cls(df.withColumn(ID, F.xxhash64(*[F.col(f"`{c}`") for c in cols])))

    @property
    def df(self) -> DataFrame:
        return self._df

    def to_df(self) -> DataFrame:
        """User-facing DataFrame without engine columns."""
        drop = [c for c in (ID, "_pw_time", "_pw_diff") if c in self._df.columns]
        return self._df.drop(*drop)

    @property
    def column_names(self) -> list[str]:
        return [c for c in self._df.columns if c not in (ID, "_pw_time", "_pw_diff")]

    @property
    def slice(self):
        """TableSlice of this table's columns (reference table_slice.py:16) —
        `t.select(*t.slice.without("age").with_suffix("_col"))`."""
        from .compat import TableSlice

        return TableSlice(
            {c: ColumnReference("this", c) for c in self.column_names}, self
        )

    @property
    def schema(self) -> T.StructType:
        return T.StructType([f for f in self._df.schema.fields if f.name != ID])

    def __getattr__(self, name: str) -> ColumnReference:
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in self._df.columns:
            raise AttributeError(f"table has no column {name!r}")
        return ColumnReference("this", name, table=self)

    def __getitem__(self, name) -> ColumnReference:
        if isinstance(name, (list, tuple)):
            return [self[n] for n in name]  # type: ignore[return-value]
        if isinstance(name, ColumnReference):
            name = name._name
        return ColumnReference("this", name, table=self)

    @property
    def id(self) -> ColumnReference:
        return ColumnReference("this", ID)

    def _ctx(self) -> RowContext:
        return RowContext({"this": self._df})

    def _resolve_projection(self, args, kwargs, ctx=None, keep_id=True) -> list[Column]:
        ctx = ctx or self._ctx()
        cols: list[Column] = [to_col(ColumnReference("this", ID), ctx).alias(ID)] if keep_id else []
        for a in args:
            if a is this:
                for c in self.column_names:
                    cols.append(self._df[c])
                continue
            if not isinstance(a, ColumnReference):
                raise TypeError("positional select args must be column references")
            cols.append(to_col(a, ctx).alias(a._name))
        for name, e in kwargs.items():
            cols.append(to_col(e, ctx).alias(name))
        return cols

    # ------------------------------------------------------------------
    # projection / filter / row ops (SURVEY §2.2)
    # ------------------------------------------------------------------

    def select(self, *args, **kwargs) -> "Table":
        """reference table.py:389 — projection, keeps id."""
        return Table(self._df.select(*self._resolve_projection(args, kwargs)))

    def with_columns(self, *args, **kwargs) -> "Table":
        """reference table.py:1865."""
        ctx = self._ctx()
        updates = {a._name: to_col(a, ctx) for a in args if isinstance(a, ColumnReference)}
        updates.update({name: to_col(e, ctx) for name, e in kwargs.items()})
        return Table(self._df.withColumns(updates))

    def filter(self, expr) -> "Table":
        """reference table.py:497."""
        return Table(self._df.filter(to_col(expr, self._ctx())))

    def split(self, expr) -> tuple["Table", "Table"]:
        """reference table.py:538."""
        c = to_col(expr, self._ctx())
        return Table(self._df.filter(c)), Table(self._df.filter(~F.coalesce(c, F.lit(False))))

    def without(self, *cols) -> "Table":
        names = [c._name if isinstance(c, ColumnReference) else c for c in cols]
        return Table(self._df.drop(*names))

    def rename(self, mapping=None, **kwargs) -> "Table":
        m = dict(mapping or {})
        m.update(kwargs)
        out = {}
        for new, old in m.items():
            out[old._name if isinstance(old, ColumnReference) else old] = new
        return Table(self._df.withColumnsRenamed(out))

    def rename_columns(self, **kwargs) -> "Table":
        return self.rename(kwargs)

    def rename_by_dict(self, mapping) -> "Table":
        return self.rename(mapping)

    def with_prefix(self, prefix: str) -> "Table":
        return Table(
            self._df.withColumnsRenamed({c: prefix + c for c in self.column_names})
        )

    def with_suffix(self, suffix: str) -> "Table":
        return Table(
            self._df.withColumnsRenamed({c: c + suffix for c in self.column_names})
        )

    def update_types(self, **kwargs) -> "Table":
        return self.cast_to_types(**kwargs)

    def cast_to_types(self, **kwargs) -> "Table":
        from .schema import to_spark_type
        return Table(
            self._df.withColumns(
                {name: self._df[name].cast(to_spark_type(tp)) for name, tp in kwargs.items()}
            )
        )

    def copy(self) -> "Table":
        return Table(self._df.alias(f"copy_{next(_ctr)}"))

    def flatten(self, col, *, origin_id: str | None = None) -> "Table":
        """reference table.py:2341 / engine graph.rs:828 — explode an
        iterable column; new id derives from (old id, position)."""
        name = col._name if isinstance(col, ColumnReference) else col
        others = [c for c in self._df.columns if c not in (name, ID)]
        exploded = self._df.select(
            F.col(ID).alias("_pw_origin"), *[F.col(f"`{c}`") for c in others],
            F.posexplode(F.col(f"`{name}`")).alias("_pw_pos", name),
        )
        out = exploded.withColumn(ID, F.xxhash64("_pw_origin", "_pw_pos"))
        keep = [ID, name] + others + ([F.col("_pw_origin").alias(origin_id)] if origin_id else [])
        return Table(out.select(*[c if isinstance(c, Column) else F.col(f"`{c}`") for c in keep]))

    def pointer_from(self, *args) -> ColumnExpression:
        """reference table.py:2633 — deterministic key hash of columns."""
        from .expressions import SparkFunc
        return SparkFunc("pointer_from", lambda *cs: F.xxhash64(*cs), *args)

    def with_id_from(self, *args) -> "Table":
        """reference table.py:1942 / graph.rs:851 reindex."""
        ctx = self._ctx()
        cols = [to_col(a, ctx) for a in args]
        return Table(self._df.withColumn(ID, F.xxhash64(*cols)))

    def with_universe_of(self, other: "Table") -> "Table":
        """reference table.py:2289 — re-key to other's universe. Both tables
        must have equal key sets; realized as an id-preserving no-op."""
        return Table(self._df)

    def __add__(self, other: "Table") -> "Table":
        """Zip same-universe tables (reference table.py:431) == join on id."""
        dup = set(self.column_names) & set(other.column_names)
        if dup:
            raise ValueError(f"duplicate columns in zip: {dup}")
        return Table(self._df.join(other._df, on=ID, how="inner"))

    def __lshift__(self, other: "Table") -> "Table":
        """reference table.py:1541 — update_cells sugar."""
        return self.update_cells(other)

    # ------------------------------------------------------------------
    # set / universe ops (SURVEY §2.7)
    # ------------------------------------------------------------------

    def concat(self, *others: "Table") -> "Table":
        """reference table.py:1586 — disjoint-id union."""
        df = self._df
        for o in others:
            df = df.unionByName(o._df, allowMissingColumns=False)
        return Table(df)

    def concat_reindex(self, *others: "Table") -> "Table":
        """reference table.py:315 — union + fresh ids (side-tagged rehash)."""
        parts = []
        for i, t in enumerate([self, *others]):
            parts.append(t._df.withColumn(ID, F.xxhash64(F.col(ID), F.lit(i))))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return Table(df)

    def update_rows(self, other: "Table") -> "Table":
        """reference table.py:1776 — upsert other's rows over self by id.

        Conflicts resolve "preferring other's values" (reference
        internals/table.py:1692) — including explicit NULLs in the patch:
        a presence marker on the patch side decides, never coalesce (which
        would silently keep self's value under a NULL patch cell)."""
        cols = self.column_names
        o = other._df.select(
            ID,
            F.lit(True).alias("__pw_hit"),
            *[F.col(f"`{c}`").alias(f"__u_{c}") for c in cols],
        )
        j = self._df.join(o, on=ID, how="full_outer")
        hit = F.col("__pw_hit").isNotNull()
        out = j.select(
            ID,
            *[
                F.when(hit, F.col(f"__u_{c}")).otherwise(F.col(f"`{c}`")).alias(c)
                for c in cols
            ],
        )
        return Table(out)

    def update_cells(self, other: "Table") -> "Table":
        """reference table.py:1691 — like update_rows, only other's columns;
        other's keys must be a subset of self's. NULL patch cells overwrite
        (presence-marker join, same as update_rows)."""
        cols = [c for c in other.column_names if c in self.column_names]
        o = other._df.select(
            ID,
            F.lit(True).alias("__pw_hit"),
            *[F.col(f"`{c}`").alias(f"__u_{c}") for c in cols],
        )
        j = self._df.join(o, on=ID, how="left")
        hit = F.col("__pw_hit").isNotNull()
        out = j.select(
            ID,
            *[
                (
                    F.when(hit, F.col(f"__u_{c}")).otherwise(F.col(f"`{c}`"))
                    if c in cols
                    else F.col(f"`{c}`")
                ).alias(c)
                for c in self.column_names
            ],
        )
        return Table(out)

    def intersect(self, *others: "Table") -> "Table":
        """reference table.py:1025 — rows whose id is in all others."""
        df = self._df
        for o in others:
            df = df.join(o._df.select(ID), on=ID, how="left_semi")
        return Table(df)

    def difference(self, other: "Table") -> "Table":
        """reference table.py:988."""
        return Table(self._df.join(other._df.select(ID), on=ID, how="left_anti"))

    def restrict(self, other: "Table") -> "Table":
        """reference table.py:1087 — keep rows with id in other's universe."""
        return Table(self._df.join(other._df.select(ID), on=ID, how="left_semi"))

    def having(self, *indexers) -> "Table":
        """reference table.py:2279."""
        out = self
        for idx in indexers:
            out = out.restrict(Table(self._df.select(to_col(idx, self._ctx()).alias(ID))))
        return out

    def ix(self, key_expr, *, context: "Table", optional: bool = False) -> "Table":
        """reference table.py:1416 / graph.rs:912 — for each row of `context`,
        fetch the row of `self` whose id equals `key_expr` (evaluated on
        context). Result keeps context's universe."""
        key = to_col(key_expr, context._ctx()).alias("__pw_key")
        left = context._df.select(F.col(ID), key)
        right = self._df.withColumnsRenamed({ID: "__pw_rid"})
        how = "left" if optional else "inner"
        j = left.join(right, left["__pw_key"] == right["__pw_rid"], how)
        return Table(j.drop("__pw_key", "__pw_rid"))

    def ix_ref(self, *args, context: "Table", optional: bool = False) -> "Table":
        """reference table.py:2662 — ix by pointer_from(*args)."""
        return self.ix(self.pointer_from(*args), context=context, optional=optional)

    # ------------------------------------------------------------------
    # groupby / reduce (SURVEY §2.4)
    # ------------------------------------------------------------------

    def groupby(self, *args, sort_by=None, instance=None, **_kw) -> "GroupedTable":
        keys = list(args)
        if instance is not None:
            keys.append(instance)
        return GroupedTable(self, keys, sort_by=sort_by)

    def reduce(self, *args, **kwargs) -> "Table":
        """Global aggregation (groupby with no keys) — reference table.py
        allows t.reduce(...) producing a single row."""
        return GroupedTable(self, []).reduce(*args, **kwargs)

    def deduplicate(self, *, value=None, instance=None, acceptor=None,
                    name=None, keep=None) -> "Table":
        """reference table.py:1315 / stdlib/stateful/deduplicate.py:9.

        Batch semantics: one surviving row per `value` (or per `instance`).
        Default keeps the row with the smallest id (deterministic);
        `acceptor(new, old)` folds rows in id order via applyInPandas.
        `keep=<expr>` (extension): survivor is the row minimizing the
        given USER column instead of the internal id — a
        value-deterministic order any external engine can reproduce
        (ties broken by id; pass a group-unique column for cross-engine
        exactness).
        Streaming: see streaming.deduplicate (dropDuplicatesWithinWatermark).
        """
        ctx = self._ctx()
        val = to_col(value if value is not None else ColumnReference("this", ID), ctx)
        keys = [val.alias("__pw_dedup")]
        if instance is not None:
            keys.append(to_col(instance, ctx).alias("__pw_inst"))
        df = self._df
        if acceptor is None:
            strukt = F.struct(*[F.col(f"`{c}`") for c in df.columns])
            order = (F.struct(to_col(keep, ctx), F.col(ID))
                     if keep is not None else F.col(ID))
            agg = df.groupBy(*keys).agg(F.min_by(strukt, order).alias("__row"))
            out = agg.select("__row.*")
            return Table(out)
        # custom acceptor: fold per group in id order (python slow path)
        import pandas as pd

        schema = df.schema
        valname = "__pw_dedup"
        with_key = df.withColumn(valname, val)
        if instance is not None:
            inst = to_col(instance, ctx).alias("__pw_inst")
            with_key = with_key.withColumn("__pw_inst", to_col(instance, ctx))
            group_cols = ["__pw_inst"]
        else:
            group_cols = [valname]

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(ID)
            cur = None
            for _, row in pdf.iterrows():
                if cur is None or acceptor(row[valname], cur[valname]):
                    cur = row
            out = cur.to_frame().T.drop(columns=[c for c in ("__pw_inst", valname) if c in pdf.columns])
            return out

        res = with_key.groupBy(*group_cols).applyInPandas(fold, schema)
        return Table(res)

    # ------------------------------------------------------------------
    # joins (SURVEY §2.3)
    # ------------------------------------------------------------------

    def join(self, other: "Table", *on, how: str = "inner", id=None,
             left_instance=None, right_instance=None) -> "JoinResult":
        return JoinResult(self, other, list(on), how, id_expr=id,
                          instances=(left_instance, right_instance))

    def join_inner(self, other, *on, **kw):
        return self.join(other, *on, how="inner", **kw)

    def join_left(self, other, *on, **kw):
        return self.join(other, *on, how="left", **kw)

    def join_right(self, other, *on, **kw):
        return self.join(other, *on, how="right", **kw)

    def join_outer(self, other, *on, **kw):
        return self.join(other, *on, how="outer", **kw)

    # ------------------------------------------------------------------
    # temporal / ordered (SURVEY §2.5, §2.6) — implemented in operators/
    # ------------------------------------------------------------------

    def windowby(self, time_expr, *, window, instance=None, behavior=None):
        from .operators.temporal import windowby
        return windowby(self, time_expr, window=window, instance=instance, behavior=behavior)

    def asof_join(self, other, t_left, t_right, *on, how="inner", direction="backward", defaults=None):
        from .operators.asof import asof_join
        return asof_join(self, other, t_left, t_right, list(on), how=how,
                         direction=direction, defaults=defaults)

    def asof_join_left(self, other, t_left, t_right, *on, **kw):
        return self.asof_join(other, t_left, t_right, *on, how="left", **kw)

    def asof_join_right(self, other, t_left, t_right, *on, **kw):
        return self.asof_join(other, t_left, t_right, *on, how="right", **kw)

    def asof_join_outer(self, other, t_left, t_right, *on, **kw):
        return self.asof_join(other, t_left, t_right, *on, how="outer", **kw)

    def asof_now_join(self, other, *on, how="inner", **kw):
        from .operators.asof import asof_now_join
        return asof_now_join(self, other, *on, how=how, **kw)

    def asof_now_join_inner(self, other, *on, **kw):
        return self.asof_now_join(other, *on, how="inner", **kw)

    def asof_now_join_left(self, other, *on, **kw):
        return self.asof_now_join(other, *on, how="left", **kw)

    def interval_join(self, other, t_left, t_right, interval, *on, how="inner"):
        from .operators.temporal import interval_join
        return interval_join(self, other, t_left, t_right, interval, list(on), how=how)

    def interval_join_inner(self, *a, **kw):
        return self.interval_join(*a, how="inner", **kw)

    def interval_join_left(self, *a, **kw):
        return self.interval_join(*a, how="left", **kw)

    def window_join(self, other, t_left, t_right, window, *on, how="inner"):
        from .operators.temporal import window_join
        return window_join(self, other, t_left, t_right, window, list(on), how=how)

    def sort(self, key, instance=None) -> "Table":
        from .operators.sort import sort as _sort
        return _sort(self, key, instance)

    def diff(self, timestamp, *values, instance=None) -> "Table":
        from .operators.sort import diff as _diff
        return _diff(self, timestamp, values, instance)

    # ------------------------------------------------------------------
    # misc / debug
    # ------------------------------------------------------------------

    def remove_errors(self) -> "Table":
        """reference table.py:2753 — our error model is NULL-poisoning; this
        drops rows where any column is NULL."""
        cond = None
        for c in self.column_names:
            cc = self._df[c].isNotNull()
            cond = cc if cond is None else (cond & cc)
        return Table(self._df.filter(cond)) if cond is not None else self

    def await_futures(self) -> "Table":
        """reference table.py:2779 — async results resolve within batch; no-op."""
        return self

    def remove_retractions(self) -> "Table":
        """reference table.py:2842 — keep only insertions of a changelog
        table (rows with `_pw_diff` > 0; plain tables pass through)."""
        if "_pw_diff" in self._df.columns:
            return Table(self._df.filter(F.col("_pw_diff") > 0))
        return self

    def assert_append_only(self) -> "Table":
        """reference `assert_append_only` (graph.rs:1040): fail if the
        changelog carries retractions."""
        if "_pw_diff" in self._df.columns:
            bad = self._df.filter(F.col("_pw_diff") < 0)
            assert bad.isEmpty(), "table is not append-only: retractions present"
        return self

    def stream_to_table(self) -> "Table":
        """changelog → snapshot (reference stream_to_table, graph.rs:1020):
        fold +1/-1 diffs per id, keep rows with positive net count at the
        latest time."""
        if "_pw_diff" not in self._df.columns:
            return self
        from pyspark.sql.window import Window as _W

        net = self._df.groupBy(ID).agg(F.sum("_pw_diff").alias("__net"))
        order = (F.col("_pw_time").desc() if "_pw_time" in self._df.columns
                 else F.lit(0))
        latest = (
            self._df.filter(F.col("_pw_diff") > 0)
            .withColumn("__rn", F.row_number().over(_W.partitionBy(ID).orderBy(order)))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        keep = latest.join(net.filter(F.col("__net") > 0).select(ID), ID, "left_semi")
        return Table(keep.drop("_pw_diff", "_pw_time"))

    def table_to_stream(self) -> "Table":
        """snapshot → changelog: every row becomes a +1 insert at time 0."""
        df = self._df
        if "_pw_diff" not in df.columns:
            df = df.withColumn("_pw_diff", F.lit(1))
        if "_pw_time" not in df.columns:
            df = df.withColumn("_pw_time", F.lit(0))
        return Table(df)

    def explain(self, mode: str = "formatted") -> None:
        self._df.explain(mode)

    def show(self, n: int = 20) -> None:
        self.to_df().show(n, truncate=False)

    def count_rows(self) -> int:
        return self._df.count()

    # ------------------------------------------------------ parity block
    # Methods from the reference `internals/table.py` / `joins.py` whose
    # Spark mappings are thin; the watermark family (buffer / forget /
    # ignore_late) maps the engine's time-threshold primitives onto
    # Structured Streaming watermarks (the identical eviction contract),
    # with batch forms defined against max(time_column).

    @property
    def C(self):
        """joins.py:106 — column namespace; attribute access on a Table
        already yields bound ColumnReferences, so the namespace is the
        table itself."""
        return self

    _C = C

    @staticmethod
    def empty(**kwargs) -> "Table":
        """table.py:362 — empty table with columns typed by kwargs."""
        from .schema import schema_from_types
        from .session import get_spark

        schema = schema_from_types(**kwargs)
        struct = schema.to_struct_type().add(ID, T.LongType())
        return Table(get_spark().createDataFrame([], struct))

    @staticmethod
    def from_columns(*args, **kwargs) -> "Table":
        """table.py:272 — build a table from same-universe columns: the
        first column's table provides the ids; every further source
        table joins on id (a co-partitioned equi-join — same-universe
        tables hash-partition identically on `_pw_id`)."""
        named = {**{a._name: a for a in args}, **kwargs}
        if not named:
            raise ValueError("Table.from_columns() cannot have empty arguments list")
        items = list(named.items())
        base_t = items[0][1].table
        out = base_t._df.select(ID, F.col(f"`{items[0][1]._name}`").alias(items[0][0]))
        for new_name, ref in items[1:]:
            piece = ref.table._df.select(
                ID, F.col(f"`{ref._name}`").alias(new_name))
            out = out.join(piece, ID)
        return Table(out)

    def keys(self):
        """table.py:157 — the column names."""
        return list(self.column_names)

    def typehints(self):
        """table.py:3119 — column name → python type."""
        mapping = {
            "bigint": int, "int": int, "smallint": int, "tinyint": int,
            "double": float, "float": float, "string": str,
            "boolean": bool, "binary": bytes,
        }
        return {c: mapping.get(dt.split("(")[0], object)
                for c, dt in self._df.dtypes if c != ID}

    def eval_type(self, expression):
        """table.py:3138 — the type an expression evaluates to here."""
        from .expressions import to_col

        probe = self._df.select(to_col(expression, self._ctx()).alias("_t"))
        return self.__class__(probe.withColumn(ID, F.lit(0))).typehints()["_t"]

    def with_id(self, new_index) -> "Table":
        """table.py:1899 — adopt an id-typed column as the new id
        (with_id_from hashes arbitrary values; this takes ids as-is)."""
        name = new_index._name if hasattr(new_index, "_name") else str(new_index)
        df = self._df
        src = (new_index.table._df.select(ID, F.col(f"`{name}`").alias("__newid"))
               if getattr(new_index, "_table", None) is not None
               and new_index.table is not self else None)
        if src is not None:
            df = df.join(src, ID).drop(ID).withColumnRenamed("__newid", ID)
        else:
            df = df.withColumn(ID, F.col(f"`{name}`").cast("long"))
        return Table(df)

    def update_id_type(self, id_type, *, id_append_only=None) -> "Table":
        """table.py:2255 — ids here are always hashed longs; the
        declared pointer type is erased at plan time, so this is the
        identity (documented divergence)."""
        del id_type, id_append_only
        return self

    @property
    def is_append_only(self) -> bool:
        """table.py:196 — no retraction stream attached."""
        return "_pw_diff" not in self._df.columns

    def live(self):
        """table.py:3154 — interactive live view; batch plans are
        always materializable, so the table itself serves."""
        return self

    def debug(self, name: str) -> "Table":
        """table.py:2608 — attach a debug probe. Spark mapping: print
        the schema now and the rows at the next action (batch: eagerly,
        bounded to 20 rows)."""
        print(f"[debug:{name}] schema={self._df.dtypes}")
        if not self._df.isStreaming:
            self.to_df().show(20, truncate=False)
        return self

    def to(self, sink) -> None:
        """table.py:2615 — write this table to a sink object: anything
        callable, or exposing .write(table)."""
        if callable(sink):
            sink(self)
        elif hasattr(sink, "write"):
            sink.write(self)
        else:
            raise TypeError(f"not a sink: {sink!r}")

    def to_stream(self, upsert_column_name: str = "is_upsert") -> "Table":
        """table.py:2857 — changelog rows become upsert flags: +1 →
        True, -1 → False; a plain batch table is all inserts."""
        df = self._df
        if "_pw_diff" in df.columns:
            df = df.withColumn(upsert_column_name, F.col("_pw_diff") > 0) \
                   .drop("_pw_diff")
        else:
            df = df.withColumn(upsert_column_name, F.lit(True))
        return Table(df)

    def from_streams(self, deletion_stream: "Table") -> "Table":
        """table.py:2967 — rebuild current state from an update stream
        and a deletion stream: last write per id wins (order within a
        batch is unspecified, as in the reference), then ids present in
        the deletion stream are dropped (one anti-join)."""
        from pyspark.sql.window import Window as _W

        order = (F.col("_pw_time").desc() if "_pw_time" in self._df.columns
                 else F.lit(0))
        latest = (self._df.withColumn(
                      "__rn", F.row_number().over(_W.partitionBy(ID).orderBy(order)))
                  .filter(F.col("__rn") == 1).drop("__rn", "_pw_diff", "_pw_time"))
        dels = deletion_stream._df.select(ID)
        return Table(latest.join(dels, ID, "left_anti"))

    def unpack_snapshots(self) -> "Table":
        """table.py:3056 — changelog → per-minibatch full snapshots.
        Each row's validity interval [add_time, delete_time) joins the
        distinct minibatch times: alive rows replicate per snapshot.
        Quadratic in (rows × batches) by definition — the reference
        carries the same warning."""
        df = self._df
        if "_pw_time" not in df.columns or "_pw_diff" not in df.columns:
            return self
        adds = df.filter(F.col("_pw_diff") > 0).drop("_pw_diff") \
                 .withColumnRenamed("_pw_time", "__t_add")
        dels = df.filter(F.col("_pw_diff") < 0).select(
            ID, F.col("_pw_time").alias("__t_del"))
        spans = adds.join(dels, ID, "left")
        times = df.select(F.col("_pw_time").alias("__snap")).distinct()
        alive = spans.join(
            times,
            (F.col("__t_add") <= F.col("__snap"))
            & (F.col("__t_del").isNull() | (F.col("__snap") < F.col("__t_del"))),
        )
        out = (alive.drop("__t_add", "__t_del")
               .withColumnRenamed("__snap", "_pw_time")
               .withColumn("_pw_diff", F.lit(1)))
        return Table(out)

    def _threshold_str(self, threshold) -> str:
        import datetime as _dtm
        if isinstance(threshold, _dtm.timedelta):
            return f"{int(threshold.total_seconds() * 1e6)} microseconds"
        return f"{int(threshold)} microseconds"

    def _late_filter(self, time_column, threshold) -> "Table":
        from .expressions import to_col

        t = to_col(time_column, self._ctx())
        mx = self._df.agg(F.max(t).alias("__mx"))
        import datetime as _dtm
        if isinstance(threshold, _dtm.timedelta):
            cut = F.col("__mx") - F.expr(
                f"INTERVAL {int(threshold.total_seconds() * 1e6)} MICROSECOND")
        else:
            cut = F.col("__mx") - F.lit(threshold)
        joined = self._df.crossJoin(F.broadcast(mx.select(cut.alias("__cut"))))
        return Table(joined.filter(t > F.col("__cut")).drop("__cut"))

    def ignore_late(self, time_column, threshold) -> "Table":
        """table.py:852 — drop entries older than max(time) − threshold.
        Streaming: EXACTLY Structured Streaming's watermark contract
        (late rows dropped, no state kept) → withWatermark. Batch: one
        broadcast max + filter."""
        if self._df.isStreaming:
            name = time_column._name if hasattr(time_column, "_name") else str(time_column)
            return Table(self._df.withWatermark(name, self._threshold_str(threshold)))
        return self._late_filter(time_column, threshold)

    def forget(self, time_column, threshold,
               mark_forgetting_records: bool = False) -> "Table":
        """table.py:671 — evict entries older than max(time) − threshold
        from downstream state. Streaming: the watermark IS the state-
        eviction contract (stateful ops drop state past it). Batch: the
        final state after all forgetting is the same late-filter.
        `mark_forgetting_records` tags would-be deletion events; batch
        final state has none, so the marker column is constant False."""
        out = self.ignore_late(time_column, threshold)
        if mark_forgetting_records:
            out = Table(out._df.withColumn("_pw_forgotten", F.lit(False)))
        return out

    def filter_out_results_of_forgetting(self,
                                         ensure_consistency: bool = False
                                         ) -> "Table":
        """table.py:793 — drop deletion events produced by forget()."""
        del ensure_consistency
        df = self._df
        if "_pw_forgotten" in df.columns:
            df = df.filter(~F.col("_pw_forgotten")).drop("_pw_forgotten")
        return Table(df)

    def buffer(self, time_column, threshold) -> "Table":
        """table.py:921 — delay emission until time advances past
        entry-time + threshold. Streaming: a watermark with `threshold`
        delay + append output holds rows exactly until the clock (max
        event time) passes them. Batch: all input is present, so every
        buffered row is already released — identity."""
        if self._df.isStreaming:
            name = time_column._name if hasattr(time_column, "_name") else str(time_column)
            return Table(self._df.withWatermark(name, self._threshold_str(threshold)))
        return self


class GroupedTable:
    """reference `internals/groupbys.py:71`."""

    def __init__(self, table: Table, keys: list, sort_by=None):
        self._table = table
        self._keys = keys
        self._sort_by = sort_by
        # post-agg column aliases (e.g. window struct fields) + id override
        self._key_aliases: dict[str, Column] = {}
        self._id_expr: Column | None = None
        # hidden aggregates computed alongside the user's reducers (e.g.
        # deferred session bounds min/max — r11): {out_name: agg Column}
        self._extra_aggs: dict[str, Column] = {}

    def reduce(self, *args, **kwargs) -> Table:
        """reference groupbys.py:158 → Spark groupBy().agg() with
        map-side partial aggregation. Two-phase compile: (1) collect
        reducer atoms from every output expression, aggregate them once,
        (2) re-evaluate outputs over the aggregated frame."""
        tbl = self._table
        df = tbl._df
        row_ctx = tbl._ctx()

        # named output exprs; positional ColumnReferences pass group keys through
        outputs: dict[str, ColumnExpression] = {}
        for a in args:
            if not isinstance(a, ColumnReference):
                raise TypeError("positional reduce args must be column references")
            outputs[a._name] = a
        outputs.update({name: _wrap(e) for name, e in kwargs.items()})

        # group keys: references keep names, exprs get synthetic names
        key_cols: list[Column] = []
        key_names: list[str] = []
        for k in self._keys:
            k = _wrap(k)
            if isinstance(k, ColumnReference):
                key_cols.append(to_col(k, row_ctx).alias(k._name))
                key_names.append(k._name)
            else:
                n = f"__pw_key_{len(key_names)}"
                key_cols.append(to_col(k, row_ctx).alias(n))
                key_names.append(n)

        reducers = _collect_reducers(outputs.values())
        # sort_by feeds order-sensitive reducers (tuple/ndarray):
        # collect (sort_key, value) structs, sort post-agg, unwrap
        from .reducers import OrderedReducer

        sort_col = to_col(self._sort_by, row_ctx) if self._sort_by is not None else None
        alias = {key: f"__agg_{i}" for i, (key, _) in enumerate(reducers.items())}

        def compile_agg(key, red) -> Column:
            if sort_col is not None and isinstance(red, OrderedReducer):
                return red._agg_col_sorted(row_ctx, sort_col).alias(alias[key])
            return red._agg_col(row_ctx).alias(alias[key])

        # pandas GROUPED_AGG UDFs (custom python reducers) can't share an
        # .agg() with plain aggregates — compile them as a second
        # aggregation over the same keys, null-safe-joined back. Both
        # sides stay Arrow/codegen; the extra agg re-reads the (already
        # shuffled-by-key) input once.
        plain_cols = [compile_agg(k, r) for k, r in reducers.items()
                      if not getattr(r, "_is_pandas_agg", False)]
        plain_cols += [c.alias(n) for n, c in self._extra_aggs.items()]
        pandas_cols = [compile_agg(k, r) for k, r in reducers.items()
                       if getattr(r, "_is_pandas_agg", False)]

        if pandas_cols and plain_cols:
            gdf = df.groupBy(*key_cols).agg(*plain_cols)
            g2 = df.groupBy(*key_cols).agg(*pandas_cols)
            k2 = [f"__pw_k2_{i}" for i in range(len(key_names))]
            g2 = g2.select(
                *[F.col(f"`{n}`").alias(k2[i]) for i, n in enumerate(key_names)],
                *[c for c in g2.columns if c.startswith("__agg_")],
            )
            if key_names:
                cond = None
                for i, n in enumerate(key_names):
                    eq = gdf[f"`{n}`"].eqNullSafe(g2[k2[i]])
                    cond = eq if cond is None else (cond & eq)
                gdf = gdf.join(g2, cond, "inner").drop(*k2)
            else:
                gdf = gdf.crossJoin(g2)
        else:
            agg_cols = pandas_cols or plain_cols
            if not agg_cols:
                agg_cols = [F.count(F.lit(1)).alias("__pw_dummy_count")]
            gdf = df.groupBy(*key_cols).agg(*agg_cols)

        post = _AggContext({k: a for k, a in alias.items()}, set(key_names),
                           self._key_aliases)
        if self._id_expr is not None:
            id_col = self._id_expr.alias(ID)
        elif key_names:
            id_col = F.xxhash64(*[F.col(f"`{n}`") for n in key_names]).alias(ID)
        else:
            id_col = F.lit(0).alias(ID)
        out_cols = [id_col] + [to_col(e, post).alias(name) for name, e in outputs.items()]
        return Table(gdf.select(*out_cols))


class JoinResult:
    """reference `internals/joins.py:135` — lazy join; `.select` projects
    with pw.left / pw.right / pw.this references."""

    _HOW = {"inner": "inner", "left": "left", "right": "right", "outer": "full_outer",
            "full": "full_outer", "left_semi": "left_semi", "left_anti": "left_anti"}

    def __init__(self, lt: Table, rt: Table, on: list, how: str, id_expr=None,
                 instances=(None, None)):
        n = next(_ctr)
        self._la, self._ra = f"__pw_l{n}", f"__pw_r{n}"
        self._lt, self._rt = lt, rt
        self._how = self._HOW[how]
        ldf = lt._df.alias(self._la)
        rdf = rt._df.alias(self._ra)
        self._ctx = RowContext(
            {"left": ldf, "right": rdf},
            alias={"left": self._la, "right": self._ra},
        )
        conds = []
        li, ri = instances
        if li is not None and ri is not None:
            on = list(on) + [BinaryOp("==", _wrap(li), _wrap(ri))]
        for c in on:
            conds.append(to_col(c, self._ctx))
        cond = None
        for c in conds:
            cond = c if cond is None else (cond & c)
        self._jdf = ldf.join(rdf, cond, self._how) if cond is not None else ldf.crossJoin(rdf)
        self._id_expr = id_expr

    def _resolve(self, ref: ColumnReference) -> Column:
        side = ref._side
        if side == "this":
            in_l = ref._name in self._lt._df.columns
            in_r = ref._name in self._rt._df.columns
            if in_l and in_r:
                raise ValueError(f"ambiguous column {ref._name!r}; use pw.left/pw.right")
            side = "left" if in_l else "right"
        return F.col(f"{self._la if side == 'left' else self._ra}.`{ref._name}`")

    def select(self, *args, **kwargs) -> Table:
        ctx = _JoinCtx(self)
        if self._id_expr is not None:
            id_col = to_col(self._id_expr, ctx).alias(ID)
        else:
            # outer-join null-side ids are hash-derived (joins.py:1188 note)
            id_col = F.xxhash64(
                F.col(f"{self._la}.`{ID}`"), F.col(f"{self._ra}.`{ID}`")
            ).alias(ID)
        cols: list[Column] = [id_col]
        for a in args:
            if a is this:
                raise TypeError("use explicit columns or pw.left/pw.right in join select")
            cols.append(to_col(a, ctx).alias(a._name))
        for name, e in kwargs.items():
            cols.append(to_col(e, ctx).alias(name))
        return Table(self._jdf.select(*cols))

    def groupby(self, *keys) -> "GroupedJoinResult":
        return GroupedJoinResult(self, list(keys))

    def filter(self, expr) -> "JoinResult":
        out = object.__new__(JoinResult)
        out.__dict__.update(self.__dict__)
        out._jdf = self._jdf.filter(to_col(expr, _JoinCtx(self)))
        return out


class _JoinCtx(EvalContext):
    def __init__(self, jr: JoinResult):
        self._jr = jr

    def ref(self, ref: ColumnReference) -> Column:
        return self._jr._resolve(ref)


class GroupedJoinResult:
    """reference `groupbys.py:280`."""

    def __init__(self, jr: JoinResult, keys: list):
        self._jr = jr
        self._keys = keys

    def reduce(self, *args, **kwargs) -> Table:
        jr = self._jr
        ctx = _JoinCtx(jr)
        outputs: dict[str, ColumnExpression] = {}
        for a in args:
            outputs[a._name] = a
        outputs.update({name: _wrap(e) for name, e in kwargs.items()})

        key_cols, key_names = [], []
        for k in self._keys:
            k = _wrap(k)
            nm = k._name if isinstance(k, ColumnReference) else f"__pw_key_{len(key_names)}"
            key_cols.append(to_col(k, ctx).alias(nm))
            key_names.append(nm)

        reducers = _collect_reducers(outputs.values())
        alias = {key: f"__agg_{i}" for i, (key, _) in enumerate(reducers.items())}
        agg_cols = [red._agg_col(ctx).alias(alias[key]) for key, red in reducers.items()]
        if not agg_cols:
            agg_cols = [F.count(F.lit(1)).alias("__pw_dummy_count")]
        gdf = jr._jdf.groupBy(*key_cols).agg(*agg_cols)
        post = _AggContext(alias, set(key_names))
        id_col = (
            F.xxhash64(*[F.col(f"`{n}`") for n in key_names]).alias(ID)
            if key_names else F.lit(0).alias(ID)
        )
        out_cols = [id_col] + [to_col(e, post).alias(name) for name, e in outputs.items()]
        return Table(gdf.select(*out_cols))
