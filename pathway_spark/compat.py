"""API-parity surface: types, enums, and helpers the reference exports
from ``import pathway as pw`` that don't belong to any one operator module.

Mirrors (behaviour, not code):
- reference `python/pathway/internals/join_mode.py:9` (JoinMode)
- reference `python/pathway/internals/monitoring.py:249` (MonitoringLevel)
- reference `python/pathway/internals/datetime_types.py` (DateTimeNaive/Utc, Duration)
- reference `python/pathway/internals/json.py:31` (Json)
- reference `python/pathway/internals/api.py:237` (PyObjectWrapper / wrap_py_object)
- reference `python/pathway/internals/schema.py:277/927` (SchemaProperties, schema_from_csv)
- reference `python/pathway/internals/table_slice.py:16` (TableSlice)
- reference `python/pathway/internals/common.py:474/524` (assert_table_has_schema,
  table_transformer)
- reference `python/pathway/internals/errors.py` (global/local_error_log)
- reference `python/pathway/internals/yaml_loader.py:232` (load_yaml)

Everything here is driver-side metadata — nothing touches the Spark plan,
so there is no scale cost to any of it.
"""

from __future__ import annotations

import contextlib
import importlib
import io as _io
import pickle
from dataclasses import dataclass
from enum import Enum
from typing import Any, Callable, Generic, TypeVar

import pandas as pd

from pyspark.sql import types as T

_KT = TypeVar("_KT")


# ---------------------------------------------------------------------------
# enums
# ---------------------------------------------------------------------------

class JoinMode(Enum):
    """reference internals/join_mode.py:9 — the four join flavours."""

    INNER = "inner"
    LEFT = "left"
    RIGHT = "right"
    OUTER = "outer"


class MonitoringLevel(Enum):
    """reference internals/monitoring.py:249. Monitoring is a no-op here:
    Spark exposes the same information through its own UI/metrics sinks."""

    AUTO = 0
    AUTO_ALL = 1
    NONE = 2
    IN_OUT = 3
    ALL = 4


class PersistenceMode(Enum):
    """reference internals/api PersistenceMode. Maps onto Structured
    Streaming checkpointing (see `pathway_spark/persistence.py`)."""

    BATCH = 0
    SPEEDRUN_REPLAY = 1
    REALTIME_REPLAY = 2
    PERSISTING = 3
    SELECTIVE_PERSISTING = 4
    UDF_CACHING = 5
    OPERATOR_PERSISTING = 6


class Type(Enum):
    """reference PathwayType (api.py) — the dynamic dtype enum users pass
    to connectors. `.to_spark()` gives the Spark-native mapping
    (SURVEY §1.2)."""

    ANY = "any"
    STRING = "string"
    INT = "int"
    BOOL = "bool"
    FLOAT = "float"
    POINTER = "pointer"
    DATE_TIME_NAIVE = "datetime_naive"
    DATE_TIME_UTC = "datetime_utc"
    DURATION = "duration"
    ARRAY = "array"
    JSON = "json"
    BYTES = "bytes"
    PY_OBJECT_WRAPPER = "py_object_wrapper"

    def to_spark(self) -> T.DataType:
        from .schema import to_spark_type

        return to_spark_type(self.value)


# ---------------------------------------------------------------------------
# datetime value types (reference datetime_types.py: thin pandas subclasses
# so isinstance checks and arithmetic behave exactly like the reference)
# ---------------------------------------------------------------------------

class DateTimeNaive(pd.Timestamp):
    """Timezone-naive datetime (reference DateTimeNaive → TimestampNTZ)."""


class DateTimeUtc(pd.Timestamp):
    """Timezone-aware datetime (reference DateTimeUtc → Timestamp)."""


class Duration(pd.Timedelta):
    """Time duration (reference Duration → ns-precision interval)."""


class Pointer(Generic[_KT]):
    """Row-id type marker (reference dtype.py:304). Concrete ids are
    xxhash64 longs (`table.py` ID column); this class exists for schema
    annotations: ``class S(pw.Schema): owner: pw.Pointer``."""

    _spark_type = T.LongType()


# ---------------------------------------------------------------------------
# Json value wrapper (reference internals/json.py:31)
# ---------------------------------------------------------------------------

class Json:
    """Immutable wrapper over a parsed JSON value; mirrors the reference's
    `pw.Json` surface (`.value`, `.as_int()` family, indexing)."""

    NULL: "Json"

    def __init__(self, value: Any = None):
        if isinstance(value, Json):
            value = value.value
        self._value = value

    @property
    def value(self) -> Any:
        return self._value

    @classmethod
    def parse(cls, s: str | bytes) -> "Json":
        import json as _json

        return cls(_json.loads(s))

    @classmethod
    def dumps(cls, value: Any) -> str:
        import json as _json

        return _json.dumps(value.value if isinstance(value, Json) else value)

    def __getitem__(self, key):
        return Json(self._value[key])

    def get(self, key, default=None):
        try:
            return Json(self._value[key])
        except (KeyError, IndexError, TypeError):
            return default

    def as_int(self) -> int:
        if isinstance(self._value, bool) or not isinstance(self._value, int):
            raise ValueError(f"Cannot convert json {self._value!r} to int")
        return self._value

    def as_float(self) -> float:
        if isinstance(self._value, bool) or not isinstance(self._value, (int, float)):
            raise ValueError(f"Cannot convert json {self._value!r} to float")
        return float(self._value)

    def as_str(self) -> str:
        if not isinstance(self._value, str):
            raise ValueError(f"Cannot convert json {self._value!r} to str")
        return self._value

    def as_bool(self) -> bool:
        if not isinstance(self._value, bool):
            raise ValueError(f"Cannot convert json {self._value!r} to bool")
        return self._value

    def as_list(self) -> list:
        if not isinstance(self._value, list):
            raise ValueError(f"Cannot convert json {self._value!r} to list")
        return self._value

    def as_dict(self) -> dict:
        if not isinstance(self._value, dict):
            raise ValueError(f"Cannot convert json {self._value!r} to dict")
        return self._value

    def __eq__(self, other):
        return isinstance(other, Json) and self._value == other._value

    def __hash__(self):
        return hash(Json.dumps(self._value))

    def __repr__(self):
        return f"pw.Json({self._value!r})"


Json.NULL = Json(None)


# ---------------------------------------------------------------------------
# PyObjectWrapper (reference api.py:237 / wrap_py_object:257)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PyObjectWrapper:
    """Carries an arbitrary pickleable Python object through a table as an
    opaque binary cell — the Spark column type is BinaryType and the object
    crosses executor boundaries pickled (Arrow-batch friendly)."""

    value: Any

    def to_bytes(self) -> bytes:
        return pickle.dumps(self.value)

    @classmethod
    def from_bytes(cls, b: bytes) -> "PyObjectWrapper":
        return cls(pickle.loads(b))


def wrap_py_object(value: Any, *, serializer: Any = None) -> PyObjectWrapper:
    return PyObjectWrapper(value)


# ---------------------------------------------------------------------------
# schema helpers
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SchemaProperties:
    """reference schema.py:277."""

    append_only: bool | None = None


def assert_table_has_schema(
    table,
    schema,
    *,
    allow_superset: bool = False,
    ignore_primary_keys: bool = True,
) -> None:
    """reference common.py:474 — raise AssertionError unless ``table``'s
    columns (names + Spark types) match ``schema``."""
    from .schema import Schema

    want = {f.name: f.dataType for f in schema.to_struct_type().fields} \
        if isinstance(schema, type) and issubclass(schema, Schema) else \
        {f.name: f.dataType for f in schema.fields}
    have = {f.name: f.dataType for f in table.schema.fields}
    missing = {n: t for n, t in want.items() if n not in have}
    if missing:
        raise AssertionError(f"table is missing columns {sorted(missing)}")
    mismatched = {
        n: (have[n], t) for n, t in want.items() if have[n] != t
    }
    if mismatched:
        raise AssertionError(f"column dtype mismatches: {mismatched}")
    if not allow_superset and set(have) - set(want):
        raise AssertionError(
            f"table has extra columns {sorted(set(have) - set(want))}"
        )


def table_transformer(func: Callable | None = None, /, **_kw) -> Callable:
    """reference common.py:524 — decorator that (in the reference) checks
    argument/return schemas at call time. Schemas here are carried by the
    Spark plan itself, so this is a transparent marker decorator."""
    if func is None:
        return lambda f: f
    return func


def schema_from_csv(
    path: str,
    *,
    name: str = "CsvSchema",
    properties: SchemaProperties | None = None,
    delimiter: str = ",",
    comment_character: str | None = None,
    escape: str | None = None,
    quote: str | None = '"',
    double_quote_escapes: bool = True,
    num_parsed_rows: int | None = 100,
) -> type:
    """reference schema.py:927 — infer a Schema from a CSV sample using
    pandas (driver-side; the actual read then goes through spark.read.csv
    with the inferred schema so the cluster-side scan is schema-stable)."""
    from .schema import schema_from_dict

    pdf = pd.read_csv(
        path,
        sep=delimiter,
        comment=comment_character,
        escapechar=escape,
        quotechar=quote or '"',
        doublequote=double_quote_escapes,
        nrows=num_parsed_rows,
    )
    mapping = {
        "int64": int, "float64": float, "bool": bool, "object": str,
    }
    cols = {
        c: mapping.get(str(dt), str) for c, dt in pdf.dtypes.items()
    }
    return schema_from_dict(cols, name=name)


# ---------------------------------------------------------------------------
# TableSlice (reference table_slice.py:16)
# ---------------------------------------------------------------------------

class TableSlice:
    """Collection of column references supporting without/with_prefix/
    with_suffix/rename, usable inside ``select(*t.slice.without("x"))``."""

    def __init__(self, mapping: dict, table):
        self._mapping = dict(mapping)
        self._table = table

    def keys(self):
        return self._mapping.keys()

    def items(self):
        return self._mapping.items()

    def __iter__(self):
        return iter(self._mapping.values())

    def __len__(self):
        return len(self._mapping)

    def __getitem__(self, arg):
        if isinstance(arg, list):
            return TableSlice({self._name_of(a): self._mapping[self._name_of(a)]
                               for a in arg}, self._table)
        return self._mapping[self._name_of(arg)]

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            return self._mapping[name]
        except KeyError:
            raise AttributeError(f"slice has no column {name!r}")

    @staticmethod
    def _name_of(arg) -> str:
        return arg if isinstance(arg, str) else arg.name

    def without(self, *cols) -> "TableSlice":
        drop = {self._name_of(c) for c in cols}
        for c in drop:  # reference table_slice.py:85 — unknown name raises
            if c not in self._mapping:
                raise KeyError(f"Column name {c!r} not found in a {self}.")
        return TableSlice(
            {n: r for n, r in self._mapping.items() if n not in drop},
            self._table,
        )

    def rename(self, mapping: dict) -> "TableSlice":
        ren = {self._name_of(k): (v if isinstance(v, str) else v.name)
               for k, v in mapping.items()}
        for old in ren:
            if old not in self._mapping:
                raise KeyError(f"Column name {old!r} not found in a {self}.")
        return TableSlice(
            {ren.get(n, n): r for n, r in self._mapping.items()}, self._table
        )

    def with_prefix(self, prefix: str) -> "TableSlice":
        return TableSlice(
            {prefix + n: r for n, r in self._mapping.items()}, self._table
        )

    def with_suffix(self, suffix: str) -> "TableSlice":
        return TableSlice(
            {n + suffix: r for n, r in self._mapping.items()}, self._table
        )

    def __repr__(self):
        return f"TableSlice({self._mapping})"


# ---------------------------------------------------------------------------
# error logs (reference internals/errors.py; our error model: SURVEY §4 —
# Value::Error → NULL + remove_errors; the log table records udf failures)
# ---------------------------------------------------------------------------

_ERROR_LOG_ROWS: list[tuple[str, str]] = []


def _log_error(operator: str, message: str) -> None:
    _ERROR_LOG_ROWS.append((operator, message))


def _error_rows_table(rows: list[tuple[str, str]]):
    from .debug import table_from_rows
    from .schema import schema_from_dict

    schema = schema_from_dict(
        {"_log_id": int, "operator": str, "message": str}, name="ErrorLogSchema"
    )
    return table_from_rows(
        schema, [(i, op, msg) for i, (op, msg) in enumerate(rows)]
    )


def global_error_log():
    """Table of (operator, message) errors captured driver-side from UDF
    fallbacks. Spark-side row errors surface as NULLs (`remove_errors`)."""
    return _error_rows_table(_ERROR_LOG_ROWS)


@contextlib.contextmanager
def local_error_log():
    mark = len(_ERROR_LOG_ROWS)

    class _Lazy:
        def table(self):
            return _error_rows_table(_ERROR_LOG_ROWS[mark:])

    yield _Lazy()


# ---------------------------------------------------------------------------
# misc no-ops + yaml loader
# ---------------------------------------------------------------------------

def set_license_key(key: str | None) -> None:
    """No-op: everything in this engine is Apache-2-style open surface."""


def set_monitoring_config(*, server_endpoint: str | None = None,
                          **_kw) -> None:
    """No-op: use Spark's own metrics/UI configuration instead."""


def enable_interactive_mode() -> None:
    """No-op marker (reference interactive mode drives a live notebook
    display; `pw.debug.compute_and_print` covers the batch equivalent)."""


def load_yaml(stream):
    """reference yaml_loader.py:232 — parse a YAML pipeline config.
    Supports `!pw.<dotted.path>` tags resolved against this package, and
    plain `$ref`-free safe loading otherwise. Gated on PyYAML presence."""
    try:
        import yaml
    except ImportError as exc:  # pragma: no cover
        raise ImportError("load_yaml requires PyYAML") from exc

    class _Loader(yaml.SafeLoader):
        pass

    def _resolve(tag_suffix: str):
        parts = tag_suffix.split(".")
        obj = importlib.import_module("pathway_spark")
        for p in parts:
            obj = getattr(obj, p)
        return obj

    def _construct(loader, tag_suffix, node):
        target = _resolve(tag_suffix)
        if isinstance(node, yaml.MappingNode):
            kwargs = loader.construct_mapping(node, deep=True)
            return target(**kwargs) if callable(target) else target
        if isinstance(node, yaml.ScalarNode):
            arg = loader.construct_scalar(node)
            if arg in ("", None):
                return target() if callable(target) else target
            if isinstance(target, type) and issubclass(target, Enum):
                return target[arg]
            return target(arg) if callable(target) else target
        args = loader.construct_sequence(node, deep=True)
        return target(*args) if callable(target) else target

    yaml.add_multi_constructor("!pw.", _construct, Loader=_Loader)
    if isinstance(stream, bytes):
        stream = stream.decode()
    if isinstance(stream, str):
        stream = _io.StringIO(stream)
    return yaml.load(stream, Loader=_Loader)
