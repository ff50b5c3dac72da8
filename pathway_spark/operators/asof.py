"""As-of join — reference `python/pathway/stdlib/temporal/_asof_join.py`
(asof_join 481, _left 659, _right 831, _outer 1002).

Spark-first design (SURVEY §2.3): instead of the reference's sort +
prev/next-pointer iteration, we use the union + window-function pattern:
tag both sides, union on (keys, t), then `last(right_value, ignorenulls)`
over `Window.partitionBy(keys).orderBy(t, side)` — one shuffle on the join
keys, linear in |L|+|R|, no per-key loops. This scales to arbitrarily many
rows per key (differential's asof has the same single-ordering cost).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..expressions import BinaryOp, ColumnReference, to_col
from ..table import ID, Table


def _extract_key_pairs(on: list) -> list[tuple[str, str]]:
    pairs = []
    for cond in on:
        if not (isinstance(cond, BinaryOp) and cond._op == "=="
                and isinstance(cond._lhs, ColumnReference)
                and isinstance(cond._rhs, ColumnReference)):
            raise TypeError("asof_join `on` must be pw.left.k == pw.right.k conditions")
        l, r = cond._lhs, cond._rhs
        if l._side == "right":
            l, r = r, l
        pairs.append((l._name, r._name))
    return pairs


def asof_join(lt: Table, rt: Table, t_left, t_right, on: list, *,
              how: str = "inner", direction: str = "backward",
              defaults: dict | None = None) -> Table:
    """Match each left row with the latest right row at-or-before its time
    (direction='backward'; 'forward' = earliest at-or-after).

    Output: left columns + right columns (right side suffixed `_right` on
    collision). `how='inner'` drops unmatched left rows; 'left' keeps them
    (NULL/default right columns).
    """
    pairs = _extract_key_pairs(on)
    lkeys = [p[0] for p in pairs]
    rkeys = [p[1] for p in pairs]

    lcols = lt.column_names
    rcols = rt.column_names
    rename_r = {c: (f"{c}_right" if c in lcols else c) for c in rcols}

    tl = to_col(t_left, lt._ctx())
    tr = to_col(t_right, rt._ctx())

    lhs = lt._df.select(
        F.col(ID).alias("__pw_lid"),
        tl.alias("__pw_t"),
        F.lit(1).alias("__pw_side"),
        *[F.col(f"`{c}`") for c in lcols],
        *[F.lit(None).cast(rt._df.schema[c].dataType).alias(rename_r[c]) for c in rcols],
        *[F.col(f"`{k}`").alias(f"__pw_k{i}") for i, k in enumerate(lkeys)],
        F.lit(None).cast("long").alias("__pw_rid"),
    )
    rhs = rt._df.select(
        F.lit(None).cast("long").alias("__pw_lid"),
        tr.alias("__pw_t"),
        F.lit(0).alias("__pw_side"),
        *[F.lit(None).cast(lt._df.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(f"`{c}`").alias(rename_r[c]) for c in rcols],
        *[F.col(f"`{k}`").alias(f"__pw_k{i}") for i, k in enumerate(rkeys)],
        F.col(ID).alias("__pw_rid"),
    )
    u = lhs.unionByName(rhs)

    keys = [F.col(f"__pw_k{i}") for i in range(len(pairs))]
    if direction == "backward":
        # right rows sort before left rows at equal t → "at or before"
        w = W.partitionBy(*keys).orderBy(F.col("__pw_t").asc(), F.col("__pw_side").asc())
        frame = w.rowsBetween(W.unboundedPreceding, 0)
        pick = lambda c: F.last(c, ignorenulls=True).over(frame)  # noqa: E731
    elif direction == "forward":
        w = W.partitionBy(*keys).orderBy(F.col("__pw_t").desc(), F.col("__pw_side").asc())
        frame = w.rowsBetween(W.unboundedPreceding, 0)
        pick = lambda c: F.last(c, ignorenulls=True).over(frame)  # noqa: E731
    else:
        raise ValueError(f"direction must be backward/forward, got {direction!r}")

    filled = u.select(
        "*",
        *[pick(F.col(f"`{rename_r[c]}`")).alias(f"__pw_f_{rename_r[c]}") for c in rcols],
        pick(F.col("__pw_rid")).alias("__pw_matched"),
    )
    out = filled.filter(F.col("__pw_side") == 1)

    sel: list[Column] = [F.xxhash64(F.col("__pw_lid"), F.col("__pw_matched")).alias(ID)]
    sel += [F.col(f"`{c}`") for c in lcols]
    for c in rcols:
        rc = rename_r[c]
        col = F.col(f"__pw_f_{rc}")
        if defaults and c in defaults:
            col = F.coalesce(col, F.lit(defaults[c]))
        sel.append(col.alias(rc))
    out = out.select(*sel, F.col("__pw_matched"))
    if how == "inner":
        out = out.filter(F.col("__pw_matched").isNotNull())
    result = out.drop("__pw_matched")

    if how in ("right", "outer"):
        # append right rows never used by any match (NULL left columns)
        used = out.select(F.col("__pw_matched").alias("__pw_rid")).distinct()
        unused = rt._df.join(
            used, rt._df[ID] == used["__pw_rid"], "left_anti"
        )
        pad = unused.select(
            F.xxhash64(F.lit(None).cast("long"), F.col(ID)).alias(ID),
            *[F.lit(None).cast(lt._df.schema[c].dataType).alias(c) for c in lcols],
            *[F.col(f"`{c}`").alias(rename_r[c]) for c in rcols],
        )
        if how == "right":  # matched left rows only + unused right rows
            base = out.filter(F.col("__pw_matched").isNotNull()).drop("__pw_matched")
        else:  # outer: unmatched left rows kept too
            base = result
        result = base.unionByName(pad)
    return Table(result)


def asof_now_join(lt: Table, rt: Table, *on, how: str = "inner") -> "Table":
    """_asof_now_join.py:176 — batch semantics collapse to a plain equi
    join against the full right state (every left row sees current state).
    Streaming: stream-static join (see streaming/)."""
    jr = lt.join(rt, *on, how=how)
    lcols = lt.column_names
    rcols = [c for c in rt.column_names if c not in lcols]
    kwargs = {c: ColumnReference("left", c) for c in lcols}
    kwargs.update({c: ColumnReference("right", c) for c in rcols})
    return jr.select(**kwargs)
