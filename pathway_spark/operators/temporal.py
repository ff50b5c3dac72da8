"""Temporal windows + temporal joins (batch semantics).

Reference: `python/pathway/stdlib/temporal/_window.py` (windowby 768,
tumbling 641, sliding 565, session 501, intervals_over 699),
`_interval_join.py`, `_window_join.py`.

Spark mapping (SURVEY §2.5): tumbling/sliding == arithmetic window
assignment (kept JVM-side via sequence+explode so it works for numeric AND
timestamp time columns); session == lag/cumsum sessionization; interval
join == range-condition join (Spark's canonical pattern, AQE-optimized).

Scale notes: window assignment is embarrassingly parallel (no shuffle);
the single shuffle is the groupBy on (window, instance) — partial
aggregation applies. Sliding windows fan out rows by ceil(duration/hop)
— the same cost differential dataflow pays, made explicit.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..expressions import BinaryOp, ColumnReference, _wrap, left as pw_left, right as pw_right, to_col
from ..table import ID, GroupedTable, JoinResult, Table

WSTART = "_pw_window_start"
WEND = "_pw_window_end"
INSTANCE = "_pw_instance"


def _dur_us(d) -> int:
    """Duration -> integer units: timedelta -> microseconds, number -> itself."""
    if isinstance(d, _dt.timedelta):
        return int(d.total_seconds() * 1_000_000)
    return d


@dataclass
class Window:
    kind: str
    duration: Any = None
    hop: Any = None
    origin: Any = None
    max_gap: Any = None


def tumbling(duration, origin=None) -> Window:
    """_window.py:641."""
    return Window("tumbling", duration=duration, hop=duration, origin=origin)


def sliding(hop, duration=None, origin=None, ratio=None) -> Window:
    """_window.py:565."""
    if duration is None and ratio is not None:
        duration = hop * ratio
    return Window("sliding", duration=duration, hop=hop, origin=origin)


def session(max_gap=None, predicate=None) -> Window:
    """_window.py:501. `predicate` sessions merge adjacent rows when
    predicate(prev, cur) — batch impl sorts per instance."""
    w = Window("session", max_gap=max_gap)
    w.predicate = predicate  # type: ignore[attr-defined]
    return w


def intervals_over(*, at, lower_bound, upper_bound) -> Window:
    """_window.py:699."""
    w = Window("intervals_over")
    w.at = at  # type: ignore[attr-defined]
    w.lower = lower_bound  # type: ignore[attr-defined]
    w.upper = upper_bound  # type: ignore[attr-defined]
    return w


class WindowedTable(GroupedTable):
    """Result of windowby: a groupby keyed on window bounds (+instance)."""


def _is_ts(df: DataFrame, col: Column) -> bool:
    return isinstance(df.select(col.alias("_t")).schema[0].dataType,
                      (T.TimestampType, T.TimestampNTZType, T.DateType))


_INT_DTS = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _dbl_bandable(point_dt, interval_dt, lo, up) -> bool:
    """Gate for double-axis banding of a batch θ range join (mirrors
    differential._dband_init): admitted only when Catalyst's coercion
    provably computes the predicate in doubles the same way the band
    expressions do.  An integral interval axis with INTEGER bounds is
    out — the predicate then adds in int64 (exact), while the band
    explode computes in doubles (lossy above 2^53); float32 axes are
    out (the predicate computes in float32)."""
    import math as _m

    def real(v):
        return (isinstance(v, (int, float)) and not isinstance(v, bool)
                and _m.isfinite(v) and abs(v) < 2 ** 53)

    if not (real(lo) and real(up)) or not float(up) > float(lo):
        return False
    ok = (T.DoubleType,) + _INT_DTS
    if not isinstance(point_dt, ok) or not isinstance(interval_dt, ok):
        return False
    int_bounds = (isinstance(lo, int) and isinstance(up, int)
                  and not isinstance(lo, bool) and not isinstance(up, bool))
    if isinstance(interval_dt, _INT_DTS) and int_bounds:
        return False
    return True


def _assign_hopping(df: DataFrame, t: Column, window: Window) -> DataFrame:
    """Add WSTART/WEND for tumbling/sliding — no shuffle, pure projection."""
    is_ts = _is_ts(df, t)
    if is_ts:
        tl = F.unix_micros(t.cast("timestamp"))
        dur, hop = _dur_us(window.duration), _dur_us(window.hop)
        origin = (
            F.unix_micros(F.lit(window.origin).cast("timestamp"))
            if window.origin is not None else F.lit(0)
        )
        back = lambda c: F.timestamp_micros(c)  # noqa: E731
    else:
        tl = t
        dur, hop = window.duration, window.hop
        origin = F.lit(window.origin if window.origin is not None else 0)
        back = lambda c: c  # noqa: E731

    n_windows = math.ceil(dur / hop)
    latest_start = origin + F.floor((tl - origin) / F.lit(hop)) * hop
    if n_windows == 1:
        out = df.withColumn(WSTART, back(latest_start))
        return out.withColumn(WEND, back(latest_start + F.lit(dur)))
    # fan out to every window containing t: starts s = latest - k*hop, s+dur > t
    ks = F.sequence(F.lit(0), F.lit(n_windows - 1))
    starts = F.filter(
        F.transform(ks, lambda k: latest_start - k * hop),
        lambda s: (s + F.lit(dur) > tl),
    )
    out = df.withColumn("__pw_ws", F.explode(starts))
    out = out.withColumn(WSTART, back(F.col("__pw_ws")))
    out = out.withColumn(WEND, back(F.col("__pw_ws") + F.lit(dur)))
    return out.drop("__pw_ws")


class _RowView:
    """Attribute access -> Column factory; lets `session(predicate=...)`
    callables write `prev.v - cur.v` style conditions that compile to
    window-function Columns (reference `_window.py:501` predicate)."""

    def __init__(self, fn):
        object.__setattr__(self, "_fn", fn)

    def __getattr__(self, name):
        return self._fn(name)

    def __getitem__(self, name):
        return self._fn(name)


def _assign_session(df: DataFrame, t: Column, window: Window, inst: Column | None) -> DataFrame:
    """lag/cumsum sessionization (guide: 'Sessionization' pattern).

    `max_gap` sessions break when the time delta exceeds the gap;
    `predicate(prev, cur)` sessions break when the predicate is false for
    adjacent rows (reference merges via iterate connected-components —
    for a sorted order the transitive closure IS the lag/cumsum scan)."""
    from pyspark.sql import Window as W

    is_ts = _is_ts(df, t)
    tl = F.unix_micros(t.cast("timestamp")) if is_ts else t
    part = [inst] if inst is not None else [F.lit(0)]
    w = W.partitionBy(*part).orderBy(tl)
    d = df.withColumn("__pw_t", tl)
    predicate = getattr(window, "predicate", None)
    gap = 0  # predicate sessions end at the last row's time
    if predicate is not None:
        prev = _RowView(lambda n: F.lag(F.col(f"`{n}`")).over(w))
        cur = _RowView(lambda n: F.col(f"`{n}`"))
        keep = predicate(prev, cur)
        if hasattr(keep, "_to_col"):  # expression-tree predicate
            from ..expressions import to_col as _tc
            from ..expressions import RowContext as _RC
            keep = _tc(keep, _RC({"this": d}))
        breaks = ~F.coalesce(keep, F.lit(False))
    else:
        gap = _dur_us(window.max_gap) if is_ts else window.max_gap
        breaks = F.col("__pw_t") - F.lag("__pw_t").over(w) > F.lit(gap)
    d = d.withColumn(
        "__pw_new",
        F.when(F.lag("__pw_t").over(w).isNull(), 1).otherwise(
            F.when(breaks, 1).otherwise(0)
        ),
    )
    d = d.withColumn("__pw_sess", F.sum("__pw_new").over(
        w.rowsBetween(W.unboundedPreceding, 0)))
    back = (lambda c: F.timestamp_micros(c)) if is_ts else (lambda c: c)
    # bounds are NOT materialized per row here: a third window pass
    # (min/max over the full session frame) plus its re-sort would run
    # over every row only to be deduplicated by the reduce — windowby
    # defers them into the reduce aggregation instead (r11, guide §2.4:
    # same-keyed window + aggregation need one pass, not two).
    return d.drop("__pw_new"), gap, back


def windowby(table: Table, time_expr, *, window: Window, instance=None,
             behavior=None) -> WindowedTable:
    """_window.py:768 → groupby on (window bounds, instance).

    `behavior` is accepted for API parity; in batch it is a no-op (all data
    is on time); streaming maps it to watermarks (streaming/behaviors.py).
    """
    df = table._df
    ctx = table._ctx()
    t = to_col(time_expr, ctx)
    inst = to_col(instance, ctx) if instance is not None else None

    if behavior is not None and df.isStreaming:
        # cutoff ≡ withWatermark (SURVEY §2.5): bounded state + late-data
        # drop; requires a real timestamp event-time column
        from ..streaming import _fmt_interval

        cutoff = getattr(behavior, "cutoff", None) or getattr(behavior, "shift", None)
        if cutoff is not None:
            df = df.withColumn("__pw_evt", t.cast("timestamp")).withWatermark(
                "__pw_evt", _fmt_interval(cutoff)
            )
            t = F.col("__pw_evt")

    if df.isStreaming and window.kind in ("tumbling", "sliding", "session") \
            and _is_ts(df, t):
        # streaming + event-time: use Spark's native window functions so
        # the watermark's event-time metadata survives into the groupBy
        # (append mode / state eviction need it); the window STRUCT is
        # the grouping key and _pw_window_start/_end resolve to its
        # fields post-aggregation.
        def dur_str(d):
            return f"{_dur_us(d)} microseconds"

        if window.kind == "session":
            wcol = F.session_window(t, dur_str(window.max_gap))
        elif window.kind == "tumbling":
            wcol = F.window(t, dur_str(window.duration))
        else:
            wcol = F.window(t, dur_str(window.duration), dur_str(window.hop))
        aug = df.withColumn("_pw_window", wcol)
        if inst is not None:
            aug = aug.withColumn(INSTANCE, inst)
        wt = WindowedTable(
            Table(aug.withColumn(ID, F.lit(0))),
            [ColumnReference("this", "_pw_window")]
            + ([ColumnReference("this", INSTANCE)] if inst is not None else []),
        )
        wt._key_aliases = {
            WSTART: F.col("_pw_window.start"),
            WEND: F.col("_pw_window.end"),
        }
        wt._id_expr = F.xxhash64(
            F.col("_pw_window").cast("string"),
            *( [F.col(INSTANCE)] if inst is not None else [] ),
        )
        return wt

    if window.kind in ("tumbling", "sliding"):
        aug = _assign_hopping(df, t, window)
    elif window.kind == "session":
        # Deferred-bounds session windows: group on the session counter
        # (+instance) and compute _pw_window_start/_end as hidden
        # min/max aggregates INSIDE the reduce — the per-row bounds
        # window (a third window pass + a re-sort by session) only
        # existed to be deduplicated by the groupby.  Bounds keyed by
        # (instance, session) are identical either way: sessions of one
        # instance are disjoint in time.
        d, gap, back = _assign_session(df, t, window, inst)
        if inst is not None:
            d = d.withColumn(INSTANCE, inst)
        wt = WindowedTable(
            Table(d.withColumn(ID, F.lit(0))),
            [ColumnReference("this", "__pw_sess")]
            + ([ColumnReference("this", INSTANCE)] if inst is not None else []),
        )
        wt._extra_aggs = {
            "__pw_ws": back(F.min(F.col("__pw_t"))),
            "__pw_we": back(F.max(F.col("__pw_t")) + F.lit(gap)),
        }
        wt._key_aliases = {WSTART: F.col("__pw_ws"), WEND: F.col("__pw_we")}
        wt._id_expr = F.xxhash64(
            F.col("__pw_ws"), F.col("__pw_we"),
            *( [F.col(INSTANCE)] if inst is not None else [] ),
        )
        return wt
    elif window.kind == "intervals_over":
        at = window.at  # a column reference on another table, or a Table
        at_tbl: Table = at if isinstance(at, Table) else None
        if at_tbl is None:
            raise TypeError("intervals_over: pass at=Table with a single time column")
        lo, up = window.lower, window.upper
        pts = at_tbl._df.select(F.col(at_tbl.column_names[0]).alias("__pw_at")).distinct()
        lo_v = _dur_us(lo) if _is_ts(df, t) else lo
        up_v = _dur_us(up) if _is_ts(df, t) else up
        cond = (t >= F.col("__pw_at") + F.lit(lo_v)) & (
            t <= F.col("__pw_at") + F.lit(up_v))
        INTS = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        t_dt = df.select(t.alias("_t")).schema[0].dataType
        at_dt = pts.schema[0].dataType
        if (isinstance(t_dt, INTS) and isinstance(at_dt, INTS)
                and type(lo_v) is int and type(up_v) is int
                and up_v >= lo_v):
            # Banded θ join (mirrors differential._ThetaJoinNode and the
            # reference's time-bucketed arrangements): points carry band
            # ⌊t/W⌋, each at-point explodes to the ≤2 bands its interval
            # [at+lo, at+up] can touch, and the join hash-partitions on
            # the band with the ORIGINAL predicate re-checked — bands
            # only generate candidates.  The un-banded form is a
            # BroadcastNestedLoopJoin: every point row is tested against
            # every at-point, O(rows × at-points) comparisons.
            from ..streaming.differential import (_BAND, _band_assign,
                                                  _band_explode)
            width = max(up_v - lo_v, 1)
            dfb = _band_assign(df, t, width)
            ptsb = _band_explode(pts, F.col("__pw_at"), lo_v, up_v, width)
            j = dfb.join(ptsb, on=[_BAND], how="inner").where(cond).drop(
                _BAND)
        elif _dbl_bandable(t_dt, at_dt, lo_v, up_v):
            # Double-axis banding (mirrors differential._dband_*): the
            # interval side explodes with the PREDICATE'S OWN double
            # arithmetic, the point side assigns ⌊t/W⌋ — IEEE division
            # monotonicity makes coverage exact with no slack, and the
            # original predicate still re-checks every candidate.
            from ..streaming.differential import (_BAND, _dband_assign_dbl,
                                                  _dband_explode_dbl)
            width = float(up_v) - float(lo_v)
            dfb = _dband_assign_dbl(df, t, width)
            ptsb = _dband_explode_dbl(pts, F.col("__pw_at"), float(lo_v),
                                      float(up_v), width)
            j = dfb.join(ptsb, on=[_BAND], how="inner").where(cond).drop(
                _BAND)
        else:
            j = df.join(pts, cond, "inner")
        aug = j.withColumn(WSTART, F.col("__pw_at")).withColumn(WEND, F.col("__pw_at")).drop("__pw_at")
    else:
        raise ValueError(window.kind)

    if inst is not None:
        aug = aug.withColumn(INSTANCE, inst)
    wt = Table(aug.withColumn(ID, F.xxhash64(*( [F.col(WSTART), F.col(WEND)]
               + ([F.col(INSTANCE)] if inst is not None else [])))))
    keys = [ColumnReference("this", WSTART), ColumnReference("this", WEND)]
    if inst is not None:
        keys.append(ColumnReference("this", INSTANCE))
    return WindowedTable(wt, keys)


def interval_join(lt: Table, rt: Table, t_left, t_right, interval, on: list,
                  how: str = "inner") -> JoinResult:
    """_interval_join.py:577 — self.t in [other.t+lb, other.t+ub].

    Compiled to a range-condition join — Spark's canonical interval join;
    with equi `on` keys the range is a post-join filter on the hash join,
    otherwise AQE picks a broadcast-range strategy for the small side.
    """
    lb, ub = interval if isinstance(interval, (tuple, list)) else (interval.lower_bound, interval.upper_bound)
    tl = _wrap(t_left)
    tr = _wrap(t_right)
    is_delta = isinstance(lb, _dt.timedelta)
    if is_delta:
        from ..expressions import SparkFunc
        lbound = SparkFunc("ivl", lambda a, b: a >= b + F.expr(f"INTERVAL {_dur_us(lb)} MICROSECOND"), tl, tr)
        ubound = SparkFunc("ivr", lambda a, b: a <= b + F.expr(f"INTERVAL {_dur_us(ub)} MICROSECOND"), tl, tr)
        conds = list(on) + [lbound, ubound]
    else:
        conds = list(on) + [tl >= tr + lb, tl <= tr + ub]
    if (not on and how == "inner" and not is_delta
            and isinstance(lb, (int, float)) and isinstance(ub, (int, float))
            and not isinstance(lb, bool) and not isinstance(ub, bool)
            and isinstance(t_left, ColumnReference)
            and isinstance(t_right, ColumnReference)
            and t_left._name in lt.column_names
            and t_right._name in rt.column_names):
        # Key-less integral-axis interval join: without equi keys the
        # raw range condition plans as a nested-loop/cartesian of left
        # against right.  Band exactly like the batch intervals_over and
        # differential._ThetaJoinNode — the point (left) side carries
        # ⌊t/W⌋, the interval (right) side explodes to the ≤2 bands
        # [t+lb, t+ub] can touch, the join hashes on the band, and the
        # original predicate re-checks every candidate, so results are
        # identical.  Each pair matches in exactly one band (the left
        # row's), so inner-join multiplicity is unchanged; outer joins
        # stay un-banded (an exploded unmatched right row would null-
        # extend once per band).
        l_dt = {f.name: f.dataType for f in lt._df.schema.fields}
        r_dt = {f.name: f.dataType for f in rt._df.schema.fields}
        pt_dt, iv_dt = l_dt[t_left._name], r_dt[t_right._name]
        if (isinstance(pt_dt, _INT_DTS) and isinstance(iv_dt, _INT_DTS)
                and type(lb) is int and type(ub) is int and ub >= lb):
            from ..streaming.differential import (_BAND, _band_assign,
                                                  _band_explode)
            width = max(ub - lb, 1)
            lt = Table(_band_assign(lt._df, F.col(t_left._name), width))
            rt = Table(_band_explode(rt._df, F.col(t_right._name), lb, ub,
                                     width))
            conds = [BinaryOp("==", ColumnReference("left", _BAND),
                              ColumnReference("right", _BAND))] + conds
        elif _dbl_bandable(pt_dt, iv_dt, lb, ub):
            from ..streaming.differential import (_BAND, _dband_assign_dbl,
                                                  _dband_explode_dbl)
            width = float(ub) - float(lb)
            lt = Table(_dband_assign_dbl(lt._df, F.col(t_left._name), width))
            rt = Table(_dband_explode_dbl(rt._df, F.col(t_right._name),
                                          float(lb), float(ub), width))
            conds = [BinaryOp("==", ColumnReference("left", _BAND),
                              ColumnReference("right", _BAND))] + conds
    return JoinResult(lt, rt, conds, how)


class _Interval:
    def __init__(self, lower_bound, upper_bound):
        self.lower_bound = lower_bound
        self.upper_bound = upper_bound


def interval(lower_bound, upper_bound) -> _Interval:
    """pw.temporal.interval sugar."""
    return _Interval(lower_bound, upper_bound)


def window_join(lt: Table, rt: Table, t_left, t_right, window: Window, on: list,
                how: str = "inner") -> JoinResult:
    """_window_join.py:156 — assign both sides to windows, join within
    same window (+ same keys). Equi-join on window bounds → shuffle-hash/
    broadcast chosen by Catalyst."""
    lctx = lt._ctx()
    rctx = rt._ctx()
    laug = Table(_assign_hopping(lt._df, to_col(t_left, lctx), window))
    raug = Table(_assign_hopping(rt._df, to_col(t_right, rctx), window))
    conds = [BinaryOp("==", ColumnReference("left", WSTART), ColumnReference("right", WSTART))] + list(on)
    return JoinResult(laug, raug, conds, how)


# ----------------------------------------------------------------- parity
# Names exported by the reference `stdlib/temporal/__init__.py` that are
# free-function forms of Table methods, enums, or behavior re-exports.

import enum as _enum


class Direction(_enum.Enum):
    """_asof_join.py:34."""
    BACKWARD = "backward"
    FORWARD = "forward"
    NEAREST = "nearest"


Interval = _Interval
Window = Window  # noqa: PLW0127  (re-export under the reference name)
AsofJoinResult = JoinResult
AsofNowJoinResult = JoinResult
IntervalJoinResult = JoinResult
WindowJoinResult = JoinResult


def _how_name(how) -> str:
    return how.name.lower() if hasattr(how, "name") else str(how)


def _dir_name(direction) -> str:
    return (direction.value if isinstance(direction, Direction)
            else str(direction))


def asof_join(self, other, self_time, other_time, *on, how="inner",
              behavior=None, defaults=None, direction=Direction.BACKWARD,
              left_instance=None, right_instance=None):
    """_asof_join.py:481 — free-function form of Table.asof_join."""
    del behavior  # batch plans need no forgetting policy
    onl = list(on)
    if left_instance is not None and right_instance is not None:
        onl.append(left_instance == right_instance)
    return self.asof_join(other, self_time, other_time, *onl,
                          how=_how_name(how), direction=_dir_name(direction),
                          defaults=defaults)


def asof_join_left(self, other, self_time, other_time, *on, **kw):
    return asof_join(self, other, self_time, other_time, *on, how="left", **kw)


def asof_join_right(self, other, self_time, other_time, *on, **kw):
    return asof_join(self, other, self_time, other_time, *on, how="right", **kw)


def asof_join_outer(self, other, self_time, other_time, *on, **kw):
    return asof_join(self, other, self_time, other_time, *on, how="outer", **kw)


def asof_now_join(self, other, *on, how="inner", **kw):
    """_asof_now_join.py — free-function form of Table.asof_now_join."""
    return self.asof_now_join(other, *on, how=_how_name(how), **kw)


def asof_now_join_inner(self, other, *on, **kw):
    return asof_now_join(self, other, *on, how="inner", **kw)


def asof_now_join_left(self, other, *on, **kw):
    return asof_now_join(self, other, *on, how="left", **kw)


def interval_join_inner(lt, rt, t_left, t_right, interval, on=(), **kw):
    return interval_join(lt, rt, t_left, t_right, interval, list(on),
                         how="inner", **kw)


def interval_join_left(lt, rt, t_left, t_right, interval, on=(), **kw):
    return interval_join(lt, rt, t_left, t_right, interval, list(on),
                         how="left", **kw)


def interval_join_right(lt, rt, t_left, t_right, interval, on=(), **kw):
    return interval_join(lt, rt, t_left, t_right, interval, list(on),
                         how="right", **kw)


def interval_join_outer(lt, rt, t_left, t_right, interval, on=(), **kw):
    return interval_join(lt, rt, t_left, t_right, interval, list(on),
                         how="outer", **kw)


def window_join_inner(lt, rt, t_left, t_right, window, on=(), **kw):
    return window_join(lt, rt, t_left, t_right, window, list(on),
                       how="inner", **kw)


def window_join_left(lt, rt, t_left, t_right, window, on=(), **kw):
    return window_join(lt, rt, t_left, t_right, window, list(on),
                       how="left", **kw)


def window_join_right(lt, rt, t_left, t_right, window, on=(), **kw):
    return window_join(lt, rt, t_left, t_right, window, list(on),
                       how="right", **kw)


def window_join_outer(lt, rt, t_left, t_right, window, on=(), **kw):
    return window_join(lt, rt, t_left, t_right, window, list(on),
                       how="outer", **kw)


def _load_behaviors():
    # lazy: streaming imports ..table only, but keep module import light
    from ..streaming import (CommonBehavior, ExactlyOnceBehavior,
                             common_behavior, exactly_once_behavior)
    return CommonBehavior, ExactlyOnceBehavior, common_behavior, exactly_once_behavior


(CommonBehavior, ExactlyOnceBehavior,
 common_behavior, exactly_once_behavior) = _load_behaviors()

from .time_utils import (  # noqa: E402
    add_update_timestamp_utc,
    inactivity_detection,
    utc_now,
)
