"""`expr.dt.*` — reference `python/pathway/internals/expressions/date_time.py`.

Precision note (SURVEY §2.8): the reference carries nanosecond datetimes;
Spark timestamps are microsecond. Sub-microsecond accessors return 0-padded
values. Durations are carried as LongType nanoseconds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..expressions import ColumnExpression, SparkFunc, _wrap

NS_PER_US = 1_000
NS_PER_MS = 1_000_000
NS_PER_S = 1_000_000_000



def _exact_div(c: Column, k: int) -> Column:
    """Exact TRUNCATING div of 64-bit integer columns by a positive
    literal — chrono's num_seconds()/num_minutes()/... truncate toward
    zero (reference src/engine/time.rs:400-418), and ns values exceed
    double's 53-bit mantissa so no fp division: Spark's % truncates
    (sign of dividend), making (c - c%k)/k exact truncation."""
    kk = F.lit(k)
    return ((c - c % kk).cast("decimal(38,0)") / kk).cast("long")


def _exact_floor_div(c: Column, k: int) -> Column:
    """Exact FLOOR-div — datetime construction splits ns as
    (floor(secs), non-negative nanos) (reference time.rs:23-27), unlike
    duration accessors which truncate."""
    kk = F.lit(k)
    return ((c - F.pmod(c, kk)).cast("decimal(38,0)") / kk).cast("long")


class DateTimeNamespace:
    def __init__(self, expr: ColumnExpression):
        self._e = expr

    def _f(self, name, fn, *args):
        return SparkFunc(f"dt.{name}", fn, self._e, *args)

    # --- components (date_time.py:41-349) ---
    def nanosecond(self):
        return self._f("nanosecond", lambda c: (F.unix_micros(c) % 1_000_000 * 1000).cast("long"))

    def microsecond(self):
        return self._f("microsecond", lambda c: (F.unix_micros(c) % 1_000_000).cast("long"))

    def millisecond(self):
        return self._f("millisecond", lambda c: (F.unix_micros(c) % 1_000_000 / 1000).cast("long"))

    def second(self):
        return self._f("second", lambda c: F.second(c).cast("long"))

    def minute(self):
        return self._f("minute", lambda c: F.minute(c).cast("long"))

    def hour(self):
        return self._f("hour", lambda c: F.hour(c).cast("long"))

    def day(self):
        return self._f("day", lambda c: F.dayofmonth(c).cast("long"))

    def month(self):
        return self._f("month", lambda c: F.month(c).cast("long"))

    def year(self):
        return self._f("year", lambda c: F.year(c).cast("long"))

    def week(self):
        return self._f("week", lambda c: F.weekofyear(c).cast("long"))

    def weekday(self):  # date_time.py:1605 — Monday=0
        return self._f("weekday", lambda c: ((F.dayofweek(c) + 5) % 7).cast("long"))

    def timestamp(self, unit: str = "ns"):  # date_time.py:384
        div = {"ns": 1, "us": NS_PER_US, "ms": NS_PER_MS, "s": NS_PER_S}[unit]
        return self._f(
            f"timestamp_{unit}",
            lambda c: (F.unix_micros(c) * 1000 / div).cast("double" if unit != "ns" else "long"),
        )

    # --- formatting / parsing (497/555) ---
    def strftime(self, fmt):
        spark_fmt = _strftime_to_spark(fmt) if isinstance(fmt, str) else fmt
        return self._f("strftime", lambda c: F.date_format(c, spark_fmt))

    def strptime(self, fmt, contains_timezone: bool = False):
        spark_fmt = _strftime_to_spark(fmt) if isinstance(fmt, str) else fmt
        return self._f("strptime", lambda c: F.to_timestamp(c, spark_fmt))

    # --- timezone (660/750) ---
    def to_utc(self, from_timezone: str):
        return self._f("to_utc", lambda c, tz: F.to_utc_timestamp(c, tz), _wrap(from_timezone))

    def to_naive_in_timezone(self, timezone: str):
        return self._f(
            "to_naive", lambda c, tz: F.from_utc_timestamp(c, tz), _wrap(timezone)
        )

    def add_duration_in_timezone(self, duration_ns, timezone: str):
        """date_time.py:840 — wall-clock add across DST; duration in ns."""
        def fn(c: Column, d: Column, tz: Column) -> Column:
            local = F.from_utc_timestamp(c, tz)
            moved = F.timestamp_micros(F.unix_micros(local) + (d.cast("decimal(38,0)") / 1000).cast("long"))
            return F.to_utc_timestamp(moved, tz)

        return self._f("add_dur_tz", fn, _wrap(duration_ns), _wrap(timezone))

    def subtract_duration_in_timezone(self, duration_ns, timezone: str):
        return self.add_duration_in_timezone(-_wrap(duration_ns), timezone)

    def subtract_date_time_in_timezone(self, date_time, timezone):
        """date_time.py:928 — difference of two naive datetimes measured
        in the given zone (DST transitions count): convert both to UTC
        in that zone, subtract; Duration as ns long."""
        def fn(c: Column, other: Column, tz: Column) -> Column:
            a = F.to_utc_timestamp(c, tz)
            b = F.to_utc_timestamp(other, tz)
            return (F.unix_micros(a) - F.unix_micros(b)) * F.lit(1000)

        return self._f("sub_dt_tz", fn, _wrap(date_time), _wrap(timezone))

    def to_duration(self, unit="ns"):
        """date_time.py:1119 — integer → Duration (ns long) by unit."""
        _NS = {
            "W": 7 * 86400 * 10**9,
            "D": 86400 * 10**9, "day": 86400 * 10**9, "days": 86400 * 10**9,
            "h": 3600 * 10**9, "hr": 3600 * 10**9, "hour": 3600 * 10**9,
            "hours": 3600 * 10**9,
            "m": 60 * 10**9, "min": 60 * 10**9, "minute": 60 * 10**9,
            "minutes": 60 * 10**9,
            "s": 10**9, "sec": 10**9, "second": 10**9, "seconds": 10**9,
            "ms": 10**6, "millisecond": 10**6, "milliseconds": 10**6,
            "millis": 10**6, "milli": 10**6,
            "us": 10**3, "microsecond": 10**3, "microseconds": 10**3,
            "ns": 1, "nano": 1, "nanos": 1, "nanosecond": 1,
            "nanoseconds": 1,
        }
        # try_multiply: an out-of-range Duration poisons to NULL, per the
        # engine error model (Value::Error -> NULL cell)
        if isinstance(unit, str):
            return self._f(
                "to_duration",
                lambda c: F.try_multiply(c.cast("long"), F.lit(_NS[unit])))

        def fn(c: Column, u: Column) -> Column:
            expr = F.lit(None).cast("long")
            for k, v in _NS.items():
                expr = F.when(u == k,
                              F.try_multiply(c.cast("long"), F.lit(v))
                              ).otherwise(expr)
            return expr

        return self._f("to_duration", fn, _wrap(unit))

    # --- rounding (975/1047) ---
    def round(self, granularity: str):
        return self._f("round", lambda c: _round_ts(c, granularity, up_half=True))

    def floor(self, granularity: str):
        return self._f("floor", lambda c: F.date_trunc(_TRUNC.get(granularity, granularity), c))

    # --- duration accessors (1157-1461); durations are ns longs ---
    def nanoseconds(self):
        return self._f("nanoseconds", lambda c: c.cast("long"))

    def microseconds(self):
        return self._f("microseconds", lambda c: _exact_div(c, NS_PER_US))

    def milliseconds(self):
        return self._f("milliseconds", lambda c: _exact_div(c, NS_PER_MS))

    def seconds(self):
        return self._f("seconds", lambda c: _exact_div(c, NS_PER_S))

    def minutes(self):
        return self._f("minutes", lambda c: _exact_div(c, 60 * NS_PER_S))

    def hours(self):
        return self._f("hours", lambda c: _exact_div(c, 3600 * NS_PER_S))

    def days(self):
        return self._f("days", lambda c: _exact_div(c, 86400 * NS_PER_S))

    def weeks(self):
        return self._f("weeks", lambda c: _exact_div(c, 7 * 86400 * NS_PER_S))

    # --- constructors (1504/1563) ---
    def from_timestamp(self, unit: str):
        mult = {"s": 1_000_000, "ms": 1000, "us": 1, "ns": 1}[unit]
        if unit == "ns":
            return self._f("from_ts", lambda c: F.timestamp_micros(_exact_floor_div(c, 1000)))
        return self._f("from_ts", lambda c: F.timestamp_micros((c * mult).cast("long")))

    def utc_from_timestamp(self, unit: str):
        return self.from_timestamp(unit)


_TRUNC = {
    "D": "day", "h": "hour", "min": "minute", "s": "second",
    "ms": "millisecond", "us": "microsecond",
    "M": "month", "Y": "year", "W": "week",
}

_GRAN_NS = {
    "D": 86400 * NS_PER_S, "h": 3600 * NS_PER_S, "min": 60 * NS_PER_S,
    "s": NS_PER_S, "ms": NS_PER_MS, "us": NS_PER_US,
}


def _round_ts(c: Column, granularity: str, up_half: bool) -> Column:
    ns = _GRAN_NS.get(granularity)
    if ns is None:
        return F.date_trunc(_TRUNC.get(granularity, granularity), c)
    us = ns // 1000
    micros = F.unix_micros(c.cast("timestamp"))  # ntz-safe (UTC session)
    shifted = micros + us // 2
    rounded = ((shifted - F.pmod(shifted, F.lit(us))).cast("decimal(38,0)") / F.lit(us)).cast("long") * us
    return F.timestamp_micros(rounded)


def _strftime_to_spark(fmt: str) -> str:
    """Translate python strftime codes to Spark's java format codes."""
    rep = {
        "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
        "%S": "ss", "%f": "SSSSSS", "%j": "DDD", "%B": "MMMM", "%b": "MMM",
        "%A": "EEEE", "%a": "EEE", "%z": "XX", "%%": "%",
    }
    out = fmt
    for k, v in rep.items():
        out = out.replace(k, v)
    return out
