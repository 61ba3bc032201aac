"""``TIME(p)`` support (SURVEY §7.3): Flink has a time-of-day type
(``decodable/client/types.py:498-512``); Spark has none. Our convention —
chosen by the type converter (``ftypes.py``) — encodes TIME as
**nanos-of-day** in a ``LongType`` column, with these helpers for parsing,
formatting, and arithmetic. All pure JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

NANOS_PER_SECOND = 1_000_000_000
NANOS_PER_DAY = 86_400 * NANOS_PER_SECOND


def time_from_string(col: Column | str) -> Column:
    """'HH:mm:ss[.SSS...]' → nanos-of-day (invalid strings → NULL)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, ":")
    ok = c.rlike(r"^\d{1,2}:\d{2}:\d{2}(\.\d{1,9})?$")
    secs_str = parts[2]
    whole = F.split(secs_str, r"\.")[0].cast("long")
    frac = F.when(
        secs_str.contains("."),
        F.rpad(F.split(secs_str, r"\.")[1], 9, "0").cast("long"),
    ).otherwise(0)
    nanos = (
        parts[0].cast("long") * 3600 + parts[1].cast("long") * 60 + whole
    ) * NANOS_PER_SECOND + frac
    return F.when(ok, nanos)


def time_to_string(col: Column | str, precision: int = 3) -> Column:
    """nanos-of-day → 'HH:mm:ss[.fff]' with the given fractional precision."""
    c = F.col(col) if isinstance(col, str) else col
    secs = (c / NANOS_PER_SECOND).cast("long")
    hh = F.lpad((secs / 3600).cast("long").cast("string"), 2, "0")
    mm = F.lpad(((secs % 3600) / 60).cast("long").cast("string"), 2, "0")
    ss = F.lpad((secs % 60).cast("string"), 2, "0")
    base = F.concat_ws(":", hh, mm, ss)
    if precision <= 0:
        return base
    frac_digits = F.lpad((c % NANOS_PER_SECOND).cast("string"), 9, "0").substr(
        1, precision
    )
    return F.concat(base, F.lit("."), frac_digits)


def time_from_timestamp(col: Column | str) -> Column:
    """timestamp → its time-of-day as nanos (µs source precision)."""
    c = F.col(col) if isinstance(col, str) else col
    micros_of_day = F.unix_micros(c) - F.unix_micros(F.date_trunc("day", c))
    return micros_of_day * 1000


def time_add(col: Column | str, nanos: int) -> Column:
    """Add a duration, wrapping at midnight (TIME semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return ((c + nanos) % NANOS_PER_DAY + NANOS_PER_DAY) % NANOS_PER_DAY
