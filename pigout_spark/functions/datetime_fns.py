"""Pig date/time builtins (Joda-backed, SURVEY.md §2.7 "Date/time").

Pig's datetime is millisecond-precision with timezone; Spark's
TimestampType is microsecond UTC — strictly finer, so every reference
function maps losslessly.  Durations: Pig takes ISO-8601 strings
(AddDuration/SubtractDuration); we accept the common subset (P<n>D,
PT<n>H/M/S, P<n>M, P<n>Y) and translate to INTERVAL arithmetic.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def CURRENT_TIME() -> Column:
    return F.current_timestamp()


def TO_DATE(c: Column | str, fmt: str | None = None) -> Column:
    return F.to_timestamp(_col(c), fmt) if fmt else F.to_timestamp(_col(c))


def TO_STRING(c: Column | str, fmt: str) -> Column:
    return F.date_format(_col(c), fmt)


def TO_UNIX_TIME(c: Column | str) -> Column:
    return F.unix_timestamp(_col(c))


def TO_MILLISECONDS(c: Column | str) -> Column:
    return F.unix_millis(_col(c))


def GET_YEAR(c):
    return F.year(_col(c))


def GET_MONTH(c):
    return F.month(_col(c))


def GET_DAY(c):
    return F.dayofmonth(_col(c))


def GET_HOUR(c):
    return F.hour(_col(c))


def GET_MINUTE(c):
    return F.minute(_col(c))


def GET_SECOND(c):
    return F.second(_col(c))


def GET_WEEK(c):
    return F.weekofyear(_col(c))


_ISO = re.compile(
    r"^P(?:(?P<years>\d+)Y)?(?:(?P<months>\d+)M)?(?:(?P<days>\d+)D)?"
    r"(?:T(?:(?P<hours>\d+)H)?(?:(?P<minutes>\d+)M)?(?:(?P<seconds>\d+)S)?)?$"
)


def _duration_parts(duration: str) -> list[str]:
    """ISO-8601 duration → ordered INTERVAL literals (years first, the
    Joda Period field order Pig applies)."""
    m = _ISO.match(duration)
    if not m or not any(m.groupdict().values()):
        raise ValueError(f"unsupported ISO-8601 duration: {duration!r}")
    parts = {k: int(v) for k, v in m.groupdict().items() if v}
    return [f"INTERVAL {n} {unit.rstrip('s').upper()}" for unit, n in parts.items()]


def ADD_DURATION(c: Column | str, duration: str) -> Column:
    """Pig AddDuration(dt, 'P1D') → dt + INTERVAL [+ INTERVAL ...]."""
    out = _col(c)
    for part in _duration_parts(duration):
        out = out + F.expr(part)
    return out


def SUBTRACT_DURATION(c: Column | str, duration: str) -> Column:
    """Pig SubtractDuration: each unit is SUBTRACTED (a single joined
    'a + b' interval string would subtract only the first unit and add
    the rest — that was a real bug for multi-unit durations like P1Y2M)."""
    out = _col(c)
    for part in _duration_parts(duration):
        out = out - F.expr(part)
    return out


def MILLISECONDS_BETWEEN(a, b) -> Column:
    return F.unix_millis(_col(a)) - F.unix_millis(_col(b))


def SECONDS_BETWEEN(a, b) -> Column:
    return F.unix_timestamp(_col(a)) - F.unix_timestamp(_col(b))


def MINUTES_BETWEEN(a, b) -> Column:
    return (SECONDS_BETWEEN(a, b) / 60).cast("long")


def HOURS_BETWEEN(a, b) -> Column:
    return (SECONDS_BETWEEN(a, b) / 3600).cast("long")


def DAYS_BETWEEN(a, b) -> Column:
    return (SECONDS_BETWEEN(a, b) / 86400).cast("long")


def MONTHS_BETWEEN(a, b) -> Column:
    """Pig MonthsBetween truncates to whole months (Joda Months.monthsBetween)."""
    return F.floor(F.months_between(_col(a), _col(b)))


def YEARS_BETWEEN(a, b) -> Column:
    return F.floor(F.months_between(_col(a), _col(b)) / 12)
