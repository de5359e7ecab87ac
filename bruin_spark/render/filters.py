"""Jinja date filters (ref: pkg/jinja/filters.go:15-40).

Semantics mirror the reference exactly:

- Inputs are parsed against the reference's ordered format list
  (ref: pkg/date/helper.go ParseTimeWithFormat) and the result is
  echoed back IN THE SAME SHAPE the input had — separator (space/'T'),
  time precision (minute/second), fractional digits (3 or 6), and
  timezone suffix are all preserved. A zero offset always echoes as
  'Z' (Go's ``Z07:00`` format verb).
- Month/year arithmetic uses Go ``time.AddDate`` normalization: day
  overflow rolls into the following month (Jan 31 + 1 month =
  Mar 2/3), it is NOT clamped to month-end.
- Unparseable dates and non-integer amounts raise, like the
  reference's error values.

Pinned against the reference's own jinja_test.go tables by
tests/test_jinja_reference_cases.py.
"""

from __future__ import annotations

import re
from calendar import monthrange
from datetime import date, datetime, timedelta, timezone

_MONTHS = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

#: ISO-ish shapes (ref: pkg/date/helper.go allowedFormats, the
#: '2006-01-02…' entries): date, optional time at minute/second
#: precision, optional .3/.6 fraction (only with seconds), optional
#: 'Z'/±HH:MM offset.
_ISO = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})"
    r"(?:([ T])(\d{2}):(\d{2})(?::(\d{2})(?:\.(\d{3}|\d{6}))?)?"
    r"(Z|[+-]\d{2}:\d{2})?)?$"
)
#: '02 Jan 2006' shapes — per the reference list the timed variants
#: REQUIRE an offset, the date-only variant has none.
_ENG = re.compile(
    r"^(\d{2}) ([A-Z][a-z]{2}) (\d{4})"
    r"(?: (\d{2}):(\d{2})(?::(\d{2})(?:\.(\d{3}))?)?(Z|[+-]\d{2}:\d{2}))?$"
)


class _Shape:
    __slots__ = ("style", "sep", "has_time", "has_seconds", "frac", "has_tz")

    def __init__(self, style, sep, has_time, has_seconds, frac, has_tz):
        self.style = style  # 'iso' | 'eng'
        self.sep = sep
        self.has_time = has_time
        self.has_seconds = has_seconds
        self.frac = frac  # 0 | 3 | 6
        self.has_tz = has_tz


def _tzinfo(suffix: str | None):
    if not suffix:
        return None
    if suffix == "Z":
        return timezone.utc
    sign = 1 if suffix[0] == "+" else -1
    hh, mm = int(suffix[1:3]), int(suffix[4:6])
    return timezone(sign * timedelta(hours=hh, minutes=mm))


def _parse_with_shape(v) -> tuple[datetime, _Shape]:
    if isinstance(v, datetime):
        frac = 6 if v.microsecond else 0
        return v, _Shape("iso", "T", True, True, frac, v.tzinfo is not None)
    if isinstance(v, date):
        return datetime(v.year, v.month, v.day), _Shape("iso", "T", False, False, 0, False)
    s = str(v)
    m = _ISO.match(s)
    if m:
        y, mo, d, sep, hh, mi, ss, frac, tz = m.groups()
        if sep is None:
            return datetime(int(y), int(mo), int(d)), _Shape("iso", "T", False, False, 0, False)
        us = int(frac.ljust(6, "0")) if frac else 0
        dt = datetime(
            int(y), int(mo), int(d), int(hh), int(mi), int(ss or 0), us,
            tzinfo=_tzinfo(tz),
        )
        return dt, _Shape("iso", sep, True, ss is not None, len(frac or ""), tz is not None)
    m = _ENG.match(s)
    if m:
        d, mon, y, hh, mi, ss, frac, tz = m.groups()
        if mon not in _MONTHS:
            raise ValueError(f"unparseable date: {v!r}")
        us = int(frac.ljust(6, "0")) if frac else 0
        if hh is None:
            return datetime(int(y), _MONTHS.index(mon) + 1, int(d)), _Shape(
                "eng", " ", False, False, 0, False
            )
        dt = datetime(
            int(y), _MONTHS.index(mon) + 1, int(d), int(hh), int(mi), int(ss or 0), us,
            tzinfo=_tzinfo(tz),
        )
        return dt, _Shape("eng", " ", True, ss is not None, len(frac or ""), tz is not None)
    raise ValueError(f"unparseable date: {v!r}")


def _parse(v) -> datetime:
    return _parse_with_shape(v)[0]


def _fmt_shape(dt: datetime, shape: _Shape) -> str:
    if shape.style == "eng":
        out = f"{dt.day:02d} {_MONTHS[dt.month - 1]} {dt.year:04d}"
    else:
        out = f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d}"
    if not shape.has_time:
        return out
    out += f"{shape.sep}{dt.hour:02d}:{dt.minute:02d}"
    if shape.has_seconds:
        out += f":{dt.second:02d}"
        if shape.frac == 3:
            out += f".{dt.microsecond // 1000:03d}"
        elif shape.frac == 6:
            out += f".{dt.microsecond:06d}"
    if shape.has_tz:
        off = dt.utcoffset() or timedelta(0)
        if off == timedelta(0):
            out += "Z"
        else:
            total = int(off.total_seconds())
            sign = "+" if total >= 0 else "-"
            total = abs(total)
            out += f"{sign}{total // 3600:02d}:{(total % 3600) // 60:02d}"
    return out


def _shift(v, delta: timedelta) -> str:
    dt, shape = _parse_with_shape(v)
    return _fmt_shape(dt + delta, shape)


def _add_date(dt: datetime, years: int, months: int) -> datetime:
    """Go ``time.AddDate`` month arithmetic: day overflow normalizes
    into the next month (Jan 31 + 1mo = Mar 2/3), never clamps."""
    y = dt.year + years
    m = dt.month - 1 + months
    y += m // 12
    m = m % 12 + 1
    base = dt.replace(year=y, month=m, day=1)
    return base + timedelta(days=dt.day - 1)


def add_days(v, n) -> str:
    return _shift(v, timedelta(days=int(n)))


def add_hours(v, n) -> str:
    return _shift(v, timedelta(hours=int(n)))


def add_minutes(v, n) -> str:
    return _shift(v, timedelta(minutes=int(n)))


def add_seconds(v, n) -> str:
    return _shift(v, timedelta(seconds=int(n)))


def add_milliseconds(v, n) -> str:
    return _shift(v, timedelta(milliseconds=int(n)))


def add_months(v, n) -> str:
    dt, shape = _parse_with_shape(v)
    return _fmt_shape(_add_date(dt, 0, int(n)), shape)


def add_years(v, n) -> str:
    dt, shape = _parse_with_shape(v)
    return _fmt_shape(_add_date(dt, int(n), 0), shape)


def date_format(v, fmt: str) -> str:
    return _parse(v).strftime(fmt)


def truncate_year(v) -> str:
    dt, shape = _parse_with_shape(v)
    return _fmt_shape(
        dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0), shape
    )


def truncate_month(v) -> str:
    dt, shape = _parse_with_shape(v)
    return _fmt_shape(dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0), shape)


def truncate_day(v) -> str:
    dt, shape = _parse_with_shape(v)
    return _fmt_shape(dt.replace(hour=0, minute=0, second=0, microsecond=0), shape)


def truncate_hour(v) -> str:
    dt, shape = _parse_with_shape(v)
    return _fmt_shape(dt.replace(minute=0, second=0, microsecond=0), shape)


FILTERS = {
    "add_days": add_days,
    "add_hours": add_hours,
    "add_minutes": add_minutes,
    "add_seconds": add_seconds,
    "add_milliseconds": add_milliseconds,
    "add_months": add_months,
    "add_years": add_years,
    # reference alias (filters.go:25): date_add == add_days
    "date_add": add_days,
    "date_format": date_format,
    "truncate_year": truncate_year,
    "truncate_month": truncate_month,
    "truncate_day": truncate_day,
    "truncate_hour": truncate_hour,
}
