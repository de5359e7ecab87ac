"""Jinja date filters (ref: pkg/jinja/filters.go:15-40).

Filters accept either a datetime/date or an ISO string and return a
string in the same shape bruin templates expect.
"""

from __future__ import annotations

import re
from datetime import date, datetime, timedelta


def _parse(v):
    if isinstance(v, (datetime, date)):
        return v if isinstance(v, datetime) else datetime(v.year, v.month, v.day)
    s = str(v)
    for fmt in (
        "%Y-%m-%dT%H:%M:%S.%f%z",
        "%Y-%m-%dT%H:%M:%S.%f",
        "%Y-%m-%dT%H:%M:%S",
        "%Y-%m-%d %H:%M:%S",
        "%Y-%m-%d",
        "%Y%m%d",
    ):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ValueError(f"unparseable date: {v!r}")


def _fmt_like(v, dt: datetime) -> str:
    """Echo back in the same textual shape the input had — including any
    timezone suffix: dropping a trailing 'Z'/offset would make the
    filtered literal parse in session-local time, shifting incremental
    window boundaries by the UTC offset."""
    s = str(v)
    if len(s) == 10 and s[4] == "-":
        return dt.strftime("%Y-%m-%d")
    if len(s) == 8 and s.isdigit():
        return dt.strftime("%Y%m%d")
    suffix = ""
    m = re.search(r"(Z|[+-]\d{2}:\d{2})$", s)
    if m:
        suffix = m.group(1)
    if "." in s:
        return dt.strftime("%Y-%m-%dT%H:%M:%S.%f") + suffix
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + suffix


def add_days(v, n: int) -> str:
    return _fmt_like(v, _parse(v) + timedelta(days=int(n)))


def add_hours(v, n: int) -> str:
    return _fmt_like(v, _parse(v) + timedelta(hours=int(n)))


def add_minutes(v, n: int) -> str:
    return _fmt_like(v, _parse(v) + timedelta(minutes=int(n)))


def add_seconds(v, n: int) -> str:
    return _fmt_like(v, _parse(v) + timedelta(seconds=int(n)))


def add_milliseconds(v, n: int) -> str:
    return _fmt_like(v, _parse(v) + timedelta(milliseconds=int(n)))


def add_months(v, n: int) -> str:
    dt = _parse(v)
    month = dt.month - 1 + int(n)
    year = dt.year + month // 12
    month = month % 12 + 1
    from calendar import monthrange

    day = min(dt.day, monthrange(year, month)[1])
    return _fmt_like(v, dt.replace(year=year, month=month, day=day))


def add_years(v, n: int) -> str:
    dt = _parse(v)
    try:
        out = dt.replace(year=dt.year + int(n))
    except ValueError:  # Feb 29
        out = dt.replace(year=dt.year + int(n), day=28)
    return _fmt_like(v, out)


def date_format(v, fmt: str) -> str:
    return _parse(v).strftime(fmt)


def truncate_year(v) -> str:
    return _fmt_like(v, _parse(v).replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0))


def truncate_month(v) -> str:
    return _fmt_like(v, _parse(v).replace(day=1, hour=0, minute=0, second=0, microsecond=0))


def truncate_day(v) -> str:
    return _fmt_like(v, _parse(v).replace(hour=0, minute=0, second=0, microsecond=0))


def truncate_hour(v) -> str:
    return _fmt_like(v, _parse(v).replace(minute=0, second=0, microsecond=0))


FILTERS = {
    "add_days": add_days,
    "add_hours": add_hours,
    "add_minutes": add_minutes,
    "add_seconds": add_seconds,
    "add_milliseconds": add_milliseconds,
    "add_months": add_months,
    "add_years": add_years,
    "date_format": date_format,
    "truncate_year": truncate_year,
    "truncate_month": truncate_month,
    "truncate_day": truncate_day,
    "truncate_hour": truncate_hour,
}
