"""SQL-generating Jinja builtins — Spark SQL dialect.

Each function returns SQL text spliced into the user's query
(ref: pkg/jinja/bruin_funcs.go:82-140 for semantics; per-platform
overrides registered by dialect packages at bruin_funcs.go:45-71 — this
module is the Spark override set).

Everything emitted here stays inside Catalyst/whole-stage-codegen:
built-in expressions only, no UDFs.
"""

from __future__ import annotations

from typing import Iterable


def group_by(*positions: int) -> str:
    return "GROUP BY " + ", ".join(str(p) for p in positions)


def safe_divide(a: str, b: str) -> str:
    # Spark has try_divide (NULL on /0) since 3.4
    return f"TRY_DIVIDE({a}, {b})"


def safe_add(*args: str) -> str:
    return " + ".join(f"COALESCE({a}, 0)" for a in args)


def safe_subtract(a: str, b: str) -> str:
    return f"COALESCE({a}, 0) - COALESCE({b}, 0)"


def generate_surrogate_key(*cols: str) -> str:
    """md5 over coalesced string casts (ref: bruin_funcs.go:112-140).

    Uses the same '_bruin_surrogate_key_null_' null sentinel so keys are
    stable across engines.
    """
    parts = ", ".join(
        f"COALESCE(CAST({c} AS STRING), '_bruin_surrogate_key_null_')" for c in cols
    )
    return f"MD5(CONCAT_WS('|', {parts}))"


def degrees_to_radians(expr: str) -> str:
    return f"RADIANS({expr})"


def haversine_distance(lat1: str, lon1: str, lat2: str, lon2: str, unit: str = "km") -> str:
    r = "6371.0" if unit == "km" else "3958.8"
    return (
        f"2 * {r} * ASIN(SQRT(POWER(SIN((RADIANS({lat2}) - RADIANS({lat1})) / 2), 2)"
        f" + COS(RADIANS({lat1})) * COS(RADIANS({lat2}))"
        f" * POWER(SIN((RADIANS({lon2}) - RADIANS({lon1})) / 2), 2)))"
    )


def width_bucket(expr: str, lo: str, hi: str, n: str) -> str:
    return f"WIDTH_BUCKET({expr}, {lo}, {hi}, {n})"


def deduplicate(table: str, keys: Iterable[str] | str, order_by: str) -> str:
    """Latest-row-per-key subquery (QUALIFY row_number()=1 pattern)."""
    if isinstance(keys, str):
        keys = [keys]
    ks = ", ".join(keys)
    # EXCEPT drops the helper column: leaking `_rn` into the result
    # would add a surprise column to every materialized SELECT *
    return (
        f"(SELECT * EXCEPT (_rn) FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY {ks} "
        f"ORDER BY {order_by}) AS _rn FROM {table}) WHERE _rn = 1)"
    )


def generate_series(start: str, stop: str, step: str = "1") -> str:
    return f"(SELECT EXPLODE(SEQUENCE({start}, {stop}, {step})) AS generate_series)"


def date_spine(datepart: str, start_date: str, end_date: str) -> str:
    """Date scaffold: one row per <datepart> between the bounds
    (exclusive end). Day-and-coarser parts step over DATE operands;
    sub-day parts (hour/minute/second) step over TIMESTAMP with the
    exclusive end backed off by one <datepart>, not one day."""
    if datepart.lower() in ("day", "week", "month", "quarter", "year"):
        return (
            f"(SELECT EXPLODE(SEQUENCE(CAST({start_date} AS DATE), "
            f"CAST({end_date} AS DATE) - INTERVAL 1 DAY, INTERVAL 1 {datepart})) AS date_{datepart})"
        )
    return (
        f"(SELECT EXPLODE(SEQUENCE(CAST({start_date} AS TIMESTAMP), "
        f"CAST({end_date} AS TIMESTAMP) - INTERVAL 1 {datepart}, "
        f"INTERVAL 1 {datepart})) AS date_{datepart})"
    )


def slugify(expr: str) -> str:
    return (
        f"REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(TRIM({expr})), "
        f"'[^a-z0-9\\\\s-]', ''), '\\\\s+', '-'), '-+', '-')"
    )


def get_url_host(expr: str) -> str:
    return f"PARSE_URL({expr}, 'HOST')"


def get_url_parameter(expr: str, param: str) -> str:
    return f"PARSE_URL({expr}, 'QUERY', '{param}')"


def get_url_path(expr: str) -> str:
    return f"PARSE_URL({expr}, 'PATH')"


def pivot(table: str, group_cols: Iterable[str], pivot_col: str, value_col: str, values: Iterable[str], agg: str = "SUM") -> str:
    gc = ", ".join(group_cols)
    vals = ", ".join(f"'{v}'" for v in values)
    return (
        f"(SELECT * FROM (SELECT {gc}, {pivot_col}, {value_col} FROM {table}) "
        f"PIVOT ({agg}({value_col}) FOR {pivot_col} IN ({vals})))"
    )


def date_part(part: str, expr: str) -> str:
    return f"DATE_PART('{part}', {expr})"
