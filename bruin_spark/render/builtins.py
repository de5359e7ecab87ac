"""SQL-generating Jinja builtins — the reference's Spark platform set.

Call signatures AND emitted SQL mirror the reference byte-for-byte so a
migrating user's templates render identically:

- defaults: pkg/jinja/bruin_funcs.go (group_by :568, safe_divide :576,
  safe_add/subtract :580-598, pivot :600, degrees_to_radians :649,
  width_bucket :653, generate_series :757, slugify :778, haversine
  :HaversineDistanceWithRadians)
- Spark overrides: pkg/spark/bruin_funcs.go:11-19 —
  generate_surrogate_key (cast as string + md5), pivot (backtick
  identifier quoting), date_spine (jinja.SparkDateSpine,
  bruin_funcs.go:344), URL helpers (jinja.SparkURLHelpers,
  bruin_funcs.go:861).

List-or-varargs calls (``generate_surrogate_key(['a','b'])`` and
``generate_surrogate_key('a','b')``) both work, like gonja's
extractStringListFromVarArgs (bruin_funcs.go:1042).

ONE deliberate deviation: the reference's Spark ``deduplicate`` emits a
QUALIFY clause (pkg/ansisql/bruin_funcs.go:7 — Databricks SQL), which
open-source Spark does not parse (PARSE_SYNTAX_ERROR at 'qualify',
verified on 4.1). We emit the semantically identical single-subquery
rewrite (``* EXCEPT`` + row_number filter) so the SQL actually runs on
Spark; same rows, same columns, no helper-column leakage.

Pinned against the reference's own bruin_funcs_test.go /
bruin_platform_funcs_test.go tables by
tests/test_builtins_reference_cases.py.
"""

from __future__ import annotations

import re


def _string_list(args) -> list[str]:
    """gonja extractStringListFromVarArgs: a single list argument OR
    varargs of strings (bruin_funcs.go:1042)."""
    if len(args) == 1 and isinstance(args[0], (list, tuple)):
        return [str(a) for a in args[0]]
    return [str(a) for a in args]


def _concat(parts: list[str]) -> str:
    """concatFunction (bruin_funcs.go:151): bare for one part."""
    if len(parts) == 1:
        return parts[0]
    return f"concat({', '.join(parts)})"


def _sql_string_literal(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _sql_raw_string_literal(s: str) -> str:
    return "r" + _sql_string_literal(s)


def _backtick_quote(identifier: str) -> str:
    return "`" + identifier.replace("`", "``") + "`"


def group_by(n: int) -> str:
    """``group by 1, 2, …, n`` (bruin_funcs.go:568 — the argument is a
    COUNT of leading columns, not a position list)."""
    return "group by " + ", ".join(str(i + 1) for i in range(int(n)))


def safe_divide(numerator: str, denominator: str) -> str:
    return f"({numerator}) / nullif(({denominator}), 0)"


def _safe_arithmetic(fields: list[str], operator: str) -> str:
    if not fields:
        return ""
    return operator.join(f"coalesce({f}, 0)" for f in fields)


def safe_add(*args) -> str:
    return _safe_arithmetic(_string_list(args), " +\n    ")


def safe_subtract(*args) -> str:
    return _safe_arithmetic(_string_list(args), " -\n    ")


def generate_surrogate_key(*args) -> str:
    """Spark override (pkg/spark/bruin_funcs.go:12): md5 over
    '-'-separated coalesced string casts, '_bruin_surrogate_key_null_'
    null sentinel — key VALUES match the reference's Spark platform."""
    fields = _string_list(args)
    if not fields:
        return ""
    parts: list[str] = []
    for i, f in enumerate(fields):
        parts.append(f"coalesce(cast({f} as string), '_bruin_surrogate_key_null_')")
        if i < len(fields) - 1:
            parts.append("'-'")
    return f"md5({_concat(parts)})"


def degrees_to_radians(degrees: str) -> str:
    return f"acos(-1) * {degrees} / 180"


def haversine_distance(*args, **kwargs) -> str:
    """Default haversine (HaversineDistanceWithRadians, radians()
    builder): miles base radius 3961, km via conversion rate; unit as
    5th positional or ``unit=`` kwarg; unknown units error."""
    if len(args) < 4:
        raise ValueError("haversine_distance requires 4 arguments: lat1, lon1, lat2, lon2")
    lat1, lon1, lat2, lon2 = (str(a) for a in args[:4])
    unit = str(kwargs.get("unit", args[4] if len(args) > 4 else "mi"))
    if unit == "mi":
        conversion_rate = "1"
    elif unit == "km":
        conversion_rate = "1.60934"
    else:
        raise ValueError(f"haversine_distance unit must be 'mi' or 'km', got {unit!r}")

    def radians(expr: str) -> str:
        return f"radians({expr})"

    return (
        f"2 * 3961 * asin(sqrt(power((sin({radians(f'({lat2} - {lat1}) / 2')})), 2) +\n"
        f"    cos({radians(lat1)}) * cos({radians(lat2)}) *\n"
        f"    power((sin({radians(f'({lon2} - {lon1}) / 2')})), 2))) * {conversion_rate}"
    )


def width_bucket(expr: str, min_value: str, max_value: str, num_buckets: str) -> str:
    """Default case-expression width_bucket (bruin_funcs.go:653; Spark
    registers no override). The mod/ceil pair emulates floor()+1 at
    exact bucket boundaries."""
    bin_size = (
        f"((cast({max_value} as numeric) - cast({min_value} as numeric))"
        f" / cast({num_buckets} as numeric))"
    )
    return f"""case
        when cast({expr} as numeric) < cast({min_value} as numeric) then 0
        when cast({expr} as numeric) >= cast({max_value} as numeric) then cast({num_buckets} as numeric) + 1
        when mod(cast({expr} as numeric) - cast({min_value} as numeric), {bin_size}) = 0
            then ceil((cast({expr} as numeric) - cast({min_value} as numeric)) / {bin_size}) + 1
        else ceil((cast({expr} as numeric) - cast({min_value} as numeric)) / {bin_size})
    end"""


def deduplicate(relation: str, partition_by: str, order_by: str) -> str:
    """Latest-row-per-key. The reference's Spark platform emits QUALIFY
    (ansisql.DeduplicateQualify — Databricks SQL); open-source Spark
    rejects QUALIFY, so this emits the semantically identical
    single-subquery rewrite: same rows, original columns only."""
    return f"""select * except (__bruin_row_number)
    from (
        select
            _bruin_source.*,
            row_number() over (
                partition by {partition_by}
                order by {order_by}
            ) as __bruin_row_number
        from {relation} as _bruin_source
    )
    where __bruin_row_number = 1"""


def _powers_of_two(upper_bound: int) -> int:
    if upper_bound <= 1:
        return 1
    return max(1, (upper_bound - 1).bit_length())


def _generate_series_ctes(upper_bound: int) -> str:
    n = _powers_of_two(upper_bound)
    terms = "\n        + ".join(
        f"p{i}.generated_number * power(2, {i})" for i in range(n)
    )
    froms = "\n        cross join ".join(f"p as p{i}" for i in range(n))
    return (
        "with p as (\n        select 0 as generated_number union all select 1\n    ), unioned as (\n\n        select\n\n        "
        + terms
        + "\n        + 1\n        as generated_number\n\n        from\n\n        "
        + froms
        + "\n\n    )"
    )


def generate_series(upper_bound: int) -> str:
    """Cross-join powers-of-two CTE generating 1..upper_bound
    (bruin_funcs.go:757 — platform-independent, no native generator)."""
    upper_bound = int(upper_bound)
    return (
        f"{_generate_series_ctes(upper_bound)}\n\n    select *\n    from unioned\n"
        f"    where generated_number <= {upper_bound}\n    order by generated_number"
    )


def _interval_step_literal(datepart: str) -> str:
    if datepart == "quarter":
        return "3 month"
    if datepart == "week":
        return "7 day"
    return "1 " + datepart


def _is_timestamp_datepart(datepart: str) -> bool:
    return datepart.lower() in ("hour", "minute", "second", "millisecond", "microsecond")


def date_spine(datepart: str, start_date: str, end_date: str) -> str:
    """jinja.SparkDateSpine (bruin_funcs.go:344): explode over a
    filtered sequence, end-exclusive, empty array when the range holds
    no step (start + interval > end never descends)."""
    column_name = "date_" + datepart
    cast_fn = "to_timestamp" if _is_timestamp_datepart(datepart) else "to_date"
    array_type = "array<timestamp>" if _is_timestamp_datepart(datepart) else "array<date>"
    step = _interval_step_literal(datepart)
    return f"""select explode(
    case
        when {cast_fn}({start_date}) + interval {step} <= {cast_fn}({end_date})
            then filter(sequence({cast_fn}({start_date}), {cast_fn}({end_date}), interval {step}), x -> x < {cast_fn}({end_date}))
        else cast(array() as {array_type})
    end
) as {column_name}"""


_SLUG_SPACE_DASH = re.compile(r"[ -]+")
_SLUG_NON_ALNUM = re.compile(r"[^a-z0-9_]+")


def slugify(s: str) -> str:
    """Go-side STRING slugify (bruin_funcs.go:778) — used for pivot
    aliases and identifier cleanup, not SQL generation."""
    if not s:
        return ""
    s = str(s).lower()
    s = _SLUG_SPACE_DASH.sub("_", s)
    s = _SLUG_NON_ALNUM.sub("", s)
    if s and s[0].isdigit():
        s = "_" + s
    return s


def _url_parameter_regex(url_parameter: str) -> str:
    return r"(?:^|[?&])" + re.escape(url_parameter) + r"=([^&]*)"


def get_url_host(field: str) -> str:
    """SparkURLHelpers (bruin_funcs.go:861): regex strip + extract."""
    stripped = f"regexp_replace({field}, '^(android-app://|https?://)', '')"
    return f"cast(regexp_extract({stripped}, '^([^/?]+)', 1) as string)"


def get_url_parameter(field: str, url_parameter: str) -> str:
    return (
        f"nullif(regexp_extract({field}, "
        f"{_sql_raw_string_literal(_url_parameter_regex(url_parameter))}, 1), '')"
    )


def get_url_path(field: str) -> str:
    stripped = f"regexp_replace({field}, '^(android-app://|https?://)', '')"
    return f"cast(regexp_extract({stripped}, '^[^/?]+/([^?]*)', 1) as string)"


def pivot(*args, **kwargs) -> str:
    """Case-when pivot expression list (bruin_funcs.go:600); Spark
    quotes aliases with backticks (PivotWithIdentifierQuote,
    pkg/spark/bruin_funcs.go:17). Signature: pivot(column, values,
    alias=True, agg='sum', cmp='=', prefix='', suffix='',
    then_value='1', else_value='0', quote_identifiers=True,
    distinct=False)."""
    if len(args) < 2:
        return "/* pivot requires at least 2 arguments: column, values */"
    column = str(args[0])
    values = _string_list([args[1]])

    alias = bool(kwargs.get("alias", True))
    agg = str(kwargs.get("agg", "sum"))
    cmp = str(kwargs.get("cmp", "="))
    prefix = str(kwargs.get("prefix", ""))
    suffix = str(kwargs.get("suffix", ""))
    then_value = str(kwargs.get("then_value", "1"))
    else_value = str(kwargs.get("else_value", "0"))
    quote_identifiers = bool(kwargs.get("quote_identifiers", True))
    distinct = bool(kwargs.get("distinct", False))

    parts: list[str] = []
    for value in values:
        escaped_value = value.replace("'", "''")
        distinct_str = "distinct " if distinct else ""
        expr = (
            f"{agg}(\n        {distinct_str}case\n        when {column} {cmp} '{escaped_value}'"
            f"\n            then {then_value}\n        else {else_value}\n        end\n    )"
        )
        if alias:
            alias_name = prefix + value + suffix
            if quote_identifiers:
                expr += "\n        as " + _backtick_quote(alias_name)
            else:
                expr += "\n        as " + slugify(alias_name)
        parts.append(expr)
    return ",\n    ".join(parts)


#: the `bruin` template namespace — the reference exposes builtins ONLY
#: under this object (pkg/jinja/jinja.go:81-82 ctx["bruin"] =
#: BuiltinFunctions()); bare names are also registered in our env as a
#: convenience for local templates.
BUILTINS: dict = {
    "group_by": group_by,
    "safe_divide": safe_divide,
    "safe_add": safe_add,
    "safe_subtract": safe_subtract,
    "generate_surrogate_key": generate_surrogate_key,
    "pivot": pivot,
    "haversine_distance": haversine_distance,
    "degrees_to_radians": degrees_to_radians,
    "width_bucket": width_bucket,
    "deduplicate": deduplicate,
    "generate_series": generate_series,
    "date_spine": date_spine,
    "slugify": slugify,
    "get_url_host": get_url_host,
    "get_url_parameter": get_url_parameter,
    "get_url_path": get_url_path,
}
