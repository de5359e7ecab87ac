"""Parity with the reference's own SQL-builtin tests.

Harvests the tables from ``pkg/jinja/bruin_funcs_test.go`` and the
Spark row of ``pkg/jinja/bruin_platform_funcs_test.go`` at test time
(data-only, like tests/test_jinja_reference_cases.py) and pins
``bruin_spark.render.builtins`` against them.

Dialect handling — our engine IS the reference's Spark platform, so:

- Tables whose default emission the Spark platform does NOT override
  (group_by, safe_divide, safe_add/subtract, degrees_to_radians,
  width_bucket, generate_series, slugify, haversine, combined usage)
  are asserted VERBATIM.
- generate_surrogate_key: the default table wants ``cast(.. as
  varchar)``; the Spark override casts to ``string``
  (pkg/spark/bruin_funcs.go:12) — the harvested want is transformed
  accordingly, everything else byte-equal.
- pivot: the default table quotes aliases with double quotes; Spark
  uses backticks (pkg/spark/bruin_funcs.go:17) — ``as "x"`` becomes
  ``as `x``` in the harvested substrings.
- date_spine / URL helpers: the default tables are other dialects'
  emissions; the Spark expectations come from the ``spark`` row of
  TestPlatformSpecificBuiltinSQL (contains/excludes), plus execution
  checks in test_model_render.py.
- deduplicate: the reference's Spark emission is a QUALIFY clause,
  which open-source Spark cannot parse — we pin the documented
  deviation semantically (row_number window, partition/order clauses,
  no helper column) and assert it EXECUTES on Spark with the QUALIFY
  semantics.

Ref anchors: pkg/jinja/bruin_funcs_test.go,
pkg/jinja/bruin_platform_funcs_test.go:27, pkg/spark/bruin_funcs.go.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from go_table import entries, func_block

from bruin_spark.render.jinja import _ENV

FUNCS = Path("/root/reference/pkg/jinja/bruin_funcs_test.go")
PLATFORM = Path("/root/reference/pkg/jinja/bruin_platform_funcs_test.go")

pytestmark = pytest.mark.skipif(not FUNCS.exists(), reason="reference checkout absent")


def _render(query: str) -> str:
    return _ENV.from_string(query).render()


# -- verbatim tables (Spark uses the default emission) -------------------------

_VERBATIM_EXACT = ("TestBuiltin_GroupBy", "TestBuiltin_SafeDivide", "TestBuiltin_SafeAdd")


def _exact_cases():
    out = []
    for fn in _VERBATIM_EXACT:
        for e in entries(func_block(FUNCS, fn)):
            out.append(pytest.param(e["query"], e["want"], id=f"{fn}-{e['name'].replace(' ', '-')}"))
    # slugify table is exact too
    for e in entries(func_block(FUNCS, "TestBuiltin_Slugify")):
        out.append(pytest.param(e["query"], e["want"], id=f"Slugify-{e['name'].replace(' ', '-')}"))
    return out


@pytest.mark.parametrize("query,want", _exact_cases())
def test_exact_reference_tables(query, want):
    assert _render(query) == want


def _contains_cases():
    out = []
    for fn, transform in (
        ("TestBuiltin_GenerateSeries", None),
        ("TestBuiltin_HaversineDistance", None),
        # Spark override quotes pivot aliases with backticks
        ("TestBuiltin_Pivot", lambda s: s.replace('as "', "as `").replace('"', "`")),
    ):
        for e in entries(func_block(FUNCS, fn)):
            contains = e["contains"]
            if transform:
                contains = [transform(s) if s.startswith("as ") or '"' in s else s for s in contains]
            out.append(pytest.param(e["query"], contains, id=f"{fn}-{e['name'].replace(' ', '-')}"))
    return out


@pytest.mark.parametrize("query,contains", _contains_cases())
def test_contains_reference_tables(query, contains):
    result = _render(query)
    for substr in contains:
        assert substr in result, f"expected output to contain {substr!r}:\n{result}"


# -- surrogate key: default table with the Spark cast type ---------------------


def _surrogate_cases():
    return [
        pytest.param(
            e["query"],
            e["want"].replace(" as varchar)", " as string)"),
            id=e["name"].replace(" ", "-"),
        )
        for e in entries(func_block(FUNCS, "TestBuiltin_GenerateSurrogateKey"))
    ]


@pytest.mark.parametrize("query,want", _surrogate_cases())
def test_surrogate_key_reference_table_spark_cast(query, want):
    assert _render(query) == want


# -- inline (non-table) reference assertions, pinned by value ------------------


def test_safe_subtract_reference_inline():
    # bruin_funcs_test.go:110-117
    assert _render("{{ bruin.safe_subtract(['revenue', 'cost', 'tax']) }}") == (
        "coalesce(revenue, 0) -\n    coalesce(cost, 0) -\n    coalesce(tax, 0)"
    )


def test_degrees_to_radians_reference_inline():
    # bruin_funcs_test.go:283-289
    assert _render("{{ bruin.degrees_to_radians('angle_col') }}") == "acos(-1) * angle_col / 180"


def test_width_bucket_reference_inline():
    # bruin_funcs_test.go:291-314 (subtest asserts)
    result = _render("{{ bruin.width_bucket('price', '0', '100', '10') }}")
    for substr in ("mod(", "then 0", "ceil(", "price", "cast(10 as numeric) + 1"):
        assert substr in result
    result = _render("{{ bruin.width_bucket('val', '3', '23', '4') }}")
    assert "cast(val as numeric) - cast(3 as numeric)" in result


def test_haversine_rejects_unknown_unit():
    # bruin_funcs_test.go:274-281
    with pytest.raises(Exception) as exc:
        _render("{{ bruin.haversine_distance('lat1', 'lon1', 'lat2', 'lon2', unit='meters') }}")
    assert "haversine_distance unit must be 'mi' or 'km'" in str(exc.value)


def test_pivot_no_alias_reference_inline():
    # bruin_funcs_test.go:226-232 (double quote -> Spark backtick)
    result = _render("{{ bruin.pivot('type', ['a'], alias=false) }}")
    assert "as `" not in result


def test_pivot_escapes_single_quotes():
    # bruin_funcs_test.go:531-537
    result = _render("{{ bruin.pivot('name', [\"it's\"]) }}")
    assert "it''s" in result


def test_functions_available_by_default():
    # bruin_funcs_test.go:491-510 — the bruin namespace resolves in a
    # plain renderer context
    assert _render("{{ bruin.group_by(2) }}") == "group by 1, 2"


def test_combined_usage_reference_inline():
    # bruin_funcs_test.go:512-529
    query = (
        "select\n"
        "    {{ bruin.generate_surrogate_key(['user_id', 'event_date']) }} as surrogate_key,\n"
        "    user_id,\n"
        "    event_date,\n"
        "    {{ bruin.safe_divide('revenue', 'sessions') }} as revenue_per_session\n"
        "from events\n"
        "{{ bruin.group_by(3) }}"
    )
    result = _render(query)
    assert "md5(concat(" in result
    assert "nullif(" in result
    assert "group by 1, 2, 3" in result


# -- the Spark row of TestPlatformSpecificBuiltinSQL ----------------------------


def test_platform_spark_row():
    rows = entries(func_block(PLATFORM, "TestPlatformSpecificBuiltinSQL"))
    spark_rows = [e for e in rows if e["name"] == "spark"]
    assert spark_rows, "spark row missing from the platform table"
    e = spark_rows[0]
    result = _render(e["query"])
    for substr in e["contains"]:
        assert substr in result, f"expected spark emission to contain {substr!r}:\n{result}"
    for substr in e.get("excludes", []):
        assert substr not in result


# -- deduplicate: documented QUALIFY deviation, pinned semantically -------------


def test_deduplicate_spark_semantics(spark):
    """The reference's Spark deduplicate emits QUALIFY
    (ansisql.DeduplicateQualify) — open-source Spark rejects it, so our
    emission is the semantically identical subquery rewrite. Pin the
    reference's structural expectations that still apply and execute."""
    result = _render("{{ bruin.deduplicate('my_table', 'user_id', 'updated_at desc') }}")
    assert "row_number() over (" in result
    assert "partition by user_id" in result
    assert "order by updated_at desc" in result
    assert "_bruin_source" in result
    # it must actually parse and dedupe on OSS Spark
    spark.range(6).selectExpr("id % 3 AS user_id", "id AS updated_at").createOrReplaceTempView(
        "my_table"
    )
    df = spark.sql(f"SELECT * FROM ({result})")
    assert df.columns == ["user_id", "updated_at"]
    assert {(r[0], r[1]) for r in df.collect()} == {(0, 3), (1, 4), (2, 5)}


# -- every emission EXECUTES on Spark ------------------------------------------
# The reference only checks its generated SQL *parses* (sqlglot,
# bruin_funcs_parser_test.go); on an engine we own we can go further:
# each builtin's emission must analyze and run.


def test_every_builtin_emission_executes_on_spark(spark):
    from bruin_spark.render import builtins as b

    spark.createDataFrame(
        [(1.0, 2.0, "https://ex.com/a/b?utm_source=x&y=2", 10.0, 20.0, 30.0, 40.0)],
        "revenue double, sessions double, page_url string, lat1 double, lon1 double, lat2 double, lon2 double",
    ).createOrReplaceTempView("bt")

    exprs = {
        "safe_divide": b.safe_divide("revenue", "sessions"),
        "safe_add": b.safe_add("revenue", "sessions"),
        "safe_subtract": b.safe_subtract(["revenue", "sessions"]),
        "surrogate": b.generate_surrogate_key(["revenue", "page_url"]),
        "degrees_to_radians": b.degrees_to_radians("lat1"),
        "haversine_mi": b.haversine_distance("lat1", "lon1", "lat2", "lon2"),
        "haversine_km": b.haversine_distance("lat1", "lon1", "lat2", "lon2", unit="km"),
        "width_bucket": b.width_bucket("revenue", "0", "100", "10"),
        "url_host": b.get_url_host("page_url"),
        "url_param": b.get_url_parameter("page_url", "utm_source"),
        "url_path": b.get_url_path("page_url"),
    }
    select_list = ", ".join(f"{e} as c_{name}" for name, e in exprs.items())
    row = spark.sql(f"select {select_list} from bt").collect()[0]
    assert row["c_url_host"] == "ex.com"
    assert row["c_url_param"] == "x"
    assert row["c_url_path"] == "a/b"
    assert row["c_safe_add"] == 3.0
    assert row["c_width_bucket"] == 1  # revenue=1.0 in [0,100)/10 -> bucket 1

    # pivot expressions aggregate
    spark.createDataFrame(
        [("active",), ("churned",), ("active",)], "status string"
    ).createOrReplaceTempView("bp")
    pv = b.pivot("status", ["active", "churned"])
    r = spark.sql(f"select {pv} from bp").collect()[0]
    assert (r[0], r[1]) == (2, 1)

    # statement-shaped builtins run standalone / wrapped
    assert spark.sql(b.generate_series(10)).count() == 10
    spine = spark.sql(b.date_spine("day", "'2024-01-01'", "'2024-01-04'")).collect()
    assert [str(x[0]) for x in spine] == ["2024-01-01", "2024-01-02", "2024-01-03"]
    # empty range -> zero rows (the reference's CASE arm; a bare
    # sequence() would descend)
    assert spark.sql(b.date_spine("day", "'2024-01-04'", "'2024-01-04'")).count() == 0
    assert spark.sql(b.group_by(2).replace("group by", "select") + " from bt").count() == 1


# -- pkg/query statement classification -----------------------------------------

STMT = Path("/root/reference/pkg/query/statement_test.go")


def _result_query_cases():
    return [
        pytest.param(e["sql"], e["want"], id=e["name"].replace(" ", "-"))
        for e in entries(func_block(STMT, "TestIsLikelyResultQuery"))
    ]


@pytest.mark.parametrize("sql,want", _result_query_cases())
def test_is_likely_result_query_reference_table(sql, want):
    """The SDK's DataFrame-vs-None split uses the reference's
    IsLikelyResultQuery classifier (pkg/query/statement.go:9-18) —
    pinned against the reference's own table, including the
    returning-inside-string-literal case."""
    from bruin_spark.parser.sqlutil import is_likely_result_query

    assert is_likely_result_query(sql) is want


# -- pkg/pipeline check-value forms ----------------------------------------------


def test_column_check_value_forms_reference_table():
    """The reference's ColumnCheckValue accepts int/string arrays,
    scalar int/float/string/bool and null, and ERRORS on an object
    (pipeline_test.go TestColumnCheckValue_UnmarshalJSON) — our YAML
    check values carry the same type domain, a mapping rejects at
    load."""
    from bruin_spark.model.pipeline import ColumnCheck

    cases = [
        ([1, 2, 3], [1, 2, 3]),
        (["1", "2", "3"], ["1", "2", "3"]),
        (123, 123),
        (123.45, 123.45),
        ("test", "test"),
        (True, True),
        (False, False),
        (None, None),
    ]
    for given, want in cases:
        c = ColumnCheck.from_obj({"name": "accepted_values", "value": given})
        assert c.value == want and type(c.value) is type(want)
    with pytest.raises(ValueError, match="unsupported value type"):
        ColumnCheck.from_obj({"name": "min", "value": {"invalid": "data"}})


def test_column_check_value_yaml_dates_and_list_elements():
    """YAML-specific wrinkles around the reference table: an unquoted
    `value: 2024-01-01` arrives from safe_load as datetime.date and
    must stay legal (yaml.v3 gives the reference a string there), while
    element-level junk inside a list rejects at load."""
    import datetime

    import yaml

    from bruin_spark.model.pipeline import ColumnCheck

    loaded = yaml.safe_load("name: min\nvalue: 2024-01-01\n")
    assert isinstance(loaded["value"], datetime.date)
    assert ColumnCheck.from_obj(loaded).value == datetime.date(2024, 1, 1)
    ok = ColumnCheck.from_obj({"name": "accepted_values", "value": [1, 2]})
    assert ok.value == [1, 2]
    with pytest.raises(ValueError, match="list values"):
        ColumnCheck.from_obj({"name": "accepted_values", "value": [{"a": 1}]})
    with pytest.raises(ValueError, match="list values"):
        ColumnCheck.from_obj({"name": "accepted_values", "value": [True]})
