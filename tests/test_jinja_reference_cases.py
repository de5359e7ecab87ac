"""Parity with the reference's own Jinja renderer tests.

Harvests the test tables from ``/root/reference/pkg/jinja/jinja_test.go``
at test time (the same data-only pattern as
tests/test_semantic_reference_cases.py — no code is copied; the
reference's expectations become our gate) and pins this repo's renderer
(`bruin_spark.render.jinja`) against them:

- ``TestJinjaRenderer_RenderQuery``: template+context → exact output
  (filters, set blocks, loops, range; Context funcs become lambdas).
- ``TestAddMonths/Years/Days/Hours/Minutes/Seconds/Milliseconds``: the
  per-filter tables, including their error cases (string amounts,
  unparseable dates) — the query template is read from each func's own
  ``fmt.Sprintf`` line.
- ``TestJinjaRendererWithStartEndDate``: the interval-context variable
  FORMATS (end_date / end_datetime / end_timestamp with sub-second +
  'Z') against our RenderContext.to_jinja().
- ``TestJinjaRendererErrorHandling``: error *semantics* only (missing
  variable / filter / endfor / endif must raise). The reference pins
  gonja's message text; jinja2 words errors differently, so matching
  messages would be engine-cosplay, not parity.

Ref anchor: pkg/jinja/jinja_test.go (tables harvested below),
pkg/jinja/jinja.go:NewRenderer/NewRendererWithStartEndDates.
"""

from __future__ import annotations

import re
from datetime import datetime
from pathlib import Path

import pytest

import jinja2

from bruin_spark.render.jinja import RenderContext, _ENV

REF = Path("/root/reference/pkg/jinja/jinja_test.go")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference checkout absent")


# -- Go test-table parsing: shared helpers in tests/go_table.py --------------

from go_table import entries as _go_entries, func_block as _go_func_block


def _func_block(name: str) -> str:
    return _go_func_block(REF, name)


def _entries(block: str) -> list[dict]:
    return _go_entries(block)


def _render(query: str, args: dict) -> str:
    return _ENV.from_string(query).render(**args)


# -- RenderQuery table -------------------------------------------------------


def _renderquery_cases():
    return [
        pytest.param(e, id=e["name"].replace(" ", "-"))
        for e in _entries(_func_block("TestJinjaRenderer_RenderQuery"))
    ]


@pytest.mark.parametrize("case", _renderquery_cases())
def test_renderquery_reference_table(case):
    if case.get("wantErr"):
        with pytest.raises(Exception):
            _render(case["query"], case.get("args", {}))
        return
    assert _render(case["query"], case.get("args", {})) == case["want"]


# -- per-filter add_* tables ---------------------------------------------------

_ADD_FUNCS = (
    "TestAddMonths",
    "TestAddYears",
    "TestAddDays",
    "TestAddHours",
    "TestAddMinutes",
    "TestAddSeconds",
    "TestAddMilliseconds",
)


def _add_filter_cases():
    cases = []
    for fn in _ADD_FUNCS:
        block = _func_block(fn)
        tmpl = re.search(r'fmt\.Sprintf\("(.+?)", tt\.date, tt\.(\w+)\)', block)
        assert tmpl, f"{fn}: Sprintf template not found"
        fmt_s, amount_field = tmpl.group(1), tmpl.group(2)
        for e in _entries(block):
            # substitute the two %s verbs positionally — str.format would
            # also eat the template's Jinja braces
            p = fmt_s.split("%s")
            query = p[0] + e["date"] + p[1] + e[amount_field] + p[2]
            cases.append(
                pytest.param(
                    query,
                    e.get("want"),
                    bool(e.get("wantError")),
                    id=f"{fn}-{e['name'].replace(' ', '-')}",
                )
            )
    return cases


@pytest.mark.parametrize("query,want,want_error", _add_filter_cases())
def test_add_filter_reference_tables(query, want, want_error):
    if want_error:
        with pytest.raises(Exception):
            _render(query, {})
        return
    assert _render(query, {}) == want


# -- interval-context variable formats ----------------------------------------


def _startend_ctx() -> dict:
    # the reference's fixture: start 2022-02-03 04:00:00, end/execution
    # 2022-02-04 04:00:00.948740170 UTC (ns truncate to µs in output)
    ctx = RenderContext(
        start=datetime(2022, 2, 3, 4, 0, 0),
        end=datetime(2022, 2, 4, 4, 0, 0, 948740),
        run_id="your-run-id",
        pipeline_name="your-pipeline-name",
    )
    return ctx.to_jinja()


def _startend_cases():
    return [
        pytest.param(e, id=f"{i}-{e['name'].replace(' ', '-')}")
        for i, e in enumerate(_entries(_func_block("TestJinjaRendererWithStartEndDate")))
    ]


@pytest.mark.parametrize("case", _startend_cases())
def test_startenddate_reference_table(case):
    if case.get("wantErr"):
        with pytest.raises(Exception):
            _render(case["query"], _startend_ctx())
        return
    assert _render(case["query"], _startend_ctx()) == case["want"]


# -- error semantics -----------------------------------------------------------


def _error_cases():
    return [
        pytest.param(e, id=e["name"].replace(" ", "-"))
        for e in _entries(_func_block("TestJinjaRendererErrorHandling"))
    ]


@pytest.mark.parametrize("case", _error_cases())
def test_error_semantics_reference_table(case):
    with pytest.raises((jinja2.TemplateError, jinja2.UndefinedError, Exception)):
        out = _render(case["query"], {})
        # StrictUndefined errors surface on str() for some expression
        # positions — force full evaluation
        str(out)


# -- property fuzz over the format-echo contract --------------------------------
# The reference's contract (pkg/date/helper.go): parse against the
# ordered format list, echo in the matched shape. Property: for any
# datetime rendered into any supported shape, add_days(n)|add_days(-n)
# round-trips to the exact input string, and truncate_* is idempotent.


def _shape_strings(dt):
    iso_date = dt.strftime("%Y-%m-%d")
    base = [
        iso_date,
        dt.strftime("%Y-%m-%d %H:%M"),
        dt.strftime("%Y-%m-%dT%H:%M"),
        dt.strftime("%Y-%m-%d %H:%M:%S"),
        dt.strftime("%Y-%m-%dT%H:%M:%S"),
        dt.strftime("%Y-%m-%d %H:%M:%S.") + f"{dt.microsecond // 1000:03d}",
        dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{dt.microsecond:06d}",
    ]
    return base + [b + "Z" for b in base[1:]] + [b + "+05:30" for b in base[1:]]


def test_filter_shape_roundtrip_fuzz():
    import random

    from bruin_spark.render.filters import add_days, truncate_day, truncate_hour

    rng = random.Random(20260815)
    for _ in range(120):
        dt = datetime(
            rng.randint(1971, 2037), rng.randint(1, 12), rng.randint(1, 28),
            rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59),
            rng.randint(0, 999999),
        )
        n = rng.randint(-4000, 4000)
        for s in _shape_strings(dt):
            back = add_days(add_days(s, n), -n)
            assert back == s, (s, n, back)
            t = truncate_day(s)
            assert truncate_day(t) == t, s
            h = truncate_hour(s)
            assert truncate_hour(h) == h, s
