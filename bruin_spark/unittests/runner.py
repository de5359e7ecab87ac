"""SQL unit tests: pinned-input tests for SQL assets.

Re-expresses the reference's warehouse-query builder
(pkg/unittest/warehouse.go:51-158 rewrite, 160-320 typed literal
fixtures; compare pkg/unittest/compare.go:23-211; fixtures
pkg/unittest/fixtures.go:19-60) on Spark:

1. each mocked upstream becomes a CTE of typed literal rows
   (``SELECT CAST(..) AS col UNION ALL ...``),
2. qualified upstream names are renamed to CTE-safe identifiers,
3. ``execution_time`` freezes now()/CURRENT_TIMESTAMP via the parser
   service,
4. the rewritten query runs on Spark, rows compare subset/exact ×
   any/strict with tolerant numeric/time equality,
5. per-CTE expectations select the named CTE instead.

Test spec (YAML under the asset's ``unit_tests:``):

    - name: computes_totals
      execution_time: "2024-03-01 12:00:00"     # optional
      inputs:
        upstream_table:
          columns: [id, amount]
          types: [bigint, double]               # optional, default inferred
          rows: [[1, 10.0], [2, 20.5]]
      expected:
        columns: [id, total]                    # positional-row mode
        rows: [[1, 10.0], [2, 20.5]]            # or map rows, partial cols
        count: 2                                # independent of rows
        match: exact | subset      (default subset — reference default)
        order: any | strict        (default any)
        ctes:                                   # per-CTE assertions
          some_cte: {rows: [...], match: exact}
      expected_count: 2            (legacy alias for expected.count)
      cte: some_cte_name           (assert that CTE instead of the query)
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from bruin_spark.model.pipeline import Asset
from bruin_spark.parser import (
    extract_select,
    freeze_time,
    prepend_ctes,
    rename_tables,
    select_from_cte,
)


@dataclass
class UnitTestResult:
    asset: str
    test: str
    passed: bool
    message: str = ""
    query: str = ""


def _sql_literal(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def _fixture_cte(columns: list[str], types: list[str] | None, rows: list[list[Any]]) -> str:
    """Typed literal SELECT ... UNION ALL body for one fixture."""
    if not rows:
        # empty fixture still needs a schema: one all-NULL row filtered out
        t = types or ["string"] * len(columns)
        sel = ", ".join(
            f"CAST(NULL AS {typ}) AS {col}" for col, typ in zip(columns, t)
        )
        return f"SELECT {sel} WHERE 1 = 0"
    parts = []
    for row in rows:
        cells = []
        for i, col in enumerate(columns):
            lit = _sql_literal(row[i])
            if types and i < len(types) and types[i]:
                cells.append(f"CAST({lit} AS {types[i]}) AS {col}")
            else:
                cells.append(f"{lit} AS {col}")
        parts.append("SELECT " + ", ".join(cells))
    return " UNION ALL ".join(parts)


def _safe_name(table: str) -> str:
    return table.replace(".", "__")


def build_test_query(asset_query: str, spec: dict[str, Any]) -> str:
    """Rewrite the asset's (rendered) SQL into the pinned-input test query."""
    sql = asset_query.rstrip().rstrip(";")
    # Reduce the asset to the SELECT that produces its rows: a
    # materialization: none asset can be full DDL (CREATE ... AS SELECT,
    # CTAS, INSERT ... SELECT) and the unit test exercises only the inner
    # SELECT.  This is also the read-only guarantee — a write shape
    # raises here and never runs (ref: pkg/unittest/warehouse.go:75-84
    # buildInjected; errors surface as "cannot unit test this asset").
    try:
        sql = extract_select(sql)
    except ValueError as exc:
        raise ValueError(f"cannot unit test this asset: {exc}") from exc
    if spec.get("execution_time"):
        sql = freeze_time(sql, str(spec["execution_time"]))

    inputs: dict[str, Any] = spec.get("inputs", {}) or {}
    renames = {t: _safe_name(t) for t in inputs if "." in t}
    if renames:
        sql = rename_tables(sql, renames)
    fixtures = {
        _safe_name(t): _fixture_cte(
            fx["columns"], fx.get("types"), fx.get("rows", [])
        )
        for t, fx in inputs.items()
    }
    if fixtures:
        sql = prepend_ctes(sql, fixtures)
    if spec.get("cte"):
        sql = select_from_cte(sql, spec["cte"])
    return sql


# -- comparison (reference semantics: pkg/unittest/compare.go:23-211) ----------


def _go_str(v: Any) -> str:
    # Go fmt %v spells bools lowercase; fixture "true" matches engine TRUE
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _to_float(v: Any) -> float | None:
    """compare.go toFloat: ints/floats/Decimals and NUMERIC STRINGS
    (Snowflake returns NUMBER as "5.000000") coerce; bools do not."""
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v.strip())
        except ValueError:
            return None
    return None


def _to_time(v: Any):
    """compare.go toTime: datetimes/dates, or strings in the recognized
    layouts (RFC3339, space- or T-separated, date-only), normalized to a
    UTC instant. Non-date strings return None."""
    import datetime

    utc = datetime.timezone.utc
    if isinstance(v, datetime.datetime):
        return v if v.tzinfo else v.replace(tzinfo=utc)
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day, tzinfo=utc)
    if isinstance(v, str):
        try:
            t = datetime.datetime.fromisoformat(v.strip().replace("Z", "+00:00"))
        except ValueError:
            return None
        return t if t.tzinfo else t.replace(tzinfo=utc)
    return None


def _values_equal(want: Any, got: Any) -> bool:
    """compare.go valuesEqual: numeric by value with relative tolerance,
    dates/timestamps by instant across representations, bytes decoded,
    everything else by (Go-spelled) string form."""
    if isinstance(want, (bytes, bytearray)):
        want = bytes(want).decode("utf-8", "replace")
    if isinstance(got, (bytes, bytearray)):
        got = bytes(got).decode("utf-8", "replace")
    if want is None or got is None:
        return want is None and got is None
    wf, gf = _to_float(want), _to_float(got)
    if wf is not None and gf is not None:
        # representation-noise tolerance: 0.1 + 0.2 matches 0.3
        return wf == gf or abs(wf - gf) <= 1e-9 * max(1.0, abs(wf), abs(gf))
    wt, gt = _to_time(want), _to_time(got)
    if wt is not None and gt is not None:
        return wt == gt
    return _go_str(want) == _go_str(got)


def _row_matches(expected_row: dict, actual_row: dict) -> bool:
    """Every asserted column must match; actual may carry extra columns
    (partial assertions). Keys are compared case-insensitively."""
    for k, want in expected_row.items():
        lk = str(k).lower()
        if lk not in actual_row or not _values_equal(want, actual_row[lk]):
            return False
    return True


def _as_row_dicts(rows: list, columns: list[str] | None) -> list[dict]:
    """Normalize rows to {lower_col: value} dicts. Map rows pass through
    (the reference YAML shape); positional lists zip with ``columns``, or
    fall back to positional keys when no columns are known."""
    out = []
    for row in rows:
        if isinstance(row, dict):
            out.append({str(k).lower(): v for k, v in row.items()})
        elif columns:
            out.append({str(c).lower(): v for c, v in zip(columns, row)})
        else:
            out.append({str(i): v for i, v in enumerate(row)})
    return out


def compare_rows(
    actual: list[list[Any]],
    expected: list[list[Any]],
    match: str = "subset",
    order: str = "any",
    actual_columns: list[str] | None = None,
    expected_columns: list[str] | None = None,
    count: int | None = None,
) -> str:
    """'' when rows satisfy the expectation, else a failure message.

    Reference semantics (compare.go compareRowSet/compareRows): ``count``
    and rows are independent assertions; default match is SUBSET (extra
    actual rows allowed) and default order is any; strict order compares
    positionally (expected must be a prefix of actual); unordered mode
    binds expected rows to distinct actual rows with a maximum bipartite
    matching so a broad partial row never steals the only actual row a
    narrower one needs.
    """
    act = _as_row_dicts(actual, actual_columns)
    exp = _as_row_dicts(expected, expected_columns or actual_columns)

    if count is not None and len(act) != count:
        return f"expected {count} row(s), got {len(act)}"
    m = (match or "").lower()
    if m not in ("", "subset", "exact"):
        return f'unknown match mode "{match}" (use "subset" or "exact")'
    exact = m == "exact"
    if exact and len(exp) != len(act):
        return f"expected exactly {len(exp)} row(s), got {len(act)}"
    if (order or "").lower() == "strict":
        if len(act) < len(exp):
            return f"expected at least {len(exp)} row(s), got {len(act)}"
        for i, e in enumerate(exp):
            if not _row_matches(e, act[i]):
                return f"row {i} mismatch\n  expected: {e}\n  actual:   {act[i]}"
        return ""

    # maximum bipartite matching (augmenting paths), as in compare.go
    matched_by = [-1] * len(act)

    def augment(ei: int, seen: list[bool]) -> bool:
        for ai in range(len(act)):
            if seen[ai] or not _row_matches(exp[ei], act[ai]):
                continue
            seen[ai] = True
            if matched_by[ai] == -1 or augment(matched_by[ai], seen):
                matched_by[ai] = ei
                return True
        return False

    for ei in range(len(exp)):
        if not augment(ei, [False] * len(act)):
            return f"expected row not found: {exp[ei]}\nactual rows: {act}"
    return ""


def run_unit_tests(
    spark: SparkSession, asset: Asset, rendered_query: str | None = None
) -> list[UnitTestResult]:
    """Run every unit test declared on the asset."""
    out: list[UnitTestResult] = []
    base = rendered_query if rendered_query is not None else asset.query
    for spec in asset.unit_tests:
        name = spec.get("name", "unnamed")
        q = base  # so a build_test_query error still reports a query
        try:
            q = build_test_query(base, spec)
            df = spark.sql(q)
            actual_cols = df.columns
            actual = [list(r) for r in df.collect()]
        except Exception as exc:  # noqa: BLE001 - surface as failure
            out.append(
                UnitTestResult(asset.name, name, False, f"query error: {exc}", q)
            )
            continue

        exp = spec.get("expected") or {}
        # count and rows are independent assertions (compare.go:43-47):
        # either or both may be set, and both must hold
        count = exp.get("count")
        if count is None and "expected_count" in spec:
            count = spec["expected_count"]
        msg = ""
        exp_cols = exp.get("columns")
        if exp_cols and [c.lower() for c in actual_cols] != [
            c.lower() for c in exp_cols
        ]:
            msg = f"columns {actual_cols} != expected {exp_cols}"
        if not msg and (exp.get("rows") is not None or count is not None):
            msg = compare_rows(
                actual,
                exp.get("rows") or [],
                match=exp.get("match") or spec.get("match", "subset"),
                order=exp.get("order") or spec.get("order", "any"),
                actual_columns=actual_cols,
                expected_columns=exp_cols,
                count=count,
            )
        # per-CTE expectations: expected.ctes.{name} asserts one named
        # intermediate CTE with the same row/count/match/order semantics
        # (pipeline.go UnitTestCTEExpected)
        for cte_name, cte_exp in (exp.get("ctes") or {}).items():
            if msg:
                break
            try:
                cq = build_test_query(base, {**spec, "cte": cte_name})
                cdf = spark.sql(cq)
                c_actual = [list(r) for r in cdf.collect()]
            except Exception as exc:  # noqa: BLE001 - surface as failure
                msg = f"cte {cte_name}: query error: {exc}"
                break
            c_msg = compare_rows(
                c_actual,
                cte_exp.get("rows") or [],
                match=cte_exp.get("match", "subset"),
                order=cte_exp.get("order", "any"),
                actual_columns=cdf.columns,
                expected_columns=cte_exp.get("columns"),
                count=cte_exp.get("count"),
            )
            if c_msg:
                msg = f"cte {cte_name}: {c_msg}"
        out.append(UnitTestResult(asset.name, name, msg == "", msg, q))
    return out
