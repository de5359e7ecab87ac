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
        columns: [id, total]
        rows: [[1, 10.0], [2, 20.5]]
      match: exact | subset        (default exact)
      order: any | strict          (default any)
      expected_count: 2            (alternative to expected rows)
      cte: some_cte_name           (assert that CTE instead of the query)
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from bruin_spark.model.pipeline import Asset
from bruin_spark.parser import freeze_time, prepend_ctes, rename_tables, select_from_cte


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


# -- comparison ----------------------------------------------------------------


def _norm_cell(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    return v


def _cells_equal(a: Any, b: Any, rel_tol: float = 1e-9) -> bool:
    a, b = _norm_cell(a), _norm_cell(b)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)) and not isinstance(a, bool) and not isinstance(b, bool):
        return math.isclose(float(a), float(b), rel_tol=rel_tol, abs_tol=1e-9)
    return a == b


def _rows_equal(a: list, b: list, rel_tol: float = 1e-9) -> bool:
    return len(a) == len(b) and all(_cells_equal(x, y, rel_tol) for x, y in zip(a, b))


def compare_rows(
    actual: list[list[Any]],
    expected: list[list[Any]],
    match: str = "exact",
    order: str = "any",
) -> str:
    """'' when rows satisfy the expectation, else a failure message."""
    if order == "strict":
        if match == "exact":
            if len(actual) != len(expected):
                return f"row count {len(actual)} != expected {len(expected)}"
            for i, (a, e) in enumerate(zip(actual, expected)):
                if not _rows_equal(a, e):
                    return f"row {i} differs: {a} != {e}"
            return ""
        # subset + strict: expected must appear in order within actual
        it = iter(actual)
        for e in expected:
            for a in it:
                if _rows_equal(a, e):
                    break
            else:
                return f"expected row not found in order: {e}"
        return ""
    # order any: multiset match
    remaining = list(actual)
    for e in expected:
        for i, a in enumerate(remaining):
            if _rows_equal(a, e):
                del remaining[i]
                break
        else:
            return f"expected row not found: {e}"
    if match == "exact" and remaining:
        return f"{len(remaining)} unexpected extra rows, first: {remaining[0]}"
    return ""


def run_unit_tests(
    spark: SparkSession, asset: Asset, rendered_query: str | None = None
) -> list[UnitTestResult]:
    """Run every unit test declared on the asset."""
    out: list[UnitTestResult] = []
    base = rendered_query if rendered_query is not None else asset.query
    for spec in asset.unit_tests:
        name = spec.get("name", "unnamed")
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

        msg = ""
        if "expected_count" in spec:
            if len(actual) != spec["expected_count"]:
                msg = f"count {len(actual)} != expected {spec['expected_count']}"
        elif "expected" in spec:
            exp = spec["expected"]
            exp_cols = exp.get("columns")
            if exp_cols:
                if [c.lower() for c in actual_cols] != [c.lower() for c in exp_cols]:
                    msg = f"columns {actual_cols} != expected {exp_cols}"
            if not msg:
                msg = compare_rows(
                    actual,
                    exp.get("rows", []),
                    match=spec.get("match", "exact"),
                    order=spec.get("order", "any"),
                )
        out.append(UnitTestResult(asset.name, name, msg == "", msg, q))
    return out
