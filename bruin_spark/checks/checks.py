"""Quality checks: 9 column checks + custom checks.

Reference semantics (pkg/ansisql/checks.go:124-315, pkg/duckdb/checks.go):
every column check is a count-probe that must return 0 violations; custom
checks compare an arbitrary scalar (value mode) or a wrapped
``SELECT count(*) FROM (<q>)`` (count mode).

Scale design: the reference issues one SQL query per check. Here all
column checks of one asset are compiled into a **single aggregate pass**
(one job, one scan — conditional-count expressions fused by Catalyst into
one WholeStageCodegen stage). ``run_column_check`` remains for one-off /
DAG-node execution, and both share ``violation_expr``.

``pattern`` uses Java regex via ``rlike`` (reference platforms use POSIX;
dialect difference documented, same for all common character classes).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column as SparkCol, DataFrame, SparkSession, functions as F

from bruin_spark.model.pipeline import Asset, ColumnCheck, CustomCheck


@dataclass
class CheckResult:
    asset: str
    column: str  # "" for custom checks
    check: str
    passed: bool
    actual: Any
    expected: Any
    blocking: bool = True

    def error(self) -> str | None:
        if self.passed:
            return None
        where = f"{self.asset}.{self.column}" if self.column else self.asset
        return (
            f"check '{self.check}' on {where} failed: "
            f"expected {self.expected!r}, got {self.actual!r}"
        )


class CheckError(Exception):
    def __init__(self, results: list[CheckResult]):
        self.results = results
        super().__init__("; ".join(r.error() or "" for r in results if not r.passed))


def violation_expr(column: str, check: ColumnCheck) -> SparkCol:
    """Count-of-violations aggregate expression for one column check."""
    c = F.col(column)
    name, value = check.name, check.value
    if name == "not_null":
        cond = c.isNull()
    elif name == "unique":
        # count(c) - count(distinct c), not a row condition — special-cased
        return (F.count(c) - F.count_distinct(c)).cast("long")
    elif name == "positive":
        cond = c <= 0
    elif name == "non_negative":
        cond = c < 0
    elif name == "negative":
        cond = c >= 0
    elif name == "min":
        cond = c < F.lit(value)
    elif name == "max":
        cond = c > F.lit(value)
    elif name == "accepted_values":
        vals = [str(v) for v in (value or [])]
        cond = ~c.cast("string").isin(vals)
    elif name == "pattern":
        cond = ~c.cast("string").rlike(str(value))
    else:
        raise ValueError(f"unknown column check: {name}")
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def run_column_check(df: DataFrame, asset_name: str, column: str, check: ColumnCheck) -> CheckResult:
    actual = df.agg(violation_expr(column, check).alias("v")).collect()[0]["v"] or 0
    return CheckResult(
        asset=asset_name,
        column=column,
        check=check.name,
        passed=actual == 0,
        actual=actual,
        expected=0,
        blocking=check.blocking,
    )


def run_custom_check(spark: SparkSession, asset_name: str, check: CustomCheck) -> CheckResult:
    """value mode: scalar == value (default 0); count mode: wrapped count(*)
    == count (ref: pkg/ansisql/checks.go:283-315)."""
    if check.count is not None:
        query = f"SELECT count(*) FROM ({check.query.rstrip().rstrip(';')}) AS t"
        expected: Any = check.count
    else:
        query = check.query
        expected = check.value if check.value is not None else 0
    row = spark.sql(query).collect()
    actual = row[0][0] if row else None
    try:
        passed = float(actual) == float(expected)
    except (TypeError, ValueError):
        passed = actual == expected
    return CheckResult(
        asset=asset_name,
        column="",
        check=check.name,
        passed=passed,
        actual=actual,
        expected=expected,
        blocking=check.blocking,
    )


def run_asset_checks(
    spark: SparkSession,
    asset: Asset,
    df: DataFrame | None = None,
    raise_on_failure: bool = True,
) -> list[CheckResult]:
    """Run every declared check for an asset.

    All column checks are fused into ONE aggregation job over one scan.
    """
    if df is None:
        df = spark.table(asset.name)

    results: list[CheckResult] = []
    agg_exprs: list[SparkCol] = []
    meta: list[tuple[str, ColumnCheck]] = []
    for col in asset.columns:
        for check in col.checks:
            agg_exprs.append(violation_expr(col.name, check).alias(f"v{len(agg_exprs)}"))
            meta.append((col.name, check))

    if agg_exprs:
        row = df.agg(*agg_exprs).collect()[0]
        for i, (col_name, check) in enumerate(meta):
            actual = row[f"v{i}"] or 0
            results.append(
                CheckResult(
                    asset=asset.name,
                    column=col_name,
                    check=check.name,
                    passed=actual == 0,
                    actual=actual,
                    expected=0,
                    blocking=check.blocking,
                )
            )

    for custom in asset.custom_checks:
        results.append(run_custom_check(spark, asset.name, custom))

    failures = [r for r in results if not r.passed and r.blocking]
    if failures and raise_on_failure:
        raise CheckError(failures)
    return results
