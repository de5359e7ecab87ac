"""Quality-check workloads: every §2.3 check kind exercised as a fused
violation scan over lineitem, oracle-matched against the reference's
probe SQL shapes (pkg/ansisql/checks.go:124-281, pkg/duckdb/checks.go).

The Spark side runs ONE aggregation for all checks (the engine's fused
plan); the oracle runs the reference's per-check COUNT probes and stacks
them — same numbers, two shapes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from bruin_spark.checks.checks import violation_expr
from bruin_spark.model.pipeline import ColumnCheck
from bruin_spark.session import read_parquet

# (check_name, column, value) — covers all nine §2.3 column check kinds
CHECKS: list[tuple[str, str, object]] = [
    ("not_null", "l_orderkey", None),
    ("unique", "l_orderkey", None),  # NOT unique in lineitem -> violations
    ("positive", "l_quantity", None),
    ("non_negative", "l_discount", None),
    ("negative", "l_tax", None),  # taxes are >= 0 -> all rows violate
    ("min", "l_quantity", 5),
    ("max", "l_quantity", 45),
    ("accepted_values", "l_returnflag", ["A", "N", "R"]),
    ("pattern", "l_linestatus", "^[OF]$"),
]


def quality_violation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per check: (check_name, column_name, violations)."""
    li = read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"))
    aggs = []
    for i, (name, col, value) in enumerate(CHECKS):
        chk = ColumnCheck(name=name, value=value)
        aggs.append(violation_expr(col, chk).cast("bigint").alias(f"v{i}"))
    row = li.agg(*aggs)
    # one stack projection over the single aggregate row: a 9-way union
    # of selects would rely on runtime exchange reuse to keep the claim
    # of one fused scan; stack expresses the unpivot in ONE plan
    stack_args = ", ".join(
        f"'{name}', '{col}', v{i}" for i, (name, col, _v) in enumerate(CHECKS)
    )
    return row.selectExpr(
        f"stack({len(CHECKS)}, {stack_args}) AS (check_name, column_name, violations)"
    )


def _probe(name: str, col: str, value) -> str:
    """The reference's probe SQL for one check (DuckDB dialect)."""
    if name == "not_null":
        return f"SELECT COUNT(*) FROM lineitem WHERE {col} IS NULL"
    if name == "unique":
        return f"SELECT COUNT({col}) - COUNT(DISTINCT {col}) FROM lineitem"
    if name == "positive":
        return f"SELECT COUNT(*) FROM lineitem WHERE {col} <= 0"
    if name == "non_negative":
        return f"SELECT COUNT(*) FROM lineitem WHERE {col} < 0"
    if name == "negative":
        return f"SELECT COUNT(*) FROM lineitem WHERE {col} >= 0"
    if name == "min":
        return f"SELECT COUNT(*) FROM lineitem WHERE {col} < {value}"
    if name == "max":
        return f"SELECT COUNT(*) FROM lineitem WHERE {col} > {value}"
    if name == "accepted_values":
        vals = ", ".join(f"'{v}'" for v in value)
        return f"SELECT COUNT(*) FROM lineitem WHERE CAST({col} AS TEXT) NOT IN ({vals})"
    if name == "pattern":
        return f"SELECT COUNT(*) FROM lineitem WHERE NOT regexp_matches({col}, '{value}')"
    raise ValueError(name)


def _oracle() -> str:
    branches = [
        f"SELECT '{name}' AS check_name, '{col}' AS column_name, ({_probe(name, col, value)})::BIGINT AS violations"
        for name, col, value in CHECKS
    ]
    return " UNION ALL ".join(branches)


QUERIES = {
    "quality_violation_counts": (quality_violation_counts, _oracle()),
}
