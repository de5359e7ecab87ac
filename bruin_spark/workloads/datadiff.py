"""Data-diff workloads: per-column profile statistics with DuckDB oracles.

The oracle generator emits one UNION ALL branch per (column, stat) with
the same formulas the Spark single-pass profile computes, so values match
bit-for-bit after HALF_UP rounding on both sides.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from bruin_spark.diff import profile_long
from bruin_spark.session import read_parquet

ROUND = 4


def _profile_query(table: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = read_parquet(spark, os.path.join(sf_dir, f"{table}.parquet"))
        return profile_long(df, round_to=ROUND)

    return run


# category per column, mirroring diff._category over the driver testdata
_SCHEMAS = {
    "orders": {
        "o_orderkey": "numeric",
        "o_custkey": "numeric",
        "o_orderstatus": "string",
        "o_totalprice": "numeric",
        "o_orderdate": "datetime",
        "o_orderpriority": "string",
    },
    "part": {
        "p_partkey": "numeric",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "numeric",
        "p_retailprice": "numeric",
    },
}


def _branches(col: str, cat: str) -> list[tuple[str, str]]:
    c = col
    base = [
        ("count", f"COUNT({c})"),
        ("null_count", f"COUNT(CASE WHEN {c} IS NULL THEN 1 END)"),
    ]
    if cat == "numeric":
        base += [
            ("min", f"MIN({c})"),
            ("max", f"MAX({c})"),
            ("avg", f"AVG({c})"),
            ("sum", f"SUM({c})"),
            ("stddev", f"STDDEV_SAMP({c})"),
        ]
    elif cat == "string":
        base += [
            ("distinct_count", f"COUNT(DISTINCT {c})"),
            ("min_length", f"MIN(LENGTH({c}))"),
            ("max_length", f"MAX(LENGTH({c}))"),
            ("avg_length", f"AVG(LENGTH({c}))"),
            ("empty_count", f"COUNT(CASE WHEN LENGTH({c}) = 0 THEN 1 END)"),
        ]
    elif cat == "datetime":
        base += [
            ("earliest", f"EPOCH(MIN(CAST({c} AS TIMESTAMP)))"),
            ("latest", f"EPOCH(MAX(CAST({c} AS TIMESTAMP)))"),
            ("unique_count", f"COUNT(DISTINCT {c})"),
        ]
    return base


def _oracle(table: str) -> str:
    branches = []
    for col, cat in _SCHEMAS[table].items():
        for stat, expr in _branches(col, cat):
            branches.append(
                f"SELECT '{col}' AS column_name, '{stat}' AS stat, "
                f"ROUND(CAST({expr} AS DOUBLE), {ROUND}) AS value FROM {table}"
            )
    return " UNION ALL ".join(branches)


TOP_N = 5
_TOP_COLS = ["p_brand", "p_type", "p_name"]


def diff_top_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-string-column top-N most-common values with frequencies (the
    reference's StringStatistics MostCommon/TopNDistinct fields,
    pkg/diff/types.go:494-495).  The three columns span the cardinality
    range: p_brand ~25 distinct, p_type ~150, p_name ~unique (every
    count ties at 1 → pure value-ASC tiebreak determinism)."""
    from bruin_spark.diff import top_values

    part = read_parquet(spark, os.path.join(sf_dir, "part.parquet"))
    return top_values(part, n=TOP_N, columns=_TOP_COLS)


def _top_values_oracle() -> str:
    branches = []
    for col in _TOP_COLS:
        branches.append(
            f"""
SELECT '{col}' AS column_name, value, cnt, rank FROM (
  SELECT {col} AS value, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, {col} ASC) AS rank
  FROM part WHERE {col} IS NOT NULL GROUP BY {col}
) WHERE rank <= {TOP_N}"""
        )
    return " UNION ALL ".join(branches)


QUERIES = {
    "diff_profile_orders": (_profile_query("orders"), _oracle("orders")),
    "diff_profile_part": (_profile_query("part"), _oracle("part")),
    "diff_top_values": (diff_top_values, _top_values_oracle()),
}


def diff_rows_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff between orders and a deterministically drifted
    copy: keys %97 removed, %89 re-added under shifted keys, %53
    repriced — the same drift both engines derive, so change
    classification is value-checked."""
    from bruin_spark.diff import diff_rows
    from pyspark.sql import functions as F

    orders = read_parquet(spark, os.path.join(sf_dir, "orders.parquet"))
    a = orders
    b = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 53 == 0, F.col("o_totalprice") + 1
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 89 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10_000_000
            )
        )
    )
    return diff_rows(a, b, pks=["o_orderkey"])


DIFF_ROWS_ORACLE = """
SELECT o_orderkey, 'removed' AS change_type FROM orders WHERE o_orderkey % 97 = 0
UNION ALL
SELECT o_orderkey + 10000000 AS o_orderkey, 'added' AS change_type
FROM orders WHERE o_orderkey % 89 = 0
UNION ALL
SELECT o_orderkey, 'changed' AS change_type
FROM orders WHERE o_orderkey % 53 = 0 AND o_orderkey % 97 <> 0
"""

QUERIES["diff_rows_orders"] = (diff_rows_orders, DIFF_ROWS_ORACLE)
