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


QUERIES = {
    "diff_profile_orders": (_profile_query("orders"), _oracle("orders")),
    "diff_profile_part": (_profile_query("part"), _oracle("part")),
}
