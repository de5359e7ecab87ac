"""Workload registry: every entry pairs a Spark implementation with a
DuckDB oracle SQL string (the driver's correctness gate).

Each module exposes ``QUERIES: dict[str, (callable, oracle_sql | None)]``
where the callable has signature ``(spark, sf_dir) -> DataFrame``.
Column names/aliases are kept identical between both sides — the driver
sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def collect_queries() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    from bruin_spark.workloads import (
        analytics,
        datadiff,
        dedup,
        matqueries,
        multimodal_q,
        quality,
        relational_q,
        sampling_q,
        semantic_q,
        similarity,
        stats_q,
        streaming_q,
        text,
    )

    out: dict = {}
    for mod in (
        analytics,
        matqueries,
        quality,
        dedup,
        similarity,
        text,
        semantic_q,
        datadiff,
        relational_q,
        streaming_q,
        multimodal_q,
        stats_q,
        sampling_q,
    ):
        for name, pair in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate workload query name: {name}")
            out[name] = pair
    return out
