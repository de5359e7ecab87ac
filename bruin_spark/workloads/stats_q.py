"""Statistical aggregates and sketches over the star schema.

Reference parity: bruin's quality checks and data-diff compute summary
statistics in the target warehouse (pkg/diff/stats.go renders AVG/STDDEV/
percentile probe SQL; pkg/bigquery & pkg/duckdb ship APPROX_* variants).
Here Catalyst is the warehouse:

- ``stat_price_quantiles``: EXACT linear-interpolation percentiles
  (Spark ``percentile`` == DuckDB ``quantile_cont``), oracle-paired.
- ``stat_event_user_sketch``: HyperLogLog++ ``approx_count_distinct``
  next to the exact distinct count.  Sketch values are engine-specific,
  so this entry is rows-only for the driver; the error bound itself is
  asserted in tests/test_stats.py.

Scale notes: exact percentile needs the full value multiset per group —
fine for bounded group counts (status/priority); at 100 TB per-key use
the sketch path (``approx_percentile`` / HLL) which merges map-side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from bruin_spark.session import read_parquet

    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def stat_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median and p90 of order value per order status (exact interpolated
    percentiles; both engines use rank p*(n-1) linear interpolation)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


STAT_QUANTILES_ORACLE = """
SELECT o_orderstatus,
       ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS median_price,
       ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS p90_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""


def stat_event_user_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type: HLL++ sketch next to the exact count.
    At 100 TB the sketch is the only viable path (fixed-size state, merges
    map-side, no shuffle of the full key set); the exact column here exists
    to measure the sketch's error, asserted < 5 % rsd in tests."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
    )


QUERIES = {
    "stat_price_quantiles": (stat_price_quantiles, STAT_QUANTILES_ORACLE),
    "stat_event_user_sketch": (stat_event_user_sketch, None),
}
