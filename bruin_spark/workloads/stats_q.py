"""Statistical aggregates and sketches over the star schema.

Reference parity: bruin's quality checks and data-diff compute summary
statistics in the target warehouse (pkg/diff/stats.go renders AVG/STDDEV/
percentile probe SQL; pkg/bigquery & pkg/duckdb ship APPROX_* variants).
Here Catalyst is the warehouse:

- ``stat_price_quantiles``: EXACT linear-interpolation percentiles
  (Spark ``percentile`` == DuckDB ``quantile_cont``), oracle-paired.
- ``stat_event_user_sketch``: KMV (k-minimum-values / bottom-k) distinct
  sketch — the k smallest 32-bit md5 hash values per group, with the
  standard estimator ``(k-1) * 2^32 / kth_smallest``.  Unlike HLL
  registers (engine-specific binaries), every column here is exact
  integer arithmetic on md5, so DuckDB computes the identical sketch and
  the driver's value-hash gate applies in full.  Error bound asserted in
  tests/test_stats.py.

Scale notes: exact percentile needs the full value multiset per group —
fine for bounded group counts (status/priority); at 100 TB per-key use
the sketch path (``approx_percentile`` / HLL) which merges map-side.
The KMV distinct shuffle carries only DISTINCT hashes (map-side partial
dedupe); with billions of distinct ids add a map-only pre-filter
``hv < theta`` (theta from a cardinality prior, or adaptively from a
first micro-pass) so the shuffle carries ~k survivors per group instead
of the full distinct set — the estimator is unchanged as long as at
least k hashes survive.
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


KMV_K = 64
HASH_SPACE = 1 << 32  # first 8 md5 hex digits = uniform 32-bit hash


def kmv_sketch(
    df: DataFrame, group_cols: list[str], id_col: str, k: int = KMV_K, theta: int | None = None
) -> DataFrame:
    """KMV / bottom-k distinct sketch per group: keep the ``k`` smallest
    distinct 32-bit md5 hashes of ``id_col`` and estimate the distinct
    count as ``(k-1) * 2^32 // kth_smallest`` (exact count when fewer
    than k distinct hashes exist).

    Every output value is deterministic integer arithmetic, so any
    engine with md5 computes the identical sketch — mergeable across
    partitions/engines by unioning hash sets and re-taking the bottom k.
    Plan: the distinct on (group, hash) partially dedupes map-side, so
    the shuffle carries O(distinct) hashes, not O(rows); pass ``theta``
    (a hash-space cutoff) to pre-filter map-only down to ~k survivors
    per group when the distinct set itself is huge.
    """
    from pyspark.sql import Window

    hv = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    hashed = df.select(*group_cols, hv.alias("hv"))
    if theta is not None:
        hashed = hashed.filter(F.col("hv") < theta)
    w = Window.partitionBy(*group_cols).orderBy("hv")
    return (
        hashed.distinct()
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("hv").alias("kth_hash"))
        .select(
            *group_cols,
            "n_kept",
            "kth_hash",
            F.expr(
                f"CASE WHEN n_kept < {k} THEN n_kept "
                f"ELSE div({k - 1} * CAST({HASH_SPACE} AS BIGINT), kth_hash) END"
            ).alias("est_users"),
        )
    )


def stat_event_user_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via the KMV bottom-k sketch, next to
    the exact count (kept to expose the sketch's error, asserted in
    tests).  At 100 TB the sketch path bounds shuffle volume at
    O(distinct hashes) — or ~k per group with a theta pre-filter — while
    the exact column would shuffle the full key set."""
    ev = _t(spark, sf_dir, "events")
    sk = kmv_sketch(ev, ["event_type"], "user_id", KMV_K)
    exact = ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("exact_users"))
    return sk.join(exact, "event_type")


STAT_SKETCH_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         (('0x' || SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT) AS hv
  FROM events
), ranked AS (
  SELECT event_type, hv,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS r
  FROM h
), sk AS (
  SELECT event_type, COUNT(*) AS n_kept, MAX(hv) AS kth_hash
  FROM ranked WHERE r <= {KMV_K}
  GROUP BY event_type
), ex AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
  FROM events GROUP BY event_type
)
SELECT sk.event_type, sk.n_kept, sk.kth_hash,
       CASE WHEN sk.n_kept < {KMV_K} THEN sk.n_kept
            ELSE ({KMV_K - 1} * CAST({HASH_SPACE} AS BIGINT)) // sk.kth_hash END
         AS est_users,
       ex.exact_users
FROM sk JOIN ex ON sk.event_type = ex.event_type
"""


QUERIES = {
    "stat_price_quantiles": (stat_price_quantiles, STAT_QUANTILES_ORACLE),
    "stat_event_user_sketch": (stat_event_user_sketch, STAT_SKETCH_ORACLE),
}


def stat_doc_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length profile via the GK sketch
    (percentile_approx) — the 100 TB quantile path: map-side-combinable
    constant-size summaries per language, never a per-language sort.
    At accuracy >> n the sketch returns exactly DuckDB's quantile_disc
    element, so this is a full-hash oracle entry (same contract as
    text_ccnet_buckets_approx)."""
    import os

    from bruin_spark.session import read_parquet

    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    toks = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    return (
        docs.select("lang", toks.alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.percentile_approx("n_tokens", 0.25, 1_000_000).alias("p25_tokens"),
            F.percentile_approx("n_tokens", 0.5, 1_000_000).alias("p50_tokens"),
            F.percentile_approx("n_tokens", 0.9, 1_000_000).alias("p90_tokens"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("lang")
    )


DOC_LENGTH_PROFILE_ORACLE = """
SELECT lang,
       COUNT(*)::BIGINT AS n_docs,
       QUANTILE_DISC(n_tokens, 0.25)::INT AS p25_tokens,
       QUANTILE_DISC(n_tokens, 0.5)::INT AS p50_tokens,
       QUANTILE_DISC(n_tokens, 0.9)::INT AS p90_tokens,
       ROUND(AVG(n_tokens), 6) AS avg_tokens,
       MAX(n_tokens)::INT AS max_tokens
FROM (
  SELECT lang, len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens
  FROM documents
)
GROUP BY lang
ORDER BY lang
"""

QUERIES["stat_doc_length_profile"] = (stat_doc_length_profile, DOC_LENGTH_PROFILE_ORACLE)
