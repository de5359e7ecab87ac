"""Deterministic sampling and dataset splitting for training-data pipelines.

At 100 TB, `df.sample()` / `randomSplit()` are the wrong tools for corpus
curation: they are non-reproducible across runs/retries (task re-execution
re-draws), and can't be re-derived downstream. The standard practice is
content-addressed bucketing — hash a stable id into N buckets and carve
fractions out of the bucket space. Properties:

- **reproducible**: same id → same bucket, on any cluster, any engine
  (md5 is md5 — the DuckDB oracle computes the identical assignment);
- **map-only**: pure expression, no shuffle, fully codegen'd JVM-side;
- **consistent across tables**: hashing the same key in two datasets
  yields aligned splits (e.g. documents and their embeddings land in the
  same split without a join);
- **incremental-safe**: new data added later lands in splits at the same
  fractions without disturbing earlier assignments.

Reference parity: bruin has no sampler (its warehouses own execution);
this is part of the training-data surface this engine adds on top
(SURVEY.md §2 training-data extras).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

N_BUCKETS = 1_000_000


def hash_bucket(col: Column | str, salt: str = "", n_buckets: int = N_BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, n_buckets) from md5(salt||id).

    Uses the first 8 hex digits (32 bits) — uniform, and small enough that
    the hex→long conversion is exact in every engine's signed 64-bit int.
    """
    c = F.col(col) if isinstance(col, str) else col
    hexpart = F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8)
    return (F.conv(hexpart, 16, 10).cast("long") % n_buckets).alias("bucket")


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~`fraction` of rows, chosen by id hash (stable across runs)."""
    return df.filter(hash_bucket(id_col, salt) < int(fraction * N_BUCKETS))


def assign_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Add a `split` column partitioning rows into named fractions.

    Buckets are carved into contiguous ranges in weight order, so the
    assignment is a single chained comparison on one hash — splits are
    exhaustive and disjoint by construction.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = hash_bucket(id_col, salt)
    expr = None
    edge = 0.0
    names = list(weights)
    for name in names[:-1]:
        edge += weights[name] / total
        cond = bucket < int(edge * N_BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1])).alias("split")
    return df.withColumn("split", expr)


def stratified_quota_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    quotas: dict[str, int],
    default_quota: int = 0,
    salt: str = "quota",
) -> DataFrame:
    """Keep at most ``quotas[stratum]`` rows per stratum, chosen by hash
    rank — the training-mix shaping op ("cap English at N docs, keep all
    of the low-resource languages").

    Selection is the quota-smallest hash buckets per stratum: stable
    across runs AND monotone under growth (a kept id stays kept until
    the stratum's quota fills with smaller hashes).  Plan: one window
    (rank over bucket within stratum) — a single shuffle on the stratum
    key.  A skewed giant stratum makes that one sort task hot; for
    100 TB-scale strata pre-filter with deterministic_sample to ~quota
    size first (two-phase: cheap map-only cut, then the exact rank).
    Ties (two ids in one bucket) break on the id for determinism.
    """
    from pyspark.sql import Window

    bucket = hash_bucket(id_col, salt)
    w = Window.partitionBy(stratum_col).orderBy(bucket, F.col(id_col))
    quota_expr = None
    for stratum, q in quotas.items():
        cond = F.col(stratum_col) == stratum
        quota_expr = (
            F.when(cond, q) if quota_expr is None else quota_expr.when(cond, q)
        )
    quota_expr = (
        quota_expr.otherwise(default_quota)
        if quota_expr is not None
        else F.lit(default_quota)
    )
    return (
        df.withColumn("_qrank", F.row_number().over(w))
        .filter(F.col("_qrank") <= quota_expr)
        .drop("_qrank")
    )


def bucket_sql(id_expr: str, salt: str = "", n_buckets: int = N_BUCKETS) -> str:
    """The DuckDB-equivalent bucket expression (for oracles / warehouses
    that speak ANSI SQL) — byte-identical assignment to `hash_bucket`."""
    return (
        f"(('0x' || SUBSTR(MD5('{salt}' || CAST({id_expr} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {n_buckets})"
    )
