"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting handles most cases at runtime
(spark.sql.adaptive.skewJoin, on in our session); these explicit forms
cover what AQE can't: broadcast-ineligible joins against a *moderately*
large dimension with a few pathological hot keys, and high-cardinality
aggregations where one key holds a double-digit percentage of all rows.

- ``salted_join``: big side gets a random salt in [0, salts); the small
  side is replicated salts× with every salt value. The hot key's rows
  spread over `salts` reducers instead of one. Cost: small side inflated
  salts× — use only for hot keys, or keep `salts` modest.
- ``two_phase_agg``: groupBy(key, salt) partial -> groupBy(key) final.
  Only safe for decomposable aggregates (sum/count/min/max); the helper
  takes (partial, final) expression pairs to keep that explicit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, salts: int, col: str = "_salt") -> DataFrame:
    """Uniform random salt in [0, salts). Deterministic per row is NOT
    required — the salt only spreads rows, it never reaches results."""
    return df.withColumn(col, (F.rand() * salts).cast("int"))


def replicate_with_salts(df: DataFrame, salts: int, col: str = "_salt") -> DataFrame:
    """Cross the (small) side with every salt value."""
    return df.withColumn(col, F.explode(F.array(*[F.lit(i) for i in range(salts)])))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `big` has skewed join keys.

    Salt columns are internal and dropped from the result. Only inner
    and left joins are supported: under right/full outer, an unmatched
    small-side row survives once PER SALT replica — ``salts`` duplicate
    rows after the salt column drops.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r} "
            "(outer joins would duplicate unmatched small-side rows per salt)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    b = with_salt(big, salts)
    s = replicate_with_salts(small, salts)
    return b.join(s, [*keys, "_salt"], how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salts: int = 16,
) -> DataFrame:
    """Skew-resistant aggregation: partial per (key, salt), final per key.

    partial_aggs: {name: agg over source columns} (runs per key+salt)
    final_aggs:   {name: agg over the partial columns} (recombines)

    Example — count + sum + avg by a hot key:
        two_phase_agg(df, ["k"],
            {"n": F.count(F.lit(1)), "s": F.sum("v")},
            {"n": F.sum("n"), "s": F.sum("s")},
        ).withColumn("avg", F.col("s") / F.col("n"))
    """
    salted = with_salt(df, salts)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in final_aggs.items()]
    )
