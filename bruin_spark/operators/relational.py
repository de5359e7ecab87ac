"""Relational operators Spark lacks as single primitives: as-of join,
range join, gap sessionization.

Each is expressed as a composition of built-in DataFrame ops (the
preferred path — full codegen, AQE-aware), never a UDF:

- **as-of join** — union-then-window: tag both sides, sort each key's
  rows by time within one shuffle, carry the last right-side value
  forward with ``last(ignorenulls)``. One shuffle on the key, no range
  explosion, no per-row lookup. This is the classic distributed as-of
  plan (a sort-merge as-of): it scales with rows, not candidates².
- **range join** — equi-less interval join against a (usually tiny)
  bands table; the bands side is broadcast so the "nested loop" is an
  in-memory probe per row. For band counts at 100 TB prefer
  ``width_bucket``-style bucketize when bands are regular.
- **sessionize** — lag + running sum of gap flags per key: two window
  passes over one shuffle partitioning, then a grouped aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Fractional epoch seconds from timestamp / timestamp_ntz.

    (timestamp_ntz has no direct numeric cast; unix_micros keeps the
    microsecond fraction that unix_timestamp() would truncate.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp")) / F.lit(1000000.0)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.time <= left.time`` for the same key (backward as-of join).

    Equal timestamps match (right sorts before left at ties). Right rows
    with no following left rows are dropped; left rows with no prior
    right row keep NULLs.
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, right_time)]
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast("timestamp_ntz").alias("_rt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_lrow"].dataType).alias("_lrow"),
        F.col(right_time).cast("timestamp_ntz").alias("_rt"),
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_side",
        "_lrow",
        F.last("_rt", ignorenulls=True).over(w).alias(f"{right_time}{suffix}"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in rcols
        ],
    )
    out = carried.filter(F.col("_side") == 1)
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        f"{right_time}{suffix}",
        *[f"{c}{suffix}" for c in rcols],
    )


def range_join(
    df: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    inclusive_hi: bool = False,
) -> DataFrame:
    """Join rows to interval bands: ``lo <= value < hi`` (or <= hi).

    The bands side is broadcast — with B bands this is a B-way in-memory
    probe per row, not a shuffle. For huge band tables switch to a
    bucketize-then-equi-join plan instead.
    """
    hi_cond = (
        F.col(value_col) <= F.col(hi_col)
        if inclusive_hi
        else F.col(value_col) < F.col(hi_col)
    )
    return df.join(
        F.broadcast(bands), (F.col(value_col) >= F.col(lo_col)) & hi_cond, "inner"
    )


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    gap_seconds: float = 1800.0,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the key's previous event exceeds ``gap_seconds``.

    Adds ``session_seq`` (1-based per key). One shuffle on the key serves
    both window passes and any later per-session aggregation.
    """
    order_cols = [time_col] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order_cols)
    t = epoch_seconds(time_col)
    prev = F.lag(t).over(w)
    new_session = F.when(prev.isNull() | ((t - prev) > gap_seconds), 1).otherwise(0)
    return df.withColumn("_new", new_session).withColumn(
        "session_seq",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).drop("_new")


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    time_col: str = "ts",
    gap_seconds: float = 1800.0,
    value_col: str | None = None,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-session rollup: start/end, event count, optional value sum."""
    s = sessionize(df, key, time_col, gap_seconds, order_tiebreak)
    aggs = [
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 4).alias("total_value"))
    return s.groupBy(key, "session_seq").agg(*aggs)
