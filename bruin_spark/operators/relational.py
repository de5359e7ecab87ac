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


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    key: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    horizon_hours: int | None = 48,
) -> DataFrame:
    """First-touch ordered funnel: how many keys (users) reach each step
    of ``steps`` in order, where each step's event must be STRICTLY
    after the previous step's chosen event and (optionally) within
    ``horizon_hours`` of the first step.  Step k's chosen event is the
    earliest qualifying one (cascaded-min semantics — deterministic, so
    it is exactly expressible in both Spark and ANSI SQL).

    Returns one row per step: (step_idx 1-based, step_name, users,
    pct_of_first).  ``users`` is monotone non-increasing.

    Plan (100 TB shape): ONE shuffle.  Non-step events are filtered at
    the scan; the per-key event list (struct(ts, step_idx), sorted) is
    walked by a single JVM aggregate() pass whose state is
    (level, t1, tprev) — per-key work bounded by the key's own DISTINCT
    (ts, step) event count (exact duplicate events collapse map-side
    before the shuffle), no window functions, no cross-key ordering.
    Like sessionize/session_stats, the per-key buffer assumes
    human-scale keys; a bot key with 10^8 distinct-timestamp step
    events concentrates in one aggregation buffer — pre-filter such
    keys (or cap events per key) upstream if the corpus has them.  The step counts
    reduce to one global row (map-side combinable sums) and the K
    output rows explode from it — K is the funnel depth, a constant.
    Timestamps are compared NATIVELY (x.ts > s.tprev,
    x.ts <= s.t1 + INTERVAL) so the oracle's timestamp arithmetic
    matches bit-for-bit with no epoch-double rounding concerns.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        # A repeated event_type would map only to its FIRST index in the
        # chained WHEN below, so the duplicate step (and every later one)
        # could never be reached — reject instead of silently reporting 0.
        raise ValueError("funnel steps must be distinct event types")
    ts_type = dict(df.dtypes)[time_col]
    idx_expr = F.when(F.col(type_col) == steps[0], 0)
    for i, s in enumerate(steps[1:], start=1):
        idx_expr = idx_expr.when(F.col(type_col) == s, i)
    # NULL timestamps are excluded (the oracle's min(ts) skips NULLs; a
    # NULL-ts event would otherwise anchor t1=NULL and stall the walk).
    ev = df.filter(
        F.col(type_col).isin(list(steps)) & F.col(time_col).isNotNull()
    ).select(
        F.col(key).alias("_k"),
        F.struct(F.col(time_col).alias("ts"), idx_expr.alias("idx")).alias("_e"),
    )
    horizon_pred = (
        f"AND x.ts <= s.t1 + INTERVAL '{int(horizon_hours)}' HOUR"
        if horizon_hours is not None
        else ""
    )
    walk = F.expr(
        f"""
        aggregate(
          sort_array(evs),
          named_struct('level', 0,
                       't1', CAST(NULL AS {ts_type}),
                       'tprev', CAST(NULL AS {ts_type})),
          (s, x) -> CASE
            WHEN x.idx = s.level
                 AND (s.level = 0 OR (x.ts > s.tprev {horizon_pred}))
            THEN named_struct('level', s.level + 1,
                              't1', coalesce(s.t1, x.ts),
                              'tprev', x.ts)
            ELSE s END
        ).level
        """
    )
    # collect_SET, not list: the walk's decision depends only on
    # (ts, idx), so exact duplicate events are redundant and the set's
    # map-side partial aggregation collapses a duplicate-spamming key
    # inside each map task, keeping the plan at ONE shuffle (a distinct()
    # pre-pass would be a second exchange)
    levels = (
        ev.groupBy("_k")
        .agg(F.collect_set("_e").alias("evs"))
        .select(walk.alias("level"))
    )
    # coalesce: on step-free input `levels` is empty and sum() is NULL,
    # but a funnel count is contractually 0 (and the oracle's count(*)
    # says 0)
    counts = levels.agg(
        *[
            F.coalesce(F.sum((F.col("level") >= k).cast("long")), F.lit(0).cast("long")).alias(
                f"c{k}"
            )
            for k in range(1, len(steps) + 1)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(k).alias("step_idx"),
                F.lit(steps[k - 1]).alias("step_name"),
                F.col(f"c{k}").alias("users"),
                F.when(
                    F.col("c1") > 0, F.round(F.col(f"c{k}") / F.col("c1"), 4)
                ).alias("pct_of_first"),
            )
            for k in range(1, len(steps) + 1)
        ]
    )
    return counts.select(F.explode(rows).alias("s")).select("s.*")
