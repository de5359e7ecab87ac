"""Structured Streaming building blocks: sources, watermarked windowed
aggregation, streaming dedup, custom stateful operators.

The reference treats streaming ingestion as a managed never-terminating
ingestr process routed out of the batch DAG (pkg/ingestr/
operator.go:596-609, cmd/run.go:3147-3170). Spark-first that becomes:
``readStream`` sources → the same DataFrame transformations →
``writeStream`` with checkpoints; late data is governed by watermarks
(a design surface the reference delegates to the warehouse, SURVEY
§2.6). Everything here returns lazy streaming DataFrames; execution
(trigger/checkpoint/sink) happens in ``run_stream_to_table``.

``Trigger.AvailableNow`` gives exactly-once batch-boundary semantics for
tests and backfills: process all available input, then stop — the same
code path scales to a continuous trigger in production.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F


def stream_file_source(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source (each new file = new micro-batch input).

    Streaming sources need an explicit schema; when not given, it is
    sniffed from a one-file batch read (metadata-only for parquet).
    """
    if schema is None:
        schema_struct = spark.read.format(fmt).load(path).schema
    else:
        schema_struct = schema
    reader = spark.readStream.format(fmt).schema(schema_struct)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    sdf = reader.load(path)
    # same nanosecond-timestamp normalization as session.read_parquet:
    # under nanosAsLong, TIMESTAMP(NANOS) parquet columns surface as raw
    # nano longs — casting those to timestamp would treat them as seconds
    if fmt == "parquet":
        nano_cols = _nano_columns(path)
        for name, dtype in sdf.dtypes:
            if name in nano_cols and dtype == "bigint":
                sdf = sdf.withColumn(
                    name,
                    F.expr(f"timestamp_micros(`{name}` div 1000)").cast("timestamp_ntz"),
                )
    return sdf


def _nano_columns(path: str) -> set[str]:
    """Names of timestamp[ns] columns, from the first parquet footer found."""
    import glob
    import os

    try:
        import pyarrow.parquet as pq
    except ImportError:
        return set()
    candidates = (
        [path]
        if os.path.isfile(path)
        else sorted(glob.glob(os.path.join(path, "*.parquet")))
    )
    for f in candidates:
        try:
            return {fld.name for fld in pq.read_schema(f) if str(fld.type) == "timestamp[ns]"}
        except Exception:
            continue
    return set()


def windowed_agg(
    stream: DataFrame,
    time_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    keys: list[str] | None = None,
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation.

    ``aggs``: {output_name: "fn(col)"} — defaults to event count. The
    watermark bounds state: windows older than (max event time − delay)
    are finalized and dropped from the state store, which is what makes
    unbounded streams run in bounded memory.
    """
    ts = F.col(time_col).cast("timestamp")
    w = stream.withColumn("__ts", ts).withWatermark("__ts", watermark)
    win = F.window("__ts", window, slide) if slide else F.window("__ts", window)
    group_cols = [win] + [F.col(k) for k in (keys or [])]
    agg_exprs = (
        [F.expr(expr).alias(name) for name, expr in (aggs or {}).items()]
        if aggs
        else [F.count(F.lit(1)).alias("n_events")]
    )
    out = w.groupBy(*group_cols).agg(*agg_exprs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in (keys or [])],
        *[name for name in (aggs or {"n_events": None})],
    )


def stream_dedup(
    stream: DataFrame,
    keys: list[str],
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate events within the watermark horizon.

    State holds one entry per key seen inside the horizon; without the
    watermark the state would grow forever.
    """
    w = stream.withColumn("__ts", F.col(time_col).cast("timestamp")).withWatermark(
        "__ts", watermark
    )
    return w.dropDuplicatesWithinWatermark(keys).drop("__ts")


def stateful_running_counts(
    stream: DataFrame,
    key: str = "user_id",
    timeout_s: int | None = None,
):
    """Custom stateful operator: per-key running event count via
    applyInPandasWithState (the extension point for operators the
    built-ins can't express — reference has no analog; SURVEY §2.6
    design slot).

    Returns an 'update'-mode streaming DataFrame (key, n_events_total).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key} bigint, n_events_total bigint"
    state_schema = "n bigint"

    def update(key_tuple, pdf_iter, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        if timeout_s:
            state.setTimeoutDuration(timeout_s * 1000)
        yield pd.DataFrame({key: [key_tuple[0]], "n_events_total": [n]})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if timeout_s else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(key).applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )


def run_stream_to_table(
    sdf: DataFrame,
    table: str,
    checkpoint: str | None = None,
    output_mode: str = "append",
    available_now: bool = True,
) -> None:
    """Run a streaming DataFrame into a table and (for availableNow)
    wait for completion — exactly-once via the checkpoint."""
    cp = checkpoint or tempfile.mkdtemp(prefix=f"bruin_ckpt_{table}_")
    writer = (
        sdf.writeStream.outputMode(output_mode)
        .option("checkpointLocation", cp)
        .format("memory")
        .queryName(table)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        writer.start()
