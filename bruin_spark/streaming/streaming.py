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

import os
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
        else sorted(
            glob.glob(os.path.join(path, "*.parquet"))
            or glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
    )
    for f in candidates:
        try:
            return {fld.name for fld in pq.read_schema(f) if str(fld.type) == "timestamp[ns]"}
        except Exception:
            continue
    return set()


def kafka_reader_options(
    uri: str | None = None,
    bootstrap_servers: str | None = None,
    topic: str | None = None,
    starting_offsets: str = "earliest",
    group_id_prefix: str | None = None,
    extra: dict | None = None,
) -> dict[str, str]:
    """Spark Kafka source options from a ``kafka://host:9092/topic`` URI
    or explicit parts (ref URI grammar: pkg/ingestr/operator.go:439-454;
    the kafka source there is ``kafka://?bootstrap_servers=..&group_id=..``
    with the topic as source_table).

    Pure option construction — testable without the kafka connector jar.
    """
    servers, topic_from_uri, q = bootstrap_servers, None, {}
    if uri:
        from bruin_spark.sources.uri import normalize, parse_uri

        p = parse_uri(normalize(uri))
        if p.scheme != "kafka":
            raise ValueError(f"not a kafka URI: {uri}")
        q = p.query_dict()
        servers = p.netloc or q.get("bootstrap_servers") or servers
        topic_from_uri = p.path.lstrip("/") or None
    if not servers:
        raise ValueError("kafka source requires bootstrap servers")
    opts = {
        "kafka.bootstrap.servers": servers,
        "subscribe": topic or topic_from_uri or q.get("topic") or "",
        "startingOffsets": q.get("starting_offsets", starting_offsets),
    }
    if not opts["subscribe"]:
        raise ValueError("kafka source requires a topic (source_table)")
    gid = group_id_prefix or q.get("group_id")
    if gid:
        opts["kafka.group.id"] = gid
    for k, v in (extra or {}).items():
        opts[k] = str(v)
    return opts


def stream_kafka_source(spark: SparkSession, **kwargs) -> DataFrame:
    """``readStream.format("kafka")`` with options from
    :func:`kafka_reader_options`.  Requires the spark-sql-kafka connector
    jar on the classpath (not bundled in this container — the option
    construction and the value-parsing path are covered by tests; the
    live connection is exercised on a real cluster)."""
    opts = kafka_reader_options(**kwargs)
    reader = spark.readStream.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # pragma: no cover - depends on classpath
        raise RuntimeError(
            "kafka source requires the spark-sql-kafka-0-10 connector jar "
            "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>)"
        ) from e


def parse_kafka_json_values(df: DataFrame, value_schema: str, ts_col: str = "timestamp") -> DataFrame:
    """Decode a kafka-shaped frame (binary ``key``/``value`` + ``timestamp``)
    into typed columns: value bytes -> JSON -> struct fields, all with
    built-in expressions (JVM-side, streaming-safe)."""
    parsed = df.select(
        F.col("key").cast("string").alias("_key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        F.col(ts_col).alias("_kafka_ts"),
    )
    return parsed.select("_key", "_kafka_ts", "v.*")


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


def session_window_agg(
    stream: DataFrame,
    time_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Watermarked SESSION-window aggregation: windows extend while
    events keep arriving within ``gap`` of the previous one and close
    after a quiet period — Spark's native dynamic-gap analog of the
    batch sessionize operator (operators/relational.py).  The watermark
    bounds open-session state exactly like the tumbling-window case."""
    ts = F.col(time_col).cast("timestamp")
    w = stream.withColumn("__ts", ts).withWatermark("__ts", watermark)
    group_cols = [F.session_window("__ts", gap)] + [F.col(k) for k in (keys or [])]
    agg_exprs = (
        [F.expr(expr).alias(name) for name, expr in (aggs or {}).items()]
        if aggs
        else [F.count(F.lit(1)).alias("n_events")]
    )
    out = w.groupBy(*group_cols).agg(*agg_exprs)
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
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

    key_type = dict(stream.dtypes)[key]  # keep the caller's key type
    out_schema = f"{key} {key_type}, n_events_total bigint"
    state_schema = "n bigint"

    def update(key_tuple, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            # the timer fired with no new data: emit the final count and
            # REMOVE the state — re-arming here would keep every key's
            # state alive forever, unbounded growth the timeout exists
            # to prevent
            n = state.get[0] if state.exists else 0
            state.remove()
            yield pd.DataFrame({key: [key_tuple[0]], "n_events_total": [n]})
            return
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


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: match right events to left
    events with the same ``key`` where ``right_ts`` falls in
    ``[left_ts - within, left_ts]``.

    Both sides carry a watermark and the join condition bounds event
    time, so Spark's state store can EVICT matched/expired rows — the
    property that makes a stream-stream join runnable forever at scale
    instead of buffering both streams unboundedly.  The join itself is
    a keyed shuffle, same cost shape as a batch join on (key).
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} - INTERVAL {within}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    return l.join(r, cond, "inner")


def apply_cdc_stream(
    spark: SparkSession,
    sdf: DataFrame,
    target: str,
    pks: list[str],
    op_col: str = "op",
    ts_col: str = "",
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Apply a CDC event stream (insert/update/delete ops) onto a target
    table via ``foreachBatch`` — the apply side of the reference's CDC
    ingestion (pkg/ingestr/operator.go:229-320 produces the feed; the
    warehouse merges it; here Spark is the warehouse).

    Per micro-batch: collapse to the latest event per PK (by ``ts_col``
    when given, else by every non-PK column descending — a stable,
    content-derived tiebreaker so replays of the same batch pick the
    same row; pass ``ts_col`` whenever the feed carries event order),
    then rebuild target = (target anti-join touched PKs) ∪ upserts —
    deletes (``op = 'd'``) simply drop out.

    Crash safety: the rebuilt state is staged, then swapped via
    rename-to-backup → rename-stage-in → drop-backup, and every batch
    begins with a recovery sweep that restores the backup if a crash
    left no ``target`` and drops orphaned ``__cdc_stage_*`` /
    ``__cdc_backup_*`` tables.  The batch rebuild is idempotent
    (replaying the same micro-batch converges to the same table state),
    so with the checkpoint this is effectively-once; the metastore
    rename pair is still two statements, not one atomic commit — on
    Delta/Iceberg swap the rebuild for a real ``MERGE INTO`` per batch
    (single atomic commit) with the same plan shape (one shuffle on the
    PKs, batch side tiny).
    """
    from pyspark.sql import Window

    def _recover_and_sweep() -> None:
        """Restore target from a backup left by a mid-swap crash; drop
        orphaned stage/backup tables from failed earlier batches.
        Handles schema-qualified targets (``db.tbl``): the sweep lists
        the table's own database, and rename/drop statements stay
        qualified."""
        from bruin_spark.mat.maintenance import safe_drop, sync_partitions

        db, _, base = target.rpartition(".")
        names = {t.name for t in spark.catalog.listTables(db or None)}
        qual = (lambda n: f"{db}.{n}") if db else (lambda n: n)
        backups = sorted(n for n in names if n.startswith(f"{base}__cdc_backup_"))
        if base not in names and backups:
            spark.sql(f"ALTER TABLE {qual(backups[-1])} RENAME TO {target}")
            sync_partitions(spark, target)
            backups = backups[:-1]
        for n in backups:
            safe_drop(spark, qual(n))
        for n in names:
            if n.startswith(f"{base}__cdc_stage_"):
                safe_drop(spark, qual(n))

    def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
        # Recovery must run even for empty batches: after a mid-swap
        # crash the target exists only as a backup, and a quiet source
        # (heartbeat-only feed) would otherwise leave it missing
        # indefinitely while the stream reports healthy.
        _recover_and_sweep()
        if batch_df.isEmpty():
            return
        if ts_col:
            order = [F.col(ts_col).desc()]
        else:
            # No event-time column: break ties on the full row content so
            # the picked row is a deterministic function of the batch.
            tie_cols = [c for c in batch_df.columns if c not in pks]
            order = [F.col(c).desc() for c in tie_cols] or [F.lit(1)]
        w = Window.partitionBy(*pks).orderBy(*order)
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # a missing/NULL op is a plain insert — `op != 'd'` alone would
        # evaluate NULL and silently drop the row
        upserts = latest.filter(
            F.coalesce(F.col(op_col), F.lit("c")) != "d"
        ).drop(op_col)
        keys = latest.select(*pks)
        if not spark.catalog.tableExists(target):
            upserts.write.saveAsTable(target)
            return
        from bruin_spark.mat.maintenance import safe_swap, swap_token

        remaining = spark.table(target).join(keys, pks, "left_anti")
        new_state = remaining.unionByName(upserts)
        token = swap_token()
        stage = f"{target}__cdc_stage_{token}"
        backup = f"{target}__cdc_backup_{token}"
        # Preserve the target's partition layout on the rebuilt state —
        # and make the swap safe for partitioned targets (safe_swap
        # repairs stale per-partition locations before the backup drop;
        # dropping through them would delete the fresh data).
        part_cols = [
            c.name for c in spark.catalog.listColumns(target) if c.isPartition
        ]
        writer = new_state.write
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.saveAsTable(stage)
        safe_swap(spark, target, stage, backup)

    cp = checkpoint or tempfile.mkdtemp(prefix=f"bruin_cdc_{target}_")
    writer = sdf.writeStream.foreachBatch(apply_batch).option("checkpointLocation", cp)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def run_stream_to_table(
    sdf: DataFrame,
    table: str,
    checkpoint: str | None = None,
    output_mode: str = "append",
    available_now: bool = True,
) -> None:
    """Run a streaming DataFrame into a NAMED IN-MEMORY SINK (a
    driver-local temp view queryable as ``table``) — the
    test/inspection sink, which also supports the complete/update
    output modes the workload oracles use. It is NOT durable and does
    not recover from the checkpoint; for exactly-once delivery into a
    real catalog table use ``writeStream.toTable`` (the
    ``run_streaming_asset`` path)."""
    cp = checkpoint or tempfile.mkdtemp(prefix="bruin_ckpt_")
    writer = (
        sdf.writeStream.outputMode(output_mode)
        .option("checkpointLocation", cp)
        .format("memory")
        .queryName(table.replace(".", "_"))  # temp views cannot be dotted
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        writer.start()


#: file-stream schemes -> Spark streaming file format
_STREAM_FILE_FMTS = {
    "csv": "csv",
    "json": "json",
    "jsonl": "json",
    "ndjson": "json",
    "parquet": "parquet",
}


def run_streaming_asset(
    spark: SparkSession,
    asset,
    pipeline=None,
    available_now: bool = True,
    checkpoint: str | None = None,
) -> None:
    """Execute a streaming ingestr asset — the ``run --stream <asset>``
    path.  The reference runs streaming assets as a managed,
    never-terminating ingestr process (pkg/ingestr/operator.go:596-609;
    routed out of the batch DAG at cmd/run.go:3147-3170); on Spark the
    analog is a Structured Streaming query.  ``available_now=True``
    drains the current backlog and stops (the test / catch-up trigger);
    ``False`` leaves the query running like the reference's managed
    process.

    - file-dir sources (``json://dir``, ``csv://...``, ``parquet://...``)
      stream file-by-file with exactly-once checkpointing;
    - ``kafka://`` builds the kafka reader (connector jar + broker at
      runtime);
    - CDC assets (``scheme+cdc`` / ``cdc: true``) apply the op/upsert
      envelope onto the target via :func:`apply_cdc_stream`;
    - plain streams append into the asset's catalog table.
    """
    from bruin_spark.sources.ingest import resolve_ingestr_plan
    from bruin_spark.sources.uri import parse_uri

    uri, _strategy, params = resolve_ingestr_plan(asset, pipeline)
    if checkpoint is None:
        # exactly-once across reruns needs a STABLE checkpoint: a fresh
        # temp dir per invocation would re-read the whole source and
        # duplicate rows on every `run --stream`. Anchor it to the
        # pipeline dir (next to .bruin_state.json) when known.
        pipe_dir = getattr(pipeline, "path", "") or ""
        if pipe_dir:
            checkpoint = os.path.join(
                pipe_dir, ".bruin_checkpoints", asset.name
            )
    p = parse_uri(uri)
    base = p.scheme.split("+", 1)[0].lower()
    is_cdc = p.scheme.endswith("+cdc") or str(params.get("cdc", "")).lower() in (
        "true",
        "1",
    )

    if base == "kafka":
        # kafka_reader_options wants the plain kafka:// form (a
        # kafka+cdc:// spelling would be rejected as 'not a kafka URI')
        kp = parse_uri(uri)
        kp.scheme = "kafka"
        sdf = stream_kafka_source(
            spark, uri=kp.render(), topic=params.get("source_table")
        )
        value_schema = params.get("schema")
        if value_schema:
            # decode the binary value envelope into typed columns — the
            # CDC applier (and any typed append) needs the op/pk fields,
            # not kafka's raw bytes
            sdf = parse_kafka_json_values(sdf, value_schema).drop(
                "_key", "_kafka_ts"
            )
        elif is_cdc:
            raise ValueError(
                f"streaming CDC asset {asset.name}: kafka sources need a "
                "'schema' parameter (DDL of the op envelope) to decode "
                "the value bytes"
            )
    elif base in _STREAM_FILE_FMTS or base == "file":
        path = p.netloc + p.path
        fmt = _STREAM_FILE_FMTS.get(base) or _STREAM_FILE_FMTS.get(
            str(params.get("file_type", "")).lower(), "parquet"
        )
        sdf = stream_file_source(
            spark, path, schema=params.get("schema"), fmt=fmt
        )
    else:
        raise ValueError(
            f"{p.scheme}:// is not a streamable source; streaming assets "
            "take kafka:// or a file-directory URI (json/csv/parquet)"
        )

    if is_cdc:
        pks = (
            asset.primary_keys()
            if hasattr(asset, "primary_keys")
            else []
        ) or [str(k) for k in params.get("primary_keys", [])]
        if not pks:
            raise ValueError(
                f"streaming CDC asset {asset.name}: primary keys required "
                "(declare primary_key: true on columns)"
            )
        apply_cdc_stream(
            spark,
            sdf,
            asset.name,
            pks=pks,
            ts_col=str(params.get("incremental_key", "") or ""),
            checkpoint=checkpoint,
            available_now=available_now,
        )
        return

    cp = checkpoint or tempfile.mkdtemp(prefix=f"bruin_stream_{asset.name}_")
    writer = sdf.writeStream.outputMode("append").option("checkpointLocation", cp)
    if available_now:
        q = writer.trigger(availableNow=True).toTable(asset.name)
        q.awaitTermination()
    else:
        writer.toTable(asset.name)
