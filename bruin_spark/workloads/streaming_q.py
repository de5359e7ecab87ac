"""Structured Streaming workloads.

Runs real readStream → writeStream pipelines with availableNow triggers
(single deterministic micro-batch over the sf dir's events file), then
returns the sink table. Update-mode emissions after one batch equal the
batch aggregation, so these streaming paths get REAL value oracles, not
just rows-only checks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from bruin_spark.streaming import (
    parse_kafka_json_values,
    run_stream_to_table,
    session_window_agg,
    stateful_running_counts,
    stream_dedup,
    stream_file_source,
    windowed_agg,
)


_STAGED: dict[str, str] = {}
_KAFKA_STAGED: dict[str, str] = {}


def _events_path(sf_dir: str) -> str:
    """File streaming sources need a DIRECTORY of data files; stage a
    symlink dir. A single-file source links directly; a Spark-written
    DIRECTORY source links its part files (a nested symlinked dir would
    hide them from the non-recursive file-source listing)."""
    src = os.path.join(sf_dir, "events.parquet")
    if sf_dir not in _STAGED:
        import glob
        import tempfile

        d = tempfile.mkdtemp(prefix="bruin_stream_events_")
        if os.path.isdir(src):
            for i, part in enumerate(sorted(glob.glob(os.path.join(src, "*.parquet")))):
                os.symlink(part, os.path.join(d, f"events_{i}.parquet"))
        else:
            os.symlink(src, os.path.join(d, "events.parquet"))
        _STAGED[sf_dir] = d
    return _STAGED[sf_dir]


def _run(spark: SparkSession, sdf, mode: str, name: str) -> DataFrame:
    # deterministic sink name, dropped up-front: reruns never leak tables
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    run_stream_to_table(sdf, name, output_mode=mode)
    return spark.table(name)


def stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = stream_file_source(spark, _events_path(sf_dir))
    sdf = windowed_agg(
        stream,
        time_col="ts",
        window="1 hour",
        watermark="2 hours",
        keys=["event_type"],
        aggs={"n_events": "count(1)", "total_value": "round(sum(value), 4)"},
    )
    out = _run(spark, sdf, "update", "stream_sink_hourly")
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


HOURLY_ORACLE = """
SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY 1, 2
"""


def stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = stream_file_source(spark, _events_path(sf_dir))
    sdf = stateful_running_counts(stream, key="user_id")
    return _run(spark, sdf, "update", "stream_sink_user_totals")


USER_TOTALS_ORACLE = """
SELECT user_id, COUNT(*) AS n_events_total FROM events GROUP BY user_id
"""


def stream_dedup_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = stream_file_source(spark, _events_path(sf_dir))
    deduped = stream_dedup(stream, keys=["user_id", "event_type"], time_col="ts")
    out = _run(spark, deduped, "append", "stream_sink_dedup")
    return out.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_kinds"))


DEDUP_ORACLE = """
SELECT user_id, COUNT(DISTINCT event_type) AS n_kinds FROM events GROUP BY user_id
"""


def _kafka_envelope_path(spark: SparkSession, sf_dir: str) -> str:
    """Stage events as kafka-shaped records (binary key/value + timestamp)
    so the kafka VALUE-DECODE path runs as a real stream without a broker:
    the frame matches what readStream.format(\"kafka\") yields, only the
    transport differs."""
    if sf_dir not in _KAFKA_STAGED:
        import tempfile

        from bruin_spark.session import read_parquet

        d = tempfile.mkdtemp(prefix="bruin_stream_kafka_")
        ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
        shaped = ev.select(
            F.col("user_id").cast("string").cast("binary").alias("key"),
            F.to_json(F.struct("event_id", "user_id", "event_type", "value")).cast(
                "binary"
            ).alias("value"),
            F.col("ts").cast("timestamp").alias("timestamp"),
        )
        shaped.write.mode("overwrite").parquet(d)
        _KAFKA_STAGED[sf_dir] = d
    return _KAFKA_STAGED[sf_dir]


def stream_kafka_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-envelope decode (from_json on binary values) + streaming agg:
    the parse path of a kafka ingestion, oracle-checked against the plain
    events table."""
    staged = _kafka_envelope_path(spark, sf_dir)
    stream = stream_file_source(spark, staged)
    parsed = parse_kafka_json_values(
        stream, "event_id bigint, user_id bigint, event_type string, value double"
    )
    sdf = parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
    return _run(spark, sdf, "update", "stream_sink_kafka_parse")


KAFKA_PARSE_ORACLE = """
SELECT event_type, COUNT(*)::BIGINT AS n_events, ROUND(SUM(value), 4) AS total_value
FROM events GROUP BY event_type
"""


def stream_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (dynamic gap) as a real stream; the oracle
    recomputes sessions with lag-based gap logic — cross-checking
    Spark's session_window merge semantics against plain SQL."""
    stream = stream_file_source(spark, _events_path(sf_dir))
    sdf = session_window_agg(
        stream,
        time_col="ts",
        gap="30 minutes",
        watermark="4 hours",
        keys=["user_id"],
        aggs={"n_events": "count(1)"},
    )
    out = _run(spark, sdf, "complete", "stream_sink_sessions")
    return out.select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        "n_events",
    )


# a session breaks when the gap to the previous event is >= 30 minutes
# (Spark merges an event into a session only while ts < prev_end, where
# prev_end = prev_max_ts + gap)
SESSION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS new_s
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (
           PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
         ) AS sid
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*)::BIGINT AS n_events
FROM sessions GROUP BY user_id, sid
"""


def stream_purchase_view_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join: each purchase matched to the same user's page
    views in the preceding 2 hours — the attribution-funnel shape —
    with watermark-evictable join state."""
    from bruin_spark.streaming.streaming import stream_stream_join

    purchases = stream_file_source(spark, _events_path(sf_dir)).filter(
        F.col("event_type") == "purchase"
    ).select(
        F.col("event_id").alias("p_id"),
        "user_id",
        # watermarks require TIMESTAMP (session tz = UTC, so the cast is
        # value-stable from the parquet NTZ column)
        F.col("ts").cast("timestamp").alias("p_ts"),
    )
    views = stream_file_source(spark, _events_path(sf_dir)).filter(
        F.col("event_type") == "view"
    ).select(
        F.col("event_id").alias("l_id"),
        F.col("user_id").alias("l_user"),
        F.col("ts").cast("timestamp").alias("l_ts"),
    )
    joined = stream_stream_join(
        purchases.withColumnRenamed("user_id", "key_user"),
        views.withColumnRenamed("l_user", "key_user"),
        key="key_user",
        left_ts="p_ts",
        right_ts="l_ts",
        within="2 hours",
    )
    sdf = joined.select(
        F.col("l.key_user").alias("user_id"), "p_id", "l_id"
    )
    out = _run(spark, sdf, "append", "stream_sink_pv_join")
    return out


PV_JOIN_ORACLE = """
SELECT p.user_id, p.event_id AS p_id, l.event_id AS l_id
FROM events p JOIN events l
  ON p.user_id = l.user_id
 AND p.event_type = 'purchase' AND l.event_type = 'view'
 AND l.ts >= p.ts - INTERVAL 2 HOUR AND l.ts <= p.ts
"""




_DOC_STAGED: dict[str, str] = {}


def _docs_path(sf_dir: str) -> str:
    """Staged directory for streaming the documents table (same symlink
    discipline as _events_path)."""
    src = os.path.join(sf_dir, "documents.parquet")
    if sf_dir not in _DOC_STAGED:
        import glob
        import tempfile

        d = tempfile.mkdtemp(prefix="bruin_stream_docs_")
        if os.path.isdir(src):
            for i, part in enumerate(sorted(glob.glob(os.path.join(src, "*.parquet")))):
                os.symlink(part, os.path.join(d, f"docs_{i}.parquet"))
        else:
            os.symlink(src, os.path.join(d, "documents.parquet"))
        _DOC_STAGED[sf_dir] = d
    return _DOC_STAGED[sf_dir]


def stream_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation on a STREAM: the gopher_rules operator is a map-only
    projection, so the exact same function runs unchanged on a
    streaming DataFrame in append mode — the shape of continuous
    crawl-ingest quality gating (new files -> new micro-batches ->
    per-document rule verdicts, no state, no watermark needed)."""
    from bruin_spark.operators.text import gopher_rules

    stream = stream_file_source(spark, _docs_path(sf_dir))
    sdf = gopher_rules(stream, min_words=5)
    out = _run(spark, sdf, "append", "stream_sink_gopher")
    return out


def _stream_gopher_oracle() -> str:
    from bruin_spark.workloads.text import _gopher_oracle

    return _gopher_oracle()


QUERIES = {
    "stream_hourly_counts": (stream_hourly_counts, HOURLY_ORACLE),
    "stream_purchase_view_join": (stream_purchase_view_join, PV_JOIN_ORACLE),
    "stream_session_counts": (stream_session_counts, SESSION_ORACLE),
    "stream_user_totals": (stream_user_totals, USER_TOTALS_ORACLE),
    "stream_dedup_ids": (stream_dedup_ids, DEDUP_ORACLE),
    "stream_kafka_parse": (stream_kafka_parse, KAFKA_PARSE_ORACLE),
    "stream_gopher_filter": (stream_gopher_filter, _stream_gopher_oracle()),
}
