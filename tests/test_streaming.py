"""Structured Streaming tests: file source -> watermarked windows,
streaming dedup, custom stateful operator. availableNow triggers make
these deterministic batch-boundary runs."""

import shutil
import uuid

import pytest

from bruin_spark.streaming import (
    run_stream_to_table,
    stateful_running_counts,
    stream_dedup,
    stream_file_source,
    windowed_agg,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _mem_table(spark, sdf, output_mode):
    name = f"st_{uuid.uuid4().hex[:8]}"
    run_stream_to_table(sdf, name, output_mode=output_mode)
    return spark.table(name)


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # file streaming sources want a directory of files
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(EVENTS, d / "part-000.parquet")
    return str(d)


def test_windowed_agg_matches_batch(spark, events_dir):
    # update mode emits every window state; totals must equal the batch agg
    stream = stream_file_source(spark, events_dir)
    sdf = windowed_agg(stream, time_col="ts", window="1 hour", watermark="2 hours")
    got = _mem_table(spark, sdf, "update")
    from pyspark.sql import functions as F

    from bruin_spark.session import read_parquet

    batch_df = read_parquet(spark, events_dir + "/part-000.parquet")
    batch = batch_df.groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour")).count()
    assert got.count() == batch.count()
    assert got.agg(F.sum("n_events")).collect()[0][0] == batch_df.count()


def test_windowed_agg_append_withholds_open_windows(spark, events_dir):
    # append mode only emits windows finalized by the watermark — the
    # trailing windows (within 2h of max event time) stay in state
    stream = stream_file_source(spark, events_dir)
    sdf = windowed_agg(stream, time_col="ts", window="1 hour", watermark="2 hours")
    got_append = _mem_table(spark, sdf, "append")
    from pyspark.sql import functions as F

    from bruin_spark.session import read_parquet

    batch_df = read_parquet(spark, events_dir + "/part-000.parquet")
    n_batch = batch_df.groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour")).count().count()
    n_append = got_append.count()
    assert 0 < n_append < n_batch
    assert n_batch - n_append <= 3  # only the trailing ~2h of windows


def test_windowed_agg_with_keys_and_aggs(spark, events_dir):
    stream = stream_file_source(spark, events_dir)
    sdf = windowed_agg(
        stream,
        window="6 hours",
        keys=["event_type"],
        aggs={"n": "count(1)", "total_value": "round(sum(value), 4)"},
    )
    got = _mem_table(spark, sdf, "append")
    assert set(got.columns) == {"window_start", "window_end", "event_type", "n", "total_value"}
    assert got.count() > 0


def test_stream_dedup(spark, tmp_path):
    import pandas as pd

    p = tmp_path / "dup"
    p.mkdir()
    pd.DataFrame(
        {
            "id": [1, 1, 2, 2, 3],
            "ts": pd.to_datetime(["2024-01-01 10:00:00"] * 5),
        }
    ).to_parquet(p / "f.parquet")
    stream = stream_file_source(spark, str(p))
    got = _mem_table(spark, stream_dedup(stream, keys=["id"]), "append")
    assert got.count() == 3


def test_stateful_running_counts(spark, events_dir):
    stream = stream_file_source(spark, events_dir)
    sdf = stateful_running_counts(stream, key="user_id")
    got = _mem_table(spark, sdf, "update")
    batch = spark.read.parquet(events_dir).groupBy("user_id").count()
    got_rows = {r["user_id"]: r["n_events_total"] for r in got.collect()}
    for r in batch.collect():
        assert got_rows[r["user_id"]] == r["count"]
