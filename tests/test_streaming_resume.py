"""Streaming crash/resume e2e: a query stopped between micro-batches and
restarted from the SAME checkpoint must neither lose nor duplicate
results (r6 ask #3).  The reference runs streaming assets as a managed
never-terminating process (pkg/python/command_runner.go); Spark's analog
is checkpoint-recovered Structured Streaming, and this is the test that
the recovery path actually holds:

- windowed aggregation (the ``stream_hourly_counts`` shape) through a
  durable ``toTable`` sink, stopped after a prefix of the source files
  and drained in a second run — every closed window appears EXACTLY once;
- the foreachBatch CDC applier stopped mid-stream while RUNNING, then
  drained; plus a manufactured mid-swap crash (target renamed away to a
  backup, the state a kill between the two swap renames leaves) that the
  next batch's recovery sweep must repair.
"""

import os
import shutil
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bruin_spark.streaming import stream_file_source, windowed_agg
from bruin_spark.streaming.streaming import apply_cdc_stream


def _write_events_file(path: str, hour: int, n: int, etype: str | None = None):
    """One parquet file with n events inside [hour:00, hour:59]."""
    base = 1_700_000_000_000_000  # micros epoch anchor
    rows = {
        "ts": pa.array(
            [base + (hour * 3600 + i * 3540 // max(n - 1, 1)) * 1_000_000 for i in range(n)],
            type=pa.timestamp("us"),
        ),
        "event_type": pa.array([etype or f"et{i % 2}" for i in range(n)]),
        "value": pa.array([float(hour * 100 + i) for i in range(n)]),
    }
    pq.write_table(pa.table(rows), path)
    # the file source batches in modification-time order; same-ms writes
    # tie and can flip, and an out-of-order hour would advance the
    # watermark past earlier files' events (dropped as late -> flaky)
    t = 1_700_000_000 + hour * 10
    os.utime(path, (t, t))


def test_windowed_agg_resumes_from_checkpoint_exactly_once(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    cp = str(tmp_path / "ckpt")
    table = f"resume_counts_{uuid.uuid4().hex[:8]}"

    def run_available(phase: str):
        sdf = windowed_agg(
            stream_file_source(spark, str(src), max_files_per_trigger=1),
            time_col="ts",
            window="1 hour",
            watermark="30 minutes",
            keys=["event_type"],
            aggs={"n_events": "count(1)", "total_value": "round(sum(value), 4)"},
        )
        q = (
            sdf.writeStream.outputMode("append")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .toTable(table)
        )
        q.awaitTermination()
        return q

    try:
        # phase 1: hours 0..2 — the query drains them batch-per-file and
        # STOPS (the "between micro-batches" shutdown); watermark ends at
        # ~2:29, so hour-0 and hour-1 windows are emitted here
        for h in range(3):
            _write_events_file(str(src / f"h{h}.parquet"), hour=h, n=6)
        run_available("p1")
        phase1_rows = spark.table(table).count()
        assert phase1_rows > 0, "phase 1 must emit the closed windows"

        # phase 2: fresh query object, SAME checkpoint: hours 3..5 plus a
        # far-future sentinel that advances the watermark past everything
        for h in range(3, 6):
            _write_events_file(str(src / f"h{h}.parquet"), hour=h, n=6)
        _write_events_file(str(src / "sentinel.parquet"), hour=30, n=1, etype="sentinel")
        run_available("p2")

        # exactly-once: no (window, key) appears twice
        assert spark.table(table).count() == spark.table(table).select(
            "window_start", "event_type"
        ).distinct().count(), "duplicated window emissions after resume"

        # expected: plain batch aggregation over the six real files
        from pyspark.sql import functions as F

        exp = {
            (str(r["window_start"]), r["event_type"]): (r["n"], r["tv"])
            for r in spark.read.parquet(*[str(src / f"h{h}.parquet") for h in range(6)])
            .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("tv"))
            .collect()
        }
        got_real = {
            (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.table(table).collect()
            if r["event_type"] != "sentinel"
        }
        assert got_real == exp, "lost or corrupted window counts across resume"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def _write_cdc_file(path: str, rows: list[tuple], seq: int = 0):
    ids, vals, ops, tss = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(ids, type=pa.int64()),
                "val": pa.array(vals, type=pa.string()),
                "op": pa.array(ops, type=pa.string()),
                "ts": pa.array(tss, type=pa.int64()),
            }
        ),
        path,
    )
    # the file source orders batches by modification time; files written
    # within the same ms tie and can flip — pin a strict order
    t = 1_700_000_000 + seq * 10
    os.utime(path, (t, t))


def test_cdc_applier_stop_midstream_and_resume(spark, tmp_path):
    src = tmp_path / "cdc_src"
    src.mkdir()
    cp = str(tmp_path / "cdc_ckpt")
    target = f"cdc_resume_{uuid.uuid4().hex[:8]}"

    _write_cdc_file(
        str(src / "f1.parquet"),
        [(1, "a", "c", 1), (2, "b", "c", 2), (3, "c", "c", 3), (4, "d", "c", 4)],
        seq=1,
    )
    _write_cdc_file(
        str(src / "f2.parquet"),
        [(2, "B", "u", 5), (3, "", "d", 6), (5, "e", "c", 7)],
        seq=2,
    )
    _write_cdc_file(
        str(src / "f3.parquet"),
        [(1, "A", "u", 8), (6, "f", "c", 9), (5, "", "d", 10)],
        seq=3,
    )

    def source():
        return stream_file_source(spark, str(src), max_files_per_trigger=1)

    try:
        # phase 1: RUNNING query (no availableNow), killed after at least
        # one committed micro-batch — the mid-stream stop
        q = apply_cdc_stream(
            spark, source(), target, pks=["id"], ts_col="ts",
            checkpoint=cp, available_now=False,
        )
        deadline = time.time() + 60
        while time.time() < deadline:
            p = q.lastProgress
            if p is not None and p["batchId"] >= 1:
                break
            time.sleep(0.2)
        else:
            q.stop()
            pytest.fail("stream never committed a batch")
        q.stop()
        # the stop landed after SOME prefix of the files; the target may
        # reflect 1..3 batches — all that matters is the drain converges
        assert spark.catalog.tableExists(target)

        # phase 2: resume from the same checkpoint, drain the backlog
        apply_cdc_stream(
            spark, source(), target, pks=["id"], ts_col="ts",
            checkpoint=cp, available_now=True,
        )
        state = {r["id"]: r["val"] for r in spark.table(target).collect()}
        assert state == {1: "A", 2: "B", 4: "d", 6: "f"}, state

        # phase 3: manufactured mid-swap crash — the target has been
        # renamed to its backup and the crash hit before the stage rename
        # (the exact state safe_swap's recovery sweep exists for)
        spark.sql(f"ALTER TABLE {target} RENAME TO {target}__cdc_backup_99999999")
        assert not spark.catalog.tableExists(target)
        _write_cdc_file(str(src / "f4.parquet"), [(7, "g", "c", 11)], seq=4)
        apply_cdc_stream(
            spark, source(), target, pks=["id"], ts_col="ts",
            checkpoint=cp, available_now=True,
        )
        state = {r["id"]: r["val"] for r in spark.table(target).collect()}
        assert state == {1: "A", 2: "B", 4: "d", 6: "f", 7: "g"}, state
        # the backup was consumed by recovery, not leaked
        leftovers = [
            t.name
            for t in spark.catalog.listTables()
            if t.name.startswith(f"{target}__cdc_")
        ]
        assert leftovers == []
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {target}")
        spark.sql(f"DROP TABLE IF EXISTS {target}__cdc_backup_99999999")
