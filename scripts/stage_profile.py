#!/usr/bin/env python
"""Per-STAGE breakdown of a registry entry from the Spark event log.

count_jobs.py says how many stages; shuffle_bytes.py says how many
bytes crossed in total; this says WHERE the time goes — per stage:
wall (submission -> completion), summed executor run/CPU time, task
count, input / shuffle-read / shuffle-write bytes, and the stage's
callsite name.  The r15 instrument for picking optimization targets:
even in a degraded host epoch the RATIOS between stages of one run
point at the dominant stage (degradation is roughly uniform within a
session).

Usage: python scripts/stage_profile.py <entry> [entry ...]
Prints, per entry, one line per stage (sorted by executor run time)
plus an entry total, then a final JSON line keyed by entry.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: stage_profile.py <entry> [entry ...]", file=sys.stderr)
        return 2

    ev_dir = tempfile.mkdtemp(prefix="bruin_evlog_")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    prior = os.environ.get("PYSPARK_SUBMIT_ARGS", "").replace("pyspark-shell", "").strip()
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        "--conf spark.eventLog.enabled=true "
        "--conf spark.eventLog.compress=false "
        f"--conf spark.eventLog.dir=file://{ev_dir} "
        f"{prior} pyspark-shell".replace("  ", " ")
    )

    from bruin_spark.checkpointing import pinned_scope
    from bruin_spark.session import get_spark
    from bruin_spark.workloads import collect_queries

    from pyspark.sql import SparkSession

    if SparkSession.getActiveSession() is not None:
        print("stage_profile.py must own the session; run fresh", file=sys.stderr)
        return 2
    spark = get_spark("bruin_spark_stage_profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    registry = collect_queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        import difflib

        for n in unknown:
            close = difflib.get_close_matches(n, registry, n=3)
            print(f"unknown entry {n!r}; did you mean {close}?", file=sys.stderr)
        return 2
    sc = spark.sparkContext
    app_id = sc.applicationId
    for name in names:
        sc.setJobGroup(name, name)
        try:
            with pinned_scope():
                df = registry[name][0](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
        finally:
            sc._jsc.clearJobGroup()
    spark.stop()

    log_files: list[str] = []
    for p in sorted(os.listdir(ev_dir)):
        full = os.path.join(ev_dir, p)
        if app_id not in p:
            continue
        if os.path.isdir(full):
            log_files.extend(
                os.path.join(full, q)
                for q in sorted(os.listdir(full))
                if q.startswith("events_")
            )
        else:
            log_files.append(full)
    if not log_files:
        print(f"no event log under {ev_dir}", file=sys.stderr)
        return 1

    stage_group: dict[int, str] = {}
    stages: dict[str, list[dict]] = {n: [] for n in names}
    seen_stages: set[int] = set()

    def _lines():
        import io

        try:
            import zstandard
        except ImportError:
            zstandard = None
        for path in log_files:
            if path.endswith(".zstd"):
                if zstandard is None:
                    raise RuntimeError(
                        f"event log segment {path} is zstd-compressed and "
                        "the zstandard module is missing"
                    )
                with open(path, "rb") as fh:
                    reader = zstandard.ZstdDecompressor().stream_reader(fh)
                    yield from io.TextIOWrapper(reader, encoding="utf-8")
            else:
                with open(path) as fh:
                    yield from fh

    METRICS = {
        "internal.metrics.executorRunTime": "run_ms",
        "internal.metrics.executorCpuTime": "cpu_ns",
        "internal.metrics.shuffle.write.bytesWritten": "sw_bytes",
        "internal.metrics.shuffle.write.recordsWritten": "sw_recs",
        "internal.metrics.shuffle.read.localBytesRead": "sr_bytes",
        "internal.metrics.shuffle.read.remoteBytesRead": "sr_bytes",
        "internal.metrics.shuffle.read.fetchWaitTime": "fetch_ms",
        "internal.metrics.input.bytesRead": "in_bytes",
        "internal.metrics.jvmGCTime": "gc_ms",
        "internal.metrics.peakExecutionMemory": "peak_mem",
    }

    for line in _lines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        kind = ev.get("Event")
        if kind == "SparkListenerJobStart":
            grp = (ev.get("Properties") or {}).get("spark.jobGroup.id")
            if grp in stages:
                for sid in ev.get("Stage IDs", []):
                    stage_group[sid] = grp
        elif kind == "SparkListenerStageCompleted":
            si = ev.get("Stage Info", {})
            sid = si.get("Stage ID")
            grp = stage_group.get(sid)
            if grp is None or sid in seen_stages:
                continue
            if si.get("Submission Time") is None:
                continue
            seen_stages.add(sid)
            rec = {
                "stage": sid,
                "name": si.get("Stage Name", "")[:60],
                "tasks": si.get("Number of Tasks", 0),
                "wall_ms": (si.get("Completion Time") or 0)
                - (si.get("Submission Time") or 0),
            }
            for acc in si.get("Accumulables", []):
                key = METRICS.get(acc.get("Name"))
                val = acc.get("Value")
                if key and isinstance(val, int):
                    rec[key] = rec.get(key, 0) + val
            rec["cpu_ms"] = rec.pop("cpu_ns", 0) // 1_000_000
            stages[grp].append(rec)

    shutil.rmtree(ev_dir, ignore_errors=True)
    for n in names:
        rows = sorted(stages[n], key=lambda r: -r.get("run_ms", 0))
        tot_run = sum(r.get("run_ms", 0) for r in rows)
        print(f"\n== {n}: {len(rows)} stages, exec-run total {tot_run} ms")
        hdr = (
            f"{'sid':>4} {'tasks':>5} {'wall':>6} {'run':>7} {'cpu':>7} "
            f"{'gc':>5} {'fetch':>5} {'in_MB':>7} {'srd_MB':>7} {'swr_MB':>7}  name"
        )
        print(hdr)
        for r in rows:
            print(
                f"{r['stage']:>4} {r['tasks']:>5} {r['wall_ms']:>6} "
                f"{r.get('run_ms', 0):>7} {r.get('cpu_ms', 0):>7} "
                f"{r.get('gc_ms', 0):>5} {r.get('fetch_ms', 0):>5} "
                f"{r.get('in_bytes', 0) / 1e6:>7.1f} "
                f"{r.get('sr_bytes', 0) / 1e6:>7.1f} "
                f"{r.get('sw_bytes', 0) / 1e6:>7.1f}  {r['name']}"
            )
    print(json.dumps(stages))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
