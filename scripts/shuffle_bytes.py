#!/usr/bin/env python
"""Deterministic per-entry shuffle-byte counters from the Spark event log.

count_jobs.py answers "how many jobs/stages/tasks"; this answers "how
many bytes crossed each exchange" — the §2.3 instrument (shuffle fewer
bytes) for A/Bs where the plan shape is unchanged but the rows got
narrower (e.g. a byte-encoded enum key replacing a string).  Bytes are
as host-invariant as task counts: identical code + data produce
identical shuffle-write volumes, modulo compression-codec jitter well
under 1%.

Runs each named registry entry once under its own job group (noop
sink, same forcing as count_jobs.py) with the event log enabled, then
parses the log: JobStart events carry ``spark.jobGroup.id`` which maps
stages -> entry; StageCompleted events carry the per-stage
``Shuffle Write Metrics`` / ``Shuffle Read Metrics`` totals.

Usage: python scripts/shuffle_bytes.py <entry> [entry ...]
Prints one JSON line:
  {"<entry>": {"shuffle_write_bytes": W, "shuffle_read_bytes": R,
               "shuffle_write_records": N, "input_bytes": I}, ...}
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
        print("usage: shuffle_bytes.py <entry> [entry ...]", file=sys.stderr)
        return 2

    ev_dir = tempfile.mkdtemp(prefix="bruin_evlog_")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    # SparkSession.builder is a fresh Builder on every access, so confs
    # set on one builder instance never reach get_spark's; submit-args
    # is the one channel that survives into any builder in this process
    # PREPEND to any existing submit args (never clobber a user's
    # --driver-memory/--packages); the trailing token must stay
    # 'pyspark-shell', so strip and re-append it
    prior = os.environ.get("PYSPARK_SUBMIT_ARGS", "").replace("pyspark-shell", "").strip()
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        "--conf spark.eventLog.enabled=true "
        "--conf spark.eventLog.compress=false "  # prefer plain-text segments
        f"--conf spark.eventLog.dir=file://{ev_dir} "
        f"{prior} pyspark-shell".replace("  ", " ")
    )

    from bruin_spark.checkpointing import pinned_scope
    from bruin_spark.session import get_spark
    from bruin_spark.workloads import collect_queries

    from pyspark.sql import SparkSession

    if SparkSession.getActiveSession() is not None:
        print(
            "shuffle_bytes.py must own the session (event log is a "
            "session-construction conf); run it in a fresh process",
            file=sys.stderr,
        )
        return 2
    spark = get_spark("bruin_spark_shuffle_bytes")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    registry = collect_queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        print(
            f"unknown entries {unknown}; valid: {sorted(registry)[:10]}...",
            file=sys.stderr,
        )
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

    # parse the event log: stage -> entry via JobStart's jobGroup prop.
    # Spark 4 writes a rolling-format DIRECTORY eventlog_v2_<appId>
    # holding zstd-compressed events_N_<appId>.zstd segments.
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
    totals = {
        n: {
            "shuffle_write_bytes": 0,
            "shuffle_read_bytes": 0,
            "shuffle_write_records": 0,
            "input_bytes": 0,
        }
        for n in names
    }
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
                    # FAIL, never yield a truncated stream: an A/B
                    # consumer must see an error, not all-zero totals
                    raise RuntimeError(
                        f"event log segment {path} is zstd-compressed and "
                        "the zstandard module is missing - install it or "
                        "keep spark.eventLog.compress=false"
                    )
                with open(path, "rb") as fh:
                    reader = zstandard.ZstdDecompressor().stream_reader(fh)
                    yield from io.TextIOWrapper(reader, encoding="utf-8")
            else:
                with open(path) as fh:
                    yield from fh

    for line in _lines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        kind = ev.get("Event")
        if kind == "SparkListenerJobStart":
            grp = (ev.get("Properties") or {}).get("spark.jobGroup.id")
            if grp in totals:
                for sid in ev.get("Stage IDs", []):
                    stage_group[sid] = grp
        elif kind == "SparkListenerStageCompleted":
            si = ev.get("Stage Info", {})
            sid = si.get("Stage ID")
            grp = stage_group.get(sid)
            # skipped stages re-appear under later jobs; count once
            if grp is None or sid in seen_stages:
                continue
            if si.get("Submission Time") is None:
                continue  # skipped (reused) stage: no tasks ran
            seen_stages.add(sid)
            t = totals[grp]
            for acc in si.get("Accumulables", []):
                nm, val = acc.get("Name"), acc.get("Value")
                if not isinstance(val, int):
                    continue
                if nm == "internal.metrics.shuffle.write.bytesWritten":
                    t["shuffle_write_bytes"] += val
                elif nm == "internal.metrics.shuffle.write.recordsWritten":
                    t["shuffle_write_records"] += val
                elif nm == "internal.metrics.shuffle.read.localBytesRead":
                    t["shuffle_read_bytes"] += val
                elif nm == "internal.metrics.shuffle.read.remoteBytesRead":
                    t["shuffle_read_bytes"] += val
                elif nm == "internal.metrics.input.bytesRead":
                    t["input_bytes"] += val
    shutil.rmtree(ev_dir, ignore_errors=True)
    for n in names:
        print(f"# {n}: {totals[n]}", file=sys.stderr)
    print(json.dumps(totals))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
