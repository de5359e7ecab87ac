#!/usr/bin/env python
"""Deterministic per-entry counters: Spark jobs / stages / tasks.

Wall time on this host swings 2-4x between invocations of identical
code (see BASELINE.md r14 re-calibration), so optimization A/Bs are
decided on counters that are invariant to host state wherever
possible.  This runs each named registry entry once under its own job
group (noop sink, same forcing as bench.py) and reports how many jobs,
stages and tasks it scheduled.

Usage: python scripts/count_jobs.py <entry> [entry ...]
Prints one JSON line: {"<entry>": {"jobs": J, "stages": S, "tasks": T}, ...}

Stages shared between jobs (skipped as already-computed) still appear
in each job's stageIds; the count is therefore an upper bound but a
CONSISTENT one across A/B runs of the same protocol.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: count_jobs.py <entry> [entry ...]", file=sys.stderr)
        return 2

    from bruin_spark.checkpointing import pinned_scope
    from bruin_spark.session import get_spark
    from bruin_spark.workloads import collect_queries

    spark = get_spark("bruin_spark_count_jobs")
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
    out: dict[str, dict[str, int]] = {}
    for name in names:
        fn, _ = registry[name]
        sc.setJobGroup(name, name)
        try:
            with pinned_scope():
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
        finally:
            sc._jsc.clearJobGroup()
        st = sc.statusTracker()
        jids = st.getJobIdsForGroup(name)
        n_stages = 0
        n_tasks = 0
        for jid in jids:
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is None:
                    continue
                n_stages += 1
                n_tasks += si.numTasks
        out[name] = {"jobs": len(jids), "stages": n_stages, "tasks": n_tasks}
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
