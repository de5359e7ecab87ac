#!/usr/bin/env python
"""Dump `.explain("formatted")` for registry entries to plans/<tag>/.

Usage: python scripts/explain_dump.py <tag> [entry ...]
Writes plans/<tag>/<entry>_<suffix>.txt for every named entry (default:
the bench HEADLINE list).  <tag> is like "r14"; suffix defaults to
"before" (override with EXPLAIN_SUFFIX=after).  Building a DataFrame can
itself run jobs (BPE training collects per merge; bucketed-index entries
write their fixture) — the dump reflects the plan the bench times.

EXPLAIN_CHECKPOINT_MODE=none dumps the FULL-lineage plan instead: a
materialize() pin hides everything upstream of it behind a LogicalRDD
leaf, so a change below a pin is invisible in the default dump — mode
'none' disables pinning for the dump, exposing the whole operator
pipeline (use a distinct suffix, e.g. full_before / full_after).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SUFFIX = os.environ.get("EXPLAIN_SUFFIX", "before")


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    out_dir = os.path.join(repo, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from contextlib import nullcontext

    from bruin_spark.checkpointing import checkpoint_scope, pinned_scope
    from bruin_spark.session import get_spark
    from bruin_spark.workloads import collect_queries

    mode = os.environ.get("EXPLAIN_CHECKPOINT_MODE", "")

    def mode_ctx():  # fresh context per entry (generator CMs are one-shot)
        return checkpoint_scope(mode) if mode else nullcontext()

    spark = get_spark("bruin_spark_explain")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.debug.maxToStringFields", "10000")

    registry = collect_queries()
    if not names:
        import bench

        names = [n for n in bench.HEADLINE if n in registry]
    for name in names:
        fn, _ = registry[name]
        try:
            with mode_ctx(), pinned_scope():
                df = fn(spark, SF_DIR)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            path = os.path.join(out_dir, f"{name}_{SUFFIX}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"# wrote {path} ({len(plan)} chars)", file=sys.stderr)
        except Exception as e:
            print(f"# {name} FAILED: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
