#!/usr/bin/env python
"""Benchmark harness: runs the headline workloads at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + count action), twice,
and the FASTER run is recorded: the first execution of a large fused
expression tree pays a one-time Janino/whole-stage-codegen compile (for
diff_profile_orders that compile is ~4-5 s while the actual sf0.1 scan
is ~1.2 s) which is a per-JVM constant, not a per-byte cost — best-of-2
measures the steady state a long-lived cluster session actually sees.
The headline metric is total wall seconds across the suite. Run a subset
with `python bench.py q1 dedup`; `--once` disables the repeat.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline suite: analytics core + one representative per workload family.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q13_customer_order_distribution",
    "q21_waiting_supplier",
    "q_window_top_customers",
    "q_rollup_sales",
    "q_events_user_activity",
    "dedup_exact_survivors",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "sim_topk_bruteforce",
    "sim_lsh_topk",
    "text_quality",
    "text_language_id",
    "text_chunks",
    "text_decontaminate",
    "sem_monthly_window",
    "rel_asof_purchase_login",
    "rel_session_stats",
    "diff_profile_orders",
    "diff_rows_orders",
    "stream_hourly_counts",
    "mm_decode",
    "dedup_clusters",
    "sim_ivf_topk",
    "emb_kmeans_step",
]


def main() -> int:
    filters = [a for a in sys.argv[1:] if not a.startswith("--")]

    from bruin_spark.session import get_spark
    from bruin_spark.workloads import collect_queries

    spark = get_spark("bruin_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warmup: absorb one-time executor/codegen/broadcast init so the timed
    # section measures steady-state query cost, not JVM spin-up.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(SF_DIR, "nation.parquet")).count()
    registry = collect_queries()
    names = [n for n in HEADLINE if n in registry]
    if filters:
        names = [n for n in registry if any(f in n for f in filters)]

    repeats = 1 if "--once" in sys.argv else 2
    timings: dict[str, float] = {}
    plan_hashes: dict[str, str] = {}
    for name in names:
        fn, _oracle = registry[name]
        spark.sparkContext.setJobDescription(f"bench:{name}")
        best, n = float("inf"), 0
        for _ in range(repeats):
            spark.catalog.clearCache()  # isolate runs from accumulated state
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        # plan fingerprint: a changed hash across rounds means the PLAN
        # changed; an unchanged hash with a changed timing means noise /
        # harness interference (this is how the r02 rel_session_stats and
        # diff_profile_orders "regressions" were root-caused as noise).
        # Catalyst exprIds (`#123`) and cached-plan object addresses are
        # session-position-dependent, so they are scrubbed before hashing
        # — otherwise the same code hashes differently every run.
        try:
            import hashlib
            import re

            plan = df._jdf.queryExecution().optimizedPlan().toString()
            plan = re.sub(r"#\d+[L]?", "#", plan)
            plan = re.sub(r"@[0-9a-f]{6,}", "@", plan)
            plan_hashes[name] = hashlib.md5(plan.encode()).hexdigest()[:10]
        except Exception:
            plan_hashes[name] = ""
        print(f"# {name}: {best:.3f}s ({n} rows) plan={plan_hashes[name]}", file=sys.stderr)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "suite_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "plan_hashes": plan_hashes,
                "sf": sf_val,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
