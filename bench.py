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

Scale-stress section: full (unfiltered) runs also time the heaviest
training-data operators on synthetic SCALE_FACTOR/2× and SCALE_FACTOR×
copies of documents/embeddings and report the fitted growth exponent
between the two points (fixed overhead cancels; linear -> ~1,
quadratic -> ~2) — the empirical check behind the "would this survive
a 100× scale-up" design claims.
Disable with --no-scale-stress or SPARK_GRAFT_SCALE_STRESS=0.
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
    "dedup_segments",
    "dedup_incremental",
    "sim_topk_bruteforce",
    "sim_lsh_topk",
    "text_quality",
    "text_language_id",
    "text_chunks",
    "text_decontaminate",
    "text_curation_funnel",
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


#: operators whose scaling slope is worth measuring empirically: LSH
#: dedup (candidate generation), iterative connected components, IVF ANN,
#: incremental batch-vs-corpus dedup (the continuous-curation path)
SCALE_ENTRIES = [
    "dedup_minhash_lsh",
    "dedup_clusters",
    "sim_ivf_topk",
    "dedup_incremental",
    # r6: the previously-unfitted heavy tail
    "dedup_simhash_pairs",
    "dedup_segments",
    "text_curation_funnel",
    "emb_kmeans_step",
]
SCALE_FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "8"))


def _ivf_serving_stress(spark, sf_dir: str):
    """sim_ivf_topk with a FIXED 64-query batch.

    The oracle entry takes its query set from the corpus itself
    (vec_id % 100 == 0), so under the stress both |Q| and |N| grow 8x and
    the candidate count grows ~|Q|*|N|/k — super-linear BY CONSTRUCTION,
    regardless of the index. The question the stress should answer is the
    production one: does a bounded search batch stay fast as the corpus
    grows 8x? Hence a fixed deterministic batch here; the oracle entry is
    untouched.
    """
    from bruin_spark.operators import similarity as S
    from bruin_spark.workloads.similarity import (
        _emb,
        K,
        N_CENTROIDS,
        N_PROBE,
        QUERY_MOD,
    )

    emb = _emb(spark, sf_dir)
    queries = (
        emb.filter(f"vec_id % {QUERY_MOD} = 0")
        .orderBy("vec_id")
        .limit(64)
        .withColumnRenamed("vec_id", "query_id")
    )
    return S.ivf_topk(emb, queries, k=K, n_centroids=N_CENTROIDS, n_probe=N_PROBE)


#: stress-shape overrides: entries whose oracle form couples two
#: corpus-sized inputs get the production-shaped variant here
STRESS_VARIANTS = {"sim_ivf_topk": _ivf_serving_stress}

#: quality gates: iterative/approximate operators get a correctness-shaped
#: bound alongside their wall-time — a convergence or recall regression
#: can hide inside wall-time noise (the r05 dedup_clusters +8% wobble
#: was noise; these numbers would have said so directly)
CC_MAX_ROUNDS = 12  # alternating-star rounds on the bench pair graph
#: recall@K floor, 64-query batch vs exact brute force. The synthetic
#: embeddings are near-random, which caps IVF recall structurally
#: (measured 0.52-0.64 across sf0.001-0.1 at n_probe=2/8 cells ≈ 25% of
#: the corpus scanned); the gate is regression-shaped — a broken cell
#: assignment or probe ranking craters recall to ~0.1, well below this.
IVF_MIN_RECALL = 0.45


def synthetic_dag(width: int = 100, depth: int = 10):
    """width×depth layered DAG: node (d, w) depends on (d-1, w) and
    (d-1, w-1) — every layer fans in, so the frontier stays wide and the
    Tick-loop/ready-queue machinery is the thing measured. Timeouts and
    cooldowns are set on every asset so their bookkeeping (watcher
    thread, cooldown clock) is included in the per-instance overhead.
    Tier pools alternate to exercise fair-scheduler pool routing."""
    from bruin_spark.model.pipeline import Asset, Pipeline, Upstream

    assets = []
    for d in range(depth):
        for w in range(width):
            deps = []
            if d > 0:
                deps.append(f"n_{d - 1}_{w}")
                if w > 0:
                    deps.append(f"n_{d - 1}_{w - 1}")
            assets.append(
                Asset(
                    name=f"n_{d}_{w}",
                    type="noop",
                    timeout="60s",
                    rerun_cooldown=1,
                    tier=f"tier-{w % 3}",
                    depends=[Upstream(value=x) for x in deps],
                )
            )
    return Pipeline(name="sched_stress", assets=assets, concurrency=16)


def _scheduler_stress(spark) -> dict:
    """1000-asset DAG through the real Scheduler with no-op operators:
    wall time IS the scheduling overhead (build + tick + dispatch +
    timeout-watcher + state bookkeeping), reference behavior
    pkg/scheduler/scheduler.go:836-1140."""
    import threading
    import time as _time

    from bruin_spark.scheduler import Scheduler

    pipe = synthetic_dag()
    done: list[str] = []
    lock = threading.Lock()

    def noop(s, asset, ctx):
        with lock:
            done.append(asset.name)

    t0 = _time.perf_counter()
    sched = Scheduler(spark, pipe, operators={"noop": noop})
    build_s = _time.perf_counter() - t0
    t1 = _time.perf_counter()
    res = sched.run()
    run_s = _time.perf_counter() - t1
    n = len(sched.instances)
    return {
        "assets": len(pipe.assets),
        "instances": n,
        "ok": res.ok,
        "completed": len(done),
        "build_s": round(build_s, 3),
        "run_s": round(run_s, 3),
        "overhead_ms_per_instance": round(run_s / max(n, 1) * 1000, 3),
    }


def _quality_gates(spark) -> dict:
    """Round-count gate for connected components and recall@K gate for
    IVF, both on the bench inputs."""
    from bruin_spark.operators import dedup as D
    from bruin_spark.operators import similarity as S
    from bruin_spark.workloads.dedup import JACCARD_T, LSH_BANDS, MINHASH_K, NGRAM, _docs
    from bruin_spark.workloads.similarity import K, N_CENTROIDS, N_PROBE, QUERY_MOD, _emb

    out: dict = {}
    # connected-components convergence on the bench LSH pair graph
    stats: dict = {}
    pairs = D.minhash_dedup_pairs(
        _docs(spark, SF_DIR), k=MINHASH_K, bands=LSH_BANDS, n=NGRAM, threshold=JACCARD_T
    )
    D.connected_components(pairs, "id_a", "id_b", stats=stats).count()
    # rounds == 0 is a legitimate pass (empty pair graph), so test for
    # None explicitly rather than truthiness
    cc_rounds = stats.get("rounds")
    out["cc_rounds"] = {
        "rounds": cc_rounds,
        "max": CC_MAX_ROUNDS,
        "pass": cc_rounds is not None and cc_rounds <= CC_MAX_ROUNDS,
    }

    # IVF recall@K vs exact brute force on the fixed 64-query batch
    emb = _emb(spark, SF_DIR)
    queries = (
        emb.filter(f"vec_id % {QUERY_MOD} = 0")
        .orderBy("vec_id")
        .limit(64)
        .withColumnRenamed("vec_id", "query_id")
    )
    exact = S.cosine_topk(emb, queries, k=K).select("query_id", "nn_id")
    approx = S.ivf_topk(
        emb, queries, k=K, n_centroids=N_CENTROIDS, n_probe=N_PROBE
    ).select("query_id", "nn_id")
    hit = approx.join(exact, ["query_id", "nn_id"]).count()
    total = exact.count()
    recall = round(hit / total, 4) if total else 1.0
    out["ivf_recall_at_k"] = {
        "k": K,
        "n_probe": N_PROBE,
        "n_centroids": N_CENTROIDS,
        "recall": recall,
        "min": IVF_MIN_RECALL,
        "pass": recall >= IVF_MIN_RECALL,
    }
    return out


def _build_scaled_dir(spark, base_dir: str, factor: int) -> str:
    """Materialize a factor× replica of documents/embeddings, ids
    renumbered.  Replica texts are re-generated by hashing each word
    with the replica id: distinct shingle sets per replica (a replica is
    NOT a near-duplicate of its source — otherwise the stress would
    measure an 8-way-duplicated corpus, where candidate-pair OUTPUT
    grows quadratically by construction and says nothing about the
    algorithm), while within one replica the original similarity
    structure is preserved (same word -> same hash).  Cached on disk
    across bench runs."""
    from pyspark.sql import functions as F

    out = f"/tmp/bruin_scale{factor}v3_{os.path.basename(base_dir.rstrip('/'))}"
    marker = os.path.join(out, "_BUILT")
    if os.path.exists(marker):
        return out
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    hashed_words = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.substring(
                F.md5(F.concat(w, F.lit("#"), F.col("rep").cast("string"))), 1, 7
            ),
        ),
        " ",
    )
    scaled_docs = (
        docs.select("*", reps)
        .select(
            (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(hashed_words)
            .alias("text"),
            "lang",
            "source",
        )
        # recompute so replica rows stay internally consistent (hashed
        # words change the length; a stale n_chars would corrupt any
        # length-dependent operator added to SCALE_ENTRIES later)
        .withColumn("n_chars", F.length("text"))
    )
    scaled_docs.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(base_dir, "embeddings.parquet"))
    scaled_emb = emb.select("*", reps).select(
        (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
        "embedding",
        "label",
    )
    scaled_emb.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    with open(marker, "w") as f:
        f.write(str(factor))
    return out


def _stress_cache_key() -> str:
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, cwd=repo,
        ).stdout.strip()
        # uncommitted changes must invalidate the cache — a stale verdict
        # would be presented as a measurement of the edited code
        diff = subprocess.run(
            ["git", "status", "--porcelain"],
            capture_output=True, text=True, cwd=repo,
        ).stdout
        if diff.strip():
            import hashlib

            head += ":" + hashlib.md5(diff.encode()).hexdigest()[:8]
    except Exception:
        head = "nohead"
    return f"{head}:{SCALE_FACTOR}:{SF_DIR}"


def _scale_stress(spark, registry, timings: dict[str, float]) -> dict:
    """Time SCALE_ENTRIES at half-factor and factor scale and fit the
    growth exponent between the two points (``timings`` only gates which
    entries ran in the main loop).  The result is cached per
    (git state, factor, sf_dir) so repeated bench invocations in one
    round pay the ~2 min probe once and reuse the measurement."""
    import time as _time

    cache_path = "/tmp/bruin_scale_stress_cache.json"
    key = _stress_cache_key()
    try:
        with open(cache_path) as f:
            cached = json.load(f)
        if cached.get("key") == key:
            print("# scale-stress: cached result (same commit)", file=sys.stderr)
            return cached["result"]
    except Exception:
        pass

    import math as _math

    # Two scale points: fitting the growth exponent between half-factor
    # and factor (data doubles between them) cancels the fixed per-job
    # overhead that a single small-base ratio cannot separate from the
    # algorithm's own growth: linear -> 2x time, quadratic -> 4x.
    half = max(2, SCALE_FACTOR // 2)
    if half >= SCALE_FACTOR:
        print(
            f"# scale-stress: factor {SCALE_FACTOR} too small for a "
            "two-point exponent fit (need >= 4)",
            file=sys.stderr,
        )
        return {}
    dir_half = _build_scaled_dir(spark, SF_DIR, half)
    dir_full = _build_scaled_dir(spark, SF_DIR, SCALE_FACTOR)
    base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    entries = {}
    for name in SCALE_ENTRIES:
        if name not in registry or name not in timings:
            continue
        fn = STRESS_VARIANTS.get(name) or registry[name][0]
        spark.sparkContext.setJobDescription(f"bench-scale:{name}")

        def timed(sf_dir: str, factor: int) -> tuple[float, int]:
            # size shuffle parallelism to the data, as a cluster
            # operator would (AQE still coalesces downward)
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(base_parts * factor)
            )
            try:
                # MEDIAN-of-5: sub-2s measurements carry enough noise to
                # flap the fitted exponent across the verdict boundary,
                # and best-of-N is biased — one lucky fast run at the
                # HALF scale inflates the exponent by ~0.3 (measured).
                # The median is robust to a single outlier on either
                # side of the ratio.
                times, rows = [], 0
                for _ in range(5):
                    spark.catalog.clearCache()
                    t0 = _time.perf_counter()
                    rows = fn(spark, sf_dir).count()
                    times.append(_time.perf_counter() - t0)
                return sorted(times)[len(times) // 2], rows
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", str(base_parts))

        t_half, _ = timed(dir_half, half)
        t_full, n = timed(dir_full, SCALE_FACTOR)
        step = SCALE_FACTOR / half  # data growth between the two points
        exponent = _math.log(t_full / max(t_half, 1e-9)) / _math.log(step)
        # linear cost -> exponent ~1 (n log n ~1.1); quadratic -> ~2
        if exponent <= 1.3:
            verdict = "sub-linear-or-linear"
        elif exponent <= 1.8:
            verdict = "super-linear-sub-quadratic"
        else:
            verdict = "quadratic-NOT-scale-safe"
        entries[name] = {
            "t_half_s": round(t_half, 3),
            "scaled_s": round(t_full, 3),
            "half_factor": half,
            "rows": n,
            "exponent": round(exponent, 2),
            "verdict": verdict,
        }
        print(
            f"# scale-stress {name}: {t_half:.2f}s @{half}x -> {t_full:.2f}s "
            f"@{SCALE_FACTOR}x (growth exponent {exponent:.2f}): {verdict}",
            file=sys.stderr,
        )
    result = {"factor": SCALE_FACTOR, "entries": entries}
    try:
        with open(cache_path, "w") as f:
            json.dump({"key": key, "result": result}, f)
    except Exception:
        pass
    return result


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
        # exact registry names select exactly; anything else is a
        # substring ('q1' must not silently also select q10..q19)
        exact = [f for f in filters if f in registry]
        subs = [f for f in filters if f not in registry]
        names = [n for n in registry if n in exact or any(f in n for f in subs)]

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
            # higher-order-function lambda variables (`lambda x_19#`)
            # carry a session-global counter too — scrub it, or every
            # zip_with/transform-using plan hashes differently per run
            plan = re.sub(r"\blambda ([A-Za-z]+)_\d+#", r"lambda \1#", plan)
            plan_hashes[name] = hashlib.md5(plan.encode()).hexdigest()[:10]
        except Exception:
            plan_hashes[name] = ""
        print(f"# {name}: {best:.3f}s ({n} rows) plan={plan_hashes[name]}", file=sys.stderr)

    scale_stress = None
    want_stress = (
        not filters
        and "--no-scale-stress" not in sys.argv
        and os.environ.get("SPARK_GRAFT_SCALE_STRESS", "1") != "0"
    )
    if want_stress:
        try:
            scale_stress = _scale_stress(spark, registry, timings)
        except Exception as e:  # never let the stress probe sink the bench
            print(f"# scale-stress failed: {e}", file=sys.stderr)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "suite_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    # The driver captures a bounded tail of stdout and parses the last
    # line as JSON (BENCH_r04 truncated mid-line once plan_hashes +
    # scale_stress grew past the buffer). Keep the stdout contract line
    # minimal; the full diagnostics go to a sidecar file next to bench.py.
    sidecar = {**out, "plan_hashes": plan_hashes}
    if scale_stress:
        sidecar["scale_stress"] = scale_stress
    if want_stress:
        try:
            gates = _quality_gates(spark)
            sidecar["quality_gates"] = gates
            for gname, g in gates.items():
                print(f"# quality-gate {gname}: {g}", file=sys.stderr)
        except Exception as e:  # gates must never sink the bench contract
            print(f"# quality-gates failed: {e}", file=sys.stderr)
        try:
            ss = _scheduler_stress(spark)
            sidecar["scheduler_stress"] = ss
            print(f"# scheduler-stress: {ss}", file=sys.stderr)
        except Exception as e:
            print(f"# scheduler-stress failed: {e}", file=sys.stderr)
    sidecar_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_details.json"
    )
    try:
        with open(sidecar_path, "w") as f:
            json.dump(sidecar, f, indent=1)
        print(f"# full diagnostics -> {sidecar_path}", file=sys.stderr)
    except Exception as e:
        print(f"# sidecar write failed: {e}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
