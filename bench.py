#!/usr/bin/env python
"""Benchmark harness: runs the headline workloads at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + full-column noop-sink
materialization - see _force), twice,
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
    "dedup_duplicate_spans",
    # r13: the PERSISTED bucketed-index layout is now the headline
    # daily-batch measurement (the unbucketed in-line variant stays in
    # the registry + skew suite); see BASELINE.md r13 note
    "dedup_spans_incr_bucketed",
    "diff_top_values",
    # r11b: BPE corpus encoding (vocab join), bigram-LM quality scoring,
    # per-group TF-IDF characteristic terms, boilerplate stripping
    "text_bpe_encode",
    "text_lm_perplexity",
    "text_tfidf_terms",
    "dedup_strip_boilerplate",
    "text_lang_segments",
    # r11c: Gopher-rule quality filter (map-only) and DSIR importance
    # weights (one corpus shuffle + broadcast bucket models)
    "text_gopher_rules",
    "text_dsir_weights",
    "text_line_filters",
    "text_ccnet_buckets",
    # r12: the window-free percentile-threshold bucketing (100 TB path)
    "text_ccnet_buckets_approx",
    # r12: image near-dup candidate pairs (pHash + Hamming banding)
    "mm_phash_pairs",
    # r12: the composed five-stage RefinedWeb curation funnel
    "text_refinedweb_funnel",
    # r12: image duplicate clusters (exact-collapse + banding + CC)
    "mm_phash_clusters",
    # r12: URL filtering (RefinedWeb stage 1; map-only)
    "text_url_filters",
    # r12: hashed linear quality classifier (train + apply)
    "text_quality_classifier",
    # r12: full BPE tokenization to id sequences
    "text_bpe_ids",
    # r12: paraphrase-robust (Jaccard) decontamination
    "text_decontaminate_fuzzy",
    # r12: A-ES weighted sampling (TakeOrderedAndProject)
    "sample_weighted_topk",
    # r12: Gopher repetition-removal table (one unified explode)
    "text_gopher_repetition",
    # r12: PQ + asymmetric-distance ANN (memory-bound path)
    "sim_pq_adc_topk",
    # r12b: readability/lexical-diversity features (map-only)
    "text_readability",
    # r12b: per-domain curation report (one groupBy, two-phase distincts)
    "text_domain_stats",
    # r12b: stupid-backoff trigram LM (trusted-slice model, broadcast
    # joins, one doc-keyed shuffle)
    "text_lm_stupid_backoff",
    # r12b: IVFADC+R — coarse cells + residual PQ + ADC + exact rerank
    "sim_ivfpq_rerank_topk",
    # r12b: DPR-style hard-negative mining on the IVF probe set
    "sim_hard_negatives",
    # r12b: GK-sketch per-language length profile (the 100 TB quantile
    # path — constant-size summaries, no per-language sort)
    "stat_doc_length_profile",
    # r12b: video copy detection (per-frame pHash, df-capped overlap)
    "mm_video_frame_dedup",
    # r12b: asymmetric containment pairs (overlap prefix filter)
    "dedup_containment",
    # r12b: batched per-query BM25 + RRF hybrid retrieval
    "text_bm25_multi",
    "text_hybrid_rrf",
    # r12b: UniMax epoch-schedule draw (two-phase remainder selection)
    "sample_unimax_draw",
    # r12b: length-bucketed padding-waste report (map-only + tiny agg)
    "text_padding_waste",
    # r12b: margin-based bitext mining (CCMatrix criterion)
    "sim_bitext_margin",
    # r13: HTML main-content extraction (stage 0 of web curation;
    # map-only JVM projection)
    "text_html_extract",
    # r13: crawl-level URL dedup (canonicalization + two-phase distinct)
    "text_url_dedup",
    # r13: D4 prototype pruning (broadcast argmax + GK quantile per cluster)
    "emb_d4_prune",
    # r14: fixed-vocab fertility comparison (the one r13 entry that had
    # no headline row — verdict ask; ADDED entry, never renames/removes)
    "text_fertility_fixed_vocab",
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

#: entries whose 4x->8x exponent sits near the linear boundary (0.85 on a
#: two-point fit that cannot see curvature): they get a THIRD point at
#: 16x, and the 8x->16x segment exponent is gated at 1.05 — if the curve
#: is bending upward, the last segment is where it shows
THREE_POINT_ENTRIES = {"dedup_minhash_lsh", "dedup_incremental"}
THREE_POINT_FACTOR = 16
THREE_POINT_MAX = 1.05


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
#: recall@K floor on the PLANTED Gaussian-mixture fixture, where true
#: neighbors are in-cluster by construction (r8 verdict ask: the
#: near-random corpus gate above is a weak regression detector — a
#: subtle cell-assignment bug could still pass 0.45). On separable
#: data a correct IVF must recover essentially all true neighbors;
#: measured 1.0, gated with margin for fixture tweaks.
IVF_PLANTED_MIN_RECALL = 0.9


def planted_mixture_embeddings(spark, n: int = 4096, n_clusters: int = 8, dim: int = 32):
    """Deterministic Gaussian-mixture embeddings: unit-norm cluster
    centers, sigma 0.08 noise — small against O(1) center separation,
    so each vector's true nearest neighbors are in-cluster by
    construction.  Fixed RandomState(42) keeps the fixture identical
    across runs (a recall change is a code change, never data noise)."""
    import numpy as np

    rng = np.random.RandomState(42)
    centers = rng.normal(0, 1, (n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = centers[np.arange(n) % n_clusters] + rng.normal(0, 0.08, (n, dim))
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


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


#: wall-clock ceiling for the failure-injection run. 300 no-op
#: instances cost ~1 s of pure scheduling; add ~2 s of rerun_cooldown
#: waits (20 flaky × 1 s across 16 workers), two 0.4 s timeout joins
#: and retry round-trips. 25 s only trips if a failure path serializes
#: the DAG (e.g. cooldown blocking dispatch instead of one worker).
FAILURE_STRESS_MAX_WALL_S = 25.0

# injected-failure placement in the width-50 × depth-6 DAG (layer, w).
# All failure roots sit where no OTHER root's descendant cone reaches
# them, so each injected behavior actually executes (an UPSTREAM_FAILED
# main never runs its operator).
FLAKY = {f"n_1_{w}" for w in range(20)}  # fail attempt 1, succeed attempt 2
TIMEOUT_ASSETS = {"n_2_30", "n_2_31"}  # sleep past a 0.4s timeout:
HARDFAIL = {"n_2_40", "n_2_41"}  # fail every attempt
WARN_CHECK_ASSET = "n_0_45"  # failing NON-blocking custom check
BLOCK_CHECK_ASSET = "n_0_48"  # failing BLOCKING custom check


def synthetic_failure_dag(width: int = 50, depth: int = 6):
    """Same layered fan-in DAG shape as :func:`synthetic_dag`, with the
    failure classes of reference pkg/scheduler/scheduler_test.go
    (TestScheduler_WillRunTaskAgain..., MarkTasksAsUpstreamFailed,
    checks-blocking semantics) injected at known coordinates."""
    from bruin_spark.model.pipeline import Asset, CustomCheck, Pipeline, Upstream

    assets = []
    for d in range(depth):
        for w in range(width):
            deps = []
            if d > 0:
                deps.append(f"n_{d - 1}_{w}")
                if w > 0:
                    deps.append(f"n_{d - 1}_{w - 1}")
            name = f"n_{d}_{w}"
            a = Asset(
                name=name,
                type="noop",
                # flaky assets carry a real cooldown so the retry-delay
                # clock is measured; everything else retries immediately
                rerun_cooldown=1 if name in FLAKY else -1,
                timeout="0.4s" if name in TIMEOUT_ASSETS else "60s",
                tier=f"tier-{w % 3}",
                depends=[Upstream(value=x) for x in deps],
            )
            if name == WARN_CHECK_ASSET:
                # SELECT 1 against expected 0: fails deterministically,
                # needs no table. Non-blocking => warn-only.
                a.custom_checks = [
                    CustomCheck(name="warn_probe", query="SELECT 1", value=0, blocking=False)
                ]
            elif name == BLOCK_CHECK_ASSET:
                a.custom_checks = [
                    CustomCheck(name="gate_probe", query="SELECT 1", value=0, blocking=True)
                ]
            assets.append(a)
    return Pipeline(name="sched_failure_stress", assets=assets, concurrency=16)


def expected_failure_states(width: int = 50, depth: int = 6) -> dict:
    """Forward-propagate the injected failures through the DAG edges to
    the exact expected final status of every MAIN instance. A blocking
    failed check gates the check-owner's downstreams (not the owner
    itself); FAILED and UPSTREAM_FAILED both propagate."""
    exp: dict[str, str] = {}
    for d in range(depth):
        for w in range(width):
            name = f"n_{d}_{w}"
            parents = []
            if d > 0:
                parents.append(f"n_{d - 1}_{w}")
                if w > 0:
                    parents.append(f"n_{d - 1}_{w - 1}")
            gated = any(
                exp[p] in ("failed", "upstream_failed") or p == BLOCK_CHECK_ASSET
                for p in parents
            )
            if gated:
                exp[name] = "upstream_failed"
            elif name in TIMEOUT_ASSETS or name in HARDFAIL:
                exp[name] = "failed"
            else:
                exp[name] = "succeeded"
    return exp


def _scheduler_failure_stress(spark) -> dict:
    """Failure-injection stress (r8 verdict ask #7): the 300-asset DAG
    run with retries=1 and every failure class live at width — flaky
    assets that succeed on attempt 2 after an honored rerun_cooldown,
    per-attempt timeouts that are never retried, hard failures that
    exhaust retries, a warn-only failed check that must not gate, and a
    blocking failed check that must. Asserts the EXACT final status of
    all 300 mains against a forward-propagated expectation, plus
    attempt counts, cooldown clocks, and a wall-clock ceiling."""
    import threading
    import time as _time

    from bruin_spark.scheduler import Scheduler

    pipe = synthetic_failure_dag()
    exp = expected_failure_states()
    lock = threading.Lock()
    attempts_seen: dict[str, int] = {}

    def noop(s, asset, ctx):
        with lock:
            attempts_seen[asset.name] = attempts_seen.get(asset.name, 0) + 1
            nth = attempts_seen[asset.name]
        if asset.custom_checks:
            # the fused check scan reads spark.table(asset.name)
            # unconditionally — materialize a real 1-row view so the
            # custom checks evaluate their VALUE probes (SELECT 1 vs 0),
            # not a TABLE_OR_VIEW_NOT_FOUND analysis error
            s.range(1).createOrReplaceTempView(asset.name)
        if asset.name in TIMEOUT_ASSETS:
            _time.sleep(2.0)  # watcher fires at 0.4s; abandoned thread is daemon
        elif asset.name in HARDFAIL:
            raise RuntimeError(f"injected hard failure: {asset.name}")
        elif asset.name in FLAKY and nth == 1:
            raise RuntimeError(f"injected flaky failure: {asset.name}")

    sched = Scheduler(spark, pipe, operators={"noop": noop}, retries=1)
    t0 = _time.perf_counter()
    res = sched.run()
    run_s = _time.perf_counter() - t0

    mains = {i.id: i for i in sched.instances.values() if ":" not in i.id}
    actual = {name: inst.status.value for name, inst in mains.items()}
    mismatches = sorted(n for n in exp if actual.get(n) != exp[n])

    flaky_insts = [mains[n] for n in sorted(FLAKY)]
    checks = {
        "states_exact_match": not mismatches,
        "flaky_all_succeeded": all(i.status.value == "succeeded" for i in flaky_insts),
        # attempts counts the FAILED tries (incremented in the except
        # path only), so a fail-once-then-succeed instance shows 1
        "flaky_retried_once": all(i.attempts == 1 for i in flaky_insts),
        # duration_s accumulates across attempts INCLUDING the cooldown
        # wait, so >= the 1s rerun_cooldown proves the clock ran
        "flaky_cooldown_honored": all(i.duration_s >= 1.0 for i in flaky_insts),
        "timeout_failed_never_retried": all(
            mains[n].status.value == "failed"
            and mains[n].attempts == 1
            and "timed out" in (mains[n].error or "")
            for n in TIMEOUT_ASSETS
        ),
        "hardfail_exhausted_retries": all(
            mains[n].status.value == "failed" and mains[n].attempts == 2 for n in HARDFAIL
        ),
        "warn_check_failed_not_gating": (
            f"{WARN_CHECK_ASSET}:custom:warn_probe" in res.failed
            and f"{WARN_CHECK_ASSET}:custom:warn_probe" in res.warn_only_failed
            and actual[f"n_1_{int(WARN_CHECK_ASSET.rsplit('_', 1)[1])}"] == "succeeded"
        ),
        "blocking_check_failed_and_gating": (
            f"{BLOCK_CHECK_ASSET}:custom:gate_probe" in res.failed
            and f"{BLOCK_CHECK_ASSET}:custom:gate_probe" not in res.warn_only_failed
        ),
        "run_not_ok": not res.ok,  # blocking failures must sink the run
        "wall_bounded": run_s <= FAILURE_STRESS_MAX_WALL_S,
    }
    by_status: dict[str, int] = {}
    for v in actual.values():
        by_status[v] = by_status.get(v, 0) + 1
    return {
        "assets": len(pipe.assets),
        "instances": len(sched.instances),
        "run_s": round(run_s, 3),
        "wall_bound_s": FAILURE_STRESS_MAX_WALL_S,
        "status_counts": by_status,
        "expected_counts": {
            s: sum(1 for v in exp.values() if v == s)
            for s in ("succeeded", "failed", "upstream_failed")
        },
        "mismatches": mismatches[:10],
        **checks,
        "ok": all(checks.values()),
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

    # planted Gaussian mixture: true neighbors in-cluster by
    # construction — a correct IVF recovers ~all of them; the
    # near-random corpus above is kept as the noise-floor case
    emb_p = planted_mixture_embeddings(spark)
    queries_p = emb_p.filter("vec_id % 64 = 0").withColumnRenamed("vec_id", "query_id")
    exact_p = S.cosine_topk(emb_p, queries_p, k=K).select("query_id", "nn_id")
    approx_p = S.ivf_topk(
        emb_p, queries_p, k=K, n_centroids=8, n_probe=2
    ).select("query_id", "nn_id")
    hit_p = approx_p.join(exact_p, ["query_id", "nn_id"]).count()
    total_p = exact_p.count()
    recall_p = round(hit_p / total_p, 4) if total_p else 0.0
    out["ivf_recall_planted"] = {
        "k": K,
        "n_probe": 2,
        "n_centroids": 8,
        "recall": recall_p,
        "min": IVF_PLANTED_MIN_RECALL,
        "pass": recall_p >= IVF_PLANTED_MIN_RECALL,
    }

    # centroid-count SCALING gate (r10 verdict ask #7): the two gates
    # above run at fixed n_centroids=8 at every scale, but the real
    # 100 TB knob is n_centroids ~ √N with a probe count that keeps the
    # scanned fraction sublinear.  16× the planted fixture (65536
    # vectors, 64 true clusters), √N = 256 centroids, n_probe 16 (6% of
    # cells scanned): a correct assign/probe ranking still recovers
    # essentially all in-cluster true neighbors (measured 1.0).
    n_sc = 65536
    emb_s = planted_mixture_embeddings(spark, n=n_sc, n_clusters=64)
    queries_s = emb_s.filter("vec_id % 1024 = 0").withColumnRenamed(
        "vec_id", "query_id"
    )
    exact_s = S.cosine_topk(emb_s, queries_s, k=K).select("query_id", "nn_id")
    approx_s = S.ivf_topk(
        emb_s, queries_s, k=K, n_centroids=256, n_probe=16
    ).select("query_id", "nn_id")
    hit_s = approx_s.join(exact_s, ["query_id", "nn_id"]).count()
    total_s = exact_s.count()
    recall_s = round(hit_s / total_s, 4) if total_s else 0.0
    out["ivf_recall_scaled"] = {
        "k": K,
        "n": n_sc,
        "n_probe": 16,
        "n_centroids": 256,
        "recall": recall_s,
        "min": IVF_PLANTED_MIN_RECALL,
        "pass": recall_s >= IVF_PLANTED_MIN_RECALL,
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

    # same generator-source cache key as _build_skewed_dir: corpus-shape
    # edits must invalidate the materialized data automatically
    import hashlib
    import inspect

    gen_ver = hashlib.md5(
        inspect.getsource(_build_scaled_dir).encode()
    ).hexdigest()[:8]
    out = (
        f"/tmp/bruin_scale{factor}g{gen_ver}_"
        f"{os.path.basename(base_dir.rstrip('/'))}"
    )
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


def _build_skewed_dir(spark, base_dir: str, factor: int) -> str:
    """Materialize a factor× ZIPF-SKEWED documents corpus: one text
    cluster owns ~20% of rows (identical texts — crawl boilerplate
    shape), ~20 medium clusters own 0.5% each, ~300 small clusters own
    0.05% each, the rest are unique.  The ``lang`` column is skewed the
    same way ('en' ≈ 20% of rows) so stratified sampling sees a hot
    stratum.  Everything is derived from deterministic md5 of the doc
    id, so the corpus is identical across runs and cacheable on disk.

    This is the input uniform-key replication cannot produce: LSH band
    buckets, segment hashes, CC star roots, and sampling strata all get
    one dominant key — the distribution that actually breaks naive
    plans at 100 TB.
    """
    from pyspark.sql import functions as F

    # the on-disk corpus is keyed on a hash of THIS generator's source:
    # editing the corpus shape automatically invalidates the materialized
    # data (previously a hand-bumped version tag, which could silently
    # re-measure a new shape against a stale corpus)
    import hashlib
    import inspect

    gen_ver = hashlib.md5(
        inspect.getsource(_build_skewed_dir).encode()
    ).hexdigest()[:8]
    out = (
        f"/tmp/bruin_skew{factor}g{gen_ver}_"
        f"{os.path.basename(base_dir.rstrip('/'))}"
    )
    marker = os.path.join(out, "_BUILT")
    if os.path.exists(marker):
        return out
    base = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    n_base = base.count()
    n = n_base * factor
    # near-dup families are FIXED SIZE (~8) with count ∝ n: true near-dup
    # pair output stays linear in n (pair lists within a family are
    # quadratic in FAMILY size, which does not grow)
    n_fam = max(1, int(n * 0.25 / 8))
    ids = spark.range(n).select(F.col("id").alias("doc_id"))

    def hashu(salt: str):  # uniform [0, 1) from the doc id
        hexpart = F.substring(
            F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))), 1, 8
        )
        return F.conv(hexpart, 16, 10).cast("double") / float(16**8)

    u = hashu("cl#")
    # cluster id: 0 = the hot identical-text cluster (20% of rows);
    # 1..n_fam = near-dup families (~25% of rows); -1 = unique tail
    cluster = (
        F.when(u < 0.20, F.lit(0).cast("long"))
        .when(u < 0.45, (1 + F.floor((u - 0.20) / 0.25 * n_fam)).cast("long"))
        .otherwise(F.lit(-1).cast("long"))
    )
    vary_pos = (F.col("doc_id") % 48).cast("int")

    def word(seed) -> "F.Column":
        return F.substring(F.md5(seed), 1, 7)

    # hot cluster: byte-identical text.  families: family base words with
    # ONE position replaced per doc (byte-distinct, Jaccard ~0.88 at
    # n=3 — candidates in ~97% of band draws, verified near-dups).
    # tail: fully unique words, except ~30% of tail docs open with the
    # SAME 8-word boilerplate prefix — a shingle shared by ~16% of the
    # corpus, the hot posting list that blows up a naive inverted-index
    # similarity join (prefix filtering must shed it).
    u3 = hashu("bp#")
    is_bp = (F.col("_c") == -1) & (u3 < 0.30)
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(47)),
            lambda j: F.when(
                F.col("_c") == 0,
                word(F.concat(F.lit("hot#"), j.cast("string"))),
            )
            .when(
                (F.col("_c") > 0) & (j == F.col("_vp")),
                word(F.concat(F.lit("v#"), F.col("doc_id").cast("string"))),
            )
            .when(
                F.col("_c") > 0,
                word(F.concat(F.lit("f"), F.col("_c").cast("string"), F.lit("#"), j.cast("string"))),
            )
            .when(
                is_bp & (j < 8),
                word(F.concat(F.lit("bp#"), j.cast("string"))),
            )
            .otherwise(
                word(F.concat(F.lit("u#"), F.col("doc_id").cast("string"), F.lit("#"), j.cast("string")))
            ),
        ),
        " ",
    )

    u2 = hashu("lg#")
    docs = ids.select("doc_id", cluster.alias("_c"), vary_pos.alias("_vp")).select(
        "doc_id",
        text.alias("text"),
        F.when(u2 < 0.20, "en")
        .when(u2 < 0.28, "es")
        .otherwise(F.concat(F.lit("l"), F.floor(u2 * 50).cast("string")))
        .alias("lang"),
        F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text"))
    docs.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    # HOT-CENTROID embeddings (r14 verdict ask #5): the uniform corpus
    # has no skewed vector table, so emb_d4_prune never saw a dominant
    # cluster.  Rows 0..7 are exact cluster prototypes (the operator's
    # deterministic_centroids picks the 8 lowest vec_ids); ~20% of the
    # remaining rows sit in a tight ball around prototype 0 (one
    # centroid owns a fifth of the corpus — the hot-cluster shape) and
    # the rest spread over prototypes 1..7.  Deterministic md5-derived
    # floats; jitter 0.02 keeps assignment unambiguous while making
    # every proto_cos distinct.
    n_emb_base = spark.read.parquet(
        os.path.join(base_dir, "embeddings.parquet")
    ).count()
    n_emb = n_emb_base * factor
    eids = spark.range(n_emb).select(F.col("id").alias("vec_id"))
    ue = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ecl#"), F.col("vec_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("double") / float(16**8)
    ue2 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ecs#"), F.col("vec_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("double") / float(16**8)
    ecl = (
        F.when(F.col("vec_id") < 8, F.col("vec_id"))
        .when(ue < 0.20, F.lit(0))
        .otherwise(1 + F.floor(ue2 * 7))
    ).cast("long")
    eps = F.when(F.col("vec_id") < 8, F.lit(0.0)).otherwise(F.lit(0.02))
    emb_expr = F.expr(
        """
        transform(sequence(0, 63), j -> cast(
          (conv(substring(md5(concat('eb#', cast(_ec as string), '#', cast(j as string))), 1, 8), 16, 10) / 4294967296.0 - 0.5)
          + _eps * (conv(substring(md5(concat('ej#', cast(vec_id as string), '#', cast(j as string))), 1, 8), 16, 10) / 4294967296.0 - 0.5)
        as float))
        """
    )
    emb = eids.select(
        "vec_id", ecl.alias("_ec"), eps.alias("_eps")
    ).select(
        "vec_id",
        emb_expr.alias("embedding"),
        (F.col("vec_id") % 16).cast("int").alias("label"),
    )
    emb.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    with open(marker, "w") as f:
        f.write(str(factor))
    return out


def _minhash_rep_pairs_stress(spark, sf_dir: str):
    """Production-shaped minhash-LSH pairs under duplicate skew: pairs
    among DISTINCT texts (exact groups collapsed first).  The oracle
    entry's all-member pair output is quadratic BY CONSTRUCTION when one
    text owns 20% of the corpus ((0.2n choose 2) true pairs) — no
    algorithm changes that; production pipelines run exact dedup first
    and near-dup on the survivors, which is the path measured here."""
    from bruin_spark.operators import dedup as D
    from bruin_spark.workloads.dedup import JACCARD_T, LSH_BANDS, MINHASH_K, NGRAM, _docs

    reps = D.collapse_exact_texts(_docs(spark, sf_dir))
    return D.minhash_dedup_pairs(
        reps, k=MINHASH_K, bands=LSH_BANDS, n=NGRAM, threshold=JACCARD_T
    )


def _ngram_rep_pairs_stress(spark, sf_dir: str):
    """Prefix-filtered exact-Jaccard pairs among distinct texts: the
    exact-collapse pre-pass removes identical-doc skew (inherently
    quadratic OUTPUT), so what this measures is the prefix filter
    shedding the hot boilerplate posting list — the naive inverted
    index's quadratic blowup."""
    from bruin_spark.operators import dedup as D
    from bruin_spark.workloads.dedup import JACCARD_T, NGRAM, _docs

    reps = D.collapse_exact_texts(_docs(spark, sf_dir))
    return D.ngram_jaccard_pairs(reps, n=NGRAM, threshold=JACCARD_T)


def _bm25_multi_fixed_queries_stress(spark, sf_dir: str):
    """Batched BM25 under Zipf token skew with a FIXED 5-query batch:
    the workload entry derives its query set from the corpus (query
    count grows with the factor, so total candidate work is
    Q x matches — quadratic by the WORKLOAD's construction, like the
    all-pairs oracle entries).  The operator property the gate owns is
    the hot-token shuffle: tf groupBy(id, tok) and the term semi-join
    land on the Zipf-hot tokens and must collapse map-side, which a
    constant query batch isolates."""
    from bruin_spark.operators.ranking import bm25_multi_topk
    from bruin_spark.workloads.text import _HYB_K, _hybrid_queries, _docs

    docs = _docs(spark, sf_dir)
    queries = _hybrid_queries(spark, sf_dir).filter("query_id < 500")
    return bm25_multi_topk(docs, queries, top_k=_HYB_K)


def _containment_rep_pairs_stress(spark, sf_dir: str):
    """Overlap-prefix-filtered containment pairs among distinct texts:
    exact-collapse removes the identical-doc cluster (quadratic OUTPUT
    by construction, same as the jaccard stress), so what this measures
    is the absolute-overlap prefix filter shedding each doc's hottest
    c-1 shingles — including the 8-word boilerplate prefix's posting
    lists."""
    from bruin_spark.operators import dedup as D
    from bruin_spark.workloads.dedup import CONTAIN_MIN_OV, CONTAIN_T, NGRAM, _docs

    reps = D.collapse_exact_texts(_docs(spark, sf_dir))
    return D.ngram_containment_pairs(
        reps, n=NGRAM, threshold=CONTAIN_T, min_overlap=CONTAIN_MIN_OV
    )


def _phash_pairs_stress(spark, sf_dir: str):
    """Image pHash near-dup banding under duplicate skew: ONE hot
    cluster of 2000 near-identical images (constant as the corpus
    grows — its ~2M true pairs are the bounded hot band-bucket the
    join must absorb) plus 16-image near-dup families over the rest
    (linear pair output).  Measures that the banded join's cost tracks
    the answer, not the candidate cross product."""
    import os as _os

    from pyspark.sql import functions as _F

    from bruin_spark.operators import multimodal as _M
    from bruin_spark.operators.dedup import hamming_near_pairs

    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))

    def gen(batches):
        import random
        import struct as _struct

        import pandas as pd

        # base media per FAMILY, cached per partition: rng-seeded
        # payloads make every family's content globally unique — a
        # modular arithmetic scheme (r12 first cut used seed % 29)
        # collapses families onto a few contents, and at 64x the
        # resulting band buckets go quadratic (reproduced: executor
        # OOM).  The hot cluster is the ONLY intentional repeat.
        base_cache: dict = {}

        def base_blob(fam: int) -> bytes:
            b = base_cache.get(fam)
            if b is None:
                rng = random.Random(fam)
                w, h = rng.randrange(1, 33), rng.randrange(1, 25)
                payload = rng.randbytes(w * h + 16)
                b = _struct.pack(_M.HEADER_FMT, _M.MAGIC, w, h, 1) + payload
                base_cache[fam] = b
            return b

        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                if i < 2000:
                    fam, v = -1, i  # the hot cluster
                else:
                    fam, v = i // 16, i % 16
                blob = bytearray(base_blob(fam))
                plen = len(blob) - _M.HEADER_SIZE
                if v > 0:
                    pos = (v * 13) % plen
                    blob[_M.HEADER_SIZE + pos] = (
                        blob[_M.HEADER_SIZE + pos] + v * 17
                    ) % 256
                rows.append((i, bytes(blob)))
            yield pd.DataFrame(rows, columns=["doc_id", "media"])

    media = (
        docs.select("doc_id")
        .repartition(32)
        .mapInPandas(gen, "doc_id bigint, media binary")
    )
    sig = _M.phash64(media)
    return hamming_near_pairs(
        sig, id_col="doc_id", hash_col="phash", bits=64, max_hamming=3, n_chunks=4
    ).select("id_a", "id_b", _F.col("hamming").cast("int").alias("hamming"))


def _spans_incremental_bucketed_stress(spark, sf_dir: str):
    """Incremental span dedup against the PERSISTED bucketed-by-h span
    index — the production layout write_span_index_bucketed documents.
    Since r13 this IS the registry entry (dedup_spans_incr_bucketed):
    the index table is built once per scale dir (first call — the
    harness's untimed warmup pass absorbs it); timed reps measure what
    production pays daily: batch-side hashing + the join whose corpus
    side is a bucketed scan with no Exchange (plan-asserted in
    tests/test_duplicate_spans.py)."""
    from bruin_spark.workloads.dedup import dedup_spans_incr_bucketed

    return dedup_spans_incr_bucketed(spark, sf_dir)


def _cc_hub_graph_stress(spark, sf_dir: str):
    """Connected components on a synthetic hub graph scaled to the
    corpus size: node 0 owns ~20% of all edges (the star-root shape LSH
    emits for boilerplate), plus a uniform random-pair tail.  Exercises
    the star rounds' groupBy/join under one dominant key — the failure
    mode uniform pair graphs never show."""
    from pyspark.sql import functions as F

    from bruin_spark.operators.dedup import connected_components

    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    nodes = spark.range(1, n_docs).select(F.col("id").alias("v"))
    h = (
        F.conv(F.substring(F.md5(F.concat(F.lit("e#"), F.col("v").cast("string"))), 1, 8), 16, 10)
        .cast("double")
        / float(16**8)
    )
    hub = nodes.filter(h < 0.2).select(F.lit(0).cast("long").alias("id_a"), F.col("v").alias("id_b"))
    tail = (
        nodes.filter((h >= 0.2) & (h < 0.7))
        .select(
            F.col("v").alias("id_a"),
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit("t#"), F.col("v").cast("string"))), 1, 8),
                    16,
                    10,
                ).cast("long")
                % F.lit(n_docs)
            ).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    # sever lineage before the star rounds: the hub and tail branches
    # both derive from the same range() scan, and the round-loop's
    # self-unions over that shared subtree trip attribute dedup inside
    # localCheckpoint (NoSuchElementException on the reused exprId)
    edges = hub.union(tail).localCheckpoint(eager=True)
    return connected_components(edges, "id_a", "id_b")


#: skewed-key stress: gate is tighter than the uniform one (<= ~1.1) —
#: under skew, anything super-linear means a hot key is fanning out.
#: Per-entry (half, full) scale factors: the heavy pipelines are
#: data-dominated by 4x/8x; the cheap map+shuffle entries need 16x/64x
#: before data cost outweighs fixed scheduling overhead (measured: at 8x
#: dedup_segments is ~1s of overhead on ~0.1s of data work, and the
#: fitted exponent is pure noise)
SKEW_ENTRIES = [
    ("dedup_clusters", 4, 8),
    ("dedup_minhash_lsh", 4, 8),
    ("dedup_ngram_jaccard", 4, 8),
    ("dedup_incremental", 4, 8),
    ("cc_hub_graph", 4, 8),
    ("dedup_segments", 16, 64),
    ("sample_stratified_quota", 16, 64),
    # sliding-window span dedup: the hot 20%-of-rows identical-text
    # cluster makes EVERY window inside it a ~0.2n-count duplicate —
    # the map-side-combinable groupBy(h) and linear semi-join must hold
    # (sub-2s at sf0.1, so the larger factors per the sub-2s rule)
    ("dedup_duplicate_spans", 16, 64),
    # incremental variant: the batch's distinct-hash counts join the
    # corpus (h, cnt) index — hot-cluster windows arrive PRE-AGGREGATED
    # on both sides, so the join keys stay uniform 60-bit longs
    ("dedup_spans_incremental", 16, 64),
    # boilerplate strip: the hot cluster makes EVERY segment of the hot
    # text cross the min_docs threshold — the distinct-doc count is a
    # two-phase agg and the flag join broadcasts the boilerplate keys
    ("dedup_strip_boilerplate", 16, 64),
    # bigram-LM scoring: Zipf tokens make a few bigrams extremely hot —
    # the model aggregations are map-side combinable and the scoring
    # join's hot (a, b) keys arrive pre-collapsed per document, so the
    # widest reducer is bounded by n_docs, not n_tokens
    ("text_lm_perplexity", 16, 64),
    # BPE encode: the hot identical-text cluster concentrates the word
    # count on a few tokens (map-side combinable) and the piece table
    # is broadcast — corpus-side rows never shuffle for the join.
    # 4x/16x: the 8 training rounds make this data-dominated well
    # below the cheap-entry 16x point (measured 14.7s @16x)
    ("text_bpe_encode", 4, 16),
    # DSIR weights: Zipf tokens concentrate features into a few hash
    # buckets, but the bucket models aggregate map-side into B rows,
    # the weight join is broadcast, and the per-doc scoring reducer is
    # keyed by doc_id — the hot buckets never pile onto one reducer
    ("text_dsir_weights", 16, 64),
    # CCNet perplexity buckets: the skewed lang column concentrates one
    # language into the hot ntile window partition — the documented
    # weak spot (per-language partition sort); bench_details.json is
    # authoritative for the measured exponent
    ("text_ccnet_buckets", 16, 64),
    # approx mode removes the per-language window sort entirely —
    # thresholds are one GK-sketch row per language; the plan is
    # window-free (asserted in tests/test_gopher_dsir.py)
    ("text_ccnet_buckets_approx", 16, 64),
    # image pHash banding: hot cluster bounded by construction (2000
    # images → constant ~2M-pair band bucket); family pairs linear
    ("mm_phash_pairs", 16, 64),
    # span dedup against the PERSISTED bucketed index: batch-side cost
    # only (the index builds once, untimed, on the warmup pass)
    ("dedup_spans_incr_bucketed", 16, 64),
    # per-domain report: the hot identical text spans all 20 domains —
    # the (domain, md5) distinct partial collapses the duplicate mass
    # map-side, and the skewed lang column stresses the second
    # two-phase distinct; output stays 20 rows at any factor
    ("text_domain_stats", 16, 64),
    # stupid backoff: Zipf tokens make a few trigrams hot, but model
    # tables are vocab-bounded broadcasts and the scoring stream
    # pre-collapses per (doc, a, b, w) — reducers keyed by doc_id
    ("text_lm_stupid_backoff", 16, 64),
    # containment: overlap-prefix filter on collapsed reps (see variant)
    ("dedup_containment", 4, 8),
    # batched BM25 with a fixed query batch (see variant): hot Zipf
    # tokens in the tf/df groupBys must collapse map-side
    ("text_bm25_multi", 16, 64),
    # viral-URL hot-key distinct (see variant): one canonical URL owns
    # ~20% of rows with all-distinct raw spellings — the shape the
    # r13 verdict flagged as unevidenced for the two-phase distinct
    ("text_url_dedup", 16, 64),
    # D4 prototype prune on the hot-centroid embeddings: one centroid
    # owns ~20% of vectors — the per-cluster threshold must stay a
    # constant-size GK sketch per cluster, never a hot-partition sort
    ("emb_d4_prune", 16, 64),
    # main-content extraction on the adversarial block-count mix (see
    # variant).  NOTE what this gate can and cannot see: the per-page
    # block distribution is factor-INVARIANT, so a quadratic per-page
    # residue inflates both points by the same constant and the
    # exponent stays ~1 — the O(blocks²) bound itself is pinned by
    # tests/test_html's test_pathological_many_block_page (2000-block
    # page under a wall ceiling).  What THIS row gates is linear
    # scaling in rows under a heavy-tailed block profile: straggler
    # packing / partition balance when 0.1% of pages are 256× the
    # median work.
    ("text_html_extract", 16, 64),
]
def _url_dedup_viral_stress(spark, sf_dir: str):
    """Viral-URL hot-key distinct (r13 verdict ask): ~20% of rows are
    ONE canonical URL, each spelled with an rng-unique utm_ tracking
    param — unique tracking params are stripped from the CANONICAL key,
    so every spelling collapses onto one canon key while remaining a
    DISTINCT raw.  This is the exact shape the partial distinct
    aggregate cannot collapse map-side in phase 1 (no duplicate
    (canon, raw) pairs exist); what must hold is phase 2's map-side
    partial COUNT after the (canon, raw) exchange, which bounds the hot
    reducer at one row per canon per map partition."""
    from pyspark.sql import functions as F

    from bruin_spark.operators import text as T

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    uhex = F.md5(F.concat(F.lit("vu#"), F.col("doc_id").cast("string")))
    is_hot = (
        F.conv(F.substring(uhex, 1, 8), 16, 10).cast("double") / float(16**8)
    ) < 0.20
    url = F.when(
        is_hot,
        F.concat(
            F.lit("https://Viral.Example.com/story/?utm_source="),
            F.md5(F.concat(F.lit("sp#"), F.col("doc_id").cast("string"))),
        ),
    ).otherwise(
        F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % 1000).cast("string"),
            F.lit(".example.org/p/"),
            F.md5(F.concat(F.lit("pg#"), F.col("doc_id").cast("string"))),
        )
    )
    return T.url_dedup(docs.select("doc_id", url.alias("url")))


def _html_extract_block_mix_stress(spark, sf_dir: str):
    """Adversarial block-count page mix (r14 verdict ask #5): most
    pages are normal (8 blocks), ~5% are heavy (256 blocks) and ~0.1%
    are the pathological shape the r14 extractor fix targeted (2048
    blocks — the page that took minutes under the old O(blocks²)
    prefix re-sum).  Every 4th block is link-wrapped so the
    link-density machinery runs on a mixed kept/dropped profile.
    Deterministic from doc_id; the gate checks total extraction work
    stays linear in rows as the corpus scales."""
    from pyspark.sql import functions as F

    from bruin_spark.operators.html import extract_main_content
    from bruin_spark.workloads.text import _HTML_MAX_LD, _HTML_MIN_CHARS

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    uh = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("hb#"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / float(16**8)
    )
    n_blocks = (
        F.when(uh < 0.001, F.lit(2048)).when(uh < 0.05, F.lit(256)).otherwise(F.lit(8))
    )
    body = F.expr(
        """
        array_join(transform(sequence(1, _nb), i ->
          CASE WHEN i % 4 = 0
          THEN concat('<p>see <a href="/x', cast(i as string), '">', substring(text, 1, 40), '</a></p>')
          ELSE concat('<p>', substring(text, 1, 120), ' block ', cast(i as string), '.</p>')
          END), '')
        """
    )
    pages = docs.select(
        "doc_id", F.col("text"), n_blocks.alias("_nb")
    ).select(
        "doc_id",
        F.concat(
            F.lit(
                '<html><head><title>d</title></head><body>'
                '<nav><a href="/">Home</a> <a href="/about">About</a></nav>'
            ),
            body,
            F.lit("<footer>(c) corp <a href=\"/p\">Privacy</a></footer></body></html>"),
        ).alias("html"),
    )
    out = extract_main_content(
        pages, min_chars=_HTML_MIN_CHARS, max_link_density=_HTML_MAX_LD
    )
    return out.select(
        "doc_id", "n_blocks", "n_kept", F.length("text").alias("extracted_chars")
    )


SKEW_VARIANTS = {
    "text_url_dedup": _url_dedup_viral_stress,
    "text_html_extract": _html_extract_block_mix_stress,
    # emb_d4_prune has no variant: the registry fn reads the skewed
    # dir's embeddings.parquet (hot-centroid corpus) directly
    "text_bm25_multi": _bm25_multi_fixed_queries_stress,
    "dedup_containment": _containment_rep_pairs_stress,
    "dedup_minhash_lsh": _minhash_rep_pairs_stress,
    "dedup_ngram_jaccard": _ngram_rep_pairs_stress,
    "cc_hub_graph": _cc_hub_graph_stress,
    "mm_phash_pairs": _phash_pairs_stress,
    "dedup_spans_incr_bucketed": _spans_incremental_bucketed_stress,
}
SKEW_EXPONENT_MAX = 1.1


def _scale_stress_skewed(spark, registry) -> dict:
    """Time SKEW_ENTRIES on the Zipf-skewed corpus at half-factor and
    factor scale; fit the growth exponent and gate it at
    SKEW_EXPONENT_MAX.  Same two-point protocol as the uniform stress
    (interleaved median-of-5 per point — see _interleaved_medians);
    cached per (git state, factor, sf_dir)."""
    import math as _math

    cache_path = "/tmp/bruin_scale_stress_skew_cache.json"
    key = _stress_cache_key() + ":skew"
    try:
        with open(cache_path) as f:
            cached = json.load(f)
        if cached.get("key") == key:
            print("# skew-stress: cached result (same commit)", file=sys.stderr)
            return cached["result"]
    except Exception:
        pass

    dirs = {
        f: _build_skewed_dir(spark, SF_DIR, f)
        for f in sorted({f for _n, h, fu in SKEW_ENTRIES for f in (h, fu)})
    }
    entries = {}
    for name, half, full in SKEW_ENTRIES:
        fn = SKEW_VARIANTS.get(name) or (registry[name][0] if name in registry else None)
        if fn is None:
            continue
        spark.sparkContext.setJobDescription(f"bench-skew:{name}")

        # shuffle partitions stay at the session base (None): the
        # question is how the per-core data SLICE behaves as data grows
        # (the 100 TB per-executor view); scaling partition count with
        # the factor injects O(tasks) scheduling overhead into
        # sub-second fits
        (t_half, _, raw_half), (t_full, n_rows, raw_full) = _interleaved_medians(
            spark, fn, [(dirs[half], None), (dirs[full], None)]
        )
        step = full / half
        exponent = _math.log(t_full / max(t_half, 1e-9)) / _math.log(step)
        ok = exponent <= SKEW_EXPONENT_MAX
        entries[name] = {
            "t_half_s": round(t_half, 3),
            "scaled_s": round(t_full, 3),
            "half_factor": half,
            "full_factor": full,
            "rows": n_rows,
            "exponent": round(exponent, 2),
            "gate_max": SKEW_EXPONENT_MAX,
            "pass": ok,
            "verdict": "sub-linear-or-linear" if ok else "HOT-KEY-FANOUT",
            "raw_half_s": raw_half,
            "raw_scaled_s": raw_full,
        }
        print(
            f"# skew-stress {name}: {t_half:.2f}s @{half}x -> {t_full:.2f}s "
            f"@{full}x (exponent {exponent:.2f}): "
            f"{'pass' if ok else 'FAIL'}",
            file=sys.stderr,
        )
    # drop the memoized bucketed span-index tables (they live under
    # spark-warehouse in the repo tree; leftovers would be noise) —
    # the memo moved to the workloads module in r13 when the bucketed
    # entry joined the registry
    from bruin_spark.workloads.dedup import _SPAN_IDX_TABLES as _span_tbls

    for _t in list(_span_tbls.values()):
        try:
            spark.sql(f"DROP TABLE IF EXISTS {_t}")
        except Exception:
            pass
    _span_tbls.clear()
    result = {
        "skew_shape": "hot key ~20% of rows + fixed-size near-dup families + unique tail (see _build_skewed_dir)",
        # measured r8 on this corpus WITHOUT the mitigations:
        # - minhash_dedup_pairs with no exact-collapse: 25.8s @4x ->
        #   91.3s @8x (exponent 1.82, 32.4M pairs at 8x) — the quadratic
        #   hot-band-bucket blowup the collapse removes;
        # - naive (unfiltered) inverted-index jaccard on collapsed reps:
        #   8.2s @4x -> 55.1s @8x (exponent 2.75) from the boilerplate
        #   shingle's hot posting list — prefix filtering sheds it at
        #   IDENTICAL pair output (20357/41338 pairs both plans)
        "unmitigated_reference": {
            "minhash_all_pairs": {"t_4x_s": 25.8, "t_8x_s": 91.3, "exponent": 1.82},
            "ngram_naive_index": {"t_4x_s": 8.2, "t_8x_s": 55.1, "exponent": 2.75},
        },
        "entries": entries,
    }
    try:
        with open(cache_path, "w") as f:
            json.dump({"key": key, "result": result}, f)
    except Exception:
        pass
    return result


def _stress_cache_key() -> str:
    """Cache key over the MEASURED code only (bruin_spark/ + bench.py):
    doc/test/survey commits leave the stress verdict valid, so keying on
    repo HEAD would throw away a ~25-min measurement for a README edit.
    Uncommitted changes under the measured paths still invalidate."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    paths = ["bruin_spark", "bench.py"]
    try:
        tree = subprocess.run(
            ["git", "ls-tree", "HEAD", "--"] + paths,
            capture_output=True, text=True, cwd=repo,
        ).stdout.strip()
        import hashlib

        key = hashlib.md5(tree.encode()).hexdigest()[:12] or "notree"
        # uncommitted changes to measured code must invalidate — a stale
        # verdict would be presented as a measurement of the edited code.
        # Hash the diff CONTENT (status --porcelain lists only file
        # names, so edit -> bench -> different edit would collide)
        diff = subprocess.run(
            ["git", "diff", "HEAD", "--"] + paths,
            capture_output=True, text=True, cwd=repo,
        ).stdout + subprocess.run(
            ["git", "status", "--porcelain", "--"] + paths,
            capture_output=True, text=True, cwd=repo,
        ).stdout
        if diff.strip():
            key += ":" + hashlib.md5(diff.encode()).hexdigest()[:8]
    except Exception:
        key = "nohead"
    return f"{key}:{SCALE_FACTOR}:{SF_DIR}"


def _cpu_probe(n: int = 20_000_000) -> float:
    """Single-threaded host-health probe: seconds for a fixed
    ``n``-iteration pure-Python integer loop.  The r13 verdict found
    the per-entry baseline non-reproducible because the host epoch
    itself drifts (plan-identical TPC-H Q1 read 3.5-5x across
    sessions); stamping every bench session with this figure lets
    cross-session comparisons be probe-normalized instead of guessed.
    Healthy figure on this box: record it in bench_details.json and
    compare ratios, not absolutes."""
    import time as _time

    t0 = _time.perf_counter()
    x = 0
    for i in range(n):
        x += i
    # keep x live so the loop cannot be elided by a future optimizer
    assert x >= 0
    return round(_time.perf_counter() - t0, 3)


def _quiesce(spark) -> None:
    """Level the playing field before a timed rep: drop cached
    relations, drain Python garbage, and force a JVM collection so
    entry N's timing doesn't pay entry N-1's GC debt.

    Why: in the r12 driver session five carried entries read 2.3-3.8x
    their r11 numbers with BYTE-IDENTICAL plan hashes — the suite had
    grown to 67 entries in one JVM, and heavy new entries left
    old-gen/codegen-cache pressure that landed on whoever ran next
    (the builder's same-HEAD isolated numbers matched r11).  All of
    this runs OUTSIDE the timer; System.gc() is a stop-the-world pause
    we pay in harness time, not query time."""
    import gc

    spark.catalog.clearCache()
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def _force(df) -> None:
    """Fully materialize every output column.

    ``count()`` is NOT a benchmark action: Catalyst prunes everything
    the count does not need — a projection-only operator collapses to
    a bare parquet row count, and a final left join onto a grouped
    subquery is ELIMINATED outright (unique join keys preserve row
    count), so the r11 DSIR entry "ran" in 0.13s while computing
    nothing.  The noop datasource sink (OSS Spark >= 3.0, built for
    exactly this) forces full evaluation of every column with no write
    cost.  Timings before r11 used count() — projection-heavy entries
    were under-measured then, on BOTH the r01 baseline and later
    rounds (same harness), so cross-round ratios stayed comparable;
    from r11 the per-entry numbers are faithful."""
    df.write.format("noop").mode("overwrite").save()


def _interleaved_medians(spark, fn, points, reps=5):
    """Median-of-``reps`` timings for several (sf_dir,
    shuffle_partitions|None) scale points, measured in INTERLEAVED
    rounds (p1, p2, ..., p1, p2, ...) after one untimed warmup per
    point.

    Why interleaved: the stress verdicts are RATIOS between points, so
    the two measurements must see the same machine.  Sequential blocks
    (all-half then all-full) let a minutes-long degraded phase land
    entirely on one side — r11: a phase that tripled ONLY the 64x block
    pushed dedup_spans_incremental's skew exponent from its steady 0.93
    (fresh-session reproduction, 6 runs/point) to a spurious 1.46 FAIL
    while the median-of-5 held at 59s.  Medians per point (not min:
    one lucky fast half-scale run inflates the exponent ~0.3, r8).

    Returns [(median_s, rows, raw_times)] aligned with ``points``.
    """
    import time as _time

    from bruin_spark.checkpointing import pinned_scope

    base_parts = spark.conf.get("spark.sql.shuffle.partitions")

    def run(sf_dir, parts, want_rows=False):
        if parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            _quiesce(spark)
            t0 = _time.perf_counter()
            with pinned_scope():
                df = fn(spark, sf_dir)
                _force(df)
                dt = _time.perf_counter() - t0
                # rows via an UNTIMED count (its pruned plan is cheap)
                r = df.count() if want_rows else 0
            return dt, r
        finally:
            if parts is not None:
                spark.conf.set("spark.sql.shuffle.partitions", base_parts)

    rows = [0] * len(points)
    for i, (d, p) in enumerate(points):  # untimed codegen/JIT warmup
        _, rows[i] = run(d, p, want_rows=True)
    raws = [[] for _ in points]
    for _ in range(reps):
        for i, (d, p) in enumerate(points):
            dt, _ = run(d, p)
            raws[i].append(dt)
    out = []
    for i in range(len(points)):
        ts = sorted(raws[i])
        out.append((ts[len(ts) // 2], rows[i], [round(t, 3) for t in raws[i]]))
    return out


def _scale_stress(spark, registry, timings: dict[str, float]) -> dict:
    """Time SCALE_ENTRIES at half-factor and factor scale and fit the
    growth exponent between the two points (``timings`` only gates which
    entries ran in the main loop).  The result is cached per
    (git state, factor, sf_dir) so repeated bench invocations in one
    round pay the ~2 min probe once and reuse the measurement."""
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

        # shuffle parallelism sized to the data per point, as a cluster
        # operator would (AQE still coalesces downward); interleaved
        # median-of-5 per point — see _interleaved_medians
        (t_half, _, raw_half), (t_full, n, raw_full) = _interleaved_medians(
            spark,
            fn,
            [(dir_half, base_parts * half), (dir_full, base_parts * SCALE_FACTOR)],
        )
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
            "raw_half_s": raw_half,
            "raw_scaled_s": raw_full,
        }
        if name in THREE_POINT_ENTRIES and THREE_POINT_FACTOR > SCALE_FACTOR:
            # the 8x->16x segment is ALSO a ratio: re-measure the 8x
            # point interleaved with 16x rather than reusing t_full
            # from a different measurement phase
            dir_hi = _build_scaled_dir(spark, SF_DIR, THREE_POINT_FACTOR)
            # distinct name: reassigning t_full here would leak the
            # re-measured 8x point into the half->full summary print
            (t_full_seg, _, _), (t_hi, _, raw_hi) = _interleaved_medians(
                spark,
                fn,
                [
                    (dir_full, base_parts * SCALE_FACTOR),
                    (dir_hi, base_parts * THREE_POINT_FACTOR),
                ],
            )
            step_hi = THREE_POINT_FACTOR / SCALE_FACTOR
            exp_hi = _math.log(t_hi / max(t_full_seg, 1e-9)) / _math.log(step_hi)
            entries[name].update(
                {
                    "t_16x_s": round(t_hi, 3),
                    "t_8x_segment_s": round(t_full_seg, 3),
                    "exponent_8_16": round(exp_hi, 2),
                    "three_point_max": THREE_POINT_MAX,
                    "three_point_pass": exp_hi <= THREE_POINT_MAX,
                    "raw_16x_s": raw_hi,
                }
            )
            print(
                f"# scale-stress {name} third point: {t_full_seg:.2f}s @{SCALE_FACTOR}x"
                f" -> {t_hi:.2f}s @{THREE_POINT_FACTOR}x (segment exponent"
                f" {exp_hi:.2f}, gate {THREE_POINT_MAX}):"
                f" {'pass' if exp_hi <= THREE_POINT_MAX else 'FAIL'}",
                file=sys.stderr,
            )
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

    from bruin_spark.checkpointing import pinned_scope
    from bruin_spark.session import get_spark
    from bruin_spark.workloads import collect_queries

    spark = get_spark("bruin_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    # host-health stamp, measured BEFORE and AFTER the timed suite (a
    # degraded phase can start mid-run); recorded in the sidecar
    cpu_probe_start = _cpu_probe()
    print(f"# cpu-probe (20M-iter loop): {cpu_probe_start}s", file=sys.stderr)
    # plan fingerprints hash optimizedPlan().toString(): at the default
    # maxToStringFields=25 a wide aggregate/project list prints as
    # "... N more fields", silently blinding the hash to changes inside
    # it — print everything.  Caveat discovered in r8: pipelines that
    # localCheckpoint mid-build (minhash candidates, CC rounds) hash
    # only their post-checkpoint TAIL (the earlier stages execute at
    # build time and appear as a LogicalRDD leaf), so an unchanged hash
    # there does not certify the upstream stages — cross-check those
    # against the operators' plan tests in tests/test_plans.py.
    spark.conf.set("spark.sql.debug.maxToStringFields", "10000")
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
    #: entries whose FIRST call materializes a persisted fixture (the
    #: bucketed span index): build it with an untimed call so the timed
    #: reps measure the daily-batch query, not the one-time index write
    #: — under best-of-2 the second rep already hides it, but --once
    #: would otherwise report build+query
    WARM_FIRST = {"dedup_spans_incr_bucketed"}
    for name in names:
        fn, _oracle = registry[name]
        spark.sparkContext.setJobDescription(f"bench:{name}")
        if name in WARM_FIRST:
            with pinned_scope():
                fn(spark, SF_DIR)  # builds the fixture; result discarded
        best, n = float("inf"), 0
        for rep in range(repeats):
            _quiesce(spark)  # isolate runs from accumulated state (untimed)
            t0 = time.perf_counter()
            # release whatever the query pinned (localCheckpoint blocks
            # of multi-referenced subtrees) once consumed — otherwise a
            # full bench run accumulates one pinned block set per query
            # per repeat (r10 review finding). The timer stops BEFORE
            # scope exit: release cost (JVM unpersist roundtrips, file
            # deletes) is harness bookkeeping, not query cost, and r9
            # timings were taken without it.
            with pinned_scope():
                df = fn(spark, SF_DIR)
                # full-column materialization, not count() — see _force
                _force(df)
                dt = time.perf_counter() - t0
                if rep == 0:
                    n = df.count()  # untimed, display only
            best = min(best, dt)
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
    scale_stress_skewed = None
    if want_stress:
        try:
            scale_stress = _scale_stress(spark, registry, timings)
        except Exception as e:  # never let the stress probe sink the bench
            print(f"# scale-stress failed: {e}", file=sys.stderr)
        try:
            scale_stress_skewed = _scale_stress_skewed(spark, registry)
        except Exception as e:
            print(f"# skew-stress failed: {e}", file=sys.stderr)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    cpu_probe_end = _cpu_probe()
    out = {
        "metric": "suite_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # host-health stamp IN the contract line (r14 verdict ask #1):
        # healthy band on this box is ~0.7-0.9 s; a session whose probes
        # read above ~1.1 s ran in a degraded host window and its wall
        # numbers should not be compared against healthy-window runs.
        "cpu_probe_s": {
            "start": round(cpu_probe_start, 3),
            "end": round(cpu_probe_end, 3),
        },
    }
    # The driver captures a bounded tail of stdout and parses the last
    # line as JSON (BENCH_r04 truncated mid-line once plan_hashes +
    # scale_stress grew past the buffer; BENCH_r13's stored tail ALSO
    # truncated, which nulled the whole r14 round-over-round comparison).
    # Keep the stdout contract line minimal; the full diagnostics go to
    # the bench_details.json sidecar next to bench.py — which carries
    # the same metric/value/queries/sf keys and is the documented
    # FALLBACK when the captured stdout tail is truncated mid-line.
    print(f"# cpu-probe (20M-iter loop, post-suite): {cpu_probe_end}s", file=sys.stderr)
    sidecar = {
        **out,
        "cpu_probe_s": {"start": cpu_probe_start, "end": cpu_probe_end},
        "plan_hashes": plan_hashes,
    }
    if scale_stress:
        sidecar["scale_stress"] = scale_stress
    if scale_stress_skewed:
        sidecar["scale_stress_skewed"] = scale_stress_skewed
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
        try:
            fs = _scheduler_failure_stress(spark)
            sidecar["scheduler_failure_stress"] = fs
            print(f"# scheduler-failure-stress: {fs}", file=sys.stderr)
        except Exception as e:
            print(f"# scheduler-failure-stress failed: {e}", file=sys.stderr)
    sidecar_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_details.json"
    )
    if filters:
        # a name-filtered run lacks most queries — writing it would
        # clobber the committed full-suite artifact that cross-round
        # regression triage diffs (r10 review finding)
        print(
            "# filtered run: NOT overwriting the full-suite "
            f"{os.path.basename(sidecar_path)}",
            file=sys.stderr,
        )
    elif not want_stress:
        # full query sweep with stress intentionally skipped
        # (--no-scale-stress / SPARK_GRAFT_SCALE_STRESS=0): the fresh
        # timings + plan hashes ARE complete — merge them into the
        # existing sidecar, preserving its committed stress / gate
        # sections (r11 advice: timing-only refreshes were discarded).
        # Preserved sections are only meaningful at the SAME scale
        # factor: on an sf mismatch they are dropped rather than
        # stitched into a self-inconsistent artifact, and a corrupt
        # existing file falls back to the fresh timings alone.
        try:
            merged = {}
            try:
                if os.path.exists(sidecar_path):
                    with open(sidecar_path) as f:
                        merged = json.load(f)
            except Exception:
                merged = {}
            if merged and merged.get("sf") != sidecar.get("sf"):
                print(
                    f"# previous sidecar is sf={merged.get('sf')}, this run "
                    f"is sf={sidecar.get('sf')}: dropping its stress/gate "
                    "sections instead of mixing scales",
                    file=sys.stderr,
                )
                merged = {}
            merged.update(sidecar)
            with open(sidecar_path, "w") as f:
                json.dump(merged, f, indent=1)
            print(
                f"# timings merged into {os.path.basename(sidecar_path)} "
                "(stress/gate sections preserved from previous full run)",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"# sidecar merge failed: {e}", file=sys.stderr)
    else:
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
