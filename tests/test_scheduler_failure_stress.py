"""Failure-injection stress at DAG width (r8 verdict ask #7).

The scheduler's failure-path semantics — retry + rerun_cooldown, the
never-retry-a-timeout rule, retry exhaustion, warn-only vs blocking
check gating (reference pkg/scheduler/scheduler.go:836-1140 and
scheduler_test.go MarkTasksAsUpstreamFailed / WillRunTaskAgain cases)
— are each pytest-covered in isolation in test_scheduler.py.  This
test exercises ALL of them concurrently on a 300-asset fan-in DAG and
asserts the exact final status of every main instance, so interactions
between the paths (a cooldown blocking dispatch, a timeout watcher
marking the wrong instance, check gating racing the ready-queue) can't
hide.  The same harness runs per-round in bench.py's diagnostics
sidecar (`scheduler_failure_stress`)."""

import bench


def test_failure_injection_stress(spark):
    out = bench._scheduler_failure_stress(spark)

    assert out["states_exact_match"], out["mismatches"]
    assert out["status_counts"] == out["expected_counts"]
    assert out["flaky_all_succeeded"]
    assert out["flaky_retried_once"]
    assert out["flaky_cooldown_honored"]
    assert out["timeout_failed_never_retried"]
    assert out["hardfail_exhausted_retries"]
    assert out["warn_check_failed_not_gating"]
    assert out["blocking_check_failed_and_gating"]
    assert out["run_not_ok"]
    assert out["run_s"] <= bench.FAILURE_STRESS_MAX_WALL_S
    assert out["ok"]


def test_expected_state_propagation_shape():
    """The expectation generator itself: failure cones widen by one
    column per layer and the blocking check gates only descendants."""
    exp = bench.expected_failure_states()
    # timeout root n_2_30: cone at layer 3 is w in {30, 31}
    assert exp["n_3_30"] == "upstream_failed"
    assert exp["n_3_31"] == "upstream_failed"
    assert exp["n_3_29"] == "succeeded"
    # blocking-check owner succeeds; its children are gated
    assert exp["n_0_48"] == "succeeded"
    assert exp["n_1_48"] == "upstream_failed"
    assert exp["n_1_49"] == "upstream_failed"
    assert exp["n_1_47"] == "succeeded"
    # warn-check owner's children are NOT gated
    assert exp["n_1_45"] == "succeeded"
    # flaky assets succeed after retry, so nothing downstream is gated
    assert all(exp[f"n_2_{w}"] == "succeeded" for w in range(20))


def test_continue_after_failures_reruns_only_failed_cone(spark, tmp_path):
    """The reference's `run --continue` workflow at width: after the
    failure-injection run, the user fixes the broken inputs (flaky
    sources settle, the blocking check's condition is corrected) and
    continues — prior successes must NOT re-execute, and exactly the
    failed + upstream_failed cone re-runs to green."""
    import threading
    import time as _time

    from bruin_spark.scheduler import PipelineState, Scheduler

    lock = threading.Lock()
    attempts: dict[str, int] = {}

    def broken(s, asset, ctx):
        with lock:
            attempts[asset.name] = attempts.get(asset.name, 0) + 1
            nth = attempts[asset.name]
        if asset.custom_checks:
            s.range(1).createOrReplaceTempView(asset.name)
        if asset.name in bench.TIMEOUT_ASSETS:
            _time.sleep(2.0)
        elif asset.name in bench.HARDFAIL:
            raise RuntimeError("injected hard failure")
        elif asset.name in bench.FLAKY and nth == 1:
            raise RuntimeError("injected flaky failure")

    pipe = bench.synthetic_failure_dag()
    sched = Scheduler(spark, pipe, operators={"noop": broken}, retries=1)
    res1 = sched.run()
    rerun_expected = set(res1.failed) | set(res1.upstream_failed)
    assert rerun_expected  # the failure run did fail things
    state_path = str(tmp_path / "state.json")
    sched.state().save(state_path)

    # "fix the inputs": benign operators, blocking/warn checks corrected
    # (the reference reloads the pipeline from disk on --continue, so an
    # edited check query is exactly the real workflow)
    pipe2 = bench.synthetic_failure_dag()
    for a in pipe2.assets:
        for c in a.custom_checks:
            c.query = "SELECT 0"
    executed: list[str] = []

    def benign(s, asset, ctx):
        if asset.custom_checks:
            s.range(1).createOrReplaceTempView(asset.name)
        with lock:
            executed.append(asset.name)

    sched2 = Scheduler(spark, pipe2, operators={"noop": benign}, retries=1)
    sched2.restore(PipelineState.load(state_path))
    res2 = sched2.run()

    # exactly the failed cone's MAIN instances re-executed
    rerun_mains = {i for i in rerun_expected if ":" not in i}
    assert set(executed) == rerun_mains
    assert len(executed) == len(rerun_mains)  # and each exactly once
    # the continued run ends fully green: every main succeeded at least
    # once across the two runs, nothing is left failed or gated
    assert not res2.failed and not res2.upstream_failed
    done_mains = {i for i in res2.succeeded if ":" not in i} | {
        i for i in res1.succeeded if ":" not in i
    }
    assert len(done_mains) == len(pipe.assets)
