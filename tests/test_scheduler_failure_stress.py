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
