"""Scheduler semantics tests (ref model: pkg/scheduler/scheduler.go).

Uses tiny in-memory pipelines over the shared local session; asserts DAG
explosion, blocking-check gating, failure propagation, retries, filters,
and state/continue.
"""

import threading

import pytest

from bruin_spark.model.pipeline import (
    Asset,
    Column,
    ColumnCheck,
    CustomCheck,
    Materialization,
    MaterializationType,
    Pipeline,
    Strategy,
    Upstream,
)
from bruin_spark.render.jinja import RenderContext
from bruin_spark.scheduler import InstanceStatus, PipelineState, Scheduler


def sql_asset(name, query, deps=(), checks=None, custom=None, mat=True):
    return Asset(
        name=name,
        type="spark.sql",
        query=query,
        materialization=Materialization(
            type=MaterializationType.TABLE if mat else MaterializationType.NONE,
            strategy=Strategy.CREATE_REPLACE if mat else None,
        ),
        columns=checks or [],
        custom_checks=custom or [],
        depends=[Upstream(value=d) for d in deps],
    )


def make_pipeline(assets):
    return Pipeline(name="p", assets=assets, concurrency=4)


def test_dag_explosion_and_order(spark):
    order = []
    lock = threading.Lock()

    def tracking_op(s, asset, ctx):
        with lock:
            order.append(asset.name)
        s.sql(f"CREATE OR REPLACE TEMPORARY VIEW {asset.name} AS {asset.query}")

    pipe = make_pipeline(
        [
            sql_asset("a", "SELECT 1 AS x"),
            sql_asset("b", "SELECT * FROM a", deps=["a"]),
            sql_asset("c", "SELECT * FROM b", deps=["b"]),
        ]
    )
    sched = Scheduler(spark, pipe, operators={"spark.sql": tracking_op})
    res = sched.run()
    assert res.ok
    assert order == ["a", "b", "c"]


def test_blocking_check_failure_gates_downstream(spark):
    spark.sql("DROP TABLE IF EXISTS src_blocking")
    pipe = make_pipeline(
        [
            sql_asset(
                "src_blocking",
                "SELECT * FROM VALUES (1), (NULL) AS t(v)",
                checks=[Column(name="v", checks=[ColumnCheck(name="not_null")])],
            ),
            sql_asset("down_blocking", "SELECT * FROM src_blocking", deps=["src_blocking"]),
        ]
    )
    res = Scheduler(spark, pipe, workers=2).run()
    assert "src_blocking:check:v:not_null" in res.failed
    assert "down_blocking" in res.upstream_failed
    assert not res.ok


def test_non_blocking_check_failure_does_not_gate(spark):
    spark.sql("DROP TABLE IF EXISTS src_nb")
    pipe = make_pipeline(
        [
            sql_asset(
                "src_nb",
                "SELECT * FROM VALUES (1), (NULL) AS t(v)",
                checks=[Column(name="v", checks=[ColumnCheck(name="not_null", blocking=False)])],
            ),
            sql_asset("down_nb", "SELECT v FROM src_nb WHERE v IS NOT NULL", deps=["src_nb"]),
        ]
    )
    res = Scheduler(spark, pipe, workers=2).run()
    assert "src_nb:check:v:not_null" in res.failed
    assert "down_nb" in res.succeeded


def test_custom_check_runs(spark):
    pipe = make_pipeline(
        [
            sql_asset(
                "src_cc",
                "SELECT * FROM VALUES (1), (2) AS t(v)",
                custom=[CustomCheck(name="row_count", query="SELECT COUNT(*) - 2 FROM src_cc")],
            )
        ]
    )
    res = Scheduler(spark, pipe).run()
    assert res.ok
    assert "src_cc:custom:row_count" in res.succeeded


def test_retries(spark):
    attempts = {"n": 0}

    def flaky_op(s, asset, ctx):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("flaky")

    pipe = make_pipeline([sql_asset("fl", "SELECT 1")])
    res = Scheduler(spark, pipe, retries=2, operators={"spark.sql": flaky_op}).run()
    assert res.ok
    assert attempts["n"] == 3


def test_rerun_cooldown_delays_retry(spark):
    """rerun_cooldown is honored between retry attempts (ref:
    pipeline.go rerun_cooldown -> retries_delay; test-rerun-cooldown
    fixture): a 1s cooldown makes the second attempt start >= 1s after
    the first failure; -1 opts out of any delay."""
    import time as _time

    stamps: list[float] = []

    def flaky_op(s, asset, ctx):
        stamps.append(_time.monotonic())
        if len(stamps) < 2:
            raise RuntimeError("flaky")

    a = sql_asset("cool", "SELECT 1")
    a.rerun_cooldown = 1
    pipe = make_pipeline([a])
    res = Scheduler(spark, pipe, retries=1, operators={"spark.sql": flaky_op}).run()
    assert res.ok and len(stamps) == 2
    assert stamps[1] - stamps[0] >= 1.0

    stamps.clear()
    b = sql_asset("nocool", "SELECT 1")
    b.rerun_cooldown = -1
    t0 = _time.monotonic()
    res = Scheduler(
        spark, make_pipeline([b]), retries=1, operators={"spark.sql": flaky_op}
    ).run()
    assert res.ok and len(stamps) == 2
    assert stamps[1] - t0 < 1.0  # no cooldown applied


def test_rerun_cooldown_pipeline_default_inheritance(tmp_path):
    """Assets inherit the pipeline `default: rerun_cooldown:` unless they
    set their own; -1 maps to an explicit zero delay
    (ref: test-rerun-cooldown fixture, pipeline.go:3303,3994-4005)."""
    from bruin_spark.model import load_pipeline

    d = tmp_path / "cooldown"
    (d / "assets").mkdir(parents=True)
    (d / "pipeline.yml").write_text(
        "name: cooldown\ndefault:\n  rerun_cooldown: 300\n"
    )
    (d / "assets" / "own.sql").write_text(
        "/* @bruin\nname: own\ntype: spark.sql\nrerun_cooldown: 600\n@bruin */\nSELECT 1"
    )
    (d / "assets" / "inherits.sql").write_text(
        "/* @bruin\nname: inherits\ntype: spark.sql\n@bruin */\nSELECT 2"
    )
    (d / "assets" / "optout.sql").write_text(
        "/* @bruin\nname: optout\ntype: spark.sql\nrerun_cooldown: -1\n@bruin */\nSELECT 3"
    )
    pipe = load_pipeline(str(d))
    assert pipe.asset("own").retries_delay_s() == 600
    assert pipe.asset("inherits").retries_delay_s() == 300
    assert pipe.asset("optout").retries_delay_s() == 0


def test_failure_propagates_transitively(spark):
    def boom(s, asset, ctx):
        if asset.name == "x1":
            raise RuntimeError("boom")

    pipe = make_pipeline(
        [
            sql_asset("x1", "SELECT 1"),
            sql_asset("x2", "SELECT 1", deps=["x1"]),
            sql_asset("x3", "SELECT 1", deps=["x2"]),
            sql_asset("y1", "SELECT 1"),
        ]
    )
    res = Scheduler(spark, pipe, operators={"spark.sql": boom}).run()
    assert res.failed == ["x1"]
    assert set(res.upstream_failed) == {"x2", "x3"}
    assert "y1" in res.succeeded


def test_filters_skip_and_satisfy(spark):
    ran = []

    def track(s, asset, ctx):
        ran.append(asset.name)

    pipe = make_pipeline(
        [
            sql_asset("f1", "SELECT 1"),
            sql_asset("f2", "SELECT 1", deps=["f1"]),
        ]
    )
    sched = Scheduler(spark, pipe, operators={"spark.sql": track})
    sched.apply_filters(only=["f2"])
    res = sched.run()
    assert ran == ["f2"]
    assert "f1" in res.skipped and "f2" in res.succeeded


def test_downstream_selector(spark):
    ran = []

    def track(s, asset, ctx):
        ran.append(asset.name)

    pipe = make_pipeline(
        [
            sql_asset("d1", "SELECT 1"),
            sql_asset("d2", "SELECT 1", deps=["d1"]),
            sql_asset("d3", "SELECT 1", deps=["d2"]),
            sql_asset("other", "SELECT 1"),
        ]
    )
    sched = Scheduler(spark, pipe, operators={"spark.sql": track})
    sched.apply_filters(only=["d2"], downstream=True)
    sched.run()
    assert sorted(ran) == ["d2", "d3"]


def test_tag_filters(spark):
    ran = []

    def track(s, asset, ctx):
        ran.append(asset.name)

    a = sql_asset("t1", "SELECT 1")
    a.tags = ["daily"]
    b = sql_asset("t2", "SELECT 1")
    b.tags = ["hourly"]
    sched = Scheduler(spark, make_pipeline([a, b]), operators={"spark.sql": track})
    sched.apply_filters(tags=["daily"])
    sched.run()
    assert ran == ["t1"]


def test_state_continue(spark, tmp_path):
    ran = []

    def track_then_fail(s, asset, ctx):
        ran.append(asset.name)
        if asset.name == "s2":
            raise RuntimeError("first run fails")

    pipe = make_pipeline(
        [
            sql_asset("s1", "SELECT 1"),
            sql_asset("s2", "SELECT 1", deps=["s1"]),
        ]
    )
    state_file = str(tmp_path / "state.json")
    res1 = Scheduler(spark, pipe, operators={"spark.sql": track_then_fail}).run(
        state_path=state_file
    )
    assert "s2" in res1.failed and "s1" in res1.succeeded

    ran.clear()

    def ok_op(s, asset, ctx):
        ran.append(asset.name)

    sched2 = Scheduler(spark, pipe, operators={"spark.sql": ok_op})
    sched2.restore(PipelineState.load(state_file))
    res2 = sched2.run()
    assert res2.ok
    assert ran == ["s2"]  # s1 kept from prior run


def test_symbolic_dependency_not_an_edge(spark):
    pipe = make_pipeline(
        [
            sql_asset("ext", "SELECT 1"),
            Asset(
                name="solo",
                type="spark.sql",
                query="SELECT 1",
                depends=[Upstream(value="ext", mode="symbolic")],
            ),
        ]
    )
    sched = Scheduler(spark, pipe)
    assert sched.instances["solo"].upstreams == []


def test_backfill_chunks_run_in_order(spark):
    from datetime import datetime

    from bruin_spark.scheduler.scheduler import backfill

    windows = []

    def track(s, asset, ctx):
        windows.append((ctx.start, ctx.end))

    pipe = make_pipeline([sql_asset("bf", "SELECT 1")])
    results = backfill(
        spark,
        pipe,
        datetime(2024, 1, 1),
        datetime(2024, 1, 4),
        granularity="day",
        operators={"spark.sql": track},
    )
    assert len(results) == 3 and all(r.ok for r in results)
    assert windows == [
        (datetime(2024, 1, 1), datetime(2024, 1, 2)),
        (datetime(2024, 1, 2), datetime(2024, 1, 3)),
        (datetime(2024, 1, 3), datetime(2024, 1, 4)),
    ]


def test_backfill_stops_on_failure(spark):
    from datetime import datetime

    from bruin_spark.scheduler.scheduler import backfill

    calls = {"n": 0}

    def fail_second(s, asset, ctx):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("chunk 2 fails")

    pipe = make_pipeline([sql_asset("bf2", "SELECT 1")])
    results = backfill(
        spark,
        pipe,
        datetime(2024, 1, 1),
        datetime(2024, 1, 5),
        operators={"spark.sql": fail_second},
    )
    assert len(results) == 2 and results[0].ok and not results[1].ok


def test_time_interval_gets_run_window(spark):
    from datetime import datetime

    pipe = make_pipeline(
        [
            Asset(
                name="ti_asset",
                type="spark.sql",
                query=(
                    "SELECT CAST('2024-01-01 12:00:00' AS TIMESTAMP) AS ts, 'b2' AS src"
                ),
                materialization=Materialization(
                    type=MaterializationType.TABLE,
                    strategy=Strategy.TIME_INTERVAL,
                    incremental_key="ts",
                    time_granularity="timestamp",
                ),
            )
        ]
    )
    spark.sql("DROP TABLE IF EXISTS ti_asset")
    spark.sql(
        "CREATE TABLE ti_asset AS SELECT CAST('2024-01-01 06:00:00' AS TIMESTAMP) AS ts, 'b1' AS src "
        "UNION ALL SELECT CAST('2024-02-15 00:00:00' AS TIMESTAMP), 'b1'"
    )
    ctx = RenderContext(start=datetime(2024, 1, 1), end=datetime(2024, 1, 31))
    res = Scheduler(spark, pipe, context=ctx).run()
    assert res.ok, res.failed
    rows = sorted((str(r["ts"]), r["src"]) for r in spark.table("ti_asset").collect())
    # the January window was replaced by the new batch; February survives
    assert rows == [("2024-01-01 12:00:00", "b2"), ("2024-02-15 00:00:00", "b1")]


def test_custom_check_query_is_jinja_rendered(spark):
    from datetime import datetime

    pipe = make_pipeline(
        [
            sql_asset(
                "cc_jinja",
                "SELECT CAST('2024-01-15' AS DATE) AS d",
                custom=[
                    CustomCheck(
                        name="in_window",
                        query=(
                            "SELECT COUNT(*) FROM cc_jinja "
                            "WHERE d < DATE '{{ start_date }}' OR d >= DATE '{{ end_date }}'"
                        ),
                    )
                ],
            )
        ]
    )
    ctx = RenderContext(start=datetime(2024, 1, 1), end=datetime(2024, 2, 1))
    res = Scheduler(spark, pipe, context=ctx).run()
    assert res.ok, [i.error for i in res.check_results] if res.check_results else res.failed


def test_backfill_time_interval_each_chunk_own_window(spark):
    """Regression: a reused Pipeline must not pin chunk 1's interval into
    Asset.parameters — every backfill chunk replaces ITS OWN window."""
    from datetime import datetime

    from bruin_spark.scheduler.scheduler import backfill

    pipe = make_pipeline(
        [
            Asset(
                name="ti_bf",
                type="spark.sql",
                query=(
                    "SELECT CAST('{{ start_date }} 12:00:00' AS TIMESTAMP) AS ts, "
                    "'new' AS src"
                ),
                materialization=Materialization(
                    type=MaterializationType.TABLE,
                    strategy=Strategy.TIME_INTERVAL,
                    incremental_key="ts",
                    time_granularity="timestamp",
                ),
            )
        ]
    )
    spark.sql("DROP TABLE IF EXISTS ti_bf")
    spark.sql(
        "CREATE TABLE ti_bf AS "
        "SELECT CAST('2024-01-01 06:00:00' AS TIMESTAMP) AS ts, 'old' AS src "
        "UNION ALL SELECT CAST('2024-01-02 06:00:00' AS TIMESTAMP), 'old' "
        "UNION ALL SELECT CAST('2024-03-01 00:00:00' AS TIMESTAMP), 'old'"
    )
    results = backfill(
        spark, pipe, datetime(2024, 1, 1), datetime(2024, 1, 3), granularity="day"
    )
    assert len(results) == 2 and all(r.ok for r in results)
    rows = sorted((str(r["ts"]), r["src"]) for r in spark.table("ti_bf").collect())
    # both daily windows were replaced by their own chunk; March survives
    assert rows == [
        ("2024-01-01 12:00:00", "new"),
        ("2024-01-02 12:00:00", "new"),
        ("2024-03-01 00:00:00", "old"),
    ]


def test_interval_modifiers_applied_exactly_once(spark):
    """Regression: with a start modifier of -1d the rendered SQL and the
    time_interval delete window must agree on the SAME single shift."""
    from datetime import datetime

    asset = Asset(
        name="ti_mod",
        type="spark.sql",
        query="SELECT CAST('{{ start_date }} 00:00:00' AS TIMESTAMP) AS ts",
        materialization=Materialization(
            type=MaterializationType.TABLE,
            strategy=Strategy.TIME_INTERVAL,
            incremental_key="ts",
            time_granularity="timestamp",
        ),
        interval_modifiers={"start": "-1d"},
    )
    spark.sql("DROP TABLE IF EXISTS ti_mod")
    spark.sql(
        "CREATE TABLE ti_mod AS "
        "SELECT CAST('2024-01-07 12:00:00' AS TIMESTAMP) AS ts "  # outside window
        "UNION ALL SELECT CAST('2024-01-08 06:00:00' AS TIMESTAMP)"  # inside
    )
    ctx = RenderContext(start=datetime(2024, 1, 9), end=datetime(2024, 1, 10))
    res = Scheduler(spark, make_pipeline([asset]), context=ctx).run()
    assert res.ok, res.failed
    rows = sorted(str(r["ts"]) for r in spark.table("ti_mod").collect())
    # single shift: rendered row AND delete window both start 2024-01-08 —
    # the 01-08 old row was replaced, the 01-07 row survived.  A double
    # shift would have rendered 01-07 while deleting from 01-08.
    assert rows == ["2024-01-07 12:00:00", "2024-01-08 00:00:00"]


def test_cyclic_dependencies_fail_instead_of_hanging(spark):
    pipe = make_pipeline(
        [
            sql_asset("cy_a", "SELECT 1", deps=["cy_b"]),
            sql_asset("cy_b", "SELECT 1", deps=["cy_a"]),
        ]
    )
    res = Scheduler(spark, pipe, workers=2).run()
    assert not res.ok
    assert set(res.failed) == {"cy_a", "cy_b"}
    sched = Scheduler(spark, pipe, workers=2)
    sched.run()
    assert "cycle" in sched.instances["cy_a"].error


def test_interval_modifiers_gating(spark):
    """ref cmd/run.go:553-562: modifiers are skipped when disabled, and
    always skipped under full-refresh."""
    from bruin_spark.model.pipeline import Asset, Pipeline
    from bruin_spark.scheduler.scheduler import Scheduler

    a = Asset(name="m_probe", type="spark.sql", query="SELECT 1 AS x",
              interval_modifiers={"start": "-2h"})
    pipe = Pipeline(name="p", assets=[a])
    on = Scheduler(spark, pipe, apply_interval_modifiers=True)
    off = Scheduler(spark, pipe, apply_interval_modifiers=False)
    fr = Scheduler(spark, pipe, apply_interval_modifiers=True, full_refresh=True)
    assert on._mods(a) == {"start": "-2h"}
    assert off._mods(a) == {}
    assert fr._mods(a) == {}


def test_concurrent_check_instances_share_one_scan(spark):
    """Sibling check instances dispatched together must share ONE fused
    scan (the per-asset scan lock), not each run their own."""
    from unittest.mock import patch

    import bruin_spark.scheduler.scheduler as sched_mod
    from bruin_spark.scheduler import Scheduler

    src = sql_asset("scan_once", "SELECT id AS v FROM RANGE(50)")
    src.columns = [
        Column(name="v", checks=[ColumnCheck(name="not_null"), ColumnCheck(name="unique"),
                                 ColumnCheck(name="non_negative")]),
    ]
    pipe = Pipeline(name="p", assets=[src])
    calls = []
    real = sched_mod.run_asset_checks

    def counted(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    with patch.object(sched_mod, "run_asset_checks", side_effect=counted):
        res = Scheduler(spark, pipe, workers=8).run()
    assert res.ok
    assert len(calls) == 1  # one fused scan for all three checks


def test_non_blocking_check_failure_warn_only_run_ok(spark):
    """A failed non-blocking check shows in res.failed (visible) but is
    warn-only at run level: res.ok stays True, backfills continue."""
    src = sql_asset("src_wo", "SELECT CAST(NULL AS INT) AS v")
    src.columns = [Column(name="v", checks=[ColumnCheck(name="not_null", blocking=False)])]
    down = sql_asset("down_wo", "SELECT 1 AS x", deps=["src_wo"])
    pipe = Pipeline(name="p", assets=[src, down])
    res = Scheduler(spark, pipe, workers=2).run()
    assert "src_wo:check:v:not_null" in res.failed
    assert "src_wo:check:v:not_null" in res.warn_only_failed
    assert "down_wo" in res.succeeded  # not gated
    assert res.ok  # warn-only: run still green


def test_thousand_asset_dag_stress(spark):
    """1000-asset width-100/depth-10 DAG with per-asset timeouts,
    cooldowns, and tier pools active: every instance succeeds, dependency
    order holds (a node completes only after its upstream completed), and
    scheduling overhead stays bounded (ref behavior:
    pkg/scheduler/scheduler.go:836-1140)."""
    import time

    import bench

    pipe = bench.synthetic_dag(width=100, depth=10)
    finished = {}
    lock = threading.Lock()

    def noop(s, asset, ctx):
        with lock:
            finished[asset.name] = len(finished)

    t0 = time.perf_counter()
    sched = Scheduler(spark, pipe, operators={"noop": noop})
    res = sched.run()
    wall = time.perf_counter() - t0

    assert res.ok
    assert len(finished) == 1000
    statuses = {i.status for i in sched.instances.values()}
    assert statuses == {InstanceStatus.SUCCEEDED}
    # dependency order: completion index of a node is after its upstreams
    for a in pipe.assets:
        for up in a.depends:
            assert finished[up.value] < finished[a.name], (up.value, a.name)
    # overhead gate: generous bound; a Tick-loop regression (e.g.
    # quadratic ready-scan) blows through this immediately
    assert wall / len(finished) < 0.05, f"{wall:.1f}s for 1000 instances"


def test_random_dag_failure_propagation_property(spark):
    """Property over random DAGs: the set of failed-or-skipped assets is
    exactly the union of the intrinsically-failing assets and their
    transitive descendants; everything else succeeds and runs after its
    upstreams (ref semantics: pkg/scheduler WillRunTaskPostFailures)."""
    import random

    for seed in range(6):
        rng = random.Random(seed)
        n = 30
        deps = {i: sorted(rng.sample(range(i), min(i, rng.randint(0, 3)))) for i in range(n)}
        failing = set(rng.sample(range(n), 4))
        # expected: descendants of failing nodes
        doomed = set(failing)
        for i in range(n):  # topological: deps are lower-numbered
            if any(d in doomed for d in deps[i]):
                doomed.add(i)

        finished = {}
        lock = threading.Lock()

        def op(s, asset, ctx, _failing=failing):
            with lock:
                finished[asset.name] = len(finished)
            if int(asset.name.split("_")[1]) in _failing:
                raise RuntimeError("boom")

        pipe = make_pipeline(
            [
                sql_asset(f"rnd_{i}", "SELECT 1", deps=[f"rnd_{d}" for d in deps[i]])
                for i in range(n)
            ]
        )
        sched = Scheduler(spark, pipe, operators={"spark.sql": op}, retries=0)
        res = sched.run()
        assert not res.ok
        got_failed = {
            int(k.split("_")[1].split(":")[0])
            for k, inst in sched.instances.items()
            if inst.status in (InstanceStatus.FAILED, InstanceStatus.UPSTREAM_FAILED)
        }
        assert got_failed == doomed, f"seed {seed}: {sorted(got_failed)} != {sorted(doomed)}"
        # a node RUNS iff none of its deps are doomed (a failing node
        # with a doomed upstream is upstream_failed and never executes)
        ran_expected = {i for i in range(n) if not any(d in doomed for d in deps[i])}
        assert set(finished) == {f"rnd_{i}" for i in ran_expected}
        # every executed node started after all its upstreams completed
        for i in ran_expected:
            for d in deps[i]:
                assert finished[f"rnd_{d}"] < finished[f"rnd_{i}"]


def test_connection_limits_honored(spark):
    """Per-connection concurrency limits (ref: scheduler.go
    canAcquireConnectionSlots): with pg_main limited to 1, the three
    pg_main assets never overlap; the unlimited side runs freely; a
    task consuming TWO limited connections needs capacity on both."""
    import time

    active = {"pg_main": 0, "src_db": 0}
    peak = {"pg_main": 0, "src_db": 0}
    lock = threading.Lock()

    def op(s, asset, ctx):
        conns = []
        if asset.connection:
            conns.append(asset.connection)
        if "source_connection" in asset.parameters:
            conns.append(asset.parameters["source_connection"])
        with lock:
            for c in conns:
                if c in active:
                    active[c] += 1
                    peak[c] = max(peak[c], active[c])
        time.sleep(0.05)
        with lock:
            for c in conns:
                if c in active:
                    active[c] -= 1

    assets = [
        Asset(name=f"pg_{i}", type="spark.sql", connection="pg_main") for i in range(3)
    ] + [
        Asset(name=f"free_{i}", type="spark.sql", connection="other") for i in range(3)
    ] + [
        Asset(
            name="ingest_both",
            type="ingestr",
            connection="pg_main",
            parameters={"source_connection": "src_db"},
        )
    ]
    pipe = Pipeline(name="p", assets=assets, concurrency=8)
    sched = Scheduler(
        spark,
        pipe,
        operators={"spark.sql": op, "ingestr": op},
        connection_limits={"pg_main": 1, "src_db": 1},
    )
    res = sched.run()
    assert res.ok
    assert peak["pg_main"] == 1  # never two concurrent pg_main holders
    assert peak["src_db"] == 1

    # invalid limit rejected with the reference spelling
    with pytest.raises(ValueError, match='connection "x" has concurrency limit 0'):
        Scheduler(spark, pipe, operators={}, connection_limits={"x": 0})


def test_cancellation_returns_partial_results(spark, tmp_path):
    """KeyboardInterrupt mid-run returns partial results and saves state
    with remaining work PENDING so --continue can resume (ref:
    TestScheduler_RunReturnsPartialResultsOnCancellation)."""
    import _thread
    import time

    state_path = str(tmp_path / "state.json")

    def op(s, asset, ctx):
        if asset.name == "slow_b":
            # fire a KeyboardInterrupt at the main thread mid-task
            _thread.interrupt_main()
            time.sleep(0.3)

    pipe = make_pipeline(
        [
            sql_asset("fast_a", "SELECT 1"),
            sql_asset("slow_b", "SELECT 1", deps=["fast_a"]),
            sql_asset("never_c", "SELECT 1", deps=["slow_b"]),
        ]
    )
    sched = Scheduler(spark, pipe, operators={"spark.sql": op}, workers=1)
    res = sched.run(state_path=state_path)
    assert "fast_a" in res.succeeded
    # state saved; never_c remains pending or was finished depending on
    # drain timing — but the run RETURNED instead of dying
    state = PipelineState.load(state_path)
    assert state.statuses["fast_a"] == "succeeded"
