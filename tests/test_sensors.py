"""Sensor tests: modes, polling, scheduler integration."""

import pytest

from bruin_spark.model.pipeline import Asset, Pipeline, Upstream
from bruin_spark.operators.sensors import (
    SensorNotReady,
    SensorSkip,
    path_sensor,
    query_sensor,
    table_sensor,
)
from bruin_spark.scheduler import Scheduler


def test_query_sensor_ready(spark):
    assert query_sensor(spark, "SELECT 1", mode="once")


def test_query_sensor_not_ready_once(spark):
    with pytest.raises(SensorNotReady):
        query_sensor(spark, "SELECT 0", mode="once")


def test_query_sensor_skip_mode(spark):
    with pytest.raises(SensorSkip):
        query_sensor(spark, "SELECT 0", mode="skip")


def test_query_sensor_wait_polls(spark, tmp_path):
    flag = tmp_path / "ready"
    calls = {"n": 0}

    import bruin_spark.operators.sensors as S

    def fake_check():
        calls["n"] += 1
        return calls["n"] >= 3

    assert S._poll(fake_check, "wait", poke_interval_s=0.01, timeout_s=5)
    assert calls["n"] == 3


def test_wait_timeout(spark):
    with pytest.raises(TimeoutError):
        query_sensor(spark, "SELECT 0", mode="wait", poke_interval_s=0.01, timeout_s=0.05)


def test_table_sensor(spark):
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW sensor_t AS SELECT 1 AS x")
    assert table_sensor(spark, "sensor_t", mode="once")
    with pytest.raises(SensorNotReady):
        table_sensor(spark, "no_such_table_xyz", mode="once")


def test_path_sensor(spark, tmp_path):
    f = tmp_path / "marker"
    f.write_text("x")
    assert path_sensor(spark, str(f), mode="once")
    with pytest.raises(SensorNotReady):
        path_sensor(spark, str(tmp_path / "missing"), mode="once")


def test_sensor_skip_in_scheduler_lets_downstream_run(spark):
    ran = []

    def track(s, asset, ctx):
        ran.append(asset.name)

    pipe = Pipeline(
        name="p",
        assets=[
            Asset(
                name="gate",
                type="spark.sensor.query",
                parameters={"query": "SELECT 0", "mode": "skip"},
            ),
            Asset(name="after", type="spark.sql", query="SELECT 1", depends=[Upstream(value="gate")]),
        ],
        concurrency=2,
    )
    res = Scheduler(spark, pipe, operators={"spark.sql": track}).run()
    assert "gate" in res.skipped
    assert "after" in res.succeeded and ran == ["after"]


def test_run_level_sensor_mode_override(spark):
    """--sensor-mode skip turns a would-block wait sensor into a SKIPPED
    instance (ref cmd/run.go:607)."""
    from bruin_spark.model.pipeline import Asset, Pipeline, Upstream
    from bruin_spark.scheduler.scheduler import InstanceStatus, Scheduler

    p = Pipeline(
        name="p",
        assets=[
            Asset(
                name="gate",
                type="spark.sensor.query",
                parameters={"query": "SELECT 0", "mode": "wait", "timeout": "1"},
            ),
            Asset(name="down", type="spark.sql", query="SELECT 1 AS x",
                  depends=[Upstream(value="gate")]),
        ],
    )
    sched = Scheduler(spark, p, sensor_mode="skip")
    res = sched.run()
    assert sched.instances["gate"].status == InstanceStatus.SKIPPED
    # skipped sensor satisfies readiness -> downstream still runs
    assert "down" in res.succeeded
