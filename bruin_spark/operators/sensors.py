"""Sensors: poll external state until ready (ref: pkg/ansisql/
operator.go:23-241 query/table sensors; pkg/s3 key sensor).

Modes (reference semantics):
- ``wait`` (default): poke every ``poke_interval_s`` until ready or
  ``timeout_s`` (TimeoutError);
- ``once``: poke once; raise SensorNotReady if not ready;
- ``skip``: poke once; raise SensorSkip — the scheduler marks the
  instance (and nothing else) as skipped, downstreams still run.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

DEFAULT_POKE_INTERVAL_S = 30.0


class SensorNotReady(RuntimeError):
    pass


class SensorSkip(Exception):
    """Sensor not ready in skip mode — instance becomes SKIPPED."""


def _poll(check, mode: str, poke_interval_s: float, timeout_s: float | None) -> bool:
    if mode in ("once", "skip"):
        ok = check()
        if ok:
            return True
        if mode == "skip":
            raise SensorSkip("sensor condition not met (skip mode)")
        raise SensorNotReady("sensor condition not met (once mode)")
    deadline = time.monotonic() + timeout_s if timeout_s else None
    while True:
        if check():
            return True
        if deadline and time.monotonic() > deadline:
            raise TimeoutError(f"sensor timed out after {timeout_s}s")
        time.sleep(poke_interval_s)


def query_sensor(
    spark: SparkSession,
    query: str,
    mode: str = "wait",
    poke_interval_s: float = DEFAULT_POKE_INTERVAL_S,
    timeout_s: float | None = None,
) -> bool:
    """Ready when the query's first scalar is > 0."""

    def check() -> bool:
        rows = spark.sql(query).collect()
        return bool(rows) and rows[0][0] is not None and rows[0][0] > 0

    return _poll(check, mode, poke_interval_s, timeout_s)


def table_sensor(
    spark: SparkSession,
    table: str,
    mode: str = "wait",
    poke_interval_s: float = DEFAULT_POKE_INTERVAL_S,
    timeout_s: float | None = None,
) -> bool:
    """Ready when the table exists in the catalog."""
    return _poll(
        lambda: spark.catalog.tableExists(table), mode, poke_interval_s, timeout_s
    )


def path_sensor(
    spark: SparkSession,
    path: str,
    mode: str = "wait",
    poke_interval_s: float = DEFAULT_POKE_INTERVAL_S,
    timeout_s: float | None = None,
) -> bool:
    """Ready when the path exists — local FS or any Hadoop-visible URI
    (s3a://, hdfs://, file://); the S3-key-sensor analog."""

    def check() -> bool:
        import os

        if "://" not in path or path.startswith("file://"):
            return os.path.exists(path.removeprefix("file://"))
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(conf).exists(p)

    return _poll(check, mode, poke_interval_s, timeout_s)
