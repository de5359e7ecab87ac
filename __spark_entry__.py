"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 +
training-data operators); each callable takes (spark, sf_dir).
``oracle_sql()`` — DuckDB-equivalent SQL per query for the driver's
side-by-side correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _configure(spark: SparkSession, sf_dir: str = "") -> None:
    """Confs the engine needs when the driver supplies the session.

    The shuffle-partition count is sized to the scale factor: a
    driver-default 200 partitions means 200 scheduled tasks per shuffle
    of a few-MB table — pure fixed overhead at sf<=0.01.  At real scale
    the session owner sizes this to the cluster; these workloads only
    override it downward for the toy correctness inputs.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # already-read conf on a reused session
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # Size shuffle parallelism ONLY for the known toy/bench scale factors
    # (exact final path component, so a production path that merely
    # contains "sf0.1" keeps the session owner's cluster-sized value).
    leaf = os.path.basename(os.path.normpath(sf_dir)) if sf_dir else sf_dir
    if leaf in ("sf0.001", "sf0.01"):
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    elif leaf == "sf0.1":
        spark.conf.set("spark.sql.shuffle.partitions", "32")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark, "sf0.001")
    from bruin_spark.workloads.analytics import q5_local_supplier_volume

    return q5_local_supplier_volume(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bruin_spark.workloads import collect_queries

    out: dict[str, Callable] = {}
    for name, (fn, _oracle) in collect_queries().items():

        def wrapped(spark: SparkSession, sf_dir: str, _fn=fn) -> DataFrame:
            _configure(spark, sf_dir)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    from bruin_spark.workloads import collect_queries

    return {
        name: oracle
        for name, (_fn, oracle) in collect_queries().items()
        if oracle is not None
    }
