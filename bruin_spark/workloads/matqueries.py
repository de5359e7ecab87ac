"""Materialization-strategy workloads: every §2.2 strategy executed
end-to-end (multi-batch where the strategy is incremental), with the
final table state oracle-checked against DuckDB SQL that computes the
same outcome declaratively.

Determinism: Materializer(now=T0/T1) pins SCD2 timestamps; batches are
fixed subsets of the driver tables; every target gets a fresh DROP
before the run so reruns are stable.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from bruin_spark.mat.executor import Materializer
from bruin_spark.model.pipeline import (
    Asset,
    Column,
    Materialization,
    MaterializationType,
    Strategy,
)
from bruin_spark.session import read_parquet

T0 = datetime(2024, 1, 1)
T1 = datetime(2024, 2, 1)
T0S, T1S = "2024-01-01 00:00:00", "2024-02-01 00:00:00"
OPEN_END = "9999-12-31 00:00:00"


def _load(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        read_parquet(spark, os.path.join(sf_dir, f"{n}.parquet")).createOrReplaceTempView(n)


def _asset(name: str, strategy: Strategy, columns=None, **mat_kw) -> Asset:
    return Asset(
        name=name,
        materialization=Materialization(
            type=MaterializationType.TABLE, strategy=strategy, **mat_kw
        ),
        columns=columns or [],
    )


def _fresh(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")


# -- create+replace ------------------------------------------------------------


def mat_create_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    _load(spark, sf_dir, "orders")
    a = _asset("mq_cr", Strategy.CREATE_REPLACE)
    _fresh(spark, a.name)
    q = "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus"
    Materializer(spark, now=T0).run(a, q)
    Materializer(spark, now=T0).run(a, q)  # replace is idempotent
    return spark.table(a.name)


CR_ORACLE = "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus"


# -- view ----------------------------------------------------------------------


def mat_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    _load(spark, sf_dir, "nation")
    a = Asset(name="mq_view", materialization=Materialization(type=MaterializationType.VIEW))
    Materializer(spark, now=T0).run(a, "SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 0")
    return spark.table(a.name)


VIEW_ORACLE = "SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 0"


# -- append --------------------------------------------------------------------


def mat_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    _load(spark, sf_dir, "nation")
    a = _asset("mq_append", Strategy.APPEND)
    _fresh(spark, a.name)
    q = "SELECT n_nationkey, n_name FROM nation"
    Materializer(spark, now=T0).run(a, q)
    Materializer(spark, now=T0).run(a, q)
    from pyspark.sql import functions as F

    return spark.table(a.name).groupBy("n_nationkey").agg(F.count(F.lit(1)).alias("copies"))


APPEND_ORACLE = "SELECT n_nationkey, 2::BIGINT AS copies FROM nation"


# -- truncate+insert -----------------------------------------------------------


def mat_truncate_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    _load(spark, sf_dir, "nation")
    a = _asset("mq_trunc", Strategy.TRUNCATE_INSERT)
    _fresh(spark, a.name)
    Materializer(spark, now=T0).run(a, "SELECT n_nationkey, n_name FROM nation")
    Materializer(spark, now=T0).run(
        a, "SELECT n_nationkey, n_name FROM nation WHERE n_regionkey < 3"
    )
    return spark.table(a.name)


TRUNC_ORACLE = "SELECT n_nationkey, n_name FROM nation WHERE n_regionkey < 3"


# -- delete+insert -------------------------------------------------------------


def mat_delete_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    _load(spark, sf_dir, "nation")
    a = _asset("mq_delins", Strategy.DELETE_INSERT, incremental_key="n_regionkey")
    _fresh(spark, a.name)
    Materializer(spark, now=T0).run(a, "SELECT n_nationkey, n_name, n_regionkey FROM nation")
    Materializer(spark, now=T0).run(
        a,
        "SELECT n_nationkey, UPPER(n_name) AS n_name, n_regionkey FROM nation "
        "WHERE n_regionkey IN (1, 2)",
    )
    return spark.table(a.name)


DELINS_ORACLE = """
SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey NOT IN (1, 2)
UNION ALL
SELECT n_nationkey, UPPER(n_name) AS n_name, n_regionkey FROM nation WHERE n_regionkey IN (1, 2)
"""


# -- time_interval -------------------------------------------------------------


def mat_time_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    _load(spark, sf_dir, "orders")
    a = _asset(
        "mq_tint",
        Strategy.TIME_INTERVAL,
        incremental_key="o_orderdate",
        time_granularity="timestamp",
    )
    a.parameters = {"_interval_start": "1996-03-01 00:00:00", "_interval_end": "1996-04-30 23:59:59"}
    _fresh(spark, a.name)
    base = (
        "SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_totalprice "
        "FROM orders WHERE o_orderdate < TIMESTAMP '1996-07-01 00:00:00'"
    )
    Materializer(spark, now=T0).run(a, base)
    window = (
        "SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, "
        "o_totalprice * 2 AS o_totalprice FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1996-03-01 00:00:00' "
        "AND o_orderdate <= TIMESTAMP '1996-04-30 23:59:59'"
    )
    Materializer(spark, now=T1).run(a, window)
    return spark.table(a.name)


TINT_ORACLE = """
SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_totalprice
FROM orders
WHERE o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND NOT (o_orderdate >= TIMESTAMP '1996-03-01 00:00:00' AND o_orderdate <= TIMESTAMP '1996-04-30 23:59:59')
UNION ALL
SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP), o_totalprice * 2
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-03-01 00:00:00' AND o_orderdate <= TIMESTAMP '1996-04-30 23:59:59'
"""


# -- merge ---------------------------------------------------------------------

_MERGE_COLS = [
    Column(name="c_custkey", type="bigint", primary_key=True),
    Column(name="c_acctbal", type="double", update_on_merge=True),
]


def mat_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    _load(spark, sf_dir, "customer")
    a = _asset("mq_merge", Strategy.MERGE, columns=_MERGE_COLS)
    _fresh(spark, a.name)
    Materializer(spark, now=T0).run(
        a, "SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey < 200"
    )
    Materializer(spark, now=T1).run(
        a,
        "SELECT c_custkey, c_acctbal + 100 AS c_acctbal FROM customer WHERE c_custkey < 100 "
        "UNION ALL SELECT c_custkey + 100000 AS c_custkey, 50.0 AS c_acctbal "
        "FROM customer WHERE c_custkey < 50",
    )
    return spark.table(a.name)


MERGE_ORACLE = """
SELECT c_custkey, c_acctbal + 100 AS c_acctbal FROM customer WHERE c_custkey < 100
UNION ALL
SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey >= 100 AND c_custkey < 200
UNION ALL
SELECT c_custkey + 100000, 50.0 FROM customer WHERE c_custkey < 50
"""


# -- ddl -----------------------------------------------------------------------


def mat_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _asset(
        "mq_ddl",
        Strategy.DDL,
        columns=[Column(name="id", type="bigint"), Column(name="name", type="string")],
    )
    _fresh(spark, a.name)
    Materializer(spark, now=T0).run(a, "")
    Materializer(spark, now=T0).run(a, "")  # IF NOT EXISTS — idempotent
    return spark.table(a.name)


DDL_ORACLE = "SELECT CAST(NULL AS BIGINT) AS id, CAST(NULL AS VARCHAR) AS name WHERE FALSE"


# -- scd2_by_column ------------------------------------------------------------

_SCD2_COLS = [
    Column(name="n_nationkey", type="bigint", primary_key=True),
    Column(name="n_name", type="string"),
]


def mat_scd2_by_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    _load(spark, sf_dir, "nation")
    a = _asset("mq_scd2c", Strategy.SCD2_BY_COLUMN, columns=_SCD2_COLS)
    _fresh(spark, a.name)
    Materializer(spark, now=T0).run(a, "SELECT n_nationkey, n_name FROM nation")
    # batch 2: keys 1,2 renamed; key 3 gone; key 990 new
    Materializer(spark, now=T1).run(
        a,
        "SELECT n_nationkey, CASE WHEN n_nationkey IN (1,2) THEN UPPER(n_name) || '_V2' "
        "ELSE n_name END AS n_name FROM nation WHERE n_nationkey <> 3 "
        "UNION ALL SELECT 990, 'NEWLAND'",
    )
    # _valid_until is projected as STRING because the open-row sentinel
    # (9999-12-31) overflows pandas datetime64[ns] in the driver harness;
    # the table itself keeps the timestamp sentinel (reference semantics).
    return spark.sql(
        f"SELECT _valid_from, n_nationkey, n_name, "
        f"CAST(_valid_until AS STRING) AS _valid_until, _is_current FROM {a.name}"
    )


SCD2C_ORACLE = f"""
-- unchanged keys: still current from T0
SELECT TIMESTAMP '{T0S}' AS _valid_from, n_nationkey, n_name,
       TIMESTAMP '{OPEN_END}'::VARCHAR AS _valid_until, TRUE AS _is_current
FROM nation WHERE n_nationkey NOT IN (1, 2, 3)
UNION ALL
-- changed keys: expired old version
SELECT TIMESTAMP '{T0S}', n_nationkey, n_name, TIMESTAMP '{T1S}'::VARCHAR, FALSE
FROM nation WHERE n_nationkey IN (1, 2)
UNION ALL
-- changed keys: new current version
SELECT TIMESTAMP '{T1S}', n_nationkey, UPPER(n_name) || '_V2', TIMESTAMP '{OPEN_END}'::VARCHAR, TRUE
FROM nation WHERE n_nationkey IN (1, 2)
UNION ALL
-- gone key: expired at now
SELECT TIMESTAMP '{T0S}', n_nationkey, n_name, TIMESTAMP '{T1S}'::VARCHAR, FALSE
FROM nation WHERE n_nationkey = 3
UNION ALL
-- brand-new key
SELECT TIMESTAMP '{T1S}', 990, 'NEWLAND', TIMESTAMP '{OPEN_END}'::VARCHAR, TRUE
"""


# -- scd2_by_time --------------------------------------------------------------

_SCD2T_COLS = [
    Column(name="n_nationkey", type="bigint", primary_key=True),
    Column(name="n_name", type="string"),
    Column(name="updated_at", type="timestamp"),
]


def mat_scd2_by_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    _load(spark, sf_dir, "nation")
    a = _asset(
        "mq_scd2t", Strategy.SCD2_BY_TIME, columns=_SCD2T_COLS, incremental_key="updated_at"
    )
    _fresh(spark, a.name)
    Materializer(spark, now=T0).run(
        a,
        f"SELECT n_nationkey, n_name, TIMESTAMP '{T0S}' AS updated_at FROM nation",
    )
    # batch 2: keys 1,2 get a NEWER updated_at (change); others unchanged
    Materializer(spark, now=T1).run(
        a,
        f"SELECT n_nationkey, CASE WHEN n_nationkey IN (1,2) THEN n_name || '_T1' ELSE n_name END AS n_name, "
        f"CASE WHEN n_nationkey IN (1,2) THEN TIMESTAMP '{T1S}' ELSE TIMESTAMP '{T0S}' END AS updated_at "
        "FROM nation",
    )
    # see mat_scd2_by_column: string-project the 9999-12-31 sentinel
    return spark.sql(
        f"SELECT _valid_from, n_nationkey, n_name, updated_at, "
        f"CAST(_valid_until AS STRING) AS _valid_until, _is_current FROM {a.name}"
    )


SCD2T_ORACLE = f"""
SELECT TIMESTAMP '{T0S}' AS _valid_from, n_nationkey, n_name,
       TIMESTAMP '{T0S}' AS updated_at, TIMESTAMP '{OPEN_END}'::VARCHAR AS _valid_until, TRUE AS _is_current
FROM nation WHERE n_nationkey NOT IN (1, 2)
UNION ALL
SELECT TIMESTAMP '{T0S}', n_nationkey, n_name, TIMESTAMP '{T0S}', TIMESTAMP '{T1S}'::VARCHAR, FALSE
FROM nation WHERE n_nationkey IN (1, 2)
UNION ALL
SELECT TIMESTAMP '{T1S}', n_nationkey, n_name || '_T1', TIMESTAMP '{T1S}', TIMESTAMP '{OPEN_END}'::VARCHAR, TRUE
FROM nation WHERE n_nationkey IN (1, 2)
"""


# -- data vault hub ------------------------------------------------------------

_HUB_COLS = [
    Column(name="hub_nation_hk", type="string", datavault_role="hash_key"),
    Column(name="n_name", type="string", datavault_role="business_key"),
    Column(name="load_ts", type="timestamp", datavault_role="load_datetime"),
    Column(name="rec_src", type="string", datavault_role="record_source"),
]


def mat_datavault_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    _load(spark, sf_dir, "nation")
    a = _asset("mq_dvhub", Strategy.DATAVAULT_HUB, columns=_HUB_COLS)
    _fresh(spark, a.name)
    m = Materializer(spark, now=T0)
    m.run(
        a,
        f"SELECT md5(n_name) AS hub_nation_hk, n_name, TIMESTAMP '{T0S}' AS load_ts, "
        "'batch1' AS rec_src FROM nation WHERE n_regionkey < 3",
    )
    m.run(
        a,
        f"SELECT md5(n_name) AS hub_nation_hk, n_name, TIMESTAMP '{T1S}' AS load_ts, "
        "'batch2' AS rec_src FROM nation",
    )
    return spark.table(a.name)


DVHUB_ORACLE = f"""
SELECT md5(n_name) AS hub_nation_hk, n_name, TIMESTAMP '{T0S}' AS load_ts, 'batch1' AS rec_src
FROM nation WHERE n_regionkey < 3
UNION ALL
SELECT md5(n_name), n_name, TIMESTAMP '{T1S}', 'batch2'
FROM nation WHERE n_regionkey >= 3
"""


# -- data vault link -------------------------------------------------------------

_LINK_COLS = [
    Column(name="link_nr_hk", type="string", datavault_role="link_hash_key"),
    Column(name="hub_nation_hk", type="string", datavault_role="hash_key"),
    Column(name="hub_region_hk", type="string", datavault_role="hash_key"),
    Column(name="load_ts", type="timestamp", datavault_role="load_datetime"),
    Column(name="rec_src", type="string", datavault_role="record_source"),
]


def mat_datavault_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert-only link load keyed on link_hash_key: batch 2 re-presents every
    nation-region pair, but only pairs unseen in batch 1 insert (first-load
    metadata wins).  Mirrors the reference's link materialization
    (pkg/duckdb/datavault_materialization.go:11-126)."""
    _load(spark, sf_dir, "nation", "region")
    a = _asset("mq_dvlink", Strategy.DATAVAULT_LINK, columns=_LINK_COLS)
    _fresh(spark, a.name)
    m = Materializer(spark, now=T0)
    pair = (
        "SELECT md5(n_name || r_name) AS link_nr_hk, md5(n_name) AS hub_nation_hk, "
        "md5(r_name) AS hub_region_hk, TIMESTAMP '{ts}' AS load_ts, '{src}' AS rec_src "
        "FROM nation JOIN region ON n_regionkey = r_regionkey{where}"
    )
    m.run(a, pair.format(ts=T0S, src="b1", where=" WHERE n_regionkey < 3"))
    m.run(a, pair.format(ts=T1S, src="b2", where=""))
    return spark.table(a.name)


DVLINK_ORACLE = f"""
SELECT md5(n_name || r_name) AS link_nr_hk, md5(n_name) AS hub_nation_hk,
       md5(r_name) AS hub_region_hk, TIMESTAMP '{T0S}' AS load_ts, 'b1' AS rec_src
FROM nation JOIN region ON n_regionkey = r_regionkey
WHERE n_regionkey < 3
UNION ALL
SELECT md5(n_name || r_name), md5(n_name), md5(r_name), TIMESTAMP '{T1S}', 'b2'
FROM nation JOIN region ON n_regionkey = r_regionkey
WHERE n_regionkey >= 3
"""


# -- data vault satellite ------------------------------------------------------

_SAT_COLS = [
    Column(name="hk", type="string", datavault_role="hash_key"),
    Column(name="hd", type="string", datavault_role="hash_diff"),
    Column(name="n_name", type="string"),
    Column(name="load_ts", type="timestamp", datavault_role="load_datetime"),
    Column(name="rec_src", type="string", datavault_role="record_source"),
]


def mat_datavault_satellite(spark: SparkSession, sf_dir: str) -> DataFrame:
    _load(spark, sf_dir, "nation")
    a = _asset("mq_dvsat", Strategy.DATAVAULT_SATELLITE, columns=_SAT_COLS)
    _fresh(spark, a.name)
    m = Materializer(spark, now=T0)
    m.run(
        a,
        "SELECT md5(CAST(n_nationkey AS STRING)) AS hk, md5(n_name) AS hd, n_name, "
        f"TIMESTAMP '{T0S}' AS load_ts, 'b1' AS rec_src FROM nation",
    )
    # load 2: payload changed only for keys 1,2 -> only those insert
    m.run(
        a,
        "SELECT md5(CAST(n_nationkey AS STRING)) AS hk, "
        "md5(CASE WHEN n_nationkey IN (1,2) THEN n_name || '_X' ELSE n_name END) AS hd, "
        "CASE WHEN n_nationkey IN (1,2) THEN n_name || '_X' ELSE n_name END AS n_name, "
        f"TIMESTAMP '{T1S}' AS load_ts, 'b2' AS rec_src FROM nation",
    )
    return spark.table(a.name)


DVSAT_ORACLE = f"""
SELECT md5(CAST(n_nationkey AS VARCHAR)) AS hk, md5(n_name) AS hd, n_name,
       TIMESTAMP '{T0S}' AS load_ts, 'b1' AS rec_src
FROM nation
UNION ALL
SELECT md5(CAST(n_nationkey AS VARCHAR)), md5(n_name || '_X'), n_name || '_X',
       TIMESTAMP '{T1S}', 'b2'
FROM nation WHERE n_nationkey IN (1, 2)
"""


QUERIES = {
    "mat_create_replace": (mat_create_replace, CR_ORACLE),
    "mat_view": (mat_view, VIEW_ORACLE),
    "mat_append": (mat_append, APPEND_ORACLE),
    "mat_truncate_insert": (mat_truncate_insert, TRUNC_ORACLE),
    "mat_delete_insert": (mat_delete_insert, DELINS_ORACLE),
    "mat_time_interval": (mat_time_interval, TINT_ORACLE),
    "mat_merge": (mat_merge, MERGE_ORACLE),
    "mat_ddl": (mat_ddl, DDL_ORACLE),
    "mat_scd2_by_column": (mat_scd2_by_column, SCD2C_ORACLE),
    "mat_scd2_by_time": (mat_scd2_by_time, SCD2T_ORACLE),
    "mat_datavault_hub": (mat_datavault_hub, DVHUB_ORACLE),
    "mat_datavault_link": (mat_datavault_link, DVLINK_ORACLE),
    "mat_datavault_satellite": (mat_datavault_satellite, DVSAT_ORACLE),
}
