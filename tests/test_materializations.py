"""Runtime tests for every materialization strategy (plain-parquet path).

Mirrors the reference's integration pipelines
(integration-tests/test-pipelines/duckdb-materialization-*,
duckdb-scd2-tests, duckdb-datavault-materialization) as in-session
DataFrame fixtures with t0/t1 snapshots.
"""

from datetime import datetime

import pytest

from bruin_spark.mat.executor import Materializer
from bruin_spark.model.pipeline import Asset

NOW = datetime(2024, 6, 1, 12, 0, 0)


def _mk(spark, name, sql):
    spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {sql}")


def rows(spark, name, order):
    return [tuple(r) for r in spark.table(name).orderBy(*[c.strip() for c in order.split(",")]).collect()]


@pytest.fixture()
def mat(spark):
    return Materializer(spark, now=NOW)


def test_create_replace_and_view(spark, mat):
    a = Asset.from_dict({"name": "t_cr", "materialization": {"type": "table", "strategy": "create+replace"}})
    mat.run(a, "SELECT 1 AS id, 'a' AS v")
    mat.run(a, "SELECT 2 AS id, 'b' AS v")  # replace
    assert rows(spark, "t_cr", "id") == [(2, "b")]

    v = Asset.from_dict({"name": "v_x", "materialization": {"type": "view"}})
    mat.run(v, "SELECT id * 2 AS id2 FROM t_cr")
    assert rows(spark, "v_x", "id2") == [(4,)]


def test_append_and_truncate_insert(spark, mat):
    a = Asset.from_dict({"name": "t_app", "materialization": {"type": "table", "strategy": "append"}})
    mat.run(a, "SELECT 1 AS id")
    mat.run(a, "SELECT 2 AS id")
    assert rows(spark, "t_app", "id") == [(1,), (2,)]

    t = Asset.from_dict({"name": "t_trunc", "materialization": {"type": "table", "strategy": "truncate+insert"}})
    mat.run(t, "SELECT 1 AS id")
    mat.run(t, "SELECT 9 AS id")
    assert rows(spark, "t_trunc", "id") == [(9,)]


def test_delete_insert(spark, mat):
    a = Asset.from_dict(
        {
            "name": "t_di",
            "materialization": {"type": "table", "strategy": "delete+insert", "incremental_key": "d"},
        }
    )
    mat.run(a, "SELECT * FROM VALUES ('2024-01-01', 'eu', 10.0), ('2024-01-01', 'us', 20.0), ('2024-01-02', 'eu', 30.0) AS t(d, region, amount)")
    # re-deliver day 1 with changed amounts: only day-1 rows replaced
    mat.run(a, "SELECT * FROM VALUES ('2024-01-01', 'eu', 11.0) AS t(d, region, amount)")
    assert rows(spark, "t_di", "d, region") == [
        ("2024-01-01", "eu", 11.0),
        ("2024-01-02", "eu", 30.0),
    ]


def test_delete_insert_partition_aligned(spark, mat):
    a = Asset.from_dict(
        {
            "name": "t_dip",
            "materialization": {
                "type": "table",
                "strategy": "delete+insert",
                "incremental_key": "d",
                "partition_by": "d",
            },
        }
    )
    mat.run(a, "SELECT * FROM VALUES ('2024-01-01', CAST(10.0 AS DOUBLE)), ('2024-01-02', CAST(30.0 AS DOUBLE)) AS t(d, amount)")
    mat.run(a, "SELECT * FROM VALUES ('2024-01-01', CAST(11.0 AS DOUBLE)) AS t(d, amount)")
    got = {(r["d"], r["amount"]) for r in spark.table("t_dip").collect()}
    assert got == {("2024-01-01", 11.0), ("2024-01-02", 30.0)}


def test_time_interval(spark, mat):
    a = Asset.from_dict(
        {
            "name": "t_ti",
            "materialization": {
                "type": "table",
                "strategy": "time_interval",
                "incremental_key": "d",
                "time_granularity": "date",
            },
        }
    )
    a.parameters["_interval_start"] = "2024-01-01"
    a.parameters["_interval_end"] = "2024-01-02"
    mat.run(
        a,
        "SELECT CAST(d AS DATE) AS d, amount FROM VALUES ('2024-01-01', 1.0), ('2024-01-02', 2.0), ('2024-01-03', 3.0) AS t(d, amount)",
    )
    # rerun same window with new data: only rows in window replaced
    mat.run(a, "SELECT CAST('2024-01-01' AS DATE) AS d, 9.0 AS amount")
    got = sorted((str(r[0]), r[1]) for r in spark.table("t_ti").collect())
    assert got == [("2024-01-01", 9.0), ("2024-01-03", 3.0)]


def test_merge_update_on_merge_and_merge_sql(spark, mat):
    a = Asset.from_dict(
        {
            "name": "t_merge",
            "materialization": {"type": "table", "strategy": "merge"},
            "columns": [
                {"name": "item_id", "type": "int", "primary_key": True},
                {"name": "item_name", "type": "string", "update_on_merge": True},
                {"name": "stock", "type": "int", "merge_sql": "target.stock + source.stock"},
                {"name": "unit_price", "type": "double"},
            ],
        }
    )
    mat.run(a, "SELECT * FROM VALUES (1, 'a', 10, 1.5), (2, 'b', 20, 2.5) AS t(item_id, item_name, stock, unit_price)")
    mat.run(a, "SELECT * FROM VALUES (2, 'B2', 5, 9.9), (3, 'c', 30, 3.5) AS t(item_id, item_name, stock, unit_price)")
    assert rows(spark, "t_merge", "item_id") == [
        (1, "a", 10, 1.5),
        (2, "B2", 25, 2.5),  # name updated, stock = 20+5 via merge_sql, price kept
        (3, "c", 30, 3.5),
    ]


def test_scd2_by_column(spark, mat):
    a = Asset.from_dict(
        {
            "name": "t_scd2c",
            "materialization": {"type": "table", "strategy": "scd2_by_column"},
            "columns": [
                {"name": "product_id", "type": "int", "primary_key": True},
                {"name": "price", "type": "double"},
            ],
        }
    )
    mat.run(a, "SELECT * FROM VALUES (1, 10.0), (2, 20.0), (3, 30.0) AS t(product_id, price)")
    # t1: price change on 1, new id 4, id 3 absent (expire)
    m2 = Materializer(spark, now=datetime(2024, 6, 2, 12, 0, 0))
    m2.run(a, "SELECT * FROM VALUES (1, 11.0), (2, 20.0), (4, 40.0) AS t(product_id, price)")

    got = {
        (r["product_id"], r["price"], r["_is_current"]) for r in spark.table("t_scd2c").collect()
    }
    assert got == {
        (1, 10.0, False),
        (1, 11.0, True),
        (2, 20.0, True),
        (3, 30.0, False),
        (4, 40.0, True),
    }
    cur = spark.sql("SELECT count(*) FROM t_scd2c WHERE _is_current").collect()[0][0]
    assert cur == 3


def test_scd2_by_time(spark, mat):
    a = Asset.from_dict(
        {
            "name": "t_scd2t",
            "materialization": {
                "type": "table",
                "strategy": "scd2_by_time",
                "incremental_key": "updated_at",
            },
            "columns": [
                {"name": "product_id", "type": "int", "primary_key": True},
                {"name": "price", "type": "double"},
                {"name": "updated_at", "type": "timestamp"},
            ],
        }
    )
    mat.run(
        a,
        "SELECT product_id, price, CAST(updated_at AS TIMESTAMP) AS updated_at FROM VALUES "
        "(1, 10.0, '2024-01-01 00:00:00'), (2, 20.0, '2024-01-01 00:00:00') AS t(product_id, price, updated_at)",
    )
    mat.run(
        a,
        "SELECT product_id, price, CAST(updated_at AS TIMESTAMP) AS updated_at FROM VALUES "
        "(1, 11.0, '2024-02-01 00:00:00'), (2, 20.0, '2024-01-01 00:00:00') AS t(product_id, price, updated_at)",
    )
    got = {
        (r["product_id"], r["price"], r["_is_current"], str(r["_valid_from"]))
        for r in spark.table("t_scd2t").collect()
    }
    assert got == {
        (1, 10.0, False, "2024-01-01 00:00:00"),
        (1, 11.0, True, "2024-02-01 00:00:00"),
        (2, 20.0, True, "2024-01-01 00:00:00"),
    }
    # expired row's _valid_until = new version's _valid_from
    vu = spark.sql(
        "SELECT _valid_until FROM t_scd2t WHERE product_id = 1 AND NOT _is_current"
    ).collect()[0][0]
    assert str(vu) == "2024-02-01 00:00:00"


def test_full_refresh_override(spark, mat):
    a = Asset.from_dict(
        {
            "name": "t_fr",
            "materialization": {"type": "table", "strategy": "append"},
        }
    )
    mat.run(a, "SELECT 1 AS id")
    mat.run(a, "SELECT 2 AS id")
    fr = Materializer(spark, full_refresh=True, now=NOW)
    fr.run(a, "SELECT 5 AS id")
    assert rows(spark, "t_fr", "id") == [(5,)]


def test_datavault_hub(spark, mat):
    a = Asset.from_dict(
        {
            "name": "t_dvhub",
            "materialization": {"type": "table", "strategy": "datavault_hub"},
            "columns": [
                {"name": "customer_hk", "type": "string", "datavault_role": "hash_key"},
                {"name": "customer_id", "type": "string", "datavault_role": "business_key"},
                {"name": "load_ts", "type": "timestamp", "datavault_role": "load_datetime"},
                {"name": "record_source", "type": "string", "datavault_role": "record_source"},
            ],
        }
    )
    src = (
        "SELECT customer_hk, customer_id, CAST(load_ts AS TIMESTAMP) AS load_ts, record_source FROM VALUES "
        "('h1', 'c1', '2024-01-01 00:00:00', 'crm'), "
        "('h1', 'c1', '2024-01-02 00:00:00', 'crm'), "  # dup hash key → dedup to earliest
        "('h2', 'c2', '2024-01-01 00:00:00', 'crm'), "
        "(NULL, 'c3', '2024-01-01 00:00:00', 'crm') "  # null mandatory → dropped
        "AS t(customer_hk, customer_id, load_ts, record_source)"
    )
    mat.run(a, src)
    assert spark.table("t_dvhub").count() == 2
    mat.run(a, src)  # idempotent: existing hash keys not re-inserted
    assert spark.table("t_dvhub").count() == 2


def test_datavault_satellite(spark, mat):
    a = Asset.from_dict(
        {
            "name": "t_dvsat",
            "materialization": {"type": "table", "strategy": "datavault_satellite"},
            "columns": [
                {"name": "customer_hk", "type": "string", "datavault_role": "hash_key"},
                {"name": "hashdiff", "type": "string", "datavault_role": "hash_diff"},
                {"name": "name", "type": "string"},
                {"name": "load_ts", "type": "timestamp", "datavault_role": "load_datetime"},
                {"name": "record_source", "type": "string", "datavault_role": "record_source"},
            ],
        }
    )
    t0 = (
        "SELECT customer_hk, hashdiff, name, CAST(load_ts AS TIMESTAMP) AS load_ts, record_source FROM VALUES "
        "('h1', 'd1', 'Alice', '2024-01-01 00:00:00', 'crm'), "
        "('h1', 'd1', 'Alice', '2024-01-01 00:00:00', 'crm') "  # exact dup → dedup
        "AS t(customer_hk, hashdiff, name, load_ts, record_source)"
    )
    mat.run(a, t0)
    assert spark.table("t_dvsat").count() == 1
    # t1: attribute change → new hashdiff, new row; unchanged redelivery ignored
    t1 = (
        "SELECT customer_hk, hashdiff, name, CAST(load_ts AS TIMESTAMP) AS load_ts, record_source FROM VALUES "
        "('h1', 'd1', 'Alice', '2024-01-01 00:00:00', 'crm'), "
        "('h1', 'd2', 'Alicia', '2024-01-02 00:00:00', 'crm') "
        "AS t(customer_hk, hashdiff, name, load_ts, record_source)"
    )
    mat.run(a, t1)
    got = rows(spark, "t_dvsat", "load_ts")
    assert len(got) == 2 and got[1][1] == "d2"


def test_merge_raises_on_duplicate_source_pks(spark, mat):
    """MERGE INTO semantics: >1 source row per PK is a cardinality error,
    not a silent duplication of the matched target row."""
    a = Asset.from_dict(
        {
            "name": "t_merge_card",
            "materialization": {"type": "table", "strategy": "merge"},
            "columns": [
                {"name": "id", "type": "bigint", "primary_key": True},
                {"name": "v", "type": "string", "update_on_merge": True},
            ],
        }
    )
    spark.sql("DROP TABLE IF EXISTS t_merge_card")
    mat.run(a, "SELECT 1 AS id, 'a' AS v")
    with pytest.raises(Exception, match="(?i)more than one row|assert"):
        mat.run(a, "SELECT 1 AS id, 'b' AS v UNION ALL SELECT 1, 'c'")


def test_merge_duplicate_source_pks_unmatched_insert(spark, mat):
    """MERGE INTO only errors when duplicates match the same TARGET row;
    duplicate-PK source rows matching no target row insert (one WHEN NOT
    MATCHED action per source row)."""
    a = Asset.from_dict(
        {
            "name": "t_merge_card2",
            "materialization": {"type": "table", "strategy": "merge"},
            "columns": [
                {"name": "id", "type": "int", "primary_key": True},
                {"name": "v", "type": "string", "update_on_merge": True},
            ],
        }
    )
    spark.sql("DROP TABLE IF EXISTS t_merge_card2")
    mat.run(a, "SELECT 1 AS id, 'a' AS v")
    # id=2 is absent from the target: both duplicate rows insert
    mat.run(a, "SELECT 2 AS id, 'b' AS v UNION ALL SELECT 2, 'c'")
    got = sorted(spark.table("t_merge_card2").collect(), key=lambda r: (r["id"], r["v"]))
    assert [(r["id"], r["v"]) for r in got] == [(1, "a"), (2, "b"), (2, "c")]


def test_merge_null_pk_rows_update_not_drop(spark, mat):
    """eqNullSafe join: a NULL-pk source row matches a NULL-pk target row
    and must UPDATE it (constant probe column, not pk IS NOT NULL)."""
    a = Asset.from_dict(
        {
            "name": "t_merge_nullpk",
            "materialization": {"type": "table", "strategy": "merge"},
            "columns": [
                {"name": "id", "type": "bigint", "primary_key": True},
                {"name": "v", "type": "string", "update_on_merge": True},
            ],
        }
    )
    spark.sql("DROP TABLE IF EXISTS t_merge_nullpk")
    mat.run(a, "SELECT CAST(NULL AS BIGINT) AS id, 'old' AS v UNION ALL SELECT 7, 'seven'")
    mat.run(a, "SELECT CAST(NULL AS BIGINT) AS id, 'updated' AS v")
    got = sorted([(r["id"], r["v"]) for r in spark.table("t_merge_nullpk").collect()], key=str)
    assert (None, "updated") in got and (7, "seven") in got and len(got) == 2


def test_bucketed_create_replace_sql_golden():
    from bruin_spark.mat.strategies import render_materialization
    from bruin_spark.model.pipeline import (
        Asset,
        Materialization,
        MaterializationType,
        Strategy,
    )

    asset = Asset(
        name="b.t",
        type="spark.sql",
        materialization=Materialization(
            type=MaterializationType.TABLE,
            strategy=Strategy.CREATE_REPLACE,
            bucket_by=["k"],
            buckets=16,
        ),
    )
    stmts = render_materialization(asset, "SELECT 1 AS k", False)
    assert stmts[0] == "DROP TABLE IF EXISTS `b`.`t`"
    assert "USING parquet" in stmts[1]
    assert "CLUSTERED BY (`k`) SORTED BY (`k`) INTO 16 BUCKETS" in stmts[1]


def test_save_full_dotted_name_preserves_partitioning(spark):
    """create+replace on a schema-qualified PARTITIONED asset: the stage
    rename stays within the schema (no cross-db fallback), so the
    rewritten table keeps its partition layout — a later dynamic
    overwrite must only touch matching partitions."""
    from bruin_spark.mat.executor import Materializer
    from bruin_spark.model.pipeline import (
        Asset, Materialization, MaterializationType, Strategy,
    )

    spark.sql("DROP TABLE IF EXISTS msch.t_dot")
    a = Asset(
        name="msch.t_dot",
        materialization=Materialization(
            type=MaterializationType.TABLE,
            strategy=Strategy.CREATE_REPLACE,
            partition_by="d",
        ),
    )
    m = Materializer(spark)
    m.run(a, "SELECT * FROM VALUES ('2024-01-01', 1), ('2024-01-02', 2) AS t(d, v)")
    m.run(a, "SELECT * FROM VALUES ('2024-01-01', 9), ('2024-01-03', 3) AS t(d, v)")
    part_cols = [c.name for c in spark.catalog.listColumns("msch.t_dot") if c.isPartition]
    assert part_cols == ["d"]
    got = sorted((r["d"], r["v"]) for r in spark.table("msch.t_dot").collect())
    assert got == [("2024-01-01", 9), ("2024-01-03", 3)]
    spark.sql("DROP TABLE msch.t_dot")


def test_view_with_dotted_name(spark):
    from bruin_spark.mat.executor import Materializer
    from bruin_spark.model.pipeline import Asset, Materialization, MaterializationType

    a = Asset(
        name="msch.v_dot",
        materialization=Materialization(type=MaterializationType.VIEW),
    )
    spark.sql("DROP VIEW IF EXISTS msch.v_dot")
    Materializer(spark).run(a, "SELECT 1 AS x")
    assert spark.table("msch.v_dot").collect()[0]["x"] == 1
    spark.sql("DROP VIEW msch.v_dot")


def test_scd2_rejects_duplicate_source_pks(spark):
    import pytest

    from bruin_spark.mat.executor import Materializer
    from bruin_spark.mat.strategies import MaterializationError
    from bruin_spark.model.pipeline import (
        Asset, Column, Materialization, MaterializationType, Strategy,
    )

    spark.sql("DROP TABLE IF EXISTS t_scd2dup")
    a = Asset(
        name="t_scd2dup",
        materialization=Materialization(
            type=MaterializationType.TABLE, strategy=Strategy.SCD2_BY_COLUMN
        ),
        columns=[Column(name="id", type="bigint", primary_key=True),
                 Column(name="v", type="string")],
    )
    m = Materializer(spark)
    m.run(a, "SELECT * FROM VALUES (1, 'a') AS t(id, v)")  # initial load
    with pytest.raises(MaterializationError, match="multiple rows for primary key"):
        m.run(a, "SELECT * FROM VALUES (1, 'b'), (1, 'c') AS t(id, v)")
    spark.sql("DROP TABLE t_scd2dup")


def test_insert_into_case_insensitive_alignment(spark):
    """A source with case-mismatched column names still reorders to the
    target's positional layout (Spark resolution is case-insensitive)."""
    from bruin_spark.mat.executor import Materializer
    from bruin_spark.model.pipeline import (
        Asset, Materialization, MaterializationType, Strategy,
    )

    spark.sql("DROP TABLE IF EXISTS t_case")
    a = Asset(
        name="t_case",
        materialization=Materialization(
            type=MaterializationType.TABLE, strategy=Strategy.APPEND
        ),
    )
    m = Materializer(spark)
    m.run(a, "SELECT 1 AS id, 'x' AS val")
    # second append: different order AND different case
    m.run(a, "SELECT 'y' AS VAL, 2 AS ID")
    got = sorted((r["id"], r["val"]) for r in spark.table("t_case").collect())
    assert got == [(1, "x"), (2, "y")]
    spark.sql("DROP TABLE t_case")


def test_raw_script_multi_statement_with_comments(spark, mat):
    """A strategy-less raw script holds several statements plus
    comments: each executes separately, trailing comments never reach
    spark.sql (ref: pkg/query FileQuerySplitterExtractor behaviors)."""
    a = Asset.from_dict({"name": "t_raw_script", "materialization": {}})
    mat.run(
        a,
        """
        -- set up the session
        SET spark.sql.shuffle.partitions = 4;
        CREATE OR REPLACE TEMPORARY VIEW t_raw_v AS
        SELECT 'has; semicolon -- not a comment' AS s /* inline */;
        -- trailing comment after the last statement
        """,
    )
    rows_ = spark.table("t_raw_v").collect()
    assert rows_[0]["s"] == "has; semicolon -- not a comment"
