"""Dev-environment schema prefixing (ref: pkg/devenv/modifier.go:29-198,
pkg/pipeline/pipeline.go:1524-1554)."""

from bruin_spark.devenv import (
    Environment,
    apply_dev_environment,
    load_environment,
    modify_query_for_dev,
    prefix_schema_component,
)
from bruin_spark.model.pipeline import (
    Asset,
    Materialization,
    MaterializationType,
    Pipeline,
    Strategy,
    Upstream,
)


def test_prefix_schema_component():
    assert prefix_schema_component("t", "dev_") == "t"
    assert prefix_schema_component("sch.t", "dev_") == "dev_sch.t"
    assert prefix_schema_component("cat.sch.t", "dev_") == "cat.dev_sch.t"


def test_apply_dev_environment_prefixes_names_and_upstreams():
    p = Pipeline(
        name="p",
        assets=[
            Asset(name="sch.a"),
            Asset(name="sch.b", depends=[Upstream(value="sch.a"), Upstream(value="u://x", type="uri")]),
        ],
    )
    apply_dev_environment(p, Environment(name="dev", schema_prefix="dev_"))
    assert p.assets[0].name == "dev_sch.a"
    assert p.assets[1].depends[0].value == "dev_sch.a"
    assert p.assets[1].depends[1].value == "u://x"  # uri deps untouched


def test_load_environment_from_pipeline_yaml():
    p = Pipeline(name="p", raw={"environments": {"dev": {"schema_prefix": "dev_"}}})
    env = load_environment(p, "dev")
    assert env.schema_prefix == "dev_"
    import pytest

    with pytest.raises(ValueError, match="unknown environment"):
        load_environment(p, "staging")


def test_modify_query_existence_gated(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS desch")
    spark.sql("CREATE DATABASE IF NOT EXISTS dev_desch")
    spark.sql("DROP TABLE IF EXISTS desch.src")
    spark.sql("DROP TABLE IF EXISTS desch.changed")
    spark.sql("DROP TABLE IF EXISTS dev_desch.changed")
    spark.sql("CREATE TABLE desch.src AS SELECT 1 AS id")
    spark.sql("CREATE TABLE desch.changed AS SELECT 'prod' AS v")
    spark.sql("CREATE TABLE dev_desch.changed AS SELECT 'dev' AS v")

    env = Environment(name="dev", schema_prefix="dev_")
    q = "SELECT id, v FROM desch.src JOIN desch.changed ON TRUE"
    out = modify_query_for_dev(spark, "dev_desch.out", q, env)
    # dev copy exists for `changed` only; `src` falls back to prod
    assert "dev_desch.changed" in out and "desch.src" in out
    assert "dev_desch.src" not in out


def test_self_reference_maps_to_prefixed_name(spark):
    env = Environment(name="dev", schema_prefix="dev_")
    q = "SELECT * FROM desch.out WHERE x > 0"
    out = modify_query_for_dev(spark, "dev_desch.out", q, env)
    assert "FROM dev_desch.out" in out


def test_end_to_end_dev_run(spark):
    from bruin_spark.scheduler import Scheduler

    spark.sql("CREATE DATABASE IF NOT EXISTS e2esch")
    spark.sql("CREATE DATABASE IF NOT EXISTS dev_e2esch")
    spark.sql("DROP TABLE IF EXISTS e2esch.base")
    spark.sql("DROP TABLE IF EXISTS dev_e2esch.base")
    spark.sql("DROP TABLE IF EXISTS e2esch.out")
    spark.sql("DROP TABLE IF EXISTS dev_e2esch.out")
    spark.sql("CREATE TABLE e2esch.base AS SELECT 'prod' AS src")
    spark.sql("CREATE TABLE dev_e2esch.base AS SELECT 'dev' AS src")

    p = Pipeline(
        name="p",
        assets=[
            Asset(
                name="e2esch.out",
                type="spark.sql",
                query="SELECT src FROM e2esch.base",
                materialization=Materialization(
                    type=MaterializationType.TABLE, strategy=Strategy.CREATE_REPLACE
                ),
            )
        ],
    )
    env = Environment(name="dev", schema_prefix="dev_")
    apply_dev_environment(p, env)
    res = Scheduler(spark, p, environment=env).run()
    assert res.ok, res.failed
    # materialized into the DEV schema, reading the DEV copy of base
    [row] = spark.table("dev_e2esch.out").collect()
    assert row["src"] == "dev"
    assert not spark.catalog.tableExists("e2esch.out")

def test_dev_run_creates_missing_schema(spark):
    """First --environment dev run against a catalog with no dev schema
    must succeed: the Materializer creates it per-asset (reference
    CreateSchemaIfNotExist, pkg/spark/operator.go:95 -> db.go:274)."""
    from bruin_spark.scheduler import Scheduler

    spark.sql("CREATE DATABASE IF NOT EXISTS mssch")
    spark.sql("DROP DATABASE IF EXISTS dev_mssch CASCADE")
    spark.sql("DROP TABLE IF EXISTS mssch.base")
    spark.sql("CREATE TABLE mssch.base AS SELECT 'prod' AS src")

    p = Pipeline(
        name="p",
        assets=[
            Asset(
                name="mssch.out",
                type="spark.sql",
                query="SELECT src FROM mssch.base",
                materialization=Materialization(
                    type=MaterializationType.TABLE, strategy=Strategy.CREATE_REPLACE
                ),
            )
        ],
    )
    env = Environment(name="dev", schema_prefix="dev_")
    apply_dev_environment(p, env)
    res = Scheduler(spark, p, environment=env).run()
    assert res.ok, res.failed
    # dev schema auto-created; base had no dev copy so prod data is read
    [row] = spark.table("dev_mssch.out").collect()
    assert row["src"] == "prod"
