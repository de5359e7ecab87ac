"""Lint rule tests."""

from bruin_spark.lint import lint_pipeline
from bruin_spark.model.pipeline import (
    Asset,
    Column,
    CustomCheck,
    Materialization,
    MaterializationType,
    Pipeline,
    Strategy,
    Upstream,
)


def rules_of(issues):
    return {i.rule for i in issues}


def test_clean_pipeline_no_issues():
    p = Pipeline(
        name="p",
        assets=[
            Asset(name="a", type="spark.sql", query="SELECT 1"),
            Asset(name="b", type="spark.sql", query="SELECT * FROM a", depends=[Upstream(value="a")]),
        ],
    )
    assert lint_pipeline(p) == []


def test_duplicate_and_invalid_names():
    p = Pipeline(
        name="p",
        assets=[Asset(name="a"), Asset(name="a"), Asset(name="bad name!")],
    )
    rs = rules_of(lint_pipeline(p))
    assert "asset-name-unique" in rs and "asset-name-valid" in rs


def test_unknown_dependency_and_cycle():
    p = Pipeline(
        name="p",
        assets=[
            Asset(name="x", depends=[Upstream(value="ghost"), Upstream(value="y")]),
            Asset(name="y", depends=[Upstream(value="x")]),
        ],
    )
    rs = rules_of(lint_pipeline(p))
    assert "dependency-exists" in rs and "acyclic-pipeline" in rs


def test_merge_requires_pk():
    p = Pipeline(
        name="p",
        assets=[
            Asset(
                name="m",
                materialization=Materialization(
                    type=MaterializationType.TABLE, strategy=Strategy.MERGE
                ),
            )
        ],
    )
    assert "materialization-config" in rules_of(lint_pipeline(p))


def test_time_interval_requires_granularity():
    p = Pipeline(
        name="p",
        assets=[
            Asset(
                name="t",
                materialization=Materialization(
                    type=MaterializationType.TABLE,
                    strategy=Strategy.TIME_INTERVAL,
                    incremental_key="d",
                ),
            )
        ],
    )
    assert "materialization-config" in rules_of(lint_pipeline(p))


def test_duplicate_columns_and_empty_custom_check():
    p = Pipeline(
        name="p",
        assets=[
            Asset(
                name="c",
                columns=[Column(name="v"), Column(name="V")],
                custom_checks=[CustomCheck(name="cc", query="  ")],
            )
        ],
    )
    rs = rules_of(lint_pipeline(p))
    assert "duplicate-column-names" in rs and "custom-check-query-exists" in rs


def test_missing_dependency_warning():
    p = Pipeline(
        name="p",
        assets=[
            Asset(name="up", type="spark.sql", query="SELECT 1"),
            Asset(name="down", type="spark.sql", query="SELECT * FROM up"),
        ],
    )
    issues = lint_pipeline(p)
    assert any(i.rule == "missing-dependency" and i.severity == "warning" for i in issues)
