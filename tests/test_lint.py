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
    assert "task-name-unique" in rs and "task-name-valid" in rs


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


# ---------------------------------------------------------------------------
# round-2 rule breadth (ref: pkg/lint/list.go:31-371)
# ---------------------------------------------------------------------------


def _p(assets=None, **kw):
    return Pipeline(name=kw.pop("name", "p"), assets=assets or [], **kw)


def test_rule_registry_breadth():
    from bruin_spark.lint import rule_ids
    from bruin_spark.lint.policy import BUILTIN_POLICY_RULES

    # reference ships ~45 rule ids; we mirror the applicable set plus the
    # builtin policy rules (policy_builtins.go)
    assert len(rule_ids()) + len(BUILTIN_POLICY_RULES) >= 45


def test_valid_pipeline_schedule():
    assert rules_of(lint_pipeline(_p(schedule="daily"))) == set()
    assert rules_of(lint_pipeline(_p(schedule="*/5 0-12 * * 1-5"))) == set()
    assert "valid-pipeline-schedule" in rules_of(lint_pipeline(_p(schedule="not a cron")))
    assert "valid-pipeline-schedule" in rules_of(lint_pipeline(_p(schedule="99 * * * *")))


def test_valid_pipeline_start_date_and_concurrency():
    assert "valid-pipeline-start-date" in rules_of(lint_pipeline(_p(start_date="01/02/2024")))
    assert rules_of(lint_pipeline(_p(start_date="2024-01-02"))) == set()
    assert "valid-pipeline-concurrency" in rules_of(lint_pipeline(_p(concurrency=0)))
    assert "valid-pipeline-max-active-steps" in rules_of(lint_pipeline(_p(max_active_steps=0)))


def test_valid_variables():
    bad = _p(variables={"bad name": 1})
    assert "valid-variables" in rules_of(lint_pipeline(bad))
    missing_default = _p(variables={"x": {"type": "string"}})
    assert "valid-variables" in rules_of(lint_pipeline(missing_default))
    ok = _p(variables={"x": {"type": "string", "default": "y"}, "plain": 5})
    assert rules_of(lint_pipeline(ok)) == set()


def test_notifications_shape():
    p = _p(notifications={"slack": [{}], "email": [{"recipients": ["nope"]}]})
    rs = rules_of(lint_pipeline(p))
    assert "valid-pipeline-notifications" in rs
    a = Asset(name="a", notifications={"slack": [{"channel": "#x"}]})
    assert "valid-asset-notifications" not in rules_of(lint_pipeline(_p([a])))


def test_unknown_fields_warn():
    p = _p([Asset(name="a", raw={"name": "a", "typo_field": 1})])
    p.raw = {"name": "p", "scheduel": "daily"}
    rs = lint_pipeline(p)
    assert any(i.rule == "unknown-pipeline-fields" and i.severity == "warning" for i in rs)
    assert any(i.rule == "unknown-asset-fields" and i.severity == "warning" for i in rs)


def test_name_component_count():
    assert "asset-name-component-count" in rules_of(
        lint_pipeline(_p([Asset(name="a.b.c.d", type="spark.sql")]))
    )
    assert rules_of(lint_pipeline(_p([Asset(name="cat.sch.tbl", type="spark.sql")]))) == set()


def test_sensor_rules():
    qs = Asset(name="qs", type="spark.sensor.query", parameters={})
    ts = Asset(name="ts", type="spark.sensor.table", parameters={"table": "bad name!"})
    to = Asset(name="to", type="spark.sensor.path", parameters={"path": "/x", "timeout": "5 fortnights"})
    rs = rules_of(lint_pipeline(_p([qs, ts, to])))
    assert {"valid-query-sensor", "valid-table-sensor-table", "valid-sensor-timeout"} <= rs
    ok = Asset(name="ok", type="spark.sensor.query", parameters={"query": "SELECT 1", "timeout": "30m"})
    assert rules_of(lint_pipeline(_p([ok]))) == set()


def test_valid_asset_tier():
    assert "valid-asset-tier" in rules_of(lint_pipeline(_p([Asset(name="a", tier="9")])))
    assert rules_of(lint_pipeline(_p([Asset(name="a", tier="3")]))) == set()


def test_valid_ingestr():
    a = Asset(name="ing", type="ingestr", parameters={})
    rs = rules_of(lint_pipeline(_p([a])))
    assert "valid-ingestr" in rs
    b = Asset(
        name="ing2",
        type="ingestr",
        parameters={
            "source_connection": "pg",
            "source_table": "t",
            "incremental_strategy": "merge",
            "cdc": "true",
            "cdc_mode": "stream",
        },
    )
    issues = lint_pipeline(_p([b]))
    assert any(i.rule == "ingestr-cdc-mode-deprecated" and i.severity == "warning" for i in issues)


def test_column_metadata_and_tags():
    a = Asset(
        name="a",
        columns=[
            Column(name="v", checks=[__import__("bruin_spark.model.pipeline", fromlist=["ColumnCheck"]).ColumnCheck(name="nonsense")]),
        ],
        tags=["x", "x"],
    )
    rs = rules_of(lint_pipeline(_p([a])))
    assert {"valid-column-metadata", "duplicate-tags"} <= rs


def test_python_asset_syntax_validation():
    a = Asset(name="py", type="python", query="def broken(:\n  pass")
    assert "assets-python-validation" in rules_of(lint_pipeline(_p([a])))
    ok = Asset(name="py2", type="python", query="print('hi')")
    assert rules_of(lint_pipeline(_p([ok]))) == set()


def test_hooks_on_wrong_type_warn():
    a = Asset(name="s", type="spark.sensor.query", parameters={"query": "SELECT 1"},
              hooks={"pre": ["SELECT 1"], "post": []})
    issues = lint_pipeline(_p([a]))
    assert any(i.rule == "asset-hooks-applicable-type-ignored" for i in issues)


def test_valid_time_interval_modifiers():
    a = Asset(name="a", interval_modifiers={"start": "-1q"})
    assert "valid-time-interval" in rules_of(lint_pipeline(_p([a])))
    b = Asset(name="b", interval_modifiers={"start": "-1d", "end": "2h"})
    assert rules_of(lint_pipeline(_p([b]))) == set()


def test_materialization_view_cluster_and_partition_columns():
    a = Asset(
        name="v",
        materialization=Materialization(type=MaterializationType.VIEW, cluster_by=["x"]),
    )
    assert "materialization-config" in rules_of(lint_pipeline(_p([a])))
    b = Asset(
        name="t",
        materialization=Materialization(type=MaterializationType.TABLE, partition_by="nope"),
        columns=[Column(name="real_col")],
    )
    assert "materialization-config" in rules_of(lint_pipeline(_p([b])))


def test_cross_pipeline_uri_dependencies():
    from bruin_spark.lint import lint_pipelines

    p1 = _p([Asset(name="src", uri="warehouse://p1/src")], name="p1")
    p2 = _p(
        [Asset(name="cons", depends=[Upstream(value="warehouse://p1/src", type="uri")]),
         Asset(name="bad", depends=[Upstream(value="warehouse://missing", type="uri")])],
        name="p2",
    )
    issues = lint_pipelines([p1, p2])
    assert any("not found" in i.message for i in issues)
    dup = _p([Asset(name="a", uri="u://1"), Asset(name="b", uri="u://1")], name="p3")
    assert any("duplicate URI" in i.message for i in lint_pipelines([dup]))


def test_dry_run_rules(spark):
    a = Asset(
        name="dq",
        type="spark.sql",
        query="SELECT 1 AS x",
        custom_checks=[CustomCheck(name="bad_sql", query="SELEC wrong FROM {{ this }}")],
        hooks={"pre": ["SET spark.sql.shuffle.partitions=8"], "post": []},
    )
    issues = lint_pipeline(_p([a]), spark=spark)
    assert any(i.rule == "custom-check-query-dry-run" for i in issues)
    ok = Asset(
        name="dq2",
        type="spark.sql",
        query="SELECT 1 AS x",
        custom_checks=[CustomCheck(name="ok", query="SELECT COUNT(*) - 1 FROM some_unknown_table")],
    )
    assert not lint_pipeline(_p([ok]), spark=spark)


# ---------------------------------------------------------------------------
# policies (ref: pkg/lint/policy.go, policy_builtins.go)
# ---------------------------------------------------------------------------


def test_policy_builtin_ruleset():
    from bruin_spark.lint.policy import PolicySpecification

    spec = PolicySpecification.from_dict(
        {"rulesets": [{"name": "std", "rules": ["asset-has-owner", "asset-name-is-lowercase"]}]}
    )
    p = _p([Asset(name="UPPER", owner=""), Asset(name="ok.asset", owner="team@x")])
    issues = spec.lint(p)
    ids = {(i.rule, i.asset) for i in issues}
    assert ("policy:std:asset-has-owner", "UPPER") in ids
    assert ("policy:std:asset-name-is-lowercase", "UPPER") in ids
    assert not any(a == "ok.asset" for _r, a in ids)


def test_policy_custom_criteria_and_selector():
    from bruin_spark.lint.policy import PolicySpecification

    spec = PolicySpecification.from_dict(
        {
            "custom_rules": [
                {
                    "name": "must-have-two-tags",
                    "description": "assets need >=2 tags",
                    "criteria": "len(asset.tags) >= 2",
                }
            ],
            "rulesets": [
                {"name": "tagged", "selector": [{"asset": "core\\..*"}], "rules": ["must-have-two-tags"]}
            ],
        }
    )
    p = _p([Asset(name="core.t", tags=["one"]), Asset(name="other.t", tags=[])])
    issues = spec.lint(p)
    assert [i.asset for i in issues] == ["core.t"]  # selector excluded other.t


def test_policy_validation_errors():
    import pytest

    from bruin_spark.lint.policy import PolicyError, PolicySpecification

    with pytest.raises(PolicyError, match="builtin"):
        PolicySpecification.from_dict(
            {"custom_rules": [{"name": "asset-has-owner", "description": "d", "criteria": "true"}],
             "rulesets": [{"name": "x", "rules": ["asset-has-owner"]}]}
        ).lint(_p())
    with pytest.raises(PolicyError, match="no such rule"):
        PolicySpecification.from_dict(
            {"rulesets": [{"name": "x", "rules": ["ghost-rule"]}]}
        ).lint(_p())


def test_policy_pipeline_rules_and_file_load(tmp_path):
    from bruin_spark.lint.policy import lint_with_policies

    d = tmp_path / "pipe"
    (d / "assets").mkdir(parents=True)
    (d / "pipeline.yml").write_text("name: pp\nretries: 0\n")
    (d / "assets" / "a.sql").write_text("/* @bruin\nname: a\n@bruin */\nSELECT 1 AS x\n")
    (d / "policy.yml").write_text(
        "rulesets:\n  - name: ops\n    rules: [pipeline-has-retries]\n"
    )
    from bruin_spark.model import load_pipeline

    issues = lint_with_policies(load_pipeline(str(d)))
    assert any(i.rule == "policy:ops:pipeline-has-retries" for i in issues)


def test_policy_query_matches_columns():
    from bruin_spark.lint.policy import PolicySpecification

    spec = PolicySpecification.from_dict(
        {"rulesets": [{"name": "q", "rules": ["query-matches-columns"]}]}
    )
    bad = Asset(
        name="t", type="spark.sql",
        query="SELECT a AS x, b AS y FROM src",
        columns=[Column(name="x"), Column(name="z")],
    )
    issues = spec.lint(_p([bad]))
    assert any("z" in i.message for i in issues)

def test_policy_criteria_sandbox_blocks_escapes():
    import pytest

    from bruin_spark.lint.policy import PolicyError, RuleDefinition

    def rd(criteria):
        r = RuleDefinition(name="r", description="d", criteria=criteria)
        r.validate()
        r.compile()
        return r

    # legitimate expr-lang-style criteria still work
    p = _p([Asset(name="core.t", tags=["a", "b"])])
    assert rd("all(c for c in [True])").evaluate(p, p.assets[0])
    assert rd("asset.name.startswith('core.')").evaluate(p, p.assets[0])
    assert rd("len([t for t in asset.tags if t]) == 2").evaluate(p, p.assets[0])

    # attribute escapes and statement-level constructs are rejected
    for bad in (
        "asset.__class__.__init__.__globals__",
        "().__class__.__bases__",
        "__import__('os').system('true')",
        "(lambda: 1)()",
        "(x := 5)",
        "import os",
    ):
        with pytest.raises(PolicyError):
            RuleDefinition(name="r", description="d", criteria=bad).compile()

    # names absent from the eval env (e.g. getattr) fail at runtime:
    # builtins are stripped, so there is no fallback resolution
    r = rd("getattr(asset, 'name')")
    with pytest.raises(NameError):
        r.evaluate(p, p.assets[0])


def test_bucketing_lint_rules():
    from bruin_spark.lint import lint_pipeline
    from bruin_spark.model.pipeline import (
        Asset,
        Materialization,
        MaterializationType,
        Pipeline,
        Strategy,
    )

    bad = Pipeline(
        name="p",
        assets=[
            Asset(
                name="t",
                type="spark.sql",
                query="SELECT 1 AS k",
                materialization=Materialization(
                    type=MaterializationType.TABLE,
                    strategy=Strategy.CREATE_REPLACE,
                    bucket_by=["k"],  # buckets missing
                ),
            )
        ],
    )
    msgs = [i.message for i in lint_pipeline(bad) if i.rule == "materialization-config"]
    assert any("bucket_by and buckets" in m for m in msgs)


def test_r_asset_type_is_valid():
    from bruin_spark.lint import lint_pipeline
    from bruin_spark.model.pipeline import Asset, Pipeline

    p = Pipeline(name="p", assets=[Asset(name="x", type="r", query="cat(1)")])
    assert not [i for i in lint_pipeline(p) if i.rule == "valid-task-type"]


def test_bi_placeholder_types_valid_and_noop(spark):
    from bruin_spark.lint import lint_pipeline
    from bruin_spark.model.pipeline import Asset, Pipeline
    from bruin_spark.scheduler.scheduler import Scheduler

    from bruin_spark.model.pipeline import Upstream

    p = Pipeline(
        name="p",
        assets=[
            Asset(name="base_t", type="spark.sql", query="SELECT 1 AS x"),
            Asset(name="dash", type="tableau.dashboard",
                  depends=[Upstream(value="base_t")]),
        ],
    )
    assert not [i for i in lint_pipeline(p) if i.rule == "valid-task-type"]
    res = Scheduler(spark, p).run()
    assert res.ok
    assert "dash" in res.succeeded


def test_lint_flags_unknown_source_uri_scheme():
    from bruin_spark.lint import lint_pipeline
    from bruin_spark.model.pipeline import Asset, Pipeline

    def issues_for(uri):
        a = Asset(
            name="ing", type="ingestr",
            parameters={"source_uri": uri, "source_table": "t"},
        )
        return [
            i for i in lint_pipeline(Pipeline(name="p", assets=[a]))
            if i.rule == "valid-ingestr"
        ]

    assert any("unknown source URI scheme" in i.message for i in issues_for("nosuchdb://h/db"))
    # known schemes, CDC/driver suffixes, and the SaaS tail all pass
    for uri in (
        "postgres://h/db", "postgres+cdc://h/db", "mysql+pymysql://h/db",
        "ps_mysql://h/db", "stripe://?api_key=k", "mongodb://h/db",
        "s3://bucket/k.parquet", "trino://h:8080/c",
    ):
        assert not issues_for(uri), uri


def test_ingestr_raw_jdbc_uri_not_flagged():
    """Raw jdbc:subprotocol:// URIs are supported by the reader and must
    not trip the unknown-scheme rule; uppercase schemes normalize."""
    from bruin_spark.lint.rules import lint_pipeline
    from bruin_spark.model.pipeline import Asset, Pipeline

    def issues_for(uri):
        a = Asset(name="a", type="ingestr", parameters={"source_uri": uri})
        pipe = Pipeline(name="p", assets=[a])
        return [i for i in lint_pipeline(pipe) if i.rule == "valid-ingestr"]

    assert issues_for("jdbc:postgresql://h:5432/db") == []
    assert issues_for("Postgres://h/db") == []
    assert len(issues_for("wat://h/db")) == 1


def test_cdc_lint_handles_boolean_yaml_value():
    """`cdc: true` (YAML boolean) must engage the CDC lint rules exactly
    like the string form the runtime lowercases."""
    from bruin_spark.lint.rules import lint_pipeline
    from bruin_spark.model.pipeline import Asset, Pipeline

    a = Asset(
        name="a", type="ingestr",
        parameters={"source_uri": "postgres://h/db", "source_table": "t",
                    "cdc": True, "incremental_strategy": "append"},
    )
    issues = [i for i in lint_pipeline(Pipeline(name="p", assets=[a]))
              if i.rule == "valid-ingestr"]
    assert any("merge" in i.message for i in issues)


def test_unloadable_asset_becomes_lint_error(tmp_path):
    """A typo'd strategy in ONE asset file yields a named lint issue,
    not an unloadable pipeline."""
    from bruin_spark.lint.rules import lint_pipeline
    from bruin_spark.model import load_pipeline

    d = tmp_path / "badpipe"
    (d / "assets").mkdir(parents=True)
    (d / "pipeline.yml").write_text("name: badpipe\n")
    (d / "assets" / "ok.sql").write_text(
        "/* @bruin\nname: ok\ntype: spark.sql\n@bruin */\nSELECT 1 AS x\n"
    )
    (d / "assets" / "bad.asset.yml").write_text(
        "name: bad\ntype: spark.sql\nquery: SELECT 1\n"
        "materialization:\n  type: table\n  strategy: craete+replace\n"
    )
    pipe = load_pipeline(str(d))
    assert [a.name for a in pipe.assets] == ["ok"]
    issues = [i for i in lint_pipeline(pipe) if i.rule == "asset-is-loadable"]
    assert len(issues) == 1 and "bad.asset.yml" in issues[0].message


def test_valid_parent_domains(tmp_path):
    """Glossary domains with a missing parent_domain are flagged (ref:
    EnsureParentDomainsExistInGlossary, pkg/lint/rules.go:2167)."""
    from bruin_spark.lint.rules import lint_pipeline, rule_ids
    from bruin_spark.model import load_pipeline

    assert len(rule_ids()) >= 45, rule_ids()
    d = tmp_path / "gp"
    (d / "assets").mkdir(parents=True)
    (d / "pipeline.yml").write_text("name: gp\n")
    (d / "glossary.yml").write_text(
        "domains:\n"
        "  sales:\n    description: sales\n"
        "  emea-sales:\n    parent_domain: sales\n"
        "  orphan:\n    parent_domain: nonexistent\n"
    )
    pipe = load_pipeline(str(d))
    issues = [i for i in lint_pipeline(pipe) if i.rule == "valid-parent-domains"]
    assert len(issues) == 1 and "nonexistent" in issues[0].message


def test_policy_sandbox_blocks_format_bypass(tmp_path):
    import pytest

    from bruin_spark.lint.policy import PolicyError, _validate_criteria_ast

    with pytest.raises(PolicyError, match="format"):
        _validate_criteria_ast("r", '"{0.__class__}".format(asset) != ""')
