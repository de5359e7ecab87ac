"""Pipeline lint rules (ref: pkg/lint/list.go:31-371, pkg/lint/rules.go).

Every reference rule id that has meaning for a single-platform Spark
engine is implemented under the SAME id so lint output is comparable;
platform-specific rules are adapted (noted per rule) and the handful
that cannot apply (BigQuery table options, EMR serverless, Athena) are
listed in ``NOT_APPLICABLE`` with the reason.

Architecture: a registry of (id, level, severity, fn).  ``lint_pipeline``
runs all applicable rules; ``lint_pipelines`` additionally runs the
cross-pipeline rules (URI dependency resolution).  SQL dry-run rules
(`custom-check-query-dry-run`, `hook-query-dry-run`) only run when a
SparkSession is passed — they EXPLAIN the rendered SQL without executing
it, the Spark analog of the reference's warehouse dry-run validators
(pkg/lint/rules.go:1995-2090).
"""

from __future__ import annotations

import ast
import os
import re
from dataclasses import dataclass
from datetime import datetime
from typing import Any, Callable

from bruin_spark.model.pipeline import Asset, Pipeline, Strategy
from bruin_spark.parser import missing_dependencies

_NAME_RE = re.compile(r"^[a-zA-Z0-9_\-.]+$")
_SNAKE_RE = re.compile(r"^[a-z][a-z0-9_]*$")
_DURATION_RE = re.compile(r"^\d+\s*(ms|s|m|h|d)$")
_VERSION_RE = re.compile(r"^v\d+(\.\d+\.\d+)?$")

_VALID_TYPES = {
    "spark.sql",
    "sql",
    "spark.seed",
    "seed",
    "python",
    "r",
    "ingestr",
    "spark.sensor.query",
    "spark.sensor.table",
    "spark.sensor.path",
    "noop",
    "metadata",
    # ref pipeline.go AssetTypeEmpty — a NoOp control node (ODI scenario
    # calls import as these; executor/defaults.go wires it to NoOp)
    "empty",
}

#: BI/dashboard placeholder types (ref pipeline.go:35-169): valid DAG
#: nodes with a NoOp main — they exist for lineage/metadata, checks can
#: still attach (ref pkg/executor/defaults.go:10-95)
_BI_PLACEHOLDER_TYPES = {
    "tableau", "tableau.dashboard", "tableau.datasource", "tableau.workbook",
    "tableau.worksheet", "looker", "powerbi", "metabase", "superset", "mode",
    "modebi", "redash", "grafana", "domo", "qliksense", "qlikview",
    "quicksight", "quicksight.dashboard", "quicksight.dataset", "sisense",
    "holistics", "gooddata",
}
_VALID_TYPES |= _BI_PLACEHOLDER_TYPES

_KNOWN_CHECKS = {
    "not_null",
    "unique",
    "positive",
    "non_negative",
    "negative",
    "min",
    "max",
    "accepted_values",
    "pattern",
}

#: reference rules with no Spark-engine analog (documented, not silently
#: dropped): bigquery-table-options (BQ DDL), emr-serverless-spark-
#: validation (EMR job params), valid-snowflake-query-sensor /
#: valid-bigquery-query-sensor (folded into valid-query-sensor),
#: assets-directory-exist is implemented at load time.
NOT_APPLICABLE = {
    "bigquery-table-options": "BigQuery-specific DDL options",
    "emr-serverless-spark-validation": "EMR-serverless job submission params",
}

# keys accepted in pipeline.yml / asset frontmatter — superset of the
# model fields plus documented passthroughs (ref: validateUnknownYAMLFields,
# pkg/lint/rules.go:2483-2540)
KNOWN_PIPELINE_FIELDS = {
    "name", "schedule", "start_date", "variables", "variants", "macros",
    "default_connections", "concurrency", "retries", "catchup",
    "notifications", "metadata_push", "max_active_steps", "tags",
    "description", "default", "domains", "meta",
}
KNOWN_ASSET_FIELDS = {
    "name", "type", "query", "description", "materialization", "columns",
    "custom_checks", "depends", "parameters", "tags", "owner", "tier",
    "interval_modifiers", "hooks", "unit_tests", "uri", "secrets",
    "notifications", "image", "instance", "connection", "connections",
    "domains", "meta", "rerun_cooldown", "timeout", "start_date", "extends",
    "enabled",
}

_SCHEDULE_PRESETS = {
    "hourly", "daily", "weekly", "monthly", "yearly",
    "@hourly", "@daily", "@weekly", "@monthly", "@yearly",
    "continuous", "@continuous",
}


@dataclass
class Issue:
    rule: str
    asset: str
    message: str
    severity: str = "error"  # error | warning

    def __str__(self) -> str:
        return f"[{self.severity}] {self.rule} ({self.asset}): {self.message}"


# ---------------------------------------------------------------------------
# rule registry
# ---------------------------------------------------------------------------

PipelineRule = Callable[[Pipeline], list[Issue]]
AssetRule = Callable[[Pipeline, Asset], list[Issue]]

PIPELINE_RULES: dict[str, PipelineRule] = {}
ASSET_RULES: dict[str, AssetRule] = {}


def pipeline_rule(rid: str):
    def deco(fn: PipelineRule) -> PipelineRule:
        PIPELINE_RULES[rid] = fn
        return fn

    return deco


def asset_rule(rid: str):
    def deco(fn: AssetRule) -> AssetRule:
        ASSET_RULES[rid] = fn
        return fn

    return deco


#: rule ids emitted outside the decorated registries: the EXPLAIN-based
#: dry-run rules (session-gated, ``dry_run_rules``), the warning id the
#: hooks rule shares, and the pipeline-SET-level URI-dependency rule
#: (``lint_pipelines``). Listed so ``rule_ids`` reports the full surface.
EXTRA_RULE_IDS = {
    "custom-check-query-dry-run",
    "hook-query-dry-run",
    "asset-hooks-applicable-type-ignored",
    "cross-pipeline-uri-dependencies",
}


def rule_ids() -> list[str]:
    return sorted(set(PIPELINE_RULES) | set(ASSET_RULES) | EXTRA_RULE_IDS)


# -- pipeline-level rules ----------------------------------------------------


@pipeline_rule("asset-is-loadable")
def _asset_is_loadable(p: Pipeline) -> list[Issue]:
    """Asset files that failed to parse (bad strategy/type enums, missing
    required keys) — recorded at load time so one typo'd file produces a
    named lint error, not an unloadable pipeline."""
    return [
        Issue("asset-is-loadable", "<pipeline>", msg)
        for msg in getattr(p, "load_errors", []) or []
    ]


@pipeline_rule("valid-pipeline-name")
def _valid_pipeline_name(p: Pipeline) -> list[Issue]:
    if not p.name:
        return [Issue("valid-pipeline-name", "<pipeline>", "pipeline has no name")]
    if not _NAME_RE.match(p.name):
        return [Issue("valid-pipeline-name", "<pipeline>", f"invalid pipeline name {p.name!r}")]
    return []


def _valid_cron_field(fld: str, lo: int, hi: int) -> bool:
    for part in fld.split(","):
        part = part.strip()
        if "/" in part:
            part, step = part.rsplit("/", 1)
            if not step.isdigit() or int(step) == 0:
                return False
        if part == "*":
            continue
        if "-" in part:
            a, _, b = part.partition("-")
            if not (a.isdigit() and b.isdigit() and lo <= int(a) <= int(b) <= hi):
                return False
        elif part.isdigit():
            if not lo <= int(part) <= hi:
                return False
        else:
            return False
    return True


@pipeline_rule("valid-pipeline-schedule")
def _valid_schedule(p: Pipeline) -> list[Issue]:
    """Cron or preset (ref: EnsurePipelineScheduleIsValidCron,
    pkg/lint/rules.go:513-537)."""
    s = (p.schedule or "").strip()
    if not s or s.lower() in _SCHEDULE_PRESETS:
        return []
    fields = s.split()
    bounds = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 7)]
    if len(fields) == 5 and all(
        _valid_cron_field(f, lo, hi) for f, (lo, hi) in zip(fields, bounds)
    ):
        return []
    return [Issue("valid-pipeline-schedule", "<pipeline>", f"invalid cron schedule {p.schedule!r}")]


@pipeline_rule("valid-pipeline-start-date")
def _valid_pipeline_start_date(p: Pipeline) -> list[Issue]:
    if not p.start_date:
        return []
    for fmt in ("%Y-%m-%d", "%Y-%m-%d %H:%M:%S"):
        try:
            datetime.strptime(p.start_date, fmt)
            return []
        except ValueError:
            continue
    return [
        Issue(
            "valid-pipeline-start-date",
            "<pipeline>",
            f"start_date {p.start_date!r} must be YYYY-MM-DD",
        )
    ]


@pipeline_rule("valid-pipeline-concurrency")
def _valid_concurrency(p: Pipeline) -> list[Issue]:
    if p.concurrency <= 0:
        return [Issue("valid-pipeline-concurrency", "<pipeline>", "concurrency must be positive")]
    return []


@pipeline_rule("valid-pipeline-max-active-steps")
def _valid_max_active(p: Pipeline) -> list[Issue]:
    if p.max_active_steps is not None and int(p.max_active_steps) <= 0:
        return [
            Issue("valid-pipeline-max-active-steps", "<pipeline>", "max_active_steps must be positive")
        ]
    return []


@pipeline_rule("valid-variables")
def _valid_variables(p: Pipeline) -> list[Issue]:
    """Each variable is a JSON-schema-ish def with a default
    (ref: ValidateVariables -> Variables.Validate)."""
    issues = []
    for name, spec in (p.variables or {}).items():
        if not _NAME_RE.match(str(name)):
            issues.append(Issue("valid-variables", "<pipeline>", f"invalid variable name {name!r}"))
        if isinstance(spec, dict) and ("type" in spec or "default" in spec):
            if "default" not in spec:
                issues.append(
                    Issue("valid-variables", "<pipeline>", f"variable {name!r} must declare a default")
                )
    return issues


def _notification_issues(rid: str, who: str, notifs: dict[str, Any]) -> list[Issue]:
    """Shared shape validation (ref: EnsurePipelineNotificationsAreValid)."""
    issues = []
    for ch in notifs.get("slack", []) or []:
        if not (isinstance(ch, dict) and str(ch.get("channel", "")).strip()):
            issues.append(Issue(rid, who, "slack notifications need a channel"))
    for ch in notifs.get("ms_teams", []) or []:
        if not (isinstance(ch, dict) and str(ch.get("connection", "")).strip()):
            issues.append(Issue(rid, who, "ms_teams notifications need a connection"))
    for ch in notifs.get("discord", []) or []:
        if not (isinstance(ch, dict) and str(ch.get("connection", "")).strip()):
            issues.append(Issue(rid, who, "discord notifications need a connection"))
    for ch in notifs.get("email", []) or []:
        recips = (ch or {}).get("recipients") if isinstance(ch, dict) else None
        if not recips or not all("@" in str(r) for r in recips):
            issues.append(Issue(rid, who, "email notifications need valid recipients"))
    return issues


@pipeline_rule("valid-pipeline-notifications")
def _valid_pipeline_notifications(p: Pipeline) -> list[Issue]:
    return _notification_issues("valid-pipeline-notifications", "<pipeline>", p.notifications or {})


@pipeline_rule("unknown-pipeline-fields")
def _unknown_pipeline_fields(p: Pipeline) -> list[Issue]:
    unknown = sorted(set(p.raw or {}) - KNOWN_PIPELINE_FIELDS)
    if unknown:
        return [
            Issue(
                "unknown-pipeline-fields",
                "<pipeline>",
                f"unknown pipeline.yml fields: {', '.join(unknown)}",
                severity="warning",
            )
        ]
    return []


@pipeline_rule("task-name-unique")
def _task_name_unique(p: Pipeline) -> list[Issue]:
    seen: set[str] = set()
    issues = []
    for a in p.assets:
        if a.name and a.name in seen:
            issues.append(Issue("task-name-unique", a.name, "duplicate asset name"))
        seen.add(a.name)
    return issues


@pipeline_rule("assets-directory-exist")
def _assets_dir_exists(p: Pipeline) -> list[Issue]:
    if p.path and not os.path.isdir(os.path.join(p.path, "assets")):
        return [Issue("assets-directory-exist", "<pipeline>", "pipeline has no assets/ directory")]
    return []


@pipeline_rule("plain-yaml-files")
def _plain_yaml_files(p: Pipeline) -> list[Issue]:
    """Stray .yml files under assets/ that are not *.asset.yml are ignored
    by the loader — warn so typos don't silently drop assets
    (ref: WarnRegularYamlFiles, pkg/lint/rules.go:539-600)."""
    issues = []
    assets_dir = os.path.join(p.path, "assets") if p.path else ""
    if not assets_dir or not os.path.isdir(assets_dir):
        return []
    for root, _dirs, files in os.walk(assets_dir):
        for fn in files:
            if fn.endswith((".yml", ".yaml")) and not fn.endswith(
                (".asset.yml", ".asset.yaml")
            ):
                issues.append(
                    Issue(
                        "plain-yaml-files",
                        "<pipeline>",
                        f"{os.path.join(root, fn)} is not an *.asset.yml and will be ignored",
                        severity="warning",
                    )
                )
    return issues


@pipeline_rule("acyclic-pipeline")
def _acyclic(p: Pipeline) -> list[Issue]:
    graph = {a.name: [u.value for u in a.depends] for a in p.assets}
    WHITE, GRAY, BLACK = 0, 1, 2
    color = {n: WHITE for n in graph}
    issues: list[Issue] = []

    def visit(n: str, path: list[str]) -> None:
        color[n] = GRAY
        for m in graph.get(n, []):
            if m not in color:
                continue
            if color[m] == GRAY:
                cyc = path[path.index(m):] + [m] if m in path else [n, m]
                issues.append(Issue("acyclic-pipeline", m, "cycle: " + " -> ".join(cyc)))
            elif color[m] == WHITE:
                visit(m, path + [m])
        color[n] = BLACK

    for n in graph:
        if color[n] == WHITE:
            visit(n, [n])
    return issues


# -- asset-level rules ---------------------------------------------------------


@asset_rule("task-name-valid")
def _task_name_valid(p: Pipeline, a: Asset) -> list[Issue]:
    if not a.name:
        return [Issue("task-name-valid", "<unnamed>", "asset has no name")]
    if not _NAME_RE.match(a.name):
        return [Issue("task-name-valid", a.name, "invalid characters in name")]
    return []


@asset_rule("asset-name-component-count")
def _name_component_count(p: Pipeline, a: Asset) -> list[Issue]:
    """Spark table names are at most catalog.schema.table (3 components);
    non-database assets are out of scope (ref: rules.go:1893-1920)."""
    if a.type not in ("spark.sql", "sql") or not a.name:
        return []
    if a.name.count(".") > 2 or any(not part for part in a.name.split(".")):
        return [
            Issue(
                "asset-name-component-count",
                a.name,
                "name must be table, schema.table, or catalog.schema.table",
            )
        ]
    return []


#: the reference's type grammar is `<platform>.<kind>` for ~40 platforms
#: (pipeline.go:35-169); every platform collapses to the one Spark
#: backend here, so any platform-prefixed sql/seed/sensor type is valid
_PLATFORM_TYPE_RE = re.compile(
    r"^[a-z][a-z0-9_]*\.(sql|seed|source|sensor\.(query|table))$"
)


@asset_rule("valid-task-type")
def _valid_task_type(p: Pipeline, a: Asset) -> list[Issue]:
    if (
        a.type
        and a.type not in _VALID_TYPES
        and not a.type.endswith(".source")
        and not _PLATFORM_TYPE_RE.match(a.type)
    ):
        return [Issue("valid-task-type", a.name, f"unknown type {a.type!r}")]
    return []


@asset_rule("dependency-exists")
def _dependency_exists(p: Pipeline, a: Asset) -> list[Issue]:
    names = set(p.asset_names())
    issues = []
    for up in a.depends:
        if getattr(up, "type", "asset") == "uri":
            continue
        if up.value not in names:
            s = up.value
            issues.append(Issue("dependency-exists", a.name, f"Dependency '{s}' does not exist"))
    return issues


@asset_rule("valid-executable-file")
def _valid_executable_file(p: Pipeline, a: Asset) -> list[Issue]:
    if not a.file_path:
        return []
    if not os.path.exists(a.file_path):
        return [Issue("valid-executable-file", a.name, f"file {a.file_path} does not exist")]
    if os.path.getsize(a.file_path) == 0:
        return [Issue("valid-executable-file", a.name, f"file {a.file_path} is empty")]
    return []


@asset_rule("secret-mapping-key-exists")
def _secret_mapping(p: Pipeline, a: Asset) -> list[Issue]:
    issues = []
    for s in a.secrets:
        if not str(s.get("secret_key", "")).strip():
            issues.append(Issue("secret-mapping-key-exists", a.name, "secret mapping needs a key"))
    return issues


@asset_rule("valid-asset-notifications")
def _valid_asset_notifications(p: Pipeline, a: Asset) -> list[Issue]:
    return _notification_issues("valid-asset-notifications", a.name, a.notifications or {})


@asset_rule("materialization-config")
def _materialization_config(p: Pipeline, a: Asset) -> list[Issue]:
    issues = []
    strat = a.materialization.strategy
    mat = a.materialization
    if strat == Strategy.MERGE and (not a.columns or not a.primary_keys()):
        issues.append(
            Issue("materialization-config", a.name, "merge requires declared columns with >=1 primary_key")
        )
    if strat in (Strategy.DELETE_INSERT, Strategy.TIME_INTERVAL) and not mat.incremental_key:
        issues.append(
            Issue("materialization-config", a.name, f"{strat.value} requires incremental_key")
        )
    if strat == Strategy.TIME_INTERVAL and mat.time_granularity not in ("date", "timestamp"):
        issues.append(
            Issue("materialization-config", a.name, "time_interval requires time_granularity date|timestamp")
        )
    if strat in (Strategy.SCD2_BY_COLUMN, Strategy.SCD2_BY_TIME) and not a.primary_keys():
        issues.append(Issue("materialization-config", a.name, "scd2 requires a primary_key"))
    if strat == Strategy.SCD2_BY_TIME and not mat.incremental_key:
        issues.append(Issue("materialization-config", a.name, "scd2_by_time requires incremental_key"))
    from bruin_spark.model.pipeline import MaterializationType

    if mat.type == MaterializationType.VIEW and (mat.cluster_by or mat.partition_by):
        issues.append(
            Issue("materialization-config", a.name, "views cannot be partitioned or clustered")
        )
    if bool(mat.bucket_by) != bool(mat.buckets):
        issues.append(
            Issue(
                "materialization-config",
                a.name,
                "bucket_by and buckets must be set together",
            )
        )
    if mat.bucket_by and mat.type == MaterializationType.VIEW:
        issues.append(Issue("materialization-config", a.name, "views cannot be bucketed"))
    if a.columns:
        declared = {c.name.lower() for c in a.columns}
        for col in list(mat.cluster_by) + ([mat.partition_by] if mat.partition_by else []):
            # partition_by may be an expression; only flag plain idents
            if _NAME_RE.match(col) and "." not in col and col.lower() not in declared:
                issues.append(
                    Issue(
                        "materialization-config",
                        a.name,
                        f"partition/cluster column {col!r} is not a declared column",
                    )
                )
    return issues


@asset_rule("valid-query-sensor")
def _valid_query_sensor(p: Pipeline, a: Asset) -> list[Issue]:
    """Spark analog of the per-warehouse query-sensor rules
    (valid-snowflake-query-sensor / valid-bigquery-query-sensor)."""
    if a.type != "spark.sensor.query":
        return []
    if not str(a.parameters.get("query", "")).strip():
        return [Issue("valid-query-sensor", a.name, "query sensor requires a non-empty `query` parameter")]
    return []


@asset_rule("valid-table-sensor-table")
def _valid_table_sensor(p: Pipeline, a: Asset) -> list[Issue]:
    if a.type != "spark.sensor.table":
        return []
    table = str(a.parameters.get("table", "")).strip()
    if not table:
        return [Issue("valid-table-sensor-table", a.name, "table sensor requires a `table` parameter")]
    if not _NAME_RE.match(table):
        return [Issue("valid-table-sensor-table", a.name, f"invalid table name {table!r}")]
    return []


@asset_rule("valid-sensor-timeout")
def _valid_sensor_timeout(p: Pipeline, a: Asset) -> list[Issue]:
    """Single-unit duration syntax, like interval_modifiers
    (ref: ValidateSensorTimeout, rules.go:1922-1944)."""
    if ".sensor." not in a.type:
        return []
    raw = str(a.parameters.get("timeout", "") or "").strip()
    if not raw:
        return []
    if not _DURATION_RE.match(raw) and not raw.replace(".", "", 1).isdigit():
        return [Issue("valid-sensor-timeout", a.name, f"parameters.timeout {raw!r} is invalid")]
    return []


@asset_rule("valid-timeout")
def _valid_timeout(p: Pipeline, a: Asset) -> list[Issue]:
    raw = a.timeout or a.parameters.get("asset_timeout")
    if not raw:
        return []
    from bruin_spark.model.pipeline import parse_duration_s

    try:
        parse_duration_s(str(raw))
    except ValueError:
        return [Issue("valid-timeout", a.name, f"timeout {raw!r} is invalid")]
    return []


@asset_rule("valid-asset-tier")
def _valid_tier(p: Pipeline, a: Asset) -> list[Issue]:
    if a.tier and a.tier not in {"1", "2", "3", "4", "5"}:
        return [Issue("valid-asset-tier", a.name, "tier must be between 1 and 5")]
    return []


@asset_rule("valid-ingestr")
def _valid_ingestr(p: Pipeline, a: Asset) -> list[Issue]:
    """Ingestr assets need source/destination addressing and a sane
    incremental strategy (ref: rules.go:260-356)."""
    if a.type != "ingestr":
        return []
    issues = []
    params = a.parameters
    uri = str(params.get("source_uri", "")).strip()
    has_uri = bool(uri)
    if has_uri and "://" in uri:
        # the scheme must be one the engine can address (sources/registry
        # covers the reference's full ingestr surface); strip any +cdc /
        # +driver suffix first (uri.go:118-149 scheme algebra)
        from bruin_spark.sources.registry import all_known_schemes

        scheme = uri.split("://", 1)[0].split("+", 1)[0].lower()
        if scheme.startswith("jdbc:"):
            # raw jdbc:<subprotocol>://... URIs pass through to the JDBC
            # reader verbatim (sources/ingest.py:122)
            scheme = "jdbc"
        if scheme and scheme not in all_known_schemes():
            issues.append(
                Issue(
                    "valid-ingestr",
                    a.name,
                    f"unknown source URI scheme {scheme!r}",
                )
            )
    if not has_uri:
        for key in ("source_connection", "source_table"):
            if not str(params.get(key, "")).strip():
                issues.append(
                    Issue(
                        "valid-ingestr",
                        a.name,
                        "ingestr assets require source_connection+source_table or source_uri",
                    )
                )
                break
    strategy = str(params.get("incremental_strategy", "") or "")
    if strategy and strategy not in ("replace", "append", "merge", "delete+insert"):
        issues.append(Issue("valid-ingestr", a.name, f"unsupported incremental_strategy {strategy!r}"))
    if str(params.get("cdc", "")).lower() == "true" and strategy and strategy != "merge":
        issues.append(Issue("valid-ingestr", a.name, "CDC ingestr assets require incremental strategy 'merge'"))
    mode = params.get("cdc_mode")
    if mode is not None and str(mode) not in ("stream", "batch"):
        issues.append(Issue("valid-ingestr", a.name, "cdc_mode must be 'stream' or 'batch'"))
    v = str(params.get("version", "") or "")
    if v and not _VERSION_RE.match(v):
        issues.append(Issue("valid-ingestr", a.name, f"invalid version {v!r}"))
    if any(c.update_on_merge for c in a.columns):
        issues.append(Issue("valid-ingestr", a.name, "ingestr assets do not support update_on_merge"))
    if strategy == "merge" and str(params.get("cdc", "")).lower() != "true" and not a.primary_keys():
        issues.append(Issue("valid-ingestr", a.name, "merge strategy requires a primary_key column"))
    return issues


@asset_rule("ingestr-cdc-mode-deprecated")
def _ingestr_cdc_deprecated(p: Pipeline, a: Asset) -> list[Issue]:
    if a.type != "ingestr":
        return []
    if str(a.parameters.get("cdc", "")).lower() == "true" and "cdc_mode" in a.parameters:
        return [
            Issue(
                "ingestr-cdc-mode-deprecated",
                a.name,
                "'cdc_mode' is deprecated; set 'stream: true' to stream a CDC asset",
                severity="warning",
            )
        ]
    return []


@asset_rule("valid-asset-start-date")
def _valid_asset_start_date(p: Pipeline, a: Asset) -> list[Issue]:
    raw = str(a.parameters.get("start_date", "") or "")
    if not raw:
        return []
    try:
        datetime.strptime(raw, "%Y-%m-%d")
        return []
    except ValueError:
        return [Issue("valid-asset-start-date", a.name, f"start_date {raw!r} must be YYYY-MM-DD")]


@asset_rule("duplicate-column-names")
def _duplicate_columns(p: Pipeline, a: Asset) -> list[Issue]:
    seen: set[str] = set()
    issues = []
    for c in a.columns:
        lc = c.name.lower()
        if lc in seen:
            issues.append(Issue("duplicate-column-names", a.name, f"duplicate column {c.name}"))
        seen.add(lc)
    return issues


@asset_rule("valid-column-metadata")
def _valid_column_metadata(p: Pipeline, a: Asset) -> list[Issue]:
    issues = []
    for c in a.columns:
        if not c.name or not _NAME_RE.match(c.name):
            issues.append(Issue("valid-column-metadata", a.name, f"invalid column name {c.name!r}"))
        for chk in c.checks:
            if chk.name not in _KNOWN_CHECKS:
                issues.append(
                    Issue("valid-column-metadata", a.name, f"unknown check {chk.name!r} on {c.name}")
                )
            elif chk.name == "accepted_values" and not isinstance(chk.value, (list, tuple)):
                issues.append(
                    Issue("valid-column-metadata", a.name, f"accepted_values on {c.name} needs a list")
                )
            elif chk.name == "pattern" and not str(chk.value or ""):
                issues.append(
                    Issue("valid-column-metadata", a.name, f"pattern on {c.name} needs a regex value")
                )
            elif chk.name in ("min", "max") and not isinstance(chk.value, (int, float)):
                issues.append(
                    Issue("valid-column-metadata", a.name, f"{chk.name} on {c.name} needs a number")
                )
    return issues


@asset_rule("duplicate-tags")
def _duplicate_tags(p: Pipeline, a: Asset) -> list[Issue]:
    seen: set[str] = set()
    issues = []
    for t in a.tags:
        if t in seen:
            issues.append(Issue("duplicate-tags", a.name, f"duplicate tag {t!r}", severity="warning"))
        seen.add(t)
    return issues


@asset_rule("custom-check-query-exists")
def _custom_check_query_exists(p: Pipeline, a: Asset) -> list[Issue]:
    issues = []
    for cc in a.custom_checks:
        if not cc.query.strip():
            issues.append(Issue("custom-check-query-exists", a.name, f"check {cc.name} has no query"))
    return issues


@asset_rule("custom-check-name-unique")
def _custom_check_name_unique(p: Pipeline, a: Asset) -> list[Issue]:
    seen: set[str] = set()
    issues = []
    for cc in a.custom_checks:
        if cc.name in seen:
            issues.append(Issue("custom-check-name-unique", a.name, f"duplicate check {cc.name}"))
        seen.add(cc.name)
    return issues


@asset_rule("assets-python-validation")
def _python_validation(p: Pipeline, a: Asset) -> list[Issue]:
    if a.type != "python" or not a.query:
        return []
    try:
        ast.parse(a.query)
        return []
    except SyntaxError as e:
        return [Issue("assets-python-validation", a.name, f"python asset does not parse: {e.msg} (line {e.lineno})")]


@asset_rule("default-hooks-applicable-types")
def _hooks_applicable(p: Pipeline, a: Asset) -> list[Issue]:
    """Hooks are SQL — they run only for sql/python assets; anywhere else
    they are ignored, which deserves a warning (ref rules:
    script-hooks-unsupported / asset-hooks-applicable-type-ignored)."""
    has_hooks = any(a.hooks.get(ph) for ph in ("pre", "post"))
    if not has_hooks:
        return []
    issues = []
    if a.type not in ("spark.sql", "sql", "python"):
        issues.append(
            Issue(
                "asset-hooks-applicable-type-ignored",
                a.name,
                f"hooks on a {a.type} asset are ignored",
                severity="warning",
            )
        )
    for ph in ("pre", "post"):
        for h in a.hooks.get(ph, []):
            if not str(h).strip():
                issues.append(Issue("default-hooks-applicable-types", a.name, f"empty {ph} hook"))
    return issues


@asset_rule("valid-time-interval")
def _valid_time_interval(p: Pipeline, a: Asset) -> list[Issue]:
    """interval_modifiers must parse AND must not invert the run window
    (ref: EnsureTimeIntervalIsValidForAsset + the
    validate-asset-time-interval fixture's 'start date is after end
    date' expectation). Jinja-templated modifiers are resolved against
    the pipeline variables before checking."""
    from bruin_spark.model.pipeline import resolve_variables
    from bruin_spark.render.jinja import RenderContext

    mods = a.interval_modifiers or {}
    if not mods:
        return []
    issues = []
    # report every bad side in one pass, not just the first
    for side in mods:
        if side not in ("start", "end"):
            issues.append(Issue("valid-time-interval", a.name, f"unknown interval modifier side {side!r}"))
    if issues:
        mods = {k: v for k, v in mods.items() if k in ("start", "end")}
        if not mods:
            return issues
    ctx = RenderContext(
        start=datetime(2024, 1, 1),
        end=datetime(2024, 1, 2),
        pipeline_name=p.name,
        variables=resolve_variables(p.variables or {}),
    )
    try:
        shifted = ctx.with_modifiers(mods)
    except Exception as e:  # noqa: BLE001 - bad modifier or template
        issues.append(Issue("valid-time-interval", a.name, str(e)))
        return issues
    if shifted.start > shifted.end:
        issues.append(
            Issue(
                "valid-time-interval",
                a.name,
                f"interval modifiers make the start date {shifted.start} "
                f"come after the end date {shifted.end} for asset {a.name}",
            )
        )
    return issues


@asset_rule("valid-parameters")
def _valid_parameters(p: Pipeline, a: Asset) -> list[Issue]:
    """Asset parameters must Jinja-render against the asset context —
    notably there is NO ``parameters`` self-reference variable
    (ref: cmd/const.go renderAssetParamsMutator; fixture
    nested-params-no-jinja-access expects 'error rendering parameter
    "nested"' + \"missing variable 'parameters'\")."""
    if not a.parameters:
        return []
    from bruin_spark.model.pipeline import resolve_variables
    from bruin_spark.render.jinja import RenderContext, render_parameters

    ctx = RenderContext(
        pipeline_name=p.name, variables=resolve_variables(p.variables or {})
    )
    try:
        render_parameters(a, ctx)
    except ValueError as e:
        return [Issue("valid-parameters", a.name, str(e))]
    except Exception as e:  # noqa: BLE001 - template syntax errors etc.
        return [Issue("valid-parameters", a.name, f"error rendering parameters: {e}")]
    return []


@asset_rule("valid-entity-references")
def _valid_entity_references(p: Pipeline, a: Asset) -> list[Issue]:
    """Columns extending glossary entities must reference ones that exist
    (ref: GlossaryChecker).  Loads glossary.yml from the pipeline dir."""
    refs = [c for c in a.columns if c.extends and "." in c.extends]
    if not refs or not p.path:
        return []
    from bruin_spark.model.loader import load_glossary

    glossary = load_glossary(p.path)
    issues = []
    for c in refs:
        ent, attr = c.extends.split(".", 1)
        if ent not in glossary or attr not in glossary.get(ent, {}):
            issues.append(
                Issue("valid-entity-references", a.name, f"column {c.name} extends unknown {c.extends!r}")
            )
    return issues


@asset_rule("unknown-asset-fields")
def _unknown_asset_fields(p: Pipeline, a: Asset) -> list[Issue]:
    unknown = sorted(set(a.raw or {}) - KNOWN_ASSET_FIELDS)
    if unknown:
        return [
            Issue(
                "unknown-asset-fields",
                a.name,
                f"unknown asset fields: {', '.join(unknown)}",
                severity="warning",
            )
        ]
    return []


@asset_rule("missing-dependency")
def _missing_dependency(p: Pipeline, a: Asset) -> list[Issue]:
    if a.type not in ("spark.sql", "sql") or not a.query:
        return []
    declared = [u.value for u in a.depends]
    issues = []
    try:
        for miss in missing_dependencies(a.query, declared, p.asset_names()):
            if miss != a.name:
                issues.append(
                    Issue(
                        "missing-dependency",
                        a.name,
                        f"query references {miss!r} but it is not in depends",
                        severity="warning",
                    )
                )
    except Exception:
        pass
    return issues


# -- dry-run rules (need a SparkSession) --------------------------------------


def _explain_ok(spark, sql: str) -> str | None:
    """EXPLAIN the statement — parse/analyze without executing.  Spark
    reports parse/analysis failures either as an exception or as error
    text inside the returned plan; unknown tables are expected pre-run,
    so TABLE_OR_VIEW_NOT_FOUND passes."""
    benign = ("TABLE_OR_VIEW_NOT_FOUND", "UNRESOLVED_ROUTINE")
    try:
        rows = spark.sql(f"EXPLAIN {sql.rstrip().rstrip(';')}").collect()
        plan = "\n".join(str(r[0]) for r in rows)
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        if any(b in msg for b in benign):
            return None
        first = next((ln for ln in msg.splitlines() if ln.strip()), "query is invalid")
        return first[:300]
    if "Exception" in plan or "[PARSE_SYNTAX_ERROR]" in plan or "AnalysisException" in plan:
        if any(b in plan for b in benign):
            return None
        return plan.strip().splitlines()[-1][:300]
    return None


def dry_run_rules(p: Pipeline, spark, context=None) -> list[Issue]:
    """custom-check-query-dry-run + hook-query-dry-run: EXPLAIN rendered
    SQL against the live session (ref: ValidateCustomCheckQueryDryRun,
    rules.go:1995-2090).  Separate from the static registry because it
    needs a session."""
    from bruin_spark.render.jinja import RenderContext, render_sql

    ctx = context or RenderContext(pipeline_name=p.name)
    issues: list[Issue] = []
    for a in p.assets:
        actx = ctx.with_modifiers(a.interval_modifiers or {})
        actx.this = a.name
        for cc in a.custom_checks:
            if not cc.query.strip():
                continue
            try:
                rendered = render_sql(cc.query, actx)
            except Exception as e:  # noqa: BLE001
                issues.append(
                    Issue("custom-check-query-dry-run", a.name, f"check {cc.name}: render failed: {e}")
                )
                continue
            err = _explain_ok(spark, rendered)
            if err:
                issues.append(Issue("custom-check-query-dry-run", a.name, f"check {cc.name}: {err}"))
        for ph in ("pre", "post"):
            for h in a.hooks.get(ph, []):
                if not str(h).strip():
                    continue
                try:
                    rendered = render_sql(str(h), actx)
                except Exception as e:  # noqa: BLE001
                    issues.append(Issue("hook-query-dry-run", a.name, f"{ph} hook: render failed: {e}"))
                    continue
                err = _explain_ok(spark, rendered)
                if err:
                    issues.append(Issue("hook-query-dry-run", a.name, f"{ph} hook: {err}"))
    return issues


@pipeline_rule("valid-parent-domains")
def _valid_parent_domains(p: Pipeline) -> list[Issue]:
    """Every glossary domain's parent_domain must itself exist in the
    glossary (ref: EnsureParentDomainsExistInGlossary,
    pkg/lint/rules.go:2167-2198)."""
    domains = getattr(p, "glossary_domains", {}) or {}
    issues = []
    for name, spec in domains.items():
        parent = (spec or {}).get("parent_domain")
        if parent and parent not in domains:
            issues.append(
                Issue(
                    "valid-parent-domains",
                    "<glossary>",
                    f"parent domain {parent!r} for domain {name!r} does not "
                    "exist in the glossary",
                )
            )
    return issues


# -- cross-pipeline rules ------------------------------------------------------


def lint_pipelines(pipelines: list[Pipeline]) -> list[Issue]:
    """cross-pipeline-uri-dependencies: URI deps must resolve to exactly
    one asset's declared `uri` across all pipelines
    (ref: ValidateCrossPipelineURIDependencies, rules.go:2355-2420)."""
    issues: list[Issue] = []
    uri_to_assets: dict[str, list[str]] = {}
    for pl in pipelines:
        for a in pl.assets:
            if a.uri:
                uri_to_assets.setdefault(a.uri, []).append(a.name)
    for uri, assets in uri_to_assets.items():
        if len(assets) > 1:
            issues.append(
                Issue(
                    "cross-pipeline-uri-dependencies",
                    assets[0],
                    f"duplicate URI {uri!r} across assets: {', '.join(assets)}",
                )
            )
    for pl in pipelines:
        for a in pl.assets:
            for dep in a.depends:
                if getattr(dep, "type", "asset") != "uri":
                    continue
                if not dep.value:
                    issues.append(
                        Issue("cross-pipeline-uri-dependencies", a.name, "URI dependency cannot be empty")
                    )
                elif dep.value not in uri_to_assets:
                    issues.append(
                        Issue(
                            "cross-pipeline-uri-dependencies",
                            a.name,
                            f"URI dependency {dep.value!r} not found in any pipeline",
                        )
                    )
    return issues


# -- entry points ---------------------------------------------------------------


def lint_pipeline(
    pipeline: Pipeline,
    spark=None,
    exclude_warnings: bool = False,
    select: list[str] | None = None,
) -> list[Issue]:
    """Run all (or ``select``-ed) rules against one pipeline.

    ``spark`` enables the EXPLAIN-based dry-run rules.
    """
    wanted = set(select) if select else None
    issues: list[Issue] = []
    for rid, fn in PIPELINE_RULES.items():
        if wanted is None or rid in wanted:
            issues.extend(fn(pipeline))
    for a in pipeline.assets:
        for rid, fn in ASSET_RULES.items():
            if wanted is None or rid in wanted:
                issues.extend(fn(pipeline, a))
    if spark is not None and (
        wanted is None or {"custom-check-query-dry-run", "hook-query-dry-run"} & wanted
    ):
        issues.extend(dry_run_rules(pipeline, spark))
    if exclude_warnings:
        issues = [i for i in issues if i.severity != "warning"]
    return issues
