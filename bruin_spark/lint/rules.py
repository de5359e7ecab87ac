"""Pipeline lint rules (ref: pkg/lint/list.go:31-371 — the graph/config
subset that applies to a single-platform Spark engine).

Rules:
- asset-name-valid / unique
- dependency-exists (non-URI upstreams must name a pipeline asset)
- acyclic-pipeline
- valid-asset-type
- materialization-config: merge needs columns+primary_key;
  delete+insert/time_interval need incremental_key; time_interval needs
  time_granularity date|timestamp; scd2 needs primary_key
- duplicate-column-names
- custom-check-query-exists, custom-check-name-unique
- missing-dependency (query references a sibling asset not declared) —
  uses the token-scanner parser service
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from bruin_spark.model.pipeline import Pipeline, Strategy
from bruin_spark.parser import missing_dependencies

_NAME_RE = re.compile(r"^[a-zA-Z0-9_\-.]+$")
_VALID_TYPES = {
    "spark.sql",
    "sql",
    "spark.seed",
    "seed",
    "python",
    "ingestr",
    "spark.sensor.query",
    "spark.sensor.table",
    "noop",
    "metadata",
}


@dataclass
class Issue:
    rule: str
    asset: str
    message: str
    severity: str = "error"  # error | warning

    def __str__(self) -> str:
        return f"[{self.severity}] {self.rule} ({self.asset}): {self.message}"


def lint_pipeline(pipeline: Pipeline) -> list[Issue]:
    issues: list[Issue] = []
    names = [a.name for a in pipeline.assets]
    name_set = set(names)

    # name rules
    seen: set[str] = set()
    for a in pipeline.assets:
        if not a.name:
            issues.append(Issue("asset-name-valid", "<unnamed>", "asset has no name"))
            continue
        if not _NAME_RE.match(a.name):
            issues.append(Issue("asset-name-valid", a.name, "invalid characters in name"))
        if a.name in seen:
            issues.append(Issue("asset-name-unique", a.name, "duplicate asset name"))
        seen.add(a.name)

    for a in pipeline.assets:
        # type
        if a.type and a.type not in _VALID_TYPES and not a.type.endswith(".source"):
            issues.append(Issue("valid-asset-type", a.name, f"unknown type {a.type!r}"))

        # dependencies exist
        for up in a.depends:
            if getattr(up, "type", "asset") == "uri":
                continue
            if up.value not in name_set:
                issues.append(
                    Issue("dependency-exists", a.name, f"unknown upstream {up.value!r}")
                )

        # materialization config
        strat = a.materialization.strategy
        if strat == Strategy.MERGE:
            if not a.columns or not a.primary_keys():
                issues.append(
                    Issue(
                        "materialization-config",
                        a.name,
                        "merge requires declared columns with >=1 primary_key",
                    )
                )
        if strat in (Strategy.DELETE_INSERT, Strategy.TIME_INTERVAL):
            if not a.materialization.incremental_key:
                issues.append(
                    Issue(
                        "materialization-config",
                        a.name,
                        f"{strat.value} requires incremental_key",
                    )
                )
        if strat == Strategy.TIME_INTERVAL and a.materialization.time_granularity not in (
            "date",
            "timestamp",
        ):
            issues.append(
                Issue(
                    "materialization-config",
                    a.name,
                    "time_interval requires time_granularity date|timestamp",
                )
            )
        if strat in (Strategy.SCD2_BY_COLUMN, Strategy.SCD2_BY_TIME) and not a.primary_keys():
            issues.append(
                Issue("materialization-config", a.name, "scd2 requires a primary_key")
            )
        if strat == Strategy.SCD2_BY_TIME and not a.materialization.incremental_key:
            issues.append(
                Issue("materialization-config", a.name, "scd2_by_time requires incremental_key")
            )

        # duplicate columns
        col_seen: set[str] = set()
        for c in a.columns:
            lc = c.name.lower()
            if lc in col_seen:
                issues.append(Issue("duplicate-column-names", a.name, f"duplicate column {c.name}"))
            col_seen.add(lc)

        # custom checks
        cc_seen: set[str] = set()
        for cc in a.custom_checks:
            if not cc.query.strip():
                issues.append(
                    Issue("custom-check-query-exists", a.name, f"check {cc.name} has no query")
                )
            if cc.name in cc_seen:
                issues.append(
                    Issue("custom-check-name-unique", a.name, f"duplicate check {cc.name}")
                )
            cc_seen.add(cc.name)

        # undeclared sibling references (warning — Jinja may hide refs)
        if a.type in ("spark.sql", "sql") and a.query:
            declared = [u.value for u in a.depends]
            try:
                for miss in missing_dependencies(a.query, declared, names):
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

    # acyclic
    issues.extend(_check_cycles(pipeline))
    return issues


def _check_cycles(pipeline: Pipeline) -> list[Issue]:
    graph = {a.name: [u.value for u in a.depends] for a in pipeline.assets}
    WHITE, GRAY, BLACK = 0, 1, 2
    color = {n: WHITE for n in graph}
    issues: list[Issue] = []

    def visit(n: str, path: list[str]) -> None:
        color[n] = GRAY
        for m in graph.get(n, []):
            if m not in color:
                continue
            if color[m] == GRAY:
                cyc = path[path.index(m) :] + [m] if m in path else [n, m]
                issues.append(
                    Issue("acyclic-pipeline", m, "cycle: " + " -> ".join(cyc))
                )
            elif color[m] == WHITE:
                visit(m, path + [m])
        color[n] = BLACK

    for n in graph:
        if color[n] == WHITE:
            visit(n, [n])
    return issues
