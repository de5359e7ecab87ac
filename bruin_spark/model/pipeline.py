"""Pipeline / Asset / Column data model.

Mirrors the reference's declared (not inferred) metadata model
(ref: pkg/pipeline/pipeline.go:1297-1341 Asset, :845-869 Column,
:652-660 Materialization, :808-826 checks, :1155-1161 Upstream) as plain
dataclasses. The model is engine-agnostic; execution semantics live in
bruin_spark.mat / checks / scheduler.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any


class MaterializationType(str, enum.Enum):
    NONE = ""
    VIEW = "view"
    TABLE = "table"


class Strategy(str, enum.Enum):
    """Materialization strategies (ref: pkg/pipeline/pipeline.go:607-623)."""

    CREATE_REPLACE = "create+replace"
    DELETE_INSERT = "delete+insert"
    APPEND = "append"
    MERGE = "merge"
    TRUNCATE_INSERT = "truncate+insert"
    TIME_INTERVAL = "time_interval"
    DDL = "ddl"
    SCD2_BY_COLUMN = "scd2_by_column"
    SCD2_BY_TIME = "scd2_by_time"
    DATAVAULT_HUB = "datavault_hub"
    DATAVAULT_LINK = "datavault_link"
    DATAVAULT_SATELLITE = "datavault_satellite"


#: strategies that survive --full-refresh unchanged
#: (ref: pkg/pipeline/materializer.go:30-43)
FULL_REFRESH_KEEP = {
    Strategy.DDL,
    Strategy.DATAVAULT_HUB,
    Strategy.DATAVAULT_LINK,
    Strategy.DATAVAULT_SATELLITE,
}


@dataclass
class Materialization:
    type: MaterializationType = MaterializationType.NONE
    strategy: Strategy | None = None
    partition_by: str = ""
    cluster_by: list[str] = field(default_factory=list)
    incremental_key: str = ""
    incremental_predicate: str = ""
    time_granularity: str = ""  # "date" | "timestamp"
    # Spark-first extension (no reference analog): hash-bucketed layout.
    # Two tables bucketed INTO the same count ON the join key sort-merge
    # join WITHOUT a shuffle — the co-located-join lever at 100 TB.
    bucket_by: list[str] = field(default_factory=list)
    buckets: int = 0

    @classmethod
    def from_dict(cls, d: dict[str, Any] | None) -> "Materialization":
        if not d:
            return cls()
        cluster_by = d.get("cluster_by") or []
        if isinstance(cluster_by, str):
            cluster_by = [cluster_by]
        bucket_by = d.get("bucket_by") or []
        if isinstance(bucket_by, str):
            bucket_by = [bucket_by]
        strat = d.get("strategy")
        return cls(
            type=MaterializationType(d.get("type", "") or ""),
            strategy=Strategy(strat) if strat else None,
            partition_by=d.get("partition_by", "") or "",
            cluster_by=list(cluster_by),
            incremental_key=d.get("incremental_key", "") or "",
            incremental_predicate=d.get("incremental_predicate", "") or "",
            time_granularity=d.get("time_granularity", "") or "",
            bucket_by=list(bucket_by),
            buckets=int(d.get("buckets", 0) or 0),
        )


@dataclass
class ColumnCheck:
    """A quality check attached to a column (ref: pipeline.go:808-826)."""

    name: str
    value: Any = None  # threshold / accepted list / regex
    blocking: bool = True

    @classmethod
    def from_obj(cls, obj: Any) -> "ColumnCheck":
        if isinstance(obj, str):
            return cls(name=obj)
        value = obj.get("value")
        # the reference's ColumnCheckValue accepts scalar int/float/
        # string/bool, INT or STRING arrays, and null, and errors on
        # anything else (pipeline.go UnmarshalJSON, pinned by its
        # pipeline_test.go table) — a mapping here is a config mistake
        # that would otherwise fail far away at check time.  YAML adds
        # one wrinkle the JSON reference never sees: safe_load resolves
        # an UNQUOTED `value: 2024-01-01` to datetime.date — yaml.v3
        # hands the reference a plain string there, so those stay legal
        # (kept as date objects; Spark literals them correctly).
        import datetime as _dt

        if value is not None and not isinstance(
            value, (int, float, str, bool, list, _dt.date, _dt.datetime)
        ):
            raise ValueError(
                f"check {obj.get('name')!r}: unsupported value type "
                f"{type(value).__name__} (expected number, string, bool or list)"
            )
        if isinstance(value, list) and not all(
            isinstance(e, (_dt.date, _dt.datetime))
            or (isinstance(e, (int, str, float)) and not isinstance(e, bool))
            for e in value
        ):
            # reference arrays are []int or []string; element-level
            # junk (mappings, bools) would otherwise stringify into a
            # nonsensical accepted_values comparison at check time
            raise ValueError(
                f"check {obj.get('name')!r}: list values must hold "
                f"numbers, strings or dates"
            )
        return cls(
            name=obj["name"],
            value=value,
            blocking=obj.get("blocking", True),
        )


@dataclass
class CustomCheck:
    """Asset-level check: arbitrary SQL probe (ref: pipeline.go:1078-1088).

    value mode: scalar result must equal ``value`` (default 0).
    count mode: ``SELECT count(*) FROM (<query>)`` must equal ``count``.
    """

    name: str
    query: str
    value: Any = None
    count: int | None = None
    blocking: bool = True
    description: str = ""


@dataclass
class Column:
    name: str
    type: str = ""  # opaque SQL type string, e.g. "decimal(10,2)"
    description: str = ""
    primary_key: bool = False
    update_on_merge: bool = False
    merge_sql: str = ""
    nullable: bool | None = None
    checks: list[ColumnCheck] = field(default_factory=list)
    upstreams: list[dict[str, str]] = field(default_factory=list)  # lineage
    tags: list[str] = field(default_factory=list)
    precision: int | None = None
    scale: int | None = None
    length: int | None = None
    datavault_role: str = ""  # hash_key|business_key|load_datetime|record_source|link_hash_key|hash_diff
    extends: str = ""  # "Entity.attribute" glossary inheritance (ref: pipeline.go:1747-1784)
    mask: str = ""  # ingestion masking rule/method (ref: pipeline.go:850, docs/assets/columns.md)

    def sql_type(self) -> str:
        """Render the declared type with precision/scale/length.

        Ref: Column.SQLType, pkg/pipeline/pipeline.go:887-903. Spark's DDL
        parser accepts the same strings (decimal(10,2), varchar(n), ...).
        """
        t = self.type or "string"
        # cross-platform aliases Spark's DDL parser rejects or needs a
        # size for: bare VARCHAR/CHAR (DATATYPE_MISSING_SIZE), TEXT,
        # DATETIME — sized declarations (varchar(10)) pass through
        low = t.strip().lower()
        if "(" not in low:
            alias = {
                "varchar": "string",
                "char": "string",
                "text": "string",
                "nvarchar": "string",
                "datetime": "timestamp",
            }.get(low)
            if alias and self.length is None and self.precision is None:
                t = alias
        if "(" in t:
            return t
        if self.precision is not None and self.scale is not None:
            return f"{t}({self.precision}, {self.scale})"
        if self.precision is not None:
            return f"{t}({self.precision})"
        if self.length is not None:
            return f"{t}({self.length})"
        return t

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Column":
        return cls(
            name=d["name"],
            type=d.get("type", "") or "",
            description=d.get("description", "") or "",
            primary_key=bool(d.get("primary_key", False)),
            update_on_merge=bool(d.get("update_on_merge", False)),
            merge_sql=d.get("merge_sql", "") or "",
            nullable=d.get("nullable"),
            checks=[ColumnCheck.from_obj(c) for c in d.get("checks", []) or []],
            upstreams=d.get("upstreams", []) or [],
            tags=d.get("tags", []) or [],
            precision=d.get("precision"),
            scale=d.get("scale"),
            length=d.get("length"),
            datavault_role=d.get("datavault_role", "") or "",
            extends=d.get("extends", "") or d.get("entity_attribute", "") or "",
            mask=d.get("mask", "") or "",
        )


def asset_enabled(asset: "Asset", variables: dict | None = None) -> bool:
    """Resolve an asset's ``enabled:`` value (ref: TemplatedBool,
    pipeline.go:1343-1358): None -> enabled; bool -> itself; a string is
    Jinja-rendered against the pipeline variables then parsed as a bool.
    Unresolvable values raise ValueError (the reference errors too)."""
    v = asset.enabled
    if v is None:
        return True
    if isinstance(v, bool):
        return v
    s = str(v)
    if "{{" in s or "{%" in s:
        import jinja2

        env = jinja2.Environment(undefined=jinja2.StrictUndefined)
        s = env.from_string(s).render(var=dict(variables or {}))
    s = s.strip().lower()
    if s in ("true", "1", "yes"):
        return True
    if s in ("false", "0", "no"):
        return False
    raise ValueError(
        f"asset {asset.name!r}: enabled resolved to {s!r}, expected a boolean"
    )


def parse_duration_s(text: str) -> float:
    """Go-style duration string -> seconds ("2s", "1m30s", "500ms",
    "1h"); bare numbers are seconds. Raises ValueError on junk."""
    import re as _re

    s = str(text).strip()
    try:
        return float(s)
    except ValueError:
        pass
    units = {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0}
    total, pos = 0.0, 0
    for m in _re.finditer(r"(\d+(?:\.\d+)?)(ms|s|m|h|d)", s):
        if m.start() != pos:
            raise ValueError(f"invalid duration: {text!r}")
        total += float(m.group(1)) * units[m.group(2)]
        pos = m.end()
    if pos != len(s) or pos == 0:
        raise ValueError(f"invalid duration: {text!r}")
    return total


def resolve_variables(variables: dict) -> dict:
    """Collapse JSON-Schema-shaped variable specs to their values.

    The reference's pipeline variables are JSON-Schema specs with
    defaults (pkg/pipeline/variables.go:17-48; lint's valid-variables
    mandates the spec form) — template rendering must see the DEFAULT,
    not the spec dict. Plain values pass through; a spec without a
    default resolves to None (an override must supply it).
    """
    out: dict = {}
    for k, v in (variables or {}).items():
        if isinstance(v, dict) and "type" in v and isinstance(v["type"], str):
            out[k] = v.get("default")
        else:
            out[k] = v
    return out


@dataclass
class Upstream:
    """DAG edge (ref: pipeline.go:1155-1161).

    mode="symbolic" edges carry lineage only — the scheduler must not wait
    on them (ref: pkg/scheduler/scheduler.go:810-817).
    """

    value: str
    type: str = "asset"  # "asset" | "uri"
    mode: str = "full"  # "full" | "symbolic"
    # per-edge column usage records filled by the lineage fold
    # (ref: pipeline.go:1155-1161 DependsColumn {name, usage})
    columns: list[dict[str, str]] = field(default_factory=list)

    @classmethod
    def from_obj(cls, obj: Any) -> "Upstream":
        if isinstance(obj, str):
            return cls(value=obj)
        return cls(
            value=obj.get("value") or obj.get("asset") or "",
            type=obj.get("type", "asset"),
            mode=obj.get("mode", "full"),
            columns=[
                {"name": c["name"], "usage": c.get("usage", "")}
                if isinstance(c, dict)
                else {"name": str(c), "usage": ""}
                for c in obj.get("columns", []) or []
            ],
        )


@dataclass
class Asset:
    """One node in the pipeline DAG (ref: pipeline.go:1297-1341)."""

    name: str
    type: str = "spark.sql"  # spark.sql | spark.seed | spark.sensor.* | python | ingestr
    query: str = ""  # raw (unrendered) SQL / script body
    file_path: str = ""
    description: str = ""
    materialization: Materialization = field(default_factory=Materialization)
    columns: list[Column] = field(default_factory=list)
    custom_checks: list[CustomCheck] = field(default_factory=list)
    depends: list[Upstream] = field(default_factory=list)
    parameters: dict[str, Any] = field(default_factory=dict)
    tags: list[str] = field(default_factory=list)
    owner: str = ""
    tier: str = ""  # fair-scheduler pool routing (ref: pipeline.go tier)
    # named connection override (ref: pipeline.go Asset.Connection); ""
    # falls back to the pipeline's default_connections by asset type
    connection: str = ""
    interval_modifiers: dict[str, str] = field(default_factory=dict)
    hooks: dict[str, list[str]] = field(default_factory=dict)  # {"pre": [...], "post": [...]}
    # raw unit-test specs (ref: pipeline.go:1095-1148); interpreted by
    # bruin_spark.unittests
    unit_tests: list[dict[str, Any]] = field(default_factory=list)
    uri: str = ""  # cross-pipeline address (ref: pipeline.go Asset.URI)
    start_date: str = ""  # per-asset start date (ref: pipeline.go Asset)
    # asset-level glossary entity inheritance: every attribute of each
    # listed entity becomes a column (ref: pipeline.go:4015-4061)
    extends: list[str] = field(default_factory=list)
    # templated on/off switch (ref: pipeline.go:1302 TemplatedBool):
    # literal bool, or a Jinja template over pipeline vars ("{{ var.x }}");
    # None = enabled. Disabled assets are skipped, satisfying downstreams.
    enabled: Any = None
    # wall-clock budget for one attempt, Go-style duration string
    # ("2s", "1m30s", "500ms"); "" = unlimited (ref: pipeline.go
    # Asset.Timeout, test-pipelines/asset-timeout)
    timeout: str = ""
    # seconds to wait before re-running a failed attempt; -1 means
    # explicitly none even when the pipeline default sets one
    # (ref: pipeline.go:1332 RerunCooldown, translation to retries_delay
    # at :3994-4005, pipeline-default inheritance at :3303)
    rerun_cooldown: int | None = None
    secrets: list[dict[str, str]] = field(default_factory=list)  # {secret_key, inject_as}
    notifications: dict[str, Any] = field(default_factory=dict)
    # raw parsed YAML/frontmatter, kept for unknown-field linting
    raw: dict[str, Any] = field(default_factory=dict, repr=False)

    def timeout_s(self) -> float | None:
        """Parsed per-attempt timeout in seconds, None for unlimited."""
        if not self.timeout:
            return None
        return parse_duration_s(self.timeout)

    def retries_delay_s(self) -> int | None:
        """Seconds to wait between retry attempts, or None.

        Ref: pipeline.go:3994-4005 — ``rerun_cooldown > 0`` is the delay,
        ``-1`` explicitly disables any inherited delay (maps to 0).
        """
        if self.rerun_cooldown is None:
            return None
        return self.rerun_cooldown if self.rerun_cooldown > 0 else 0

    def primary_keys(self) -> list[str]:
        return [c.name for c in self.columns if c.primary_key]

    def column(self, name: str) -> Column | None:
        for c in self.columns:
            if c.name == name:
                return c
        return None

    @classmethod
    def from_dict(cls, d: dict[str, Any], query: str = "", file_path: str = "") -> "Asset":
        hooks: dict[str, list[str]] = {}
        for phase in ("pre", "post"):
            raw = (d.get("hooks") or {}).get(phase) or []
            # reference hook entries are {query: "..."} (pipeline.go:1360
            # Hook struct yaml tag); 'sql' kept as a lenient alias
            hooks[phase] = [
                str(h.get("query") or h.get("sql") or "")
                if isinstance(h, dict)
                else str(h)
                for h in raw
            ]
        return cls(
            name=d.get("name", "") or "",
            type=d.get("type", "spark.sql") or "spark.sql",
            query=query or d.get("query", "") or "",
            file_path=file_path,
            description=d.get("description", "") or "",
            materialization=Materialization.from_dict(d.get("materialization")),
            columns=[Column.from_dict(c) for c in d.get("columns", []) or []],
            custom_checks=[
                CustomCheck(
                    name=c["name"],
                    query=c.get("query", ""),
                    value=c.get("value"),
                    count=c.get("count"),
                    blocking=c.get("blocking", True),
                    description=c.get("description", ""),
                )
                for c in d.get("custom_checks", []) or []
            ],
            depends=[Upstream.from_obj(u) for u in d.get("depends", []) or []],
            parameters=d.get("parameters", {}) or {},
            tags=d.get("tags", []) or [],
            owner=d.get("owner", "") or "",
            tier=str(d.get("tier", "") or ""),
            connection=str(d.get("connection", "") or ""),
            interval_modifiers=d.get("interval_modifiers", {}) or {},
            start_date=str(d.get("start_date", "") or ""),
            extends=[str(e) for e in d.get("extends", []) or []],
            timeout=str(d.get("timeout", "") or ""),
            enabled=d.get("enabled"),
            rerun_cooldown=(
                int(d["rerun_cooldown"]) if d.get("rerun_cooldown") is not None
                else None
            ),
            hooks=hooks,
            unit_tests=d.get("unit_tests", []) or [],
            uri=d.get("uri", "") or "",
            # YAML spells these {key, inject_as}; the IR normalizes to
            # {secret_key, injected_key} (ref: pipeline.go:1057-1076
            # SecretMapping + MarshalYAML alias). Accept both spellings.
            secrets=[
                {
                    "secret_key": s.get("key") or s.get("secret_key") or "",
                    "injected_key": s.get("inject_as")
                    or s.get("injected_key")
                    or s.get("key")
                    or s.get("secret_key")
                    or "",
                }
                if isinstance(s, dict)
                else {"secret_key": str(s), "injected_key": str(s)}
                for s in d.get("secrets", []) or []
            ],
            notifications=d.get("notifications", {}) or {},
            raw=dict(d),
        )


@dataclass
class Pipeline:
    """A directory with pipeline.yml + assets/ (ref: pipeline.go:2238-2269)."""

    name: str
    path: str = ""
    schedule: str = ""
    start_date: str = ""
    assets: list[Asset] = field(default_factory=list)
    variables: dict[str, Any] = field(default_factory=dict)
    variants: dict[str, dict[str, Any]] = field(default_factory=dict)  # named variable override sets
    #: per-asset-file load failures (bad enum values etc.) — surfaced by
    #: lint as asset-is-loadable errors instead of crashing the loader
    load_errors: list[str] = field(default_factory=list)
    macros: str = ""  # concatenated Jinja macro defs from macros/
    default_connections: dict[str, str] = field(default_factory=dict)
    concurrency: int = 16
    retries: int = 0
    catchup: bool = False
    notifications: dict[str, Any] = field(default_factory=dict)
    metadata_push: dict[str, Any] = field(default_factory=dict)
    max_active_steps: int | None = None
    # glossary.yml `domains:` map (name -> spec incl. parent_domain),
    # used by the valid-parent-domains lint rule
    glossary_domains: dict[str, dict[str, Any]] = field(default_factory=dict)
    # raw parsed pipeline.yml, kept for unknown-field linting
    raw: dict[str, Any] = field(default_factory=dict, repr=False)

    def asset(self, name: str) -> Asset | None:
        for a in self.assets:
            if a.name == name:
                return a
        return None

    def asset_names(self) -> list[str]:
        return [a.name for a in self.assets]
