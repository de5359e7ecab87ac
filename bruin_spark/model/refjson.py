"""Reference-IR JSON serializer.

``bruin internal parse-pipeline`` emits a stable JSON dump of the parsed
pipeline (the contract the VS Code extension and the reference's own
golden tests consume — golden at integration-tests/test-pipelines/
parse-whole-pipeline/expectations/pipeline.yml.json). This module
re-emits OUR model in that exact shape so downstream consumers of the
reference can read our parse output unchanged.

Key formulas (ref: pkg/pipeline/pipeline.go):
- asset id           = sha256(asset_name)                     (:4147)
- column-check id    = sha256(f"{asset}-{column}-{check}")    (:820)
- custom-check id    = sha256(f"{asset}-{check}")             (:3723)
"""

from __future__ import annotations

import hashlib
import os
from typing import Any

from bruin_spark.model.pipeline import Asset, Column, Pipeline


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _param_str(v) -> str:
    """YAML-scalar spellings for map[string]string parameters: the
    reference unmarshals YAML into Go strings, so bools are
    "true"/"false", null is "", floats keep their YAML repr — Python's
    str() would emit "True"/"None"."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _relpath(path: str, base: str | None) -> str:
    if not path:
        return ""
    if base:
        try:
            return os.path.relpath(path, base)
        except ValueError:
            pass
    return path


def _entity_attribute(c: Column):
    if not c.extends or "." not in c.extends:
        return None
    entity, attr = c.extends.split(".", 1)
    return {"entity": entity, "attribute": attr}


def _column_json(asset: Asset, c: Column) -> dict[str, Any]:
    return {
        "entity_attribute": _entity_attribute(c),
        "name": c.name,
        "source_column": "",
        "type": c.type,
        "description": c.description,
        "tags": list(c.tags),
        "primary_key": bool(c.primary_key),
        "update_on_merge": bool(c.update_on_merge),
        "default": "",
        "precision": c.precision,
        "scale": c.scale,
        "length": c.length,
        "collation": "",
        "foreign_key": None,
        "merge_sql": c.merge_sql,
        # declared columns default to nullable (DefaultTrueBool)
        "nullable": True if c.nullable is None else bool(c.nullable),
        "owner": "",
        "domains": [],
        "meta": {},
        "checks": [
            {
                "id": _sha(f"{asset.name}-{c.name}-{ch.name}"),
                "name": ch.name,
                "value": ch.value,
                "blocking": bool(ch.blocking),
                "description": "",
                "retries": None,
            }
            for ch in c.checks
        ],
        "upstreams": [
            {"column": u["column"], "table": u["table"]} for u in c.upstreams
        ],
    }


def _materialization_json(asset: Asset) -> dict[str, Any] | None:
    m = asset.materialization
    typ = str(getattr(m.type, "value", m.type) or "")
    strat = str(getattr(m.strategy, "value", m.strategy) or "")
    if not (typ or strat):
        return None
    return {
        "type": typ,
        "strategy": strat,
        "partition_by": m.partition_by or "",
        "cluster_by": list(m.cluster_by) if m.cluster_by else None,
        "incremental_key": m.incremental_key or "",
        "incremental_predicate": m.incremental_predicate or "",
        "time_granularity": m.time_granularity or "",
    }


def _resolved_enabled(asset: Asset, variables: dict | None):
    from bruin_spark.model.pipeline import asset_enabled

    try:
        return asset_enabled(asset, variables)
    except Exception:  # noqa: BLE001 - unresolvable template (missing var)
        return str(asset.enabled)


def asset_to_reference_json(
    asset: Asset, base_dir: str | None = None, variables: dict | None = None
) -> dict[str, Any]:
    fname = os.path.basename(asset.file_path) if asset.file_path else ""
    fpath = _relpath(asset.file_path, base_dir)
    def_type = "yaml" if fname.endswith((".yml", ".yaml")) else "comment"
    return {
        "id": _sha(asset.name),
        "uri": asset.uri,
        "name": asset.name,
        "type": asset.type,
        "description": asset.description,
        "start_date": asset.start_date,
        "connection": str((asset.raw or {}).get("connection", "") or ""),
        "tags": list(asset.tags),
        "domains": [],
        "meta": {},
        "materialization": _materialization_json(asset),
        "upstreams": [
            {
                "type": u.type,
                "value": u.value,
                "columns": [
                    {"name": c["name"], "usage": c.get("usage", "")}
                    for c in u.columns
                ],
                "mode": u.mode,
            }
            for u in asset.depends
        ],
        "image": str((asset.raw or {}).get("image", "") or ""),
        "instance": str((asset.raw or {}).get("instance", "") or ""),
        "owner": asset.owner,
        "executable_file": {"name": fname, "path": fpath, "content": ""},
        "definition_file": {"name": fname, "path": fpath, "type": def_type},
        "parameters": {k: _param_str(v) for k, v in asset.parameters.items()},
        "secrets": [
            {
                "secret_key": s.get("secret_key", ""),
                "injected_key": s.get("injected_key", s.get("secret_key", "")),
            }
            for s in asset.secrets
        ],
        "extends": list(asset.extends) or None,
        # emitted only when declared (TemplatedBool pointer, omitempty)
        **(
            {"enabled": _resolved_enabled(asset, variables)}
            if asset.enabled is not None
            else {}
        ),
        "columns": [_column_json(asset, c) for c in asset.columns],
        "custom_checks": [
            {
                "id": _sha(f"{asset.name}-{cc.name}"),
                "name": cc.name,
                "description": cc.description,
                "value": cc.value if cc.value is not None else 0,
                "count": cc.count,
                "blocking": bool(cc.blocking),
                "query": cc.query,
                "retries": None,
            }
            for cc in asset.custom_checks
        ],
        "hooks": (
            {
                ph: [{"query": q} for q in asset.hooks.get(ph, [])]
                for ph in ("pre", "post")
                if asset.hooks.get(ph)
            }
            if any(asset.hooks.get(ph) for ph in ("pre", "post"))
            else {}
        ),
        "metadata": {},
        "snowflake": None,
        "athena": None,
        "bigquery": None,
        "interval_modifiers": (
            dict(asset.interval_modifiers) if asset.interval_modifiers else None
        ),
        "retries": None,
    }


def _default_block_json(dv) -> dict[str, Any] | None:
    """The pipeline `default:` block in the IR's shape (note the golden's
    Go-cased secret keys — SecretMapping has no json tags in this
    position)."""
    if not isinstance(dv, dict) or not dv:
        return None
    hooks = dv.get("hooks") or {}
    return {
        "type": str(dv.get("type", "") or ""),
        "materialization": dv.get("materialization"),
        "parameters": {
            k: str(v) for k, v in (dv.get("parameters") or {}).items()
        },
        "secrets": [
            {
                "SecretKey": s.get("key") or s.get("secret_key") or "",
                "InjectedKey": s.get("inject_as")
                or s.get("injected_key")
                or s.get("key")
                or "",
            }
            if isinstance(s, dict)
            else {"SecretKey": str(s), "InjectedKey": str(s)}
            for s in dv.get("secrets") or []
        ]
        or None,
        "hooks": {
            ph: [
                {"query": str(h.get("query") or h.get("sql") or "")}
                if isinstance(h, dict)
                else {"query": str(h)}
                for h in hooks[ph]
            ]
            for ph in ("pre", "post")
            if hooks.get(ph)
        }
        or None,
        "snowflake": None,
        "athena": None,
        "bigquery": None,
        "interval_modifiers": dv.get("interval_modifiers"),
    }


def _resolve_vars(pipe: Pipeline) -> dict:
    from bruin_spark.model.pipeline import resolve_variables

    return resolve_variables(pipe.variables or {})


def pipeline_to_reference_json(
    pipe: Pipeline, base_dir: str | None = None
) -> dict[str, Any]:
    """The parse-pipeline IR dump, reference shape."""
    raw = pipe.raw or {}
    macros = [pipe.macros] if pipe.macros else []
    pyml = os.path.join(pipe.path, "pipeline.yml") if pipe.path else ""
    variables = _resolve_vars(pipe)
    return {
        "legacy_id": "",
        "name": pipe.name,
        "tags": list(raw.get("tags", []) or []),
        "domains": [],
        "meta": {},
        "owner": str(raw.get("owner", "") or ""),
        "schedule": pipe.schedule,
        "start_date": pipe.start_date,
        "definition_file": {
            "name": "pipeline.yml",
            "path": _relpath(pyml, base_dir),
        },
        "default_connections": dict(pipe.default_connections),
        "notifications": {
            "slack": list((pipe.notifications or {}).get("slack", []) or []),
            "ms_teams": list((pipe.notifications or {}).get("ms_teams", []) or []),
            "discord": list((pipe.notifications or {}).get("discord", []) or []),
            "webhook": list((pipe.notifications or {}).get("webhook", []) or []),
            "email": list((pipe.notifications or {}).get("email", []) or []),
        },
        "catchup": pipe.catchup if "catchup" in raw else "",
        "metadata_push": {
            "bigquery": bool((pipe.metadata_push or {}).get("bigquery", False))
        },
        "retries": raw.get("retries"),
        "concurrency": int(raw.get("concurrency", 1) or 1),
        "max_active_steps": pipe.max_active_steps,
        "commit": "",
        "snapshot": "",
        "agent": False,
        # post-override values when a variant was applied, else the raw
        # spec block — the dump must reflect what enabled:/templates saw
        "variables": (
            dict(pipe.variables)
            if raw.get("selected_variant")
            else raw.get("variables")
        ),
        "selected_variant": str(raw.get("selected_variant", "") or ""),
        # key present only when the pipeline sets one (omitempty)
        **(
            {"default": _default_block_json(raw.get("default"))}
            if isinstance(raw.get("default"), dict) and raw.get("default")
            else {}
        ),
        "macros": macros,
        "assets": [
            asset_to_reference_json(a, base_dir, variables=variables)
            for a in pipe.assets
        ],
    }
