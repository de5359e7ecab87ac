"""Pipeline / asset discovery and parsing.

Two definition formats, kept verbatim-compatible with the reference
(they are platform-independent):

1. standalone YAML assets: ``*.asset.yml`` (ref: pkg/pipeline/yaml.go)
2. embedded comment blocks in .sql / .py files between
   ``/* @bruin ... @bruin */`` or ``\"\"\" @bruin ... @bruin \"\"\"``
   markers, plus single-line ``-- @bruin.key: value`` form
   (ref: pkg/pipeline/comment.go:16-63)

Pipeline discovery walks a directory containing ``pipeline.yml`` and an
``assets/`` tree (ref: pkg/pipeline/pipeline.go:2768,2860).
"""

from __future__ import annotations

import os
import re

import yaml

from bruin_spark.model.pipeline import Asset, Pipeline

_BLOCK_RE = re.compile(
    r"(?:/\*\s*@bruin(?P<sql>.*?)@bruin\s*\*/)"
    r'|(?:"""\s*@bruin(?P<py>.*?)@bruin\s*""")',
    re.DOTALL,
)
_LINE_RE = re.compile(r"^\s*--\s*@bruin\.(?P<key>[\w.]+)\s*:\s*(?P<val>.+?)\s*$", re.MULTILINE)

ASSET_SUFFIXES = (".sql", ".py", ".asset.yml", ".asset.yaml")


def parse_embedded_block(content: str) -> tuple[dict, str]:
    """Extract the @bruin YAML block; return (meta dict, remaining body).

    Single-line ``-- @bruin.name: x`` keys are merged in (dotted keys make
    nested dicts), matching comment.go:42-63.
    """
    meta: dict = {}
    body = content
    m = _BLOCK_RE.search(content)
    if m:
        block = m.group("sql") or m.group("py") or ""
        try:
            meta = yaml.safe_load(block) or {}
        except yaml.YAMLError as exc:
            raise ValueError(f"invalid @bruin block: {exc}") from exc
        if not isinstance(meta, dict):
            # a malformed block can parse to a YAML scalar/list — surface
            # a named lint error, not an AttributeError deep in from_dict
            # (the reference's faulty-pipeline fixture exercises this)
            raise ValueError(
                f"invalid @bruin block: expected a YAML mapping, got "
                f"{type(meta).__name__}"
            )
        body = (content[: m.start()] + content[m.end() :]).strip()

    for lm in _LINE_RE.finditer(body):
        keys = lm.group("key").split(".")
        cur = meta
        for k in keys[:-1]:
            cur = cur.setdefault(k, {})
        cur[keys[-1]] = yaml.safe_load(lm.group("val"))
    body = _LINE_RE.sub("", body).strip()
    return meta, body


def load_asset_file(path: str) -> Asset:
    """Parse one asset file (YAML, .sql, or .py)."""
    with open(path, encoding="utf-8") as f:
        content = f.read()

    if path.endswith((".asset.yml", ".asset.yaml", ".yml", ".yaml")):
        d = yaml.safe_load(content) or {}
        asset = Asset.from_dict(d, query=d.get("query", ""), file_path=path)
    else:
        meta, body = parse_embedded_block(content)
        asset = Asset.from_dict(meta, query=body, file_path=path)
        if not meta.get("type"):
            # from_dict defaults absent types to spark.sql; the file
            # extension is the real signal here (a .py asset with no
            # declared type is a python asset, pipeline.go:315)
            asset.type = "spark.sql" if path.endswith(".sql") else "python"

    if not asset.name:
        base = os.path.basename(path)
        for suf in (".asset.yml", ".asset.yaml", ".sql", ".py", ".yml", ".yaml"):
            if base.endswith(suf):
                base = base[: -len(suf)]
                break
        asset.name = base
    return asset


def _read_glossary_yaml(path: str) -> dict:
    for fn in ("glossary.yml", "glossary.yaml"):
        p = os.path.join(path, fn)
        if os.path.exists(p):
            with open(p, encoding="utf-8") as f:
                return yaml.safe_load(f) or {}
    return {}


def load_glossary(path: str) -> dict[str, dict[str, dict]]:
    """glossary.yml entities: {Entity: {attribute: {type, description}}}
    (ref: pkg/glossary/entity.go:28-34)."""
    d = _read_glossary_yaml(path)
    out = {}
    for ent, spec in (d.get("entities") or {}).items():
        out[ent] = {
            a: (aspec or {}) for a, aspec in (spec.get("attributes") or {}).items()
        }
    return out


def load_glossary_domains(path: str) -> dict[str, dict]:
    """glossary.yml ``domains:`` map, name -> spec (description, owners,
    tags, parent_domain) (ref: pkg/glossary/entity.go:22,59-97)."""
    d = _read_glossary_yaml(path)
    return {
        name: (spec or {}) for name, spec in (d.get("domains") or {}).items()
    }


def apply_glossary(pipe: Pipeline, glossary: dict[str, dict[str, dict]]) -> None:
    """Columns with ``extends: Entity.attribute`` inherit type/description
    (declared values win — ref: pipeline.go:1747-1784)."""
    for asset in pipe.assets:
        for col in asset.columns:
            if not col.extends or "." not in col.extends:
                continue
            ent, attr = col.extends.split(".", 1)
            spec = glossary.get(ent, {}).get(attr)
            if spec is None:
                continue
            if not col.type and spec.get("type"):
                col.type = spec["type"]
            if not col.description and spec.get("description"):
                col.description = spec["description"]


def _is_sql_type(t: str) -> bool:
    return t in ("spark.sql", "sql") or t.endswith(".sql")


def _apply_asset_defaults(asset, dv: dict) -> None:
    """Apply the pipeline-level ``default:`` block to one asset
    (ref: pipeline.go:3220-3310 SetupDefaults): every field fills only
    when the asset doesn't set it; hooks only reach SQL assets."""
    declared_type = bool((asset.raw or {}).get("type"))
    ext_inferred = (asset.file_path or "").endswith((".sql", ".py"))
    if dv.get("type") and not declared_type and not ext_inferred:
        asset.type = str(dv["type"])
    if dv.get("owner") and not asset.owner:
        asset.owner = str(dv["owner"])
    if dv.get("tier") and not asset.tier:
        asset.tier = str(dv["tier"])
    for k, v in (dv.get("parameters") or {}).items():
        asset.parameters.setdefault(k, v)
    for tag in dv.get("tags") or []:
        if tag not in asset.tags:
            asset.tags.append(tag)
    have_secrets = {s.get("secret_key") for s in asset.secrets}
    for s in dv.get("secrets") or []:
        key = (s.get("key") or s.get("secret_key") or "") if isinstance(s, dict) else str(s)
        if key and key not in have_secrets:
            have_secrets.add(key)
            asset.secrets.append(
                {
                    "secret_key": key,
                    "injected_key": (
                        s.get("inject_as") or s.get("injected_key") or key
                    )
                    if isinstance(s, dict)
                    else key,
                }
            )
    hooks_dv = dv.get("hooks") or {}
    if _is_sql_type(asset.type):
        for ph in ("pre", "post"):
            if not asset.hooks.get(ph) and hooks_dv.get(ph):
                asset.hooks[ph] = [
                    str(h.get("query") or h.get("sql") or "")
                    if isinstance(h, dict)
                    else str(h)
                    for h in hooks_dv[ph]
                ]
    for side in ("start", "end"):
        mods = dv.get("interval_modifiers") or {}
        if mods.get(side) and not (asset.interval_modifiers or {}).get(side):
            asset.interval_modifiers[side] = mods[side]
    if dv.get("timeout") and not asset.timeout:
        asset.timeout = str(dv["timeout"])
    # rerun_cooldown: positive default inherits; -1 on the asset opts out
    # (ref: pipeline.go:3303-3305)
    dc = dv.get("rerun_cooldown")
    if dc is not None and int(dc) > 0 and asset.rerun_cooldown is None:
        asset.rerun_cooldown = int(dc)


def find_glossary_dir(path: str) -> str | None:
    """Nearest directory at-or-above ``path`` holding a glossary.yml —
    the reference resolves the glossary from the repo root, not only the
    pipeline dir (pkg/glossary GetGlossary walks to the repo root)."""
    start = os.path.abspath(path)
    cur = start
    home = os.path.expanduser("~")
    for _ in range(16):  # bounded: never scan arbitrary ancestors
        for fn in ("glossary.yml", "glossary.yaml"):
            if os.path.exists(os.path.join(cur, fn)):
                if cur != start:
                    import logging

                    logging.getLogger("bruin_spark.model").info(
                        "glossary resolved from ancestor: %s",
                        os.path.join(cur, fn),
                    )
                return cur
        # a repo root, a project root (.bruin.yml), or the home dir
        # bounds the project — a glossary above any belongs to someone
        # else
        if (
            os.path.isdir(os.path.join(cur, ".git"))
            or os.path.exists(os.path.join(cur, ".bruin.yml"))
            or os.path.exists(os.path.join(cur, ".bruin.yaml"))
            or cur == home
        ):
            return None
        parent = os.path.dirname(cur)
        if parent == cur:
            return None
        cur = parent
    return None


def expand_entity_extends(pipe: Pipeline, glossary: dict[str, dict[str, dict]]) -> None:
    """Asset-level ``extends: [Entity]``: each entity attribute that no
    declared column already covers (via column-level ``extends:
    Entity.attr``) is appended as a column, attributes in sorted order,
    inheriting type/description (ref: pipeline.go:4015-4061 +
    EnrichFromEntityAttributes 1747-1784)."""
    from bruin_spark.model.pipeline import Column

    for asset in pipe.assets:
        if not asset.extends:
            continue
        covered = {c.extends for c in asset.columns if c.extends}
        for entity in asset.extends:
            attrs = glossary.get(entity, {})
            for attr in sorted(attrs):
                ref = f"{entity}.{attr}"
                if ref in covered:
                    continue
                spec = attrs[attr] or {}
                asset.columns.append(
                    Column(
                        name=attr,
                        type=spec.get("type", "") or "",
                        description=spec.get("description", "") or "",
                        extends=ref,
                    )
                )


def load_pipeline(path: str) -> Pipeline:
    """Load a pipeline directory: pipeline.yml + assets/** (+glossary)."""
    pipeline_yml = os.path.join(path, "pipeline.yml")
    d: dict = {}
    if os.path.exists(pipeline_yml):
        with open(pipeline_yml, encoding="utf-8") as f:
            d = yaml.safe_load(f) or {}

    pipe = Pipeline(
        name=d.get("name", os.path.basename(os.path.abspath(path))),
        path=path,
        schedule=str(d.get("schedule", "") or ""),
        start_date=str(d.get("start_date", "") or ""),
        variables=d.get("variables", {}) or {},
        variants=d.get("variants", {}) or {},
        default_connections=d.get("default_connections", {}) or {},
        concurrency=int(d.get("concurrency", 16) or 16),
        retries=int(d.get("retries", 0) or 0),
        catchup=bool(d.get("catchup", False)),
        notifications=d.get("notifications", {}) or {},
        metadata_push=d.get("metadata_push", {}) or {},
        max_active_steps=d.get("max_active_steps"),
        raw=dict(d),
    )

    assets_dir = os.path.join(path, "assets")
    if os.path.isdir(assets_dir):
        for root, _dirs, files in os.walk(assets_dir):
            for fn in sorted(files):
                if fn.endswith(ASSET_SUFFIXES):
                    fpath = os.path.join(root, fn)
                    try:
                        pipe.assets.append(load_asset_file(fpath))
                    except (ValueError, KeyError) as exc:
                        # a typo'd strategy/type in ONE asset must not make
                        # the whole pipeline unloadable — record it so lint
                        # reports a named issue instead of a traceback
                        pipe.load_errors.append(f"{fpath}: {exc}")
    default_values = d.get("default") or {}
    if isinstance(default_values, dict) and default_values:
        for asset in pipe.assets:
            _apply_asset_defaults(asset, default_values)

    # ref pkg/jinja/macros_test.go LoadMacros table: only top-level
    # macro FILES load (subdirectories and their contents are ignored,
    # even a directory literally named `x.sql`); non-macro extensions
    # skip; a missing/empty dir is not an error
    macros_dir = os.path.join(path, "macros")
    if os.path.isdir(macros_dir):
        parts = []
        for fn in sorted(os.listdir(macros_dir)):
            full = os.path.join(macros_dir, fn)
            if fn.endswith((".sql", ".jinja", ".j2")) and os.path.isfile(full):
                with open(full, encoding="utf-8") as f:
                    parts.append(f.read())
        pipe.macros = "\n".join(parts)
    gdir = find_glossary_dir(path)
    if gdir is not None:
        glossary = load_glossary(gdir)
        if glossary:
            expand_entity_extends(pipe, glossary)
            apply_glossary(pipe, glossary)
        pipe.glossary_domains = load_glossary_domains(gdir)
    return pipe
