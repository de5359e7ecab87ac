"""Canonical re-serialization of asset definition files.

Reference parity: ``bruin format`` (cmd/format.go:23-180) parses every
asset under the project and re-persists it in canonical form
(``asset.Persist``), with ``--fail-if-changed`` as the CI hook mode.
Here the canonical forms are:

- ``*.asset.yml``: stable key order (the reference's Persist writes
  struct-field order; ours is the documented key list below, then any
  extra keys alphabetically), 2-space indent, no flow style.
- ``.sql`` / ``.py`` assets: the embedded ``@bruin`` block re-emitted in
  that same canonical YAML order inside the comment fence, followed by
  the body with normalized trailing whitespace.  SQL bodies additionally
  get keyword-case normalization (uppercase) via the shared token
  scanner (parser/sqlutil.py) — strings, quoted identifiers, and
  comments are untouched.

Formatting is idempotent: format(format(x)) == format(x), pinned by
tests/test_format.py on the repo's own fixture pipelines.
"""

from __future__ import annotations

import os
import re

import yaml

from bruin_spark.model.loader import parse_embedded_block
from bruin_spark.parser.sqlutil import _tokens

#: canonical top-level key order (reference Asset struct field order,
#: pkg/pipeline/pipeline.go:1297-1341)
_KEY_ORDER = [
    "name",
    "uri",
    "type",
    "description",
    "owner",
    "tags",
    "labels",
    "depends",
    "materialization",
    "strategy",
    "parameters",
    "secrets",
    "interval_modifiers",
    "columns",
    "custom_checks",
    "image",
    "instance",
    "athena",
    "snowflake",
]

_MAT_KEY_ORDER = [
    "type",
    "strategy",
    "partition_by",
    "cluster_by",
    "bucket_by",
    "buckets",
    "incremental_key",
    "incremental_predicate",
    "time_granularity",
]

_COLUMN_KEY_ORDER = [
    "name",
    "type",
    "description",
    "primary_key",
    "update_on_merge",
    "merge_sql",
    "nullable",
    "checks",
    "upstreams",
    "tags",
]

#: SQL keywords upper-cased by the body normalizer (conservative list —
#: only unambiguous reserved words; identifiers matching these are rare
#: and would already be quoted in real schemas)
_SQL_KEYWORDS = {
    "select", "from", "where", "group", "by", "order", "having", "limit",
    "join", "inner", "left", "right", "full", "outer", "cross", "on",
    "using", "union", "all", "intersect", "except", "with", "as", "case",
    "when", "then", "else", "end", "and", "or", "not", "in", "exists",
    "between", "like", "is", "null", "distinct", "insert", "into",
    "values", "update", "set", "delete", "create", "table", "view",
    "drop", "alter", "asc", "desc", "over", "partition", "rows", "range",
    "qualify", "window",
}


def _order_keys(d: dict, order: list[str]) -> dict:
    known = [k for k in order if k in d]
    extra = sorted(k for k in d if k not in order)
    return {k: d[k] for k in known + extra}


def _canonical_meta(meta: dict) -> dict:
    out = _order_keys(dict(meta), _KEY_ORDER)
    mat = out.get("materialization")
    if isinstance(mat, dict):
        out["materialization"] = _order_keys(mat, _MAT_KEY_ORDER)
    cols = out.get("columns")
    if isinstance(cols, list):
        out["columns"] = [
            _order_keys(c, _COLUMN_KEY_ORDER) if isinstance(c, dict) else c
            for c in cols
        ]
    return out


def _dump_yaml(d: dict) -> str:
    return yaml.safe_dump(d, sort_keys=False, default_flow_style=False, width=100)


_JINJA_SPAN = re.compile(r"\{\{.*?\}\}|\{%.*?%\}|\{#.*?#\}", re.DOTALL)


def normalize_sql_body(sql: str) -> str:
    """Uppercase bare SQL keywords; strip trailing whitespace per line;
    single trailing newline.  Strings / quoted identifiers / comments
    pass through verbatim, and jinja spans (``{{ }}``, ``{% %}``,
    ``{# #}``) are masked before keyword-casing — jinja is
    case-sensitive, so ``{% if a and b %}`` must NOT become ``AND``."""
    spans: list[str] = []

    def _mask(m: re.Match) -> str:
        spans.append(m.group(0))
        return f"\x00J{len(spans) - 1}\x00"

    masked = _JINJA_SPAN.sub(_mask, sql)
    parts = []
    for kind, text, _s in _tokens(masked):
        if kind == "word" and text.lower() in _SQL_KEYWORDS:
            parts.append(text.upper())
        else:
            parts.append(text)
    out = "".join(parts)
    out = re.sub(r"\x00J(\d+)\x00", lambda m: spans[int(m.group(1))], out)
    lines = [ln.rstrip() for ln in out.split("\n")]
    return "\n".join(lines).strip() + "\n"


def format_content(path: str, content: str) -> str:
    """Return the canonical form of one asset file's content."""
    if path.endswith((".asset.yml", ".asset.yaml", ".yml", ".yaml")):
        d = yaml.safe_load(content) or {}
        if not isinstance(d, dict):
            return content  # not an asset mapping; leave untouched
        query = d.pop("query", None)
        d = _canonical_meta(d)
        if query is not None:
            d["query"] = query
        return _dump_yaml(d)

    meta, body = parse_embedded_block(content)
    if path.endswith(".sql"):
        body = normalize_sql_body(body)
        fence_open, fence_close = "/* @bruin", "@bruin */"
    else:
        body = body.strip() + "\n"
        fence_open, fence_close = '""" @bruin', '@bruin """'
    if meta:
        block = _dump_yaml(_canonical_meta(meta))
        return f"{fence_open}\n{block}{fence_close}\n\n{body}"
    return body


def format_asset_file(path: str, write: bool = True) -> bool:
    """Canonicalize one asset file in place; returns True if it changed."""
    with open(path, encoding="utf-8") as f:
        original = f.read()
    formatted = format_content(path, original)
    changed = formatted != original
    if changed and write:
        with open(path, "w", encoding="utf-8") as f:
            f.write(formatted)
    return changed


def format_pipeline(pipeline_dir: str, write: bool = True) -> tuple[list[str], list[str]]:
    """Format every asset under ``<pipeline_dir>/assets``.

    Returns (changed_paths, error_paths).  With ``write=False`` this is
    the ``--fail-if-changed`` probe: nothing is rewritten.
    """
    from bruin_spark.model.loader import ASSET_SUFFIXES

    assets_dir = os.path.join(pipeline_dir, "assets")
    changed, errors = [], []
    for root, _dirs, files in os.walk(assets_dir):
        for fn in sorted(files):
            if not fn.endswith(ASSET_SUFFIXES):
                continue
            p = os.path.join(root, fn)
            try:
                if format_asset_file(p, write=write):
                    changed.append(p)
            except Exception:
                errors.append(p)
    return changed, errors
