"""Jinja rendering with the run-interval context.

Context keys match the reference renderer (ref: pkg/jinja/jinja.go:149-170):
``start_date`` / ``start_date_nodash`` / ``start_datetime`` /
``start_timestamp`` (and the ``end_*`` / ``execution_*`` families),
``pipeline``, ``run_id``, ``full_refresh``, ``this``, ``var``, plus the
date filters of pkg/jinja/filters.go:15-40 and the SQL-generating
builtins of pkg/jinja/bruin_funcs.go (Spark dialect).

Interval modifiers (ref: pipeline.go:1375-1452, applied at render in
jinja.go:247-305): per-asset shifts like ``1h``, ``-30m``, ``2d``, ``1M``
applied to the start/end instants before the context is built.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import date, datetime, timedelta
from typing import Any

import jinja2

from bruin_spark.render import builtins as b
from bruin_spark.render.filters import FILTERS

_MODIFIER_RE = re.compile(r"^(-?\d+)\s*(ms|s|m|h|d|w|M|y)$")


def apply_interval_modifier(dt: datetime, modifier: str) -> datetime:
    """Shift an instant by a modifier string like '2d', '-30m', '1M'."""
    m = _MODIFIER_RE.match(modifier.strip())
    if not m:
        raise ValueError(f"invalid interval modifier: {modifier!r}")
    n, unit = int(m.group(1)), m.group(2)
    if unit in ("M", "y"):
        # Go time.AddDate normalization, same as the reference's
        # ModifyDate (pipeline.go:4118-4119): day overflow rolls into
        # the next month (Jan 31 + 1M = Mar 2/3), never clamps —
        # shared with the add_months/add_years filters
        from bruin_spark.render.filters import _add_date

        return _add_date(dt, n if unit == "y" else 0, n if unit == "M" else 0)
    delta = {
        "ms": timedelta(milliseconds=n),
        "s": timedelta(seconds=n),
        "m": timedelta(minutes=n),
        "h": timedelta(hours=n),
        "d": timedelta(days=n),
        "w": timedelta(weeks=n),
    }[unit]
    return dt + delta


@dataclass
class RenderContext:
    start: datetime = field(default_factory=lambda: datetime(2024, 1, 1))
    end: datetime = field(default_factory=lambda: datetime(2024, 1, 2))
    run_id: str = "manual"
    pipeline_name: str = ""
    full_refresh: bool = False
    this: str = ""  # fully-qualified name of the asset being rendered
    variables: dict[str, Any] = field(default_factory=dict)
    # Jinja macro definitions from the pipeline's macros/ dir
    # (ref: pkg/jinja/jinja.go:37-68) — prepended to every template
    macros: str = ""
    # active environment's schema prefix, exposed as {{ schema_prefix }}
    # (ref: jinja.go:167 default "", :293 env override)
    schema_prefix: str = ""
    commit_hash: str = ""  # ref: jinja.go:166, pipe.Commit
    # extra TOP-LEVEL context keys — `query --var k=v` injects k at the
    # top level, not under var.* (ref: cmd/fetch.go:549-560
    # SetContextValue), which is how `{{ greeting }}` resolves in the
    # reference's query-var-pipeline fixture
    extra: dict[str, Any] = field(default_factory=dict)

    def with_modifiers(self, modifiers: dict[str, str]) -> "RenderContext":
        def resolve(mod: str) -> str:
            # A modifier may itself be a Jinja template ('{{ "-1d" }}',
            # or a var-driven shift) — the reference stores those
            # unparsed and renders them against the asset's context
            # before parsing (pipeline.go:1387-1403 UnmarshalYAML,
            # 1459-1476 ResolveTemplateToNew). Rendered against the
            # UNMODIFIED interval, like the reference's renderer.
            if "{{" in mod or "{%" in mod:
                return _ENV.from_string(mod).render(**self.to_jinja()).strip()
            return mod

        start, end = self.start, self.end
        if modifiers.get("start"):
            start = apply_interval_modifier(start, resolve(modifiers["start"]))
        if modifiers.get("end"):
            end = apply_interval_modifier(end, resolve(modifiers["end"]))
        out = RenderContext(**{**self.__dict__})
        out.start, out.end = start, end
        return out

    def to_jinja(self) -> dict[str, Any]:
        def ts(dt: datetime) -> str:
            # reference emits Go layout '2006-01-02T15:04:05.000000Z07:00'
            # (jinja.go:154): UTC renders as 'Z', other offsets '+hh:mm';
            # naive contexts are treated as UTC
            base = dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
            off = dt.strftime("%z")
            if not off or off in ("+0000", "-0000"):
                return base + "Z"
            return f"{base}{off[:3]}:{off[3:]}"

        def fam(prefix: str, dt: datetime) -> dict[str, str]:
            return {
                f"{prefix}_date": dt.strftime("%Y-%m-%d"),
                f"{prefix}_date_nodash": dt.strftime("%Y%m%d"),
                f"{prefix}_datetime": dt.strftime("%Y-%m-%dT%H:%M:%S"),
                f"{prefix}_timestamp": ts(dt),
            }

        ctx: dict[str, Any] = {}
        ctx.update(fam("start", self.start))
        ctx.update(fam("end", self.end))
        ctx.update(fam("execution", self.start))
        ctx.update(
            pipeline=self.pipeline_name,
            run_id=self.run_id,
            full_refresh=self.full_refresh,
            this=self.this,
            var=dict(self.variables),
            schema_prefix=self.schema_prefix,
            commit_hash=self.commit_hash,
        )
        ctx.update(self.extra)
        return ctx


def _environment() -> jinja2.Environment:
    env = jinja2.Environment(undefined=jinja2.StrictUndefined, keep_trailing_newline=True)
    env.filters.update(FILTERS)
    # SQL-generating builtins, Spark platform set. The reference
    # exposes them ONLY as the `bruin` namespace (pkg/jinja/jinja.go:
    # 81-82 ctx["bruin"] = BuiltinFunctions()); bare names are kept
    # too as a convenience for local templates. A Jinja2 dict resolves
    # `bruin.group_by` via __getitem__ fallback, matching gonja.
    env.globals.update(b.BUILTINS)
    env.globals["bruin"] = dict(b.BUILTINS)
    return env


_ENV = _environment()


def render_sql(template: str, ctx: RenderContext) -> str:
    """Render one SQL/script template against the interval context."""
    if ctx.macros:
        # macro definition blocks render to empty lines; strip what they
        # leave behind so the statement text is unchanged
        out = _ENV.from_string(ctx.macros + "\n" + template).render(**ctx.to_jinja())
        return out.lstrip("\n").lstrip()
    return _ENV.from_string(template).render(**ctx.to_jinja())


def render_parameters(asset, ctx: RenderContext) -> dict:
    """Jinja-render an asset's ``parameters`` recursively (strings are
    rendered + trimmed; lists/maps recurse) against the asset's own
    context — ref: cmd/const.go renderAssetParamsMutator /
    renderParameterValue. The context has no ``parameters`` variable, so
    self-references fail, reported as ``missing variable 'x'`` like the
    reference's renderer."""
    import re as _re

    actx = ctx.with_modifiers(asset.interval_modifiers or {})
    actx.this = asset.name
    env_ctx = actx.to_jinja()

    def render_value(value):
        if isinstance(value, str):
            try:
                return _ENV.from_string(value).render(**env_ctx).strip()
            except jinja2.UndefinedError as exc:
                m = _re.search(r"'([^']+)'", str(exc))
                name = m.group(1) if m else str(exc)
                raise ValueError(f"missing variable {name!r}") from exc
        if isinstance(value, list):
            return [render_value(v) for v in value]
        if isinstance(value, dict):
            return {k: render_value(v) for k, v in value.items()}
        return value

    out = {}
    for key, value in (asset.parameters or {}).items():
        try:
            out[key] = render_value(value)
        except ValueError as exc:
            raise ValueError(f"error rendering parameter {key!r}: {exc}") from exc
    return out


def render_asset_query(asset, ctx: RenderContext) -> str:
    """Render an asset's query with its interval modifiers + `this` bound."""
    actx = ctx.with_modifiers(asset.interval_modifiers or {})
    actx.this = asset.name
    return render_sql(asset.query, actx)


def split_statements(sql: str) -> list[str]:
    """Split a rendered script into statements on top-level semicolons.

    Respects quotes and comments (ref: pkg/query/extract.go:339-357).
    """
    stmts, buf, i, n = [], [], 0, len(sql)
    in_s = in_d = in_lc = in_bc = False
    while i < n:
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < n else ""
        if in_lc:
            if ch == "\n":
                in_lc = False
            buf.append(ch)
        elif in_bc:
            if ch == "*" and nxt == "/":
                in_bc = False
                buf.append("*/")
                i += 1
            else:
                buf.append(ch)
        elif in_s:
            buf.append(ch)
            if ch == "'" and nxt == "'":
                buf.append(nxt)
                i += 1
            elif ch == "'":
                in_s = False
        elif in_d:
            buf.append(ch)
            if ch == '"':
                in_d = False
        elif ch == "-" and nxt == "-":
            in_lc = True
            buf.append(ch)
        elif ch == "/" and nxt == "*":
            in_bc = True
            buf.append("/*")
            i += 1
        elif ch == "'":
            in_s = True
            buf.append(ch)
        elif ch == '"':
            in_d = True
            buf.append(ch)
        elif ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                stmts.append(stmt)
            buf = []
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        stmts.append(tail)
    return stmts
