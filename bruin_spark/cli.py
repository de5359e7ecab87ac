"""CLI: the reference's top entry points on Spark
(ref: cmd/run.go:571 run, cmd/fetch.go:48-160 query, cmd/render.go:54-200
render, `internal parse-pipeline` JSON dump, lint).

    python -m bruin_spark run ./pipeline [--asset X] [--downstream]
        [--tag t] [--exclude-tag t] [--full-refresh] [--workers N]
        [--start YYYY-MM-DD] [--end YYYY-MM-DD] [--continue]
    python -m bruin_spark render ./pipeline asset_name [--start ...]
    python -m bruin_spark query --query "SELECT ..." [--limit N] [--sf-dir D]
    python -m bruin_spark parse ./pipeline
    python -m bruin_spark lint ./pipeline
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from datetime import datetime, timedelta

import yaml


def _parse_date(s: str | None, default: datetime) -> datetime:
    if not s:
        return default
    for fmt in ("%Y-%m-%d", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise SystemExit(f"unparseable date: {s!r}")


def _context(args) -> "RenderContext":
    from bruin_spark.render import RenderContext

    # default interval = yesterday (ref: jinja.go:172-183)
    today = datetime.now().replace(hour=0, minute=0, second=0, microsecond=0)
    start = _parse_date(getattr(args, "start", None), today - timedelta(days=1))
    end = _parse_date(getattr(args, "end", None), today)
    return RenderContext(
        start=start,
        end=end,
        run_id=getattr(args, "run_id", "") or f"cli_{start:%Y%m%d}",
        full_refresh=bool(getattr(args, "full_refresh", False)),
    )


def _pipeline_context(args, pipe) -> "RenderContext":
    """A fully-populated render context for ``pipe``: interval bounds,
    RESOLVED variables (spec defaults collapsed), and the pipeline's
    macros — so render/query/unit-test see exactly what `run` sees."""
    from bruin_spark.model.pipeline import resolve_variables

    ctx = _context(args)
    ctx.pipeline_name = pipe.name
    ctx.variables = resolve_variables(pipe.variables)
    ctx.macros = pipe.macros
    # active environment's schema_prefix as {{ schema_prefix }}
    # (ref: jinja.go:293); flag first, then project default
    from bruin_spark.devenv import default_environment_name, load_environment

    search = getattr(args, "pipeline", None) or pipe.path or "."
    explicit_env = getattr(args, "environment", None)
    try:
        env_name = explicit_env or default_environment_name(search)
        if env_name:
            ctx.schema_prefix = load_environment(
                pipe, env_name, search_dir=search
            ).schema_prefix
    except (ValueError, OSError) as e:
        # an environment the user EXPLICITLY asked for must not silently
        # degrade to no-prefix (that would point a dev query at prod)
        if explicit_env:
            raise SystemExit(str(e)) from e
    # --var overrides are TOP-LEVEL context keys here, matching the
    # reference's query/render path (cmd/fetch.go SetContextValue);
    # they also update var.* so both spellings see the override
    try:
        overrides = parse_var_overrides(getattr(args, "var", None))
    except ValueError as e:
        raise SystemExit(str(e)) from e
    ctx.variables.update(overrides)
    ctx.extra.update(overrides)
    return ctx


def parse_var_overrides(raw: list[str] | None) -> dict:
    """Parse repeatable ``--var`` values (ref: cmd/const.go:194-220
    parseVariable): each is either a JSON object or ``key=value`` with a
    JSON-encoded value.  Raises ValueError on malformed input."""
    import json

    out: dict = {}
    for s in raw or []:
        s = s.strip()
        try:
            v = json.loads(s)
        except json.JSONDecodeError:
            v = None
        if isinstance(v, dict):
            out.update(v)
            continue
        if s.startswith("{"):
            raise ValueError(f"invalid variable override {s!r}")
        key, sep, val = s.partition("=")
        if not sep:
            raise ValueError(f"variable must be of form key=value: {s!r}")
        try:
            out[key.strip()] = json.loads(val)
        except json.JSONDecodeError as e:
            raise ValueError(
                f"invalid variable override value {val!r} (must be JSON)"
            ) from e
    return out


def cmd_run(args) -> int:
    from bruin_spark import get_spark
    from bruin_spark.lint import lint_pipeline
    from bruin_spark.model import load_pipeline

    pipe = load_pipeline(args.pipeline)
    errors = [i for i in lint_pipeline(pipe) if i.severity == "error"]
    if errors:
        for i in errors:
            print(str(i), file=sys.stderr)
        return 2

    spark = get_spark(f"bruin:{pipe.name}")
    if args.tables_dir:
        from bruin_spark.session import load_tables

        load_tables(spark, args.tables_dir)
    ctx = _context(args)
    if ctx.start > ctx.end:
        # ref: ValidateRunConfig (cmd/run.go:1798-1809) rejects inverted
        # intervals before any work happens
        print("Start date cannot be after end date.", file=sys.stderr)
        return 1
    ctx.pipeline_name = pipe.name
    from bruin_spark.model.pipeline import resolve_variables

    ctx.variables = resolve_variables(pipe.variables)
    variant_keys: set = set()
    if getattr(args, "variant", None):
        overrides = pipe.variants.get(args.variant)
        if overrides is None:
            print(f"unknown variant: {args.variant}", file=sys.stderr)
            return 2
        variant_vals = overrides.get("variables", overrides)
        variant_keys = set(variant_vals)
        ctx.variables.update(variant_vals)
    try:
        var_overrides = parse_var_overrides(getattr(args, "var", None))
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 2
    # a selected variant's keys win over --var (ref cmd/const.go:179-185)
    for k in variant_keys:
        var_overrides.pop(k, None)
    ctx.variables.update(var_overrides)
    environment = None
    env_name = getattr(args, "environment", None)
    if not env_name:
        # no flag: the project config's default_environment applies
        # (ref: .bruin.yml default_environment, cmd/run.go env selection)
        from bruin_spark.devenv import default_environment_name

        env_name = default_environment_name(args.pipeline) or None
    if env_name:
        from bruin_spark.devenv import apply_dev_environment, load_environment

        try:
            environment = load_environment(pipe, env_name, search_dir=args.pipeline)
        except ValueError as e:
            print(str(e), file=sys.stderr)
            return 2
        apply_dev_environment(pipe, environment)
        ctx.schema_prefix = environment.schema_prefix  # {{ schema_prefix }}
        if environment.tables_dir and not args.tables_dir:
            from bruin_spark.session import load_tables

            load_tables(spark, environment.tables_dir)
        if environment.shuffle_partitions:
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(environment.shuffle_partitions)
            )
        if environment.checkpoint_mode:
            from bruin_spark.checkpointing import set_mode

            set_mode(
                environment.checkpoint_mode,
                environment.checkpoint_dir or None,
            )
    # named connections from the project .bruin.yml (active environment)
    # back-fill the pipeline's own map (ref: connection resolution order,
    # cmd/run.go + pkg/connection); pipeline.yml keys win on collision
    from bruin_spark.projectconfig import load_config
    from bruin_spark.sources.connections import environment_connection_specs

    _cfg = load_config(args.pipeline)
    _conn_env = env_name or _cfg.default_environment
    _conn_specs = (
        environment_connection_specs(_cfg, _conn_env) if _conn_env else {}
    )
    # Secret masking (ref pkg/mask + cmd/run.go logOutput) is installed
    # BEFORE any connection resolution output: a malformed-spec warning
    # can embed credential values, so the masker must already be on the
    # streams when the first warning prints.
    from bruin_spark.maskout import Masker, connection_secrets

    _secret_vals: list[str] = []
    for _v in list(pipe.default_connections.values()) + list(_conn_specs.values()):
        _secret_vals += connection_secrets(_v)
    # ALWAYS installed (even with zero config secrets): a secrets
    # backend can resolve credentials later and extend() the live masker
    masker = Masker(_secret_vals)
    _old_out, _old_err = sys.stdout, sys.stderr
    sys.stdout, sys.stderr = masker.wrap(_old_out), masker.wrap(_old_err)
    try:
        return _cmd_run_resolved(args, pipe, ctx, environment, _conn_specs, masker)
    finally:
        sys.stdout.flush()
        sys.stderr.flush()
        sys.stdout, sys.stderr = _old_out, _old_err


def _cmd_run_resolved(args, pipe, ctx, environment, _conn_specs, masker) -> int:
    from bruin_spark import get_spark
    from bruin_spark.maskout import connection_secrets
    from bruin_spark.scheduler import PipelineState, Scheduler
    from bruin_spark.sources.connections import connection_uri

    spark = get_spark(f"bruin:{pipe.name}")
    for _name, _spec in _conn_specs.items():
        try:
            _uri = connection_uri(_spec)
        except ValueError as e:
            # a malformed spec only matters if an asset uses it —
            # warn, don't kill the whole run
            print(f"warning: skipping connection {_name!r}: {e}", file=sys.stderr)
            continue
        pipe.default_connections.setdefault(_name, _uri)
    # a selected secrets backend is the source of truth for connection
    # names (ref cmd/secrets_backend.go: the backend REPLACES the config
    # manager) — its value overrides any .bruin.yml/pipeline.yml copy;
    # names it can't resolve fall back to config with a warning
    from bruin_spark.secretsbackend import (
        KNOWN_BACKENDS,
        lookup_connection,
        selected_backend,
    )

    _backend = selected_backend(getattr(args, "secrets_backend", None))
    if _backend:
        if _backend not in KNOWN_BACKENDS:
            print(
                f"unknown secrets backend {_backend!r}; expected one of: "
                f"{', '.join(sorted(KNOWN_BACKENDS))}",
                file=sys.stderr,
            )
            return 2
        for _a in pipe.assets:
            _cn = str((_a.parameters or {}).get("source_connection", "") or "")
            if not _cn:
                continue
            try:
                _uri = connection_uri(lookup_connection(_backend, _cn))
            except (ValueError, NotImplementedError) as e:
                print(f"warning: secrets backend: {e}", file=sys.stderr)
                continue
            pipe.default_connections[_cn] = _uri
            if masker:
                masker.extend(connection_secrets(_uri))
    stream_target = getattr(args, "stream", None)
    if stream_target and getattr(args, "sensor_mode", None):
        # ref cmd/run.go:939 rejects combining --stream with --sensor-mode:
        # a continuously-streaming run has no sensor poll loop to override.
        print("--sensor-mode cannot be combined with --stream", file=sys.stderr)
        return 2
    if args.full_refresh and args.apply_interval_modifiers:
        print(
            "Warning: --apply-interval-modifiers is ignored when --full-refresh is enabled.",
            file=sys.stderr,
        )
    # per-connection concurrency limits from the connection specs'
    # max_concurrent_assets (ref: scheduler.go SetConnectionLimitsFromDetails
    # reading MaxConcurrentAssetsGetter off the config connection details)
    _limits: dict[str, int] = {}
    for _name, _spec in _conn_specs.items():
        if isinstance(_spec, dict) and _spec.get("max_concurrent_assets") is not None:
            try:
                _limits[_name] = int(_spec["max_concurrent_assets"])
            except (TypeError, ValueError):
                print(
                    f"warning: connection {_name!r}: non-integer "
                    "max_concurrent_assets ignored",
                    file=sys.stderr,
                )
    sched = Scheduler(
        spark,
        pipe,
        context=ctx,
        workers=args.workers,
        full_refresh=args.full_refresh,
        push_metadata=args.push_metadata,
        environment=environment,
        stream_mode=bool(stream_target),
        apply_interval_modifiers=args.apply_interval_modifiers,
        sensor_mode=args.sensor_mode or "",
        connection_limits=_limits or None,
    )
    sched.apply_filters(
        # --stream <asset> runs exactly that streaming asset (ref
        # cmd/run.go StreamMode); otherwise streaming assets are skipped
        only=[stream_target] if stream_target else ([args.asset] if args.asset else None),
        downstream=args.downstream,
        tags=args.tag,
        exclude_tags=args.exclude_tag,
        select=args.select,
        only_types=args.only,
    )
    state_path = args.state or os.path.join(args.pipeline, ".bruin_state.json")
    if args.continue_run and os.path.exists(state_path):
        sched.restore(PipelineState.load(state_path))
    # (the caller already wrapped stdout/stderr in the secret masker)
    res = sched.run(state_path=state_path)
    for iid in res.succeeded:
        print(f"ok   {iid}")
    for iid in res.skipped:
        print(f"skip {iid}")
    for iid in res.upstream_failed:
        print(f"up!  {iid}")
    for iid in res.failed:
        err = sched.instances[iid].error or ""
        # first MEANINGFUL line: Spark parse/analysis exceptions start
        # with an empty line after the class name, so taking line 0
        # verbatim would drop the actual diagnostic ('syntax error at or
        # near ...') the user needs
        lines = [ln.strip() for ln in err.splitlines() if ln.strip()]
        head = lines[0] if lines else ""
        if head.endswith(":") and len(lines) > 1:
            head = f"{head} {lines[1]}"
        print(f"FAIL {iid}: {head}")
    return 0 if res.ok else 1


_INIT_PIPELINE_YML = """name: {name}
schedule: daily
start_date: "2024-01-01"
catchup: false
"""

_INIT_SEED_YML = """name: raw_events
type: spark.seed
parameters:
  path: events.csv
columns:
  - name: event_id
    type: bigint
    checks: [{name: not_null}, {name: unique}]
  - name: user_id
    type: bigint
  - name: amount
    type: bigint
    checks: [{name: non_negative}]
"""

_INIT_SEED_CSV = """event_id,user_id,amount
1,10,25
2,10,40
3,11,5
"""

_INIT_SQL = """/* @bruin
name: user_totals
type: spark.sql
depends: [raw_events]
materialization:
  type: table
  strategy: create+replace
columns:
  - name: user_id
    type: bigint
    checks: [{name: not_null}, {name: unique}]
  - name: total_amount
    type: bigint
    checks: [{name: non_negative}]
@bruin */
SELECT user_id, sum(amount) AS total_amount
FROM raw_events
GROUP BY user_id
"""

_INIT_PY = '''""" @bruin
name: user_report
type: python
depends: [user_totals]
materialization:
  type: table
  strategy: create+replace
@bruin """

def materialize():
    totals = spark.table("user_totals").toPandas()
    totals["is_big_spender"] = totals["total_amount"] > 30
    return totals
'''


_INIT_DOCS_SEED_YML = """name: raw_documents
type: spark.seed
parameters:
  path: documents.csv
columns:
  - name: doc_id
    type: bigint
    checks: [{name: not_null}, {name: unique}]
  - name: text
    type: string
    checks: [{name: not_null}]
"""

_INIT_DOCS_CSV = """doc_id,text
1,"the quick brown fox jumps over the lazy dog while the sun shines over the green hills of the quiet valley and the river runs to the sea"
2,"the quick brown fox jumps over the lazy dog while the sun shines over the green hills of the quiet valley and the river runs to the sea"
3,"tiny doc"
4,"spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam"
5,"a perfectly ordinary document about data pipelines that describes how the quality of each record is measured and how the duplicates are removed from the corpus before training"
"""

_INIT_CURATION_PY = '''""" @bruin
name: curated_docs
type: python
depends: [raw_documents]
materialization:
  type: table
  strategy: create+replace
@bruin """

def materialize():
    # one keep/drop decision per doc with machine-readable reasons
    from bruin_spark.operators.curation import curation_decisions

    return curation_decisions(spark.table("raw_documents"), min_tokens=5)
'''

_INIT_STREAM_ASSET = """name: events_stream
type: ingestr
parameters:
  source_uri: json://{root}/stream_input
  source_table: events
  stream: true
  schema: "event_id bigint, page string"
"""

_INIT_STREAM_SAMPLE = """{"event_id": 1, "page": "/home"}
{"event_id": 2, "page": "/docs"}
{"event_id": 3, "page": "/home"}
"""


def cmd_init(args) -> int:
    """Scaffold a runnable starter pipeline (ref: cmd/init.go +
    templates/; the reference's ~40 warehouse-specific templates
    collapse into Spark-backend ones: default, empty, curation —
    the training-data funnel — and streaming)."""
    root = args.dir
    assets = os.path.join(root, "assets")
    if os.path.exists(os.path.join(root, "pipeline.yml")):
        print(f"{root} already contains a pipeline.yml", file=sys.stderr)
        return 2
    name = args.name or os.path.basename(os.path.abspath(root)) or "my_pipeline"
    abs_root = os.path.abspath(root)
    template = getattr(args, "template", None) or "default"
    templates: dict[str, list[tuple[str, str]]] = {
        "default": [
            ("raw_events.asset.yml", _INIT_SEED_YML),
            ("events.csv", _INIT_SEED_CSV),
            ("user_totals.sql", _INIT_SQL),
            ("user_report.py", _INIT_PY),
        ],
        "empty": [],
        "curation": [
            ("raw_documents.asset.yml", _INIT_DOCS_SEED_YML),
            ("documents.csv", _INIT_DOCS_CSV),
            ("curated_docs.py", _INIT_CURATION_PY),
        ],
        "streaming": [
            ("events_stream.asset.yml", _INIT_STREAM_ASSET.format(root=abs_root)),
        ],
    }
    if template not in templates:
        print(
            f"unknown template {template!r}; available: {', '.join(sorted(templates))}",
            file=sys.stderr,
        )
        return 2
    os.makedirs(assets, exist_ok=True)
    with open(os.path.join(root, "pipeline.yml"), "w") as f:
        f.write(_INIT_PIPELINE_YML.format(name=name))
    for fn, content in templates[template]:
        with open(os.path.join(assets, fn), "w") as f:
            f.write(content)
    if template == "streaming":
        stream_dir = os.path.join(root, "stream_input")
        os.makedirs(stream_dir, exist_ok=True)
        with open(os.path.join(stream_dir, "sample.json"), "w") as f:
            f.write(_INIT_STREAM_SAMPLE)
    print(f"initialized pipeline {name!r} in {root} (template {template})")
    if template == "streaming":
        print(f"run it:  python -m bruin_spark run {root} --stream events_stream")
    else:
        print(f"run it:  python -m bruin_spark run {root}")
    return 0


def cmd_docs(args) -> int:
    """Generate markdown documentation for a pipeline (ref: cmd/docs.go
    serves an interactive UI; this emits the same content statically)."""
    from bruin_spark.model import load_pipeline

    pipe = load_pipeline(args.pipeline)
    lines = [f"# Pipeline: {pipe.name}", ""]
    if pipe.variables:
        lines += ["## Variables", ""]
        for k, v in pipe.variables.items():
            lines.append(f"- `{k}` (default: `{v}`)")
        lines.append("")
    lines += ["## Assets", ""]
    for a in pipe.assets:
        mat = a.materialization
        lines.append(f"### {a.name}")
        lines.append("")
        meta = [f"type: `{a.type}`"]
        if mat.strategy:
            meta.append(f"strategy: `{mat.strategy.value}`")
        if a.depends:
            meta.append("depends: " + ", ".join(f"`{u.value}`" for u in a.depends))
        if a.tags:
            meta.append("tags: " + ", ".join(a.tags))
        if a.owner:
            meta.append(f"owner: {a.owner}")
        lines.append(" · ".join(meta))
        lines.append("")
        if a.description:
            lines += [a.description, ""]
        if a.columns:
            lines += ["| column | type | PK | checks | description |", "|---|---|---|---|---|"]
            for c in a.columns:
                checks = ", ".join(ch.name for ch in c.checks) or "—"
                lines.append(
                    f"| {c.name} | {c.type or '—'} | {'✓' if c.primary_key else ''} "
                    f"| {checks} | {c.description or ''} |"
                )
            lines.append("")
        if a.custom_checks:
            lines += ["Custom checks: " + ", ".join(cc.name for cc in a.custom_checks), ""]
    doc = "\n".join(lines)
    if args.output:
        with open(args.output, "w") as f:
            f.write(doc)
        print(f"wrote {args.output}")
    else:
        print(doc)
    return 0


def cmd_patch(args) -> int:
    """`patch fill-asset-dependencies`: parse each SQL asset's query for
    referenced tables and add any that are pipeline assets to its
    `depends` list, rewriting the asset file (ref: cmd/patch.go:233-379).
    """
    import re

    import yaml

    from bruin_spark.model import load_pipeline
    from bruin_spark.parser import used_tables

    def rewrite_meta(asset, mutate) -> bool:
        """Apply ``mutate(meta_dict)`` to the asset file's metadata
        (YAML file or embedded @bruin block); returns False when the
        file has no rewritable metadata."""
        with open(asset.file_path) as f:
            content = f.read()
        if asset.file_path.endswith((".yml", ".yaml")):
            doc = yaml.safe_load(content) or {}
            mutate(doc)
            new_content = yaml.safe_dump(doc, sort_keys=False)
        else:
            marker = (
                r"/\*\s*@bruin(.*?)@bruin\s*\*/"
                if asset.file_path.endswith(".sql")
                else r'"""\s*@bruin(.*?)@bruin\s*"""'
            )
            block = re.search(marker, content, re.DOTALL)
            if not block:
                return False
            meta = yaml.safe_load(block.group(1)) or {}
            mutate(meta)
            body = yaml.safe_dump(meta, sort_keys=False)
            wrap = ("/* @bruin\n", "@bruin */") if asset.file_path.endswith(".sql") else ('""" @bruin\n', '@bruin """')
            new_content = (
                content[: block.start()] + wrap[0] + body + wrap[1] + content[block.end():]
            )
        with open(asset.file_path, "w") as f:
            f.write(new_content)
        return True

    pipe = load_pipeline(args.pipeline)
    known = {a.name: a for a in pipe.assets}
    patched = []
    if args.subcommand == "fill-columns-from-db":
        # ref: cmd/patch.go:381+ — back-fill declared columns from the
        # materialized table's schema, keeping existing column metadata
        from bruin_spark import get_spark

        spark = get_spark("bruin:patch")
        for a in pipe.assets:
            if not a.file_path or not spark.catalog.tableExists(a.name):
                continue
            declared = {c.name for c in a.columns}
            missing = [
                (n, t) for n, t in spark.table(a.name).dtypes if n not in declared
            ]
            if not missing:
                continue

            def add_cols(meta, missing=missing):
                cols = meta.setdefault("columns", [])
                cols.extend({"name": n, "type": t} for n, t in missing)

            if rewrite_meta(a, add_cols):
                patched.append((a.name, [n for n, _ in missing]))
    else:
        for a in pipe.assets:
            if not a.query or "sql" not in (a.type or "") or not a.file_path:
                continue
            declared = {u.value for u in a.depends}
            missing = sorted(
                t
                for t in used_tables(a.query)
                if t in known and t != a.name and t not in declared
            )
            if not missing:
                continue

            def set_deps(meta, missing=missing):
                # APPEND to the existing list: rewriting it from asset
                # names would flatten structured entries (mode: symbolic,
                # type: uri) into plain full-mode asset deps
                deps = meta.setdefault("depends", [])
                deps.extend(missing)

            if rewrite_meta(a, set_deps):
                patched.append((a.name, missing))
    what = "columns" if args.subcommand == "fill-columns-from-db" else "depends"
    if args.output == "json":
        print(json.dumps([{"asset": n, "added": m} for n, m in patched]))
    else:
        for name, missing in patched:
            print(f"{name}: added {what} {', '.join(missing)}")
        if not patched:
            print(f"all asset {what} already declared")
    return 0


def cmd_import(args) -> int:
    """Scaffold assets from the warehouse catalog (ref: cmd/import.go
    ImportDatabase — here the connection is the SparkSession catalog),
    or from a BI catalog export (--tableau / --quicksight, ref:
    cmd/import_tableau.go / cmd/import_quicksight.go; fixture-replay —
    this environment has no network, so the fetch reads the export dir)."""
    if getattr(args, "odi", None):
        from xml.etree.ElementTree import ParseError

        from bruin_spark.model.odi_import import odi_import

        try:
            res = odi_import(
                args.odi,
                args.pipeline,
                connection=args.connection or "",
                overwrite=args.overwrite,
            )
        except (OSError, ValueError, ParseError, yaml.YAMLError) as e:
            # YAMLError: a malformed EXISTING pipeline.yml the variable
            # merge reads — a user input problem, not a crash
            print(f"ODI import failed: {e}", file=sys.stderr)
            return 2
        print(
            f"parsed {res.xml_files} XML files, {res.scenarios} scenarios; "
            f"created {res.sql_assets} SQL assets, {res.source_assets} source "
            f"assets, {res.control_assets} control assets "
            f"({res.skipped_assets} skipped), {res.variable_macros} variable "
            f"macros, {res.scenario_calls_resolved} scenario calls resolved"
        )
        for p in res.imported_asset_paths:
            print(f"created {p}")
        if res.control_flow_report_written:
            print(f"control-flow report: {res.control_flow_report_path}")
        return 0

    if getattr(args, "tableau", False) or getattr(args, "quicksight", False):
        from bruin_spark.model import bi_import

        fixture_dir = args.fixture_dir or os.environ.get("BRUIN_BI_FIXTURE_DIR")
        if not fixture_dir:
            print(
                "BI import needs --fixture-dir (or $BRUIN_BI_FIXTURE_DIR): "
                "a directory holding tableau.json / quicksight.json exports",
                file=sys.stderr,
            )
            return 2
        try:
            if args.tableau:
                dashboards, site = bi_import.load_tableau_fixture(fixture_dir)
                created, skipped = bi_import.import_tableau_dashboards(
                    args.pipeline,
                    dashboards,
                    host=site["host"],
                    site_id=site["site_id"],
                    workbook_filter=args.workbook or "",
                    project_filter=args.project or "",
                )
            else:
                datasets, qs_dashboards = bi_import.load_quicksight_fixture(fixture_dir)
                created, skipped = bi_import.import_quicksight_assets(
                    args.pipeline, datasets, qs_dashboards
                )
        except (OSError, ValueError, KeyError, TypeError, yaml.YAMLError) as e:
            print(f"BI import failed: {e}", file=sys.stderr)
            return 2
        for p in created:
            print(f"created {p}")
        for p in skipped:
            print(f"skipped {p} (exists)")
        if not created and not skipped:
            print("no BI assets found in the fixture")
        return 0

    from bruin_spark import get_spark
    from bruin_spark.model.importer import import_database, import_tables_dir

    spark = get_spark("bruin:import")
    try:
        if args.tables_dir:
            created, skipped = import_tables_dir(
                spark,
                args.pipeline,
                args.tables_dir,
                schema_name=args.schema or "raw",
                overwrite=args.overwrite,
            )
        else:
            created, skipped = import_database(
                spark,
                args.pipeline,
                schema=args.schema,
                fill_columns=not args.no_columns,
                overwrite=args.overwrite,
            )
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 2
    for p in created:
        print(f"created {p}")
    for p in skipped:
        print(f"skipped {p} (exists; use --overwrite)")
    if not created and not skipped:
        print("no tables found in catalog")
    return 0


def cmd_format(args) -> int:
    """Canonicalize asset files (ref: cmd/format.go; --fail-if-changed
    is the CI hook mode)."""
    from bruin_spark.model.formatter import format_asset_file, format_pipeline

    target = args.path
    if os.path.isfile(target):
        changed_list = [target] if format_asset_file(
            target, write=not args.fail_if_changed
        ) else []
        errors = []
    else:
        changed_list, errors = format_pipeline(
            target, write=not args.fail_if_changed
        )
    for p in errors:
        print(f"error formatting {p}", file=sys.stderr)
    if args.fail_if_changed:
        for p in changed_list:
            print(f"would reformat {p}")
        return 1 if changed_list or errors else 0
    for p in changed_list:
        print(f"formatted {p}")
    if not changed_list:
        print("all assets already formatted")
    return 1 if errors else 0


def cmd_environments(args) -> int:
    """Manage named environments in the project .bruin.yml
    (ref: cmd/environments.go list/create/update/delete/clone)."""
    import json

    from bruin_spark.projectconfig import (
        CONFIG_FILENAME,
        clone_environment,
        create_environment,
        delete_environment,
        load_config,
        save_config,
        update_environment,
    )

    cfg = load_config(args.config_file or os.getcwd())
    if args.envcommand == "list":
        if args.output == "json":
            from bruin_spark.maskout import MASK, _credential_key

            def scrub(v):
                # credential values never reach stdout (CI logs capture
                # this JSON); structure and non-secret fields survive
                if isinstance(v, dict):
                    return {
                        k: (
                            MASK
                            if isinstance(x, str)
                            and (k.lower() == "password" or _credential_key(k))
                            else scrub(x)
                        )
                        for k, x in v.items()
                    }
                if isinstance(v, list):
                    return [scrub(x) for x in v]
                # no '@' requirement: a URI's only credential may live in
                # the query string (stripe://?api_key=... — the standard
                # form for the SaaS schemes); connection_secrets already
                # harvests query-param credentials
                if isinstance(v, str) and "://" in v:
                    from bruin_spark.maskout import connection_secrets

                    for secret in connection_secrets(v):
                        v = v.replace(secret, MASK)
                return v

            print(
                json.dumps(
                    {
                        "selected_environment": cfg.default_environment,
                        "environments": [
                            {"name": n, **scrub(spec)}
                            for n, spec in cfg.environments.items()
                        ],
                    }
                )
            )
        else:
            if not cfg.environments:
                print("no environments defined")
            for n, spec in cfg.environments.items():
                star = "*" if n == cfg.default_environment else " "
                prefix = spec.get("schema_prefix", "")
                print(f"{star} {n}" + (f" (schema_prefix: {prefix})" if prefix else ""))
        return 0

    try:
        if args.envcommand == "create":
            create_environment(cfg, args.name, schema_prefix=args.schema_prefix or "")
        elif args.envcommand == "update":
            update_environment(
                cfg, args.name, new_name=args.new_name, schema_prefix=args.schema_prefix
            )
        elif args.envcommand == "delete":
            delete_environment(cfg, args.name)
        elif args.envcommand == "clone":
            clone_environment(
                cfg, args.name, args.target, schema_prefix=args.schema_prefix
            )
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 2
    path = cfg.path or args.config_file or os.path.join(os.getcwd(), CONFIG_FILENAME)
    save_config(cfg, path)
    print(f"{args.envcommand}d environment {args.name!r} in {path}")
    return 0


def cmd_unit_test(args) -> int:
    """Run the unit tests declared on SQL assets (ref: cmd/unittest.go
    `bruin unit-test [pipeline|asset]`): each test runs the asset's
    rendered query against pinned CTE fixtures and compares rows."""
    from bruin_spark import get_spark
    from bruin_spark.model import load_pipeline
    from bruin_spark.render import render_asset_query
    from bruin_spark.unittests import run_unit_tests

    pipe = load_pipeline(args.pipeline)
    assets = [a for a in pipe.assets if a.unit_tests]
    if args.asset:
        assets = [a for a in assets if a.name == args.asset]
        if not assets:
            print(f"no unit tests found for asset {args.asset!r}", file=sys.stderr)
            return 2
    if not assets:
        print("no unit tests declared in this pipeline")
        return 0
    spark = get_spark(f"bruin:unit-test:{pipe.name}")
    ctx = _pipeline_context(args, pipe)
    try:
        ctx.variables.update(parse_var_overrides(getattr(args, "var", None)))
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 2
    failed = 0
    for asset in assets:
        ctx.this = asset.name
        rendered = render_asset_query(asset, ctx)
        for res in run_unit_tests(spark, asset, rendered):
            mark = "ok  " if res.passed else "FAIL"
            detail = f": {res.message}" if res.message else ""
            print(f"{mark} {res.asset}::{res.test}{detail}")
            failed += 0 if res.passed else 1
    return 1 if failed else 0


def cmd_connections(args) -> int:
    """Manage named connections in the project .bruin.yml
    (ref: cmd/connections.go list/add/delete; specs are URI strings or
    typed mappings rendered by sources/connections.py)."""
    import json

    from bruin_spark.projectconfig import CONFIG_FILENAME, load_config, save_config
    from bruin_spark.sources.connections import (
        connection_uri,
        environment_connection_specs,
    )

    cfg = load_config(args.config_file or os.getcwd())
    env = args.environment or cfg.default_environment or "default"

    def _render_all(env_name: str) -> dict[str, str]:
        # per-connection tolerance: one malformed spec must not hide the
        # rest of the listing
        out = {}
        for name, spec in environment_connection_specs(cfg, env_name).items():
            try:
                out[name] = connection_uri(spec)
            except ValueError as e:
                out[name] = f"<invalid: {e}>"
        return out

    if args.conncommand == "list":
        if args.output == "json":
            print(json.dumps({e: _render_all(e) for e in (cfg.environments or {})}))
        else:
            conns = _render_all(env)
            if not conns:
                print(f"no connections in environment {env!r}")
            for name, uri in conns.items():
                scheme = uri.split("://", 1)[0]
                print(f"{name} ({scheme})")
        return 0
    envs = cfg.environments.setdefault(env, {})
    conns = envs.setdefault("connections", {})
    # flattened view covers BOTH layouts (flat name->spec and the
    # reference's grouped type->[specs-with-name])
    flat_names = set(environment_connection_specs(cfg, env))
    if args.conncommand == "add":
        if args.name in flat_names:
            print(f"connection {args.name!r} already exists in {env!r}", file=sys.stderr)
            return 2
        if args.name in conns and isinstance(conns[args.name], list):
            # a type key holding a grouped list — assigning would clobber
            # every connection in the group
            print(
                f"{args.name!r} is a connection type grouping "
                f"{len(conns[args.name])} connection(s); pick another name",
                file=sys.stderr,
            )
            return 2
        conns[args.name] = args.uri
    elif args.conncommand == "delete":
        if args.name in conns and not isinstance(conns[args.name], list):
            del conns[args.name]
        elif args.name in flat_names:
            # grouped layout: remove the single named entry from its
            # type list (never silently delete a whole group)
            for type_key, val in list(conns.items()):
                if isinstance(val, list):
                    kept = [i for i in val if (i or {}).get("name") != args.name]
                    if len(kept) != len(val):
                        if kept:
                            conns[type_key] = kept
                        else:
                            del conns[type_key]
                        break
        elif args.name in conns:  # a type key holding a group
            n = len(conns[args.name])
            print(
                f"{args.name!r} is a connection type grouping {n} connection(s); "
                f"delete them by name",
                file=sys.stderr,
            )
            return 2
        else:
            print(f"unknown connection {args.name!r} in {env!r}", file=sys.stderr)
            return 2
    path = cfg.path or args.config_file or os.path.join(os.getcwd(), CONFIG_FILENAME)
    save_config(cfg, path)
    verb = "added" if args.conncommand == "add" else "deleted"
    print(f"{verb} connection {args.name!r} in {path} ({env})")
    return 0


def cmd_ingestr_uri(args) -> int:
    """Resolve a named connection to its source URI and write it to a
    file (ref: cmd/ingestr_uri.go — plaintext credentials, 0600 perms,
    refuses an existing output path, no trailing newline; --cdc
    rewrites onto the change-data-capture scheme)."""
    from bruin_spark.projectconfig import load_config
    from bruin_spark.sources.connections import environment_connections

    from bruin_spark.secretsbackend import lookup_connection, selected_backend

    backend = selected_backend(getattr(args, "secrets_backend", None))
    if backend:
        from bruin_spark.sources.connections import connection_uri

        try:
            uri = connection_uri(lookup_connection(backend, args.connection))
        except (ValueError, NotImplementedError) as exc:
            print(str(exc), file=sys.stderr)
            return 2
    else:
        from bruin_spark.sources.connections import (
            connection_uri as _conn_uri,
            environment_connection_specs,
        )

        cfg = load_config(args.config_file or os.getcwd())
        env = args.environment or cfg.default_environment or "default"
        # render ONLY the requested spec: an unrelated malformed
        # connection elsewhere in the env must not crash this command
        specs = environment_connection_specs(cfg, env)
        if args.connection not in specs:
            print(
                f"unknown connection {args.connection!r} in environment {env!r}",
                file=sys.stderr,
            )
            return 2
        try:
            uri = _conn_uri(specs[args.connection])
        except ValueError as exc:
            print(str(exc), file=sys.stderr)
            return 2
    if args.cdc:
        from bruin_spark.sources.uri import to_cdc

        try:
            uri = to_cdc(uri)
        except ValueError as exc:
            print(str(exc), file=sys.stderr)
            return 2
    if os.path.exists(args.output):
        print(
            f"refusing to overwrite existing file: {args.output}", file=sys.stderr
        )
        return 2
    # O_EXCL so the 0600 mode applies from creation (the URI holds
    # plaintext credentials); deleting it after use is the caller's job.
    fd = os.open(args.output, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o600)
    with os.fdopen(fd, "w") as fh:
        fh.write(uri)
    return 0


def cmd_clean(args) -> int:
    """Remove run artifacts: pipeline state files and (with --sinks)
    leftover stream sink tables (ref: cmd/clean.go removes cached
    artifacts; ours are state + streaming sinks)."""
    removed = []
    state = os.path.join(args.pipeline, ".bruin_state.json")
    if os.path.exists(state):
        os.remove(state)
        removed.append(state)
    ckpts = os.path.join(args.pipeline, ".bruin_checkpoints")
    if args.sinks:
        from bruin_spark import get_spark
        from bruin_spark.mat.maintenance import sweep_orphans

        spark = get_spark("bruin:clean")
        # A streaming checkpoint and its target table are one unit:
        # deleting the checkpoint while the table survives means the next
        # `run --stream` re-reads the whole source backlog into the
        # existing table — duplicate rows, exactly-once broken. So the
        # checkpoint dir is only removed here, under --sinks, and each
        # per-asset checkpoint's target table (same name) is dropped
        # alongside it.
        if os.path.isdir(ckpts):
            import re
            import shutil

            # Checkpoint dir entries are untrusted filesystem names
            # (editor temp files, partial dirs, renamed-asset leftovers
            # can appear): only entries shaped like table identifiers
            # are dropped, quoted, and one bad entry never aborts the
            # sweep of the rest.
            ident = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?$")
            for asset_name in sorted(os.listdir(ckpts)):
                if not ident.match(asset_name):
                    print(f"skipping non-table checkpoint entry {asset_name!r}")
                    continue
                quoted = ".".join(f"`{p}`" for p in asset_name.split("."))
                try:
                    spark.sql(f"DROP TABLE IF EXISTS {quoted}")
                    removed.append(f"table:{asset_name}")
                except Exception as e:  # noqa: BLE001 - keep sweeping
                    print(f"failed to drop {asset_name}: {e}")
            shutil.rmtree(ckpts, ignore_errors=True)
            removed.append(ckpts)
        # Swap-family orphans (__cdc_*/__opt_*) go through the recovery
        # sweep, NOT a plain DROP: after a mid-swap crash the backup is
        # the only copy of the target (restore it), and a leftover
        # backup's stale partition locations can point at the live
        # table's files (safe_drop repairs before dropping).
        for action in sweep_orphans(spark):
            removed.append(f"table:{action}")
        for t in spark.catalog.listTables():
            if t.name.startswith("stream_sink_") and t.tableType != "TEMPORARY":
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")
                removed.append(f"table:{t.name}")
    for r in removed:
        print(f"removed {r}")
    if not removed:
        print("nothing to clean")
    return 0


#: curl's own template variables ({{name}} / {{name:trim:url}} chains)
#: must survive rendering untouched (ref cmd/curl.go
#: curlVariableExpression) — they are curl --variable substitutions,
#: not Jinja.
_CURL_VAR_RE = None


def render_curl_args(curl_args, lookup) -> list[str]:
    """Jinja-render each curl argument; ``bruin.connection(name)``
    exposes a named connection's fields (ref cmd/curl.go
    renderCurlArgs). Raises ValueError on an unknown connection."""
    import re
    import uuid

    from bruin_spark.render.jinja import _ENV

    global _CURL_VAR_RE
    if _CURL_VAR_RE is None:
        _CURL_VAR_RE = re.compile(r"\{\{[A-Za-z0-9_]+(?::[A-Za-z0-9_,]+)*\}\}")

    cache: dict = {}

    def connection(name: str):
        if name not in cache:
            cache[name] = lookup(name)
        return cache[name]

    rendered = []
    for i, arg in enumerate(curl_args):
        protected = arg
        placeholders = []
        for v in _CURL_VAR_RE.findall(arg):
            ph = f"__bruin_curl_var_{uuid.uuid4().hex}__"
            placeholders.append((ph, v))
            protected = protected.replace(v, ph, 1)
        try:
            # ref cmd/curl.go:160-161: the curl `bruin` context is the
            # full builtin set PLUS connection() — a passed kwarg
            # shadows the env global, so merge rather than replace
            from bruin_spark.render.builtins import BUILTINS

            out = _ENV.from_string(protected).render(
                bruin={**BUILTINS, "connection": connection}
            )
        except ValueError:
            raise
        except Exception as exc:
            raise ValueError(f"failed to render curl argument {i + 1}: {exc}") from exc
        for ph, v in placeholders:
            out = out.replace(ph, v)
        rendered.append(out)
    return rendered


def cmd_curl(args) -> int:
    """Proxy to the installed curl after rendering each argument with
    Jinja + connection context (ref cmd/curl.go). curl owns stdout;
    engine diagnostics go to stderr only, and curl's own exit code is
    propagated (128+signal when signalled)."""
    import subprocess

    curl_args = list(args.curl_args or [])
    if curl_args and curl_args[0] == "--":
        curl_args = curl_args[1:]
    if not curl_args:
        print("at least one curl option or URL is required after --", file=sys.stderr)
        return 1

    def lookup(name: str):
        from bruin_spark.projectconfig import load_config
        from bruin_spark.secretsbackend import lookup_connection, selected_backend
        from bruin_spark.sources.connections import (
            connection_fields,
            environment_connection_specs,
        )

        backend = selected_backend(getattr(args, "secrets_backend", None))
        if backend:
            return connection_fields(lookup_connection(backend, name))
        cfg = load_config(args.config_file or os.getcwd())
        env = args.environment or cfg.default_environment or "default"
        specs = environment_connection_specs(cfg, env)
        if name not in specs:
            raise ValueError(f"unknown connection {name!r} in environment {env!r}")
        return connection_fields(specs[name])

    try:
        rendered = render_curl_args(curl_args, lookup)
    except ValueError as exc:
        print(str(exc), file=sys.stderr)
        return 1
    rc = subprocess.run([args.curl_path, *rendered]).returncode
    return rc if rc >= 0 else 128 - rc


def cmd_optimize(args) -> int:
    """Compact a table's small files and optionally refresh CBO stats
    (Spark-first maintenance — the analog of Delta OPTIMIZE / Iceberg
    rewrite_data_files for the parquet warehouse this engine manages)."""
    import json

    from bruin_spark import get_spark
    from bruin_spark.mat.maintenance import analyze_table, compact_table

    spark = get_spark("bruin:optimize")
    if not spark.catalog.tableExists(args.table):
        print(f"unknown table: {args.table}", file=sys.stderr)
        return 2
    rep = compact_table(
        spark,
        args.table,
        target_file_mb=args.target_file_mb,
        dry_run=args.dry_run,
        zorder_by=args.zorder or None,
    )
    if args.analyze:
        rep["analyze"] = analyze_table(spark, args.table, args.columns or None)
    print(json.dumps(rep))
    return 0


def cmd_mcp(args) -> int:
    """Serve the engine's docs tree over MCP stdio JSON-RPC
    (ref: cmd/mcp/mcp.go:41-110)."""
    from bruin_spark.mcpserver import run_mcp_server

    if args.debug:
        print("Starting Bruin MCP server...", file=sys.stderr)
    return run_mcp_server(debug=args.debug)


def cmd_render(args) -> int:
    from bruin_spark.mat.strategies import render_materialization
    from bruin_spark.model import load_pipeline
    from bruin_spark.render import render_asset_query

    pipe = load_pipeline(args.pipeline)
    asset = pipe.asset(args.asset)
    if asset is None:
        print(f"asset not found: {args.asset}", file=sys.stderr)
        return 2
    if getattr(args, "ddl", False):
        # ref cmd/render_ddl.go:158 — force the DDL strategy so the output
        # is the CREATE TABLE schema derived from the declared columns
        from bruin_spark.model.pipeline import MaterializationType, Strategy

        asset.materialization.type = MaterializationType.TABLE
        asset.materialization.strategy = Strategy.DDL
    ctx = _pipeline_context(args, pipe)
    ctx.this = asset.name
    sql = render_asset_query(asset, ctx)
    for stmt in render_materialization(asset, sql, args.full_refresh):
        print(stmt.rstrip(";") + ";")
    return 0


def cmd_query(args) -> int:
    from bruin_spark import get_spark
    from bruin_spark.parser import add_limit
    from bruin_spark.session import load_tables

    if getattr(args, "semantic_model", None):
        # ref: cmd/fetch.go:594-680 — compile a semantic query from the
        # repo's semantic/ dir (next to the pipeline by default)
        from bruin_spark.semantic import SemanticEngine
        from bruin_spark.semantic.loader import load_semantic_dir
        from bruin_spark.semantic.model import DimensionRef, Query

        sem_dir = args.semantic_dir or os.path.join(args.pipeline or ".", "semantic")
        models = load_semantic_dir(sem_dir)
        model = models.get(args.semantic_model)
        if model is None:
            print(
                f"semantic model {args.semantic_model!r} not found in {sem_dir}",
                file=sys.stderr,
            )
            return 2
        dims = []
        for d in args.dimension or []:
            name, _, gran = d.partition(":")
            dims.append(DimensionRef(name, granularity=gran))
        q = Query(
            dimensions=dims,
            metrics=list(args.metric or []),
            segments=list(args.segment or []),
            # limit applied downstream via add_limit like every query
        )
        others = [m for m in models.values() if m.name != model.name]
        query = SemanticEngine(model, others).generate_sql(q)
    elif args.asset:
        from bruin_spark.model import load_pipeline
        from bruin_spark.render import render_asset_query

        pipe = load_pipeline(args.pipeline or ".")
        asset = pipe.asset(args.asset)
        if asset is None:
            print(f"asset not found: {args.asset}", file=sys.stderr)
            return 2
        ctx = _pipeline_context(args, pipe)
        ctx.this = asset.name
        query = render_asset_query(asset, ctx)
        # a materialization: none asset can be full DDL (CREATE ... AS
        # SELECT / CTAS / INSERT ... SELECT) — `query --asset` runs the
        # inner SELECT, never the DDL (ref: pkg/sqlparser ExtractSelect,
        # parser.go:423-435).  Best-effort: a raw multi-statement script
        # or an already-plain SELECT keeps the rendered text unchanged.
        from bruin_spark.parser import extract_select

        try:
            query = extract_select(query)
        except ValueError:
            pass
    else:
        query = args.query
    if not query:
        print(
            "one of --query, --asset, or --semantic-model is required",
            file=sys.stderr,
        )
        return 2

    spark = get_spark("bruin:query")
    if args.sf_dir:
        load_tables(spark, args.sf_dir)
    q = add_limit(query, args.limit) if args.limit else query
    df = spark.sql(q)
    rows = df.collect()
    if getattr(args, "export", None):
        # ref: cmd/fetch.go --export (CSV; .json by extension here)
        if os.path.splitext(args.export)[1].lower() == ".json":
            with open(args.export, "w") as f:
                json.dump([r.asDict() for r in rows], f, default=str)
        else:
            import csv

            with open(args.export, "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(df.columns)
                for r in rows:
                    w.writerow([r[c] for c in df.columns])
        print(f"exported {len(rows)} rows to {args.export}")
        return 0
    if args.json:
        print(json.dumps([r.asDict() for r in rows], default=str))
    else:
        print("\t".join(df.columns))
        for r in rows:
            print("\t".join(str(v) for v in r))
    return 0


def cmd_parse(args) -> int:
    from bruin_spark.model import load_pipeline

    pipe = load_pipeline(args.pipeline)
    if getattr(args, "variant", None):
        overrides = pipe.variants.get(args.variant)
        if overrides is None:
            print(f"unknown variant: {args.variant}", file=sys.stderr)
            return 2
        for k, v in overrides.get("variables", overrides).items():
            pipe.variables[k] = v
        pipe.raw["selected_variant"] = args.variant
    if getattr(args, "column_lineage", False):
        # fold column lineage into the model before dumping (ref:
        # `bruin internal parse-pipeline -c`, pkg/lineage/lineage.go)
        from bruin_spark.model.pipeline import resolve_variables
        from bruin_spark.parser.pipeline_lineage import extract_pipeline_lineage
        from bruin_spark.render import RenderContext, render_asset_query

        ctx = RenderContext(
            pipeline_name=pipe.name,
            variables=resolve_variables(pipe.variables),
            macros=pipe.macros,
        )
        issues = extract_pipeline_lineage(
            pipe, render=lambda a: render_asset_query(a, ctx)
        )
        for issue in issues:
            print(f"lineage: {issue}", file=sys.stderr)

    if getattr(args, "internal", False):
        # raw dataclass dump (debugging aid; not the compat contract)
        def clean(obj):
            if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
                return {k: clean(v) for k, v in dataclasses.asdict(obj).items()}
            if isinstance(obj, dict):
                return {k: clean(v) for k, v in obj.items()}
            if isinstance(obj, (list, tuple)):
                return [clean(v) for v in obj]
            if hasattr(obj, "value"):
                return obj.value
            return obj

        print(json.dumps(clean(pipe), indent=2, default=str))
        return 0

    # default: the reference's parse-pipeline IR shape (what the VS Code
    # extension and the reference's own golden tests consume)
    from bruin_spark.model.refjson import pipeline_to_reference_json

    base = os.path.dirname(os.path.abspath(args.pipeline))
    print(json.dumps(pipeline_to_reference_json(pipe, base_dir=base), indent=2))
    return 0


def cmd_curate(args) -> int:
    """Run the five-stage RefinedWeb curation funnel over a documents
    table/parquet: per-document decisions (optionally written to
    parquet) plus the per-stage attrition report on stdout."""
    from bruin_spark import get_spark
    from bruin_spark.operators.refinedweb import funnel_attrition, refinedweb_funnel
    from bruin_spark.session import load_tables

    spark = get_spark("bruin:curate")
    if args.sf_dir:
        load_tables(spark, args.sf_dir)
    src = args.table
    docs = spark.read.parquet(src) if src.endswith(".parquet") else spark.table(src)
    decisions = refinedweb_funnel(
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        lang_col=args.lang_col,
        lm_top_v=args.lm_top_v,
    )
    if args.out:
        decisions.write.mode("overwrite").parquet(args.out)
        # re-read: the attrition pass must not recompute the funnel
        decisions = spark.read.parquet(args.out)
    for r in funnel_attrition(decisions).collect():
        print(
            f"{r['stage_no']}. {r['stage']:<12} in={r['n_in']:<8} "
            f"dropped={r['n_dropped']:<8} out={r['n_out']}"
        )
    if args.out:
        print(f"decisions written to {args.out}")
    return 0


def cmd_data_diff(args) -> int:
    from bruin_spark import get_spark
    from bruin_spark.diff import diff_tables
    from bruin_spark.session import load_tables

    spark = get_spark("bruin:data-diff")
    if args.sf_dir:
        load_tables(spark, args.sf_dir)

    def resolve(ref: str):
        return spark.read.parquet(ref) if ref.endswith(".parquet") else spark.table(ref)

    res = diff_tables(
        resolve(args.table1),
        resolve(args.table2),
        tolerance=args.tolerance,
        approx=bool(getattr(args, "approx", False)),
    )
    for c in res.schema_only_a:
        print(f"only in {args.table1}: {c}")
    for c in res.schema_only_b:
        print(f"only in {args.table2}: {c}")
    for c, ta, tb in res.type_mismatches:
        print(f"type mismatch {c}: {ta} vs {tb}")
    for c, stat, va, vb in res.stat_diffs:
        print(f"stat diff {c}.{stat}: {va} vs {vb}")
    matched = res.matched
    if getattr(args, "top_n", 0):
        # per-string-column most-common values (ref StringStatistics
        # MostCommon/TopNDistinct, pkg/diff/types.go:494-495): shown for
        # both tables; a diverging histogram fails the diff like any
        # stat difference (the exit code is the contract CI consumes)
        from bruin_spark.diff import top_values

        n = int(args.top_n)
        ta = {
            (r["column_name"], r["value"]): r["cnt"]
            for r in top_values(resolve(args.table1), n).collect()
        }
        tb = {
            (r["column_name"], r["value"]): r["cnt"]
            for r in top_values(resolve(args.table2), n).collect()
        }
        for key in sorted(set(ta) | set(tb), key=lambda k: (k[0], str(k[1]))):
            col, val = key
            fa, fb = ta.get(key), tb.get(key)
            marker = "  " if fa == fb else "! "
            if fa != fb:
                matched = False
            print(f"{marker}top[{col}] {val!r}: {fa} vs {fb}")
    print("MATCH" if matched else "DIFFER")
    return 0 if matched else 1


def cmd_lineage(args) -> int:
    from bruin_spark.model import load_pipeline
    from bruin_spark.parser.lineage import get_column_lineage
    from bruin_spark.parser.sqlutil import used_tables

    pipe = load_pipeline(args.pipeline)
    asset = pipe.asset(args.asset)
    if asset is None:
        print(f"asset not found: {args.asset}", file=sys.stderr)
        return 2
    # sibling assets' declared columns act as the schema for * expansion,
    # like the reference feeding upstream schemas into sqlglot's qualify
    schema = {
        a.name: [c.name for c in a.columns]
        for a in pipe.assets
        if a.columns
    }
    lineage = get_column_lineage(asset.query, schema=schema or None)
    print(
        json.dumps(
            {
                "asset": asset.name,
                "used_tables": used_tables(asset.query),
                "columns": lineage["columns"],
                "non_selected_columns": lineage["non_selected_columns"],
                "errors": lineage["errors"],
            },
            indent=2,
        )
    )
    return 0


def cmd_lint(args) -> int:
    from bruin_spark.lint import lint_with_policies
    from bruin_spark.model import load_pipeline

    spark = None
    if getattr(args, "dry_run", False):
        from bruin_spark import get_spark

        spark = get_spark("bruin:lint")
    pipe = load_pipeline(args.pipeline)
    issues = lint_with_policies(pipe, spark=spark)
    if getattr(args, "output", "plain") == "json":
        # the reference's `validate -o json` issues document
        # (golden: missing-upstream-pipeline/expectations/*.json)
        by_asset: dict[str, list[dict]] = {}
        for i in issues:
            by_asset.setdefault(i.asset, []).append(
                {
                    "asset": i.asset,
                    "description": i.message,
                    "context": [],
                    "severity": "critical" if i.severity == "error" else "warning",
                }
            )
        print(
            json.dumps(
                [{"pipeline": pipe.name, "issues": by_asset}], indent=2
            )
        )
    else:
        for i in issues:
            print(str(i))
    return 1 if any(i.severity == "error" for i in issues) else 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="bruin_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pdo = sub.add_parser("docs", help="generate markdown docs for a pipeline")
    pdo.add_argument("pipeline")
    pdo.add_argument("--output", help="write to a file instead of stdout")
    pdo.set_defaults(fn=cmd_docs)

    ppa = sub.add_parser(
        "patch", help="fill missing asset dependencies from parsed SQL"
    )
    ppa.add_argument(
        "subcommand", choices=["fill-asset-dependencies", "fill-columns-from-db"]
    )
    ppa.add_argument("pipeline")
    ppa.add_argument("--output", choices=["plain", "json"], default="plain")
    ppa.set_defaults(fn=cmd_patch)

    pc = sub.add_parser("clean", help="remove run state and stream sink leftovers")
    pc.add_argument("pipeline", nargs="?", default=".")
    pc.add_argument("--sinks", action="store_true", help="also drop stream_sink_* tables")
    pc.set_defaults(fn=cmd_clean)

    pi = sub.add_parser("init", help="scaffold a runnable starter pipeline")
    pi.add_argument("dir")
    pi.add_argument("--name", help="pipeline name (default: directory name)")
    pi.add_argument(
        "--template",
        default="default",
        help="pipeline template: default, empty, curation, streaming",
    )
    pi.set_defaults(fn=cmd_init)

    pim = sub.add_parser(
        "import", help="scaffold assets from the warehouse catalog (ref: bruin import database)"
    )
    pim.add_argument("pipeline")
    pim.add_argument("--schema", "-s", help="only this schema/database")
    pim.add_argument(
        "--no-columns", "-n", action="store_true", help="skip column metadata"
    )
    pim.add_argument("--overwrite", action="store_true", help="replace existing asset files")
    pim.add_argument(
        "--tables-dir",
        help="import parquet tables from this directory instead of the catalog",
    )
    pim.add_argument(
        "--tableau",
        action="store_true",
        help="import Tableau dashboards/workbooks/data sources "
        "(fixture-replay; ref: bruin import tableau)",
    )
    pim.add_argument(
        "--quicksight",
        action="store_true",
        help="import QuickSight datasets/dashboards "
        "(fixture-replay; ref: bruin import quicksight)",
    )
    pim.add_argument(
        "--fixture-dir",
        help="BI catalog export dir (default $BRUIN_BI_FIXTURE_DIR) — the "
        "no-network analogue of the reference's live API fetch",
    )
    pim.add_argument("--workbook", help="tableau: only workbooks matching this name")
    pim.add_argument("--project", help="tableau: only projects matching this name")
    pim.add_argument(
        "--odi",
        metavar="XML_PATH",
        help="import Oracle Data Integrator XML exports from this file/dir "
        "(ref: bruin import odi)",
    )
    pim.add_argument(
        "--connection",
        "-c",
        help="odi: Oracle connection name to set on imported assets",
    )
    pim.set_defaults(fn=cmd_import)

    pe = sub.add_parser(
        "environments", help="manage environments in the project .bruin.yml"
    )
    pesub = pe.add_subparsers(dest="envcommand", required=True)
    pel = pesub.add_parser("list")
    pel.add_argument("--output", "-o", default="plain", choices=["plain", "json"])
    pel.add_argument("--config-file")
    pel.set_defaults(fn=cmd_environments)
    for verb in ("create", "update", "delete", "clone"):
        pv = pesub.add_parser(verb)
        pv.add_argument("name")
        if verb == "clone":
            pv.add_argument("target")
        if verb == "update":
            pv.add_argument("--new-name")
        if verb in ("create", "update", "clone"):
            pv.add_argument("--schema-prefix")
        pv.add_argument("--config-file")
        pv.set_defaults(fn=cmd_environments, output="plain")

    pu = sub.add_parser(
        "unit-test", help="run unit tests declared on SQL assets"
    )
    pu.add_argument("pipeline", nargs="?", default=".")
    pu.add_argument("--asset", help="only this asset's tests")
    pu.add_argument("--start")
    pu.add_argument("--end")
    pu.add_argument("--var", action="append", help="override pipeline variables")
    pu.set_defaults(fn=cmd_unit_test)

    pcn = sub.add_parser(
        "connections", help="manage named connections in the project .bruin.yml"
    )
    pcnsub = pcn.add_subparsers(dest="conncommand", required=True)
    pcl = pcnsub.add_parser("list")
    pcl.add_argument("--output", "-o", default="plain", choices=["plain", "json"])
    pcl.add_argument("--environment", "--env")
    pcl.add_argument("--config-file")
    pcl.set_defaults(fn=cmd_connections, name="")
    pca = pcnsub.add_parser("add")
    pca.add_argument("name")
    pca.add_argument("--uri", required=True, help="source URI for the connection")
    pca.add_argument("--environment", "--env")
    pca.add_argument("--config-file")
    pca.set_defaults(fn=cmd_connections, output="plain")
    pcd = pcnsub.add_parser("delete")
    pcd.add_argument("name")
    pcd.add_argument("--environment", "--env")
    pcd.add_argument("--config-file")
    pcd.set_defaults(fn=cmd_connections, output="plain")

    piu = sub.add_parser(
        "ingestr-uri",
        help="resolve a connection name to a source URI and write it to a file",
    )
    piu.add_argument("output", help="output file (created 0600; must not exist)")
    piu.add_argument("connection", help="connection name in the active environment")
    piu.add_argument("--config-file")
    piu.add_argument("--environment", "--env")
    piu.add_argument(
        "--secrets-backend",
        help="resolve the connection from a secrets store instead of .bruin.yml "
        "(env, vault, doppler, aws, azure); also via BRUIN_SECRETS_BACKEND",
    )
    piu.add_argument(
        "--cdc",
        action="store_true",
        help="rewrite the URI onto its change-data-capture scheme",
    )
    piu.set_defaults(fn=cmd_ingestr_uri)

    pf = sub.add_parser("format", help="canonicalize asset definition files")
    pf.add_argument("path", nargs="?", default=".", help="pipeline dir or one asset file")
    pf.add_argument(
        "--fail-if-changed",
        action="store_true",
        help="don't rewrite; exit 1 if any asset needs reformatting (CI hook)",
    )
    pf.set_defaults(fn=cmd_format)

    pr = sub.add_parser("run", help="run a pipeline")
    pr.add_argument("pipeline")
    pr.add_argument("--asset")
    pr.add_argument(
        "--select",
        default=None,
        help="selector expression: +name, name+2, @name, tag:/path:/file:/fqn:, comma intersect",
    )
    pr.add_argument("--downstream", action="store_true")
    pr.add_argument(
        "--only",
        action="append",
        choices=["main", "checks"],
        help="restrict to instance kinds (ref run --only): e.g. --only checks",
    )
    pr.add_argument("--tag", action="append", default=[])
    pr.add_argument("--exclude-tag", action="append", default=[])
    pr.add_argument("--full-refresh", action="store_true")
    pr.add_argument(
        "--apply-interval-modifiers",
        action="store_true",
        help="apply per-asset interval modifiers to the run window "
        "(ref run flag; ignored with --full-refresh)",
    )
    pr.add_argument("--workers", type=int, default=None)
    pr.add_argument("--start")
    pr.add_argument("--end")
    pr.add_argument("--run-id")
    pr.add_argument("--state")
    pr.add_argument("--tables-dir", help="register parquet tables from this dir as views")
    pr.add_argument("--variant", help="apply a named variable override set")
    pr.add_argument(
        "--var",
        action="append",
        help="override pipeline variables: key=value (JSON value) or a "
        "JSON object; repeatable (ref run --var)",
    )
    pr.add_argument(
        "--environment",
        help="run in a named environment from pipeline.yml (schema_prefix rewriting)",
    )
    pr.add_argument("--push-metadata", action="store_true")
    pr.add_argument(
        "--secrets-backend",
        help="resolve asset connections from a secrets store "
        "(env, vault, doppler, aws, azure); also via BRUIN_SECRETS_BACKEND",
    )
    pr.add_argument(
        "--sensor-mode",
        choices=["wait", "once", "skip"],
        help="override every sensor's mode for this run (ref run --sensor-mode)",
    )
    pr.add_argument("--continue", dest="continue_run", action="store_true")
    pr.add_argument(
        "--stream",
        metavar="ASSET",
        help="run a single continuously-streaming asset (batch runs skip them)",
    )
    pr.set_defaults(fn=cmd_run)

    pd = sub.add_parser("render", help="print rendered SQL for an asset")
    pd.add_argument("pipeline")
    pd.add_argument("asset")
    pd.add_argument("--start")
    pd.add_argument("--end")
    pd.add_argument("--full-refresh", action="store_true")
    pd.add_argument(
        "--ddl",
        action="store_true",
        help="render the asset as CREATE TABLE DDL from its declared "
        "columns (ref: bruin render-ddl)",
    )
    pd.add_argument(
        "--var",
        action="append",
        help="set top-level Jinja variables for rendering (key=value or JSON)",
    )
    pd.set_defaults(fn=cmd_render)

    pq = sub.add_parser("query", help="run an ad-hoc query or an asset's rendered query")
    pq.add_argument("--query")
    pq.add_argument("--asset", help="render + run this asset's query instead")
    pq.add_argument("--pipeline", help="pipeline dir for --asset (default .)")
    pq.add_argument("--start")
    pq.add_argument("--end")
    pq.add_argument("--limit", type=int)
    pq.add_argument("--sf-dir", help="register parquet tables from this dir")
    pq.add_argument("--json", action="store_true")
    pq.add_argument("--export", help="write results to a .csv / .json file")
    pq.add_argument("--semantic-model", help="compile a semantic query instead of SQL")
    pq.add_argument("--semantic-dir", help="semantic models dir (default: <pipeline>/semantic)")
    pq.add_argument("--metric", action="append", help="semantic metric (repeatable)")
    pq.add_argument("--dimension", action="append", help="semantic dimension, optionally name:granularity (repeatable)")
    pq.add_argument("--segment", action="append", help="semantic segment (repeatable)")
    pq.add_argument(
        "--var",
        action="append",
        help="set top-level Jinja variables for rendering (key=value or JSON)",
    )
    pq.set_defaults(fn=cmd_query)

    pli = sub.add_parser("lineage", help="best-effort column lineage for an asset")
    pli.add_argument("pipeline")
    pli.add_argument("asset")
    pli.set_defaults(fn=cmd_lineage)

    pcu = sub.add_parser(
        "curate", help="five-stage RefinedWeb curation funnel over a documents table"
    )
    pcu.add_argument("table", help="catalog table or parquet path with (id, text, lang)")
    pcu.add_argument("--sf-dir", help="register parquet tables from this dir")
    pcu.add_argument("--out", help="write per-document decisions parquet here")
    pcu.add_argument("--id-col", default="doc_id")
    pcu.add_argument("--text-col", default="text")
    pcu.add_argument("--lang-col", default="lang")
    pcu.add_argument(
        "--lm-top-v",
        type=int,
        default=None,
        help="prune the LM vocabulary to the top V tokens (production setting)",
    )
    pcu.set_defaults(fn=cmd_curate)

    pdd = sub.add_parser("data-diff", help="schema + per-column stat comparison")
    pdd.add_argument("table1", help="catalog table or parquet path")
    pdd.add_argument("table2")
    pdd.add_argument("--tolerance", type=float, default=0.0)
    pdd.add_argument(
        "--top-n",
        type=int,
        default=0,
        help="also compare the N most-common values per string column",
    )
    pdd.add_argument("--sf-dir", help="register parquet tables from this dir")
    pdd.add_argument(
        "--approx",
        action="store_true",
        help="HyperLogLog distinct counts (Expand-free plan; the "
        "recommended mode for large tables)",
    )
    pdd.set_defaults(fn=cmd_data_diff)

    pp = sub.add_parser("parse", help="dump the parsed pipeline as JSON")
    pp.add_argument("pipeline")
    pp.add_argument(
        "-c",
        "--column-lineage",
        action="store_true",
        help="fold column lineage into the dump (ref: parse-pipeline -c)",
    )
    pp.add_argument(
        "--internal",
        action="store_true",
        help="dump the internal dataclass shape instead of the reference IR",
    )
    pp.add_argument("--variant", help="apply a named variable-override set")
    pp.set_defaults(fn=cmd_parse)

    # `validate` is the reference's name for the same command (cmd/lint.go
    # registers it as "validate"); both spellings work here
    pl = sub.add_parser("lint", aliases=["validate"], help="lint a pipeline")
    pl.add_argument("pipeline")
    pl.add_argument("--output", "-o", default="plain", choices=["plain", "json"])
    pl.add_argument(
        "--dry-run",
        action="store_true",
        help="EXPLAIN custom-check/hook SQL against a live session",
    )
    pl.set_defaults(fn=cmd_lint)

    pcu = sub.add_parser(
        "curl", help="run curl with arguments rendered from named connections"
    )
    pcu.add_argument("--config-file")
    pcu.add_argument("--environment", "--env")
    pcu.add_argument("--secrets-backend")
    pcu.add_argument("--curl-path", default="curl", help=argparse.SUPPRESS)
    pcu.add_argument(
        "curl_args",
        nargs=argparse.REMAINDER,
        help="everything after -- goes to curl verbatim (post-render)",
    )
    pcu.set_defaults(fn=cmd_curl)

    po = sub.add_parser(
        "optimize", help="compact a table's small files and refresh statistics"
    )
    po.add_argument("table")
    po.add_argument("--target-file-mb", type=int, default=128)
    po.add_argument("--dry-run", action="store_true")
    po.add_argument(
        "--zorder",
        nargs="+",
        help="cluster the rewrite on a Morton key over these columns "
        "(Delta OPTIMIZE ZORDER BY analog; tightens per-file min/max "
        "stats for data skipping)",
    )
    po.add_argument("--analyze", action="store_true", help="ANALYZE TABLE after compaction")
    po.add_argument("--columns", nargs="*", help="columns for ANALYZE ... FOR COLUMNS")
    po.set_defaults(fn=cmd_optimize)

    pm = sub.add_parser(
        "mcp",
        help="serve the engine docs over the Model Context Protocol "
        "(stdio JSON-RPC; ref: bruin mcp)",
    )
    pm.add_argument("--debug", action="store_true", help="trace requests on stderr")
    pm.set_defaults(fn=cmd_mcp)

    pver = sub.add_parser("version", help="print the engine version")
    pver.set_defaults(fn=lambda a: (print(f"bruin_spark {__import__('bruin_spark').__version__}"), 0)[1])

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
