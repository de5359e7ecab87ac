"""Model parsing + Jinja rendering unit tests (no Spark session needed)."""

import textwrap
from datetime import datetime

from bruin_spark.model.loader import parse_embedded_block, load_asset_file, load_pipeline
from bruin_spark.model.pipeline import Strategy
from bruin_spark.render.jinja import (
    RenderContext,
    apply_interval_modifier,
    render_sql,
    split_statements,
)


CTX = RenderContext(start=datetime(2024, 1, 1), end=datetime(2024, 1, 2), pipeline_name="p")


def test_parse_embedded_sql_block():
    content = textwrap.dedent(
        """\
        /* @bruin
        name: myschema.daily
        type: spark.sql
        materialization:
          type: table
          strategy: delete+insert
          incremental_key: d
        columns:
          - name: d
            type: date
            primary_key: true
            checks:
              - not_null
              - name: unique
        @bruin */
        SELECT 1 AS d
        """
    )
    meta, body = parse_embedded_block(content)
    assert meta["name"] == "myschema.daily"
    assert body == "SELECT 1 AS d"
    from bruin_spark.model.pipeline import Asset

    a = Asset.from_dict(meta, query=body)
    assert a.materialization.strategy == Strategy.DELETE_INSERT
    assert a.columns[0].checks[0].name == "not_null"
    assert a.columns[0].checks[1].name == "unique"


def test_single_line_bruin_keys():
    content = "-- @bruin.name: my_asset\n-- @bruin.type: spark.sql\nSELECT 2"
    meta, body = parse_embedded_block(content)
    assert meta == {"name": "my_asset", "type": "spark.sql"}
    assert body == "SELECT 2"


def test_pipeline_dir_loading(tmp_path):
    (tmp_path / "pipeline.yml").write_text("name: demo\nschedule: daily\n")
    assets = tmp_path / "assets"
    assets.mkdir()
    (assets / "a.sql").write_text("/* @bruin\nname: a\n@bruin */\nSELECT 1 AS x")
    (assets / "b.asset.yml").write_text("name: b\ntype: spark.seed\nparameters:\n  path: seed.csv\n")
    p = load_pipeline(str(tmp_path))
    assert p.name == "demo"
    assert sorted(p.asset_names()) == ["a", "b"]


def test_render_interval_context():
    sql = "SELECT * FROM t WHERE d BETWEEN '{{ start_date }}' AND '{{ end_date }}'"
    assert (
        render_sql(sql, CTX)
        == "SELECT * FROM t WHERE d BETWEEN '2024-01-01' AND '2024-01-02'"
    )


def test_render_filters_and_builtins():
    # Go time.AddDate normalization (ref filters.go:128): Jan 31 + 1mo
    # rolls into March, it is not clamped to Feb 29
    assert render_sql("{{ '2024-01-31' | add_months(1) }}", CTX) == "2024-03-02"
    assert render_sql("{{ '2024-03-15' | truncate_month }}", CTX) == "2024-03-01"
    # reference Spark-platform emissions (pkg/spark/bruin_funcs.go:12,
    # pkg/jinja/bruin_funcs.go:576) — both bare and bruin.-namespaced
    out = render_sql("SELECT {{ generate_surrogate_key('a', 'b') }}", CTX)
    assert out == (
        "SELECT md5(concat(coalesce(cast(a as string), '_bruin_surrogate_key_null_'), "
        "'-', coalesce(cast(b as string), '_bruin_surrogate_key_null_')))"
    )
    assert render_sql("{{ bruin.generate_surrogate_key(['a', 'b']) }}", CTX) == out[7:]
    assert render_sql("{{ safe_divide('x', 'y') }}", CTX) == "(x) / nullif((y), 0)"


def test_interval_modifiers():
    assert apply_interval_modifier(datetime(2024, 1, 10), "-2d") == datetime(2024, 1, 8)
    assert apply_interval_modifier(datetime(2024, 1, 10), "3h") == datetime(2024, 1, 10, 3)
    # Go AddDate normalization, like the reference's ModifyDate
    # (pipeline.go:4118): Jan 31 + 1M rolls into March, never clamps
    assert apply_interval_modifier(datetime(2024, 1, 31), "1M") == datetime(2024, 3, 2)
    assert apply_interval_modifier(datetime(2024, 2, 29), "1y") == datetime(2025, 3, 1)


def test_split_statements():
    sql = "SELECT 1; -- c;omment\nSELECT ';' AS s; /* b;c */ SELECT 3"
    stmts = split_statements(sql)
    assert len(stmts) == 3
    assert stmts[1].endswith("SELECT ';' AS s")  # ';' inside quotes not split on


def test_pipeline_macros_render(tmp_path):
    from datetime import datetime

    from bruin_spark.model.loader import load_pipeline
    from bruin_spark.render.jinja import RenderContext, render_sql

    (tmp_path / "pipeline.yml").write_text("name: m\n")
    macros = tmp_path / "macros"
    macros.mkdir()
    (macros / "util.sql").write_text(
        "{% macro money(col) %}ROUND({{ col }}, 2){% endmacro %}"
    )
    assets = tmp_path / "assets"
    assets.mkdir()
    (assets / "a.sql").write_text("SELECT {{ money('amount') }} AS amt FROM t")
    pipe = load_pipeline(str(tmp_path))
    assert "macro money" in pipe.macros
    ctx = RenderContext(start=datetime(2024, 1, 1), end=datetime(2024, 1, 2))
    ctx.macros = pipe.macros
    out = render_sql(pipe.asset("a").query, ctx)
    assert out == "SELECT ROUND(amount, 2) AS amt FROM t"


def test_start_timestamp_has_utc_suffix():
    """Naive contexts render as UTC with a 'Z' suffix (reference Go layout
    '2006-01-02T15:04:05.000000Z07:00', jinja.go:154)."""
    from datetime import datetime, timedelta, timezone

    from bruin_spark.render.jinja import RenderContext, render_sql

    ctx = RenderContext(start=datetime(2024, 1, 1), end=datetime(2024, 1, 2))
    out = render_sql("{{ start_timestamp }}|{{ end_timestamp }}", ctx)
    assert out == "2024-01-01T00:00:00.000000Z|2024-01-02T00:00:00.000000Z"

    tz = timezone(timedelta(hours=5, minutes=30))
    ctx2 = RenderContext(start=datetime(2024, 1, 1, tzinfo=tz), end=datetime(2024, 1, 2, tzinfo=tz))
    assert render_sql("{{ start_timestamp }}", ctx2) == "2024-01-01T00:00:00.000000+05:30"


# ---------- --var overrides (ref cmd/const.go parseVariable) ----------


def test_parse_var_overrides():
    import pytest

    from bruin_spark.cli import parse_var_overrides

    assert parse_var_overrides(None) == {}
    assert parse_var_overrides(['{"forecast_days": 14, "region": "eu"}']) == {
        "forecast_days": 14,
        "region": "eu",
    }
    assert parse_var_overrides(["min_signups=5", 'name="ada"', "flag=true"]) == {
        "min_signups": 5,
        "name": "ada",
        "flag": True,
    }
    # later values win
    assert parse_var_overrides(["x=1", "x=2"]) == {"x": 2}
    with pytest.raises(ValueError, match="key=value"):
        parse_var_overrides(["novalue"])
    with pytest.raises(ValueError, match="must be JSON"):
        parse_var_overrides(["x=notjson"])
    with pytest.raises(ValueError, match="invalid variable override"):
        parse_var_overrides(['{"broken": '])


def test_run_var_overrides_and_variant_precedence(spark, tmp_path):
    """--var applies to rendering; a selected variant's keys win over
    overlapping --var keys (ref cmd/const.go:179-185)."""
    from types import SimpleNamespace

    from bruin_spark.cli import cmd_run

    d = tmp_path / "varpipe"
    (d / "assets").mkdir(parents=True)
    (d / "pipeline.yml").write_text(
        "name: varpipe\n"
        "variables:\n"
        "  days: {type: integer, default: 1}\n"
        "  label: {type: string, default: base}\n"
        "variants:\n"
        "  weekly:\n"
        "    variables: {days: 7}\n"
    )
    (d / "assets" / "vout.sql").write_text(
        "/* @bruin\nname: vout\ntype: spark.sql\nmaterialization:\n"
        "  type: table\n@bruin */\n"
        "SELECT {{ var.days }} AS days, '{{ var.label }}' AS label\n"
    )

    def run(**kw):
        args = SimpleNamespace(
            pipeline=str(d), asset=None, select=None, downstream=False, only=None,
            tag=[], exclude_tag=[], full_refresh=False, apply_interval_modifiers=False,
            workers=1, start=None, end=None, run_id=None, state=str(d / "s.json"),
            tables_dir=None, variant=None, environment=None, push_metadata=False,
            sensor_mode=None, continue_run=False, stream=None, var=None,
        )
        for k, v in kw.items():
            setattr(args, k, v)
        return cmd_run(args)

    spark.sql("DROP TABLE IF EXISTS vout")
    assert run(var=["days=3", 'label="override"']) == 0
    row = spark.table("vout").collect()[0]
    assert (row["days"], row["label"]) == (3, "override")
    # variant wins on overlap; non-overlapping --var still applies
    spark.sql("DROP TABLE IF EXISTS vout")
    assert run(variant="weekly", var=["days=99", 'label="kept"']) == 0
    row = spark.table("vout").collect()[0]
    assert (row["days"], row["label"]) == (7, "kept")
    spark.sql("DROP TABLE IF EXISTS vout")


def test_render_ddl_flag(tmp_path, capsys):
    """render --ddl forces the DDL strategy: output is CREATE TABLE from
    the declared columns (ref cmd/render_ddl.go)."""
    from types import SimpleNamespace

    from bruin_spark.cli import cmd_render

    d = tmp_path / "ddlpipe"
    (d / "assets").mkdir(parents=True)
    (d / "pipeline.yml").write_text("name: ddlpipe\n")
    (d / "assets" / "t.sql").write_text(
        "/* @bruin\nname: sch.t\ntype: spark.sql\ncolumns:\n"
        "  - name: id\n    type: bigint\n"
        "  - name: amount\n    type: decimal(10, 2)\n@bruin */\n\n"
        "SELECT 1 AS id\n"
    )
    args = SimpleNamespace(
        pipeline=str(d), asset="sch.t", start=None, end=None,
        full_refresh=False, ddl=True,
    )
    assert cmd_render(args) == 0
    out = capsys.readouterr().out
    assert "CREATE TABLE IF NOT EXISTS" in out
    assert "`id` bigint" in out and "`amount` decimal(10, 2)" in out
    assert "SELECT 1" not in out  # DDL renders schema, not the query


def test_variable_specs_resolve_to_defaults():
    """JSON-Schema-shaped variable specs (the reference's format) render
    their DEFAULT, not the spec dict (pkg/pipeline/variables.go)."""
    from bruin_spark.model.pipeline import resolve_variables
    from bruin_spark.render.jinja import RenderContext, render_sql

    vars_ = resolve_variables(
        {"env": {"type": "string", "default": "prod"}, "plain": 7}
    )
    assert vars_ == {"env": "prod", "plain": 7}
    ctx = RenderContext()
    ctx.variables = vars_
    assert render_sql("SELECT '{{ var.env }}', {{ var.plain }}", ctx) == "SELECT 'prod', 7"


def test_render_and_query_resolve_variables_and_macros(tmp_path, capsys):
    """render/query/unit-test see the same context run sees: resolved
    variable defaults and pipeline macros (shared _pipeline_context)."""
    from types import SimpleNamespace

    from bruin_spark.cli import cmd_render

    d = tmp_path / "ctxpipe"
    (d / "assets").mkdir(parents=True)
    (d / "macros").mkdir()
    (d / "pipeline.yml").write_text(
        "name: ctxpipe\nvariables:\n  lim:\n    type: integer\n    default: 7\n"
    )
    (d / "macros" / "m.sql").write_text(
        "{% macro double(x) %}({{ x }} * 2){% endmacro %}"
    )
    (d / "assets" / "a.sql").write_text(
        "/* @bruin\nname: a\ntype: spark.sql\n@bruin */\n"
        "SELECT {{ double(var.lim) }} AS v\n"
    )
    args = SimpleNamespace(
        pipeline=str(d), asset="a", start=None, end=None, run_id=None,
        full_refresh=False, ddl=False,
    )
    assert cmd_render(args) == 0
    out = capsys.readouterr().out
    assert "(7 * 2)" in out


def test_deduplicate_builtin_hides_helper_column(spark):
    from bruin_spark.render.builtins import deduplicate

    spark.range(5).selectExpr("id % 2 AS k", "id AS v").createOrReplaceTempView("dd_t")
    # the builtin emits a bare select (reference shape) — wrap to embed
    df = spark.sql(f"SELECT * FROM ({deduplicate('dd_t', 'k', 'v DESC')})")
    assert df.columns == ["k", "v"]  # no __bruin_row_number leak
    assert {(r["k"], r["v"]) for r in df.collect()} == {(0, 4), (1, 3)}


def test_date_spine_subday(spark):
    from bruin_spark.render.builtins import date_spine

    df = spark.sql(f"SELECT * FROM ({date_spine('hour', chr(39)+'2024-01-01'+chr(39), chr(39)+'2024-01-02'+chr(39))})")
    assert df.count() == 24  # exclusive end, hourly


def test_macro_loading_reference_behaviors(tmp_path):
    """Pin the reference's LoadMacros contract (pkg/jinja/macros_test.go
    TestLoadMacros table): only top-level macro FILES load —
    subdirectories are ignored (even one named `x.sql`), non-macro
    extensions skip, missing/empty dirs are fine."""
    from bruin_spark.model import load_pipeline

    (tmp_path / "pipeline.yml").write_text("name: p\n")
    adir = tmp_path / "assets"
    adir.mkdir()
    (adir / "a.sql").write_text("/* @bruin\nname: a\ntype: duckdb.sql\n@bruin */\nSELECT 1")

    # missing macros dir -> empty macros, loads fine
    pipe = load_pipeline(str(tmp_path))
    assert not pipe.macros

    macros = tmp_path / "macros"
    macros.mkdir()
    # empty dir -> still empty
    assert not load_pipeline(str(tmp_path)).macros

    (macros / "m1.sql").write_text("{% macro m1() %}SELECT 1{% endmacro %}")
    (macros / "readme.md").write_text("# Macros")
    (macros / "notes.txt").write_text("Some notes")
    sub = macros / "subdir"
    sub.mkdir()
    (sub / "ignored.sql").write_text("{% macro ignored() %}SELECT 2{% endmacro %}")
    trap = macros / "trap.sql"
    trap.mkdir()  # a DIRECTORY named like a macro file must not crash
    (trap / "inner.sql").write_text("{% macro inner() %}SELECT 3{% endmacro %}")

    pipe = load_pipeline(str(tmp_path))
    assert "macro m1()" in pipe.macros
    assert "ignored" not in pipe.macros
    assert "inner" not in pipe.macros
    assert "Macros" not in pipe.macros and "notes" not in pipe.macros
