"""`import` (catalog -> asset scaffolds, ref cmd/import.go) and
`format` (canonical asset re-serialization, ref cmd/format.go)."""

import os

import yaml


def _mk_pipeline(tmp_path, name="p"):
    d = tmp_path / name
    (d / "assets").mkdir(parents=True)
    (d / "pipeline.yml").write_text(f"name: {name}\n")
    return str(d)


# ---------- import ----------


def test_import_database_scaffolds_tables_and_views(spark, tmp_path):
    from bruin_spark.model.importer import import_database
    from bruin_spark.model import load_pipeline

    spark.sql("CREATE DATABASE IF NOT EXISTS impdb")
    spark.sql("DROP TABLE IF EXISTS impdb.users")
    spark.sql("DROP VIEW IF EXISTS impdb.users_v")
    spark.createDataFrame(
        [(1, "ada"), (2, "grace")], "id bigint, name string"
    ).write.mode("overwrite").saveAsTable("impdb.users")
    spark.sql("CREATE OR REPLACE VIEW impdb.users_v AS SELECT id, name FROM impdb.users")
    try:
        pdir = _mk_pipeline(tmp_path)
        created, skipped = import_database(spark, pdir, schema="impdb")
        assert not skipped
        by_name = {os.path.basename(p): p for p in created}
        assert "users.asset.yml" in by_name
        meta = yaml.safe_load(open(by_name["users.asset.yml"]))
        assert meta["name"] == "impdb.users"
        assert meta["type"] == "spark.source"
        cols = {c["name"]: c["type"] for c in meta["columns"]}
        assert cols == {"id": "bigint", "name": "string"}
        # the view became a runnable .sql asset with its definition
        assert "users_v.sql" in by_name
        sql_src = open(by_name["users_v.sql"]).read()
        assert "materialization" in sql_src and "SELECT" in sql_src.upper()
        # the scaffolded pipeline loads and lints as a DAG
        pipe = load_pipeline(pdir)
        assert {a.name for a in pipe.assets} == {"impdb.users", "impdb.users_v"}
        # re-import skips existing files
        created2, skipped2 = import_database(spark, pdir, schema="impdb")
        assert not created2 and len(skipped2) == 2
    finally:
        spark.sql("DROP VIEW IF EXISTS impdb.users_v")
        spark.sql("DROP TABLE IF EXISTS impdb.users")
        spark.sql("DROP DATABASE IF EXISTS impdb")


def test_import_requires_pipeline_dir(spark, tmp_path):
    import pytest

    from bruin_spark.model.importer import import_database

    with pytest.raises(ValueError):
        import_database(spark, str(tmp_path / "nope"))


def test_import_tables_dir_from_parquet_footers(spark, tmp_path):
    from bruin_spark.model.importer import import_tables_dir
    from bruin_spark.model import load_pipeline

    pdir = _mk_pipeline(tmp_path)
    created, _ = import_tables_dir(
        spark, pdir, "/root/testdata/sf0.001", schema_name="raw"
    )
    names = {os.path.basename(p) for p in created}
    assert {"orders.asset.yml", "lineitem.asset.yml", "documents.asset.yml"} <= names
    meta = yaml.safe_load(
        open(os.path.join(pdir, "assets", "raw", "orders.asset.yml"))
    )
    assert meta["name"] == "raw.orders"
    cols = {c["name"]: c["type"] for c in meta["columns"]}
    assert cols["o_orderkey"] == "bigint"
    pipe = load_pipeline(pdir)
    assert any(a.name == "raw.orders" for a in pipe.assets)


# ---------- format ----------


def test_format_yaml_stable_key_order_and_idempotent(tmp_path):
    from bruin_spark.model.formatter import format_asset_file

    pdir = _mk_pipeline(tmp_path)
    p = os.path.join(pdir, "assets", "a.asset.yml")
    with open(p, "w") as f:
        f.write("columns:\n- type: bigint\n  name: id\ndescription: d\ntype: spark.sql\nname: a\n")
    assert format_asset_file(p) is True
    out = open(p).read()
    # canonical top-level order: name, type, description, columns
    assert out.index("name:") < out.index("type:") < out.index("description:")
    assert out.index("description:") < out.index("columns:")
    assert format_asset_file(p) is False  # idempotent


def test_format_sql_block_and_keywords(tmp_path):
    from bruin_spark.model.formatter import format_asset_file
    from bruin_spark.model.loader import load_asset_file

    pdir = _mk_pipeline(tmp_path)
    p = os.path.join(pdir, "assets", "rep.sql")
    with open(p, "w") as f:
        f.write(
            "/* @bruin\ntype: spark.sql\nname: rep\nmaterialization:\n"
            "  strategy: create+replace\n  type: table\n@bruin */\n\n"
            "select o_orderkey, 'from x' as lit from orders where o_totalprice > 1   \n"
        )
    assert format_asset_file(p) is True
    out = open(p).read()
    assert "SELECT o_orderkey" in out and "FROM orders WHERE" in out
    assert "'from x'" in out  # strings untouched
    assert not any(line != line.rstrip() for line in out.splitlines())
    # semantics preserved: still parses to the same asset
    a = load_asset_file(p)
    assert a.name == "rep" and a.materialization.strategy.value == "create+replace"
    assert format_asset_file(p) is False  # idempotent


def test_format_pipeline_fail_if_changed_probe(tmp_path):
    from bruin_spark.model.formatter import format_pipeline

    pdir = _mk_pipeline(tmp_path)
    p = os.path.join(pdir, "assets", "b.asset.yml")
    with open(p, "w") as f:
        f.write("type: spark.sql\nname: b\n")
    before = open(p).read()
    changed, errors = format_pipeline(pdir, write=False)
    assert changed == [p] and not errors
    assert open(p).read() == before  # probe didn't rewrite
    changed, _ = format_pipeline(pdir, write=True)
    assert changed == [p]
    changed, _ = format_pipeline(pdir, write=True)
    assert changed == []


def test_format_idempotent_on_init_scaffold(tmp_path):
    """format(format(x)) == format(x) on the repo's own `init` starter
    pipeline — and formatting must not change what loads."""
    from types import SimpleNamespace

    from bruin_spark.cli import cmd_init
    from bruin_spark.model import load_pipeline
    from bruin_spark.model.formatter import format_pipeline

    dst = str(tmp_path / "starter")
    assert cmd_init(SimpleNamespace(dir=dst, name="starter")) == 0
    names_before = sorted(a.name for a in load_pipeline(dst).assets)
    format_pipeline(dst, write=True)
    changed, errors = format_pipeline(dst, write=True)
    assert changed == [] and errors == [], (changed, errors)
    names_after = sorted(a.name for a in load_pipeline(dst).assets)
    assert names_before == names_after


def test_format_preserves_jinja_spans(tmp_path):
    """Jinja is case-sensitive: keyword-casing must never reach inside
    {{ }} / {% %} / {# #} spans."""
    from bruin_spark.model.formatter import normalize_sql_body

    src = (
        "select x from t\n"
        "{% if ds and run_id %}\n"
        "where d between '{{ start_date }}' and '{{ end_date | date_add(1) }}'\n"
        "{% endif %}\n"
        "{# a comment with and or not #}\n"
    )
    out = normalize_sql_body(src)
    assert "{% if ds and run_id %}" in out          # jinja untouched
    assert "{{ end_date | date_add(1) }}" in out
    assert "{# a comment with and or not #}" in out
    assert out.startswith("SELECT x FROM t")         # SQL still cased
    assert "BETWEEN" in out and "AND '{{" in out     # sql AND outside jinja
    assert normalize_sql_body(out) == out            # idempotent


def test_format_idempotent_on_init_templates(tmp_path, capsys):
    """`format` must be a no-op fixpoint on every pipeline `init`
    scaffolds (CI hook contract: --fail-if-changed passes right after
    an initial format)."""
    from types import SimpleNamespace

    from bruin_spark.cli import cmd_format, cmd_init

    for template in ("default", "curation", "streaming"):
        d = tmp_path / f"fmt_{template}"
        assert cmd_init(SimpleNamespace(dir=str(d), name=None, template=template)) == 0
        # first pass may canonicalize; second pass must change nothing
        cmd_format(SimpleNamespace(path=str(d), fail_if_changed=False))
        rc = cmd_format(SimpleNamespace(path=str(d), fail_if_changed=True))
        assert rc == 0, f"format not idempotent for template {template}"


def test_docs_over_curation_template(tmp_path, capsys):
    from types import SimpleNamespace

    from bruin_spark.cli import cmd_docs, cmd_init

    d = tmp_path / "docpipe"
    assert cmd_init(SimpleNamespace(dir=str(d), name=None, template="curation")) == 0
    out_md = tmp_path / "docs.md"
    assert cmd_docs(SimpleNamespace(pipeline=str(d), output=str(out_md))) == 0
    text = out_md.read_text()
    assert "curated_docs" in text and "raw_documents" in text
