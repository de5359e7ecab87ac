"""End-to-end integration test in the reference's integration-test style
(integration-tests/test-pipelines/* executed via pkg/e2e): a full
pipeline DIRECTORY on disk — seed CSV, SQL assets with create+replace and
merge strategies, a Python materialize() asset, column checks — run
through the real CLI entry point (`bruin_spark.cli.main`), twice, with
golden row assertions after each run (the duckdb-materialization-* and
duckdb-scd2-tests expectation-CSV pattern).
"""

import textwrap

import pytest

from bruin_spark.cli import main as cli_main


@pytest.fixture()
def pipeline_dir(tmp_path):
    d = tmp_path / "shop"
    assets = d / "assets"
    assets.mkdir(parents=True)
    (d / "pipeline.yml").write_text("name: shop_pipeline\n")

    (assets / "products.csv").write_text(
        "product_id,name,stock\n1,apple,10\n2,banana,20\n"
    )
    (assets / "shop_products.asset.yml").write_text(
        textwrap.dedent(
            """
            name: shop_products
            type: spark.seed
            parameters:
              path: products.csv
            columns:
              - name: product_id
                type: bigint
                checks: [{name: not_null}, {name: unique}]
              - name: name
                type: string
              - name: stock
                type: bigint
                checks: [{name: non_negative}]
            """
        )
    )
    (assets / "shop_inventory.sql").write_text(
        textwrap.dedent(
            """
            /* @bruin
            name: shop_inventory
            type: spark.sql
            depends: [shop_products]
            materialization:
              type: table
              strategy: merge
            columns:
              - name: product_id
                type: bigint
                primary_key: true
              - name: name
                type: string
                update_on_merge: true
              - name: stock
                type: bigint
                update_on_merge: true
            @bruin */
            SELECT product_id, name, stock FROM shop_products
            """
        )
    )
    (assets / "shop_summary.sql").write_text(
        textwrap.dedent(
            """
            /* @bruin
            name: shop_summary
            type: spark.sql
            depends: [shop_inventory]
            materialization:
              type: table
              strategy: create+replace
            columns:
              - name: n_products
                type: bigint
                checks: [{name: positive}]
              - name: total_stock
                type: bigint
            @bruin */
            SELECT count(*) AS n_products, sum(stock) AS total_stock
            FROM shop_inventory
            """
        )
    )
    (assets / "shop_flags.py").write_text(
        textwrap.dedent(
            '''
            """ @bruin
            name: shop_flags
            type: python
            depends: [shop_inventory]
            materialization:
              type: table
              strategy: create+replace
            @bruin """
            import pandas as pd

            def materialize():
                inv = spark.table("shop_inventory").toPandas()
                inv["low_stock"] = inv["stock"] < 15
                return inv[["product_id", "low_stock"]]
            '''
        )
    )
    return d


def _rows(spark, table, key):
    return [tuple(r) for r in spark.table(table).orderBy(key).collect()]


def test_pipeline_runs_end_to_end_and_merges_on_rerun(spark, pipeline_dir):
    rc = cli_main(
        ["run", str(pipeline_dir), "--start", "2024-01-01", "--end", "2024-01-02"]
    )
    assert rc == 0
    assert _rows(spark, "shop_inventory", "product_id") == [
        (1, "apple", 10),
        (2, "banana", 20),
    ]
    assert _rows(spark, "shop_summary", "n_products") == [(2, 30)]
    assert _rows(spark, "shop_flags", "product_id") == [(1, True), (2, False)]

    # second run: seed changes — stock update for an existing PK plus a
    # brand-new product; merge must update in place and insert the new row
    (pipeline_dir / "assets" / "products.csv").write_text(
        "product_id,name,stock\n1,apple,7\n2,banana,20\n3,cherry,5\n"
    )
    rc = cli_main(
        ["run", str(pipeline_dir), "--start", "2024-01-02", "--end", "2024-01-03"]
    )
    assert rc == 0
    assert _rows(spark, "shop_inventory", "product_id") == [
        (1, "apple", 7),
        (2, "banana", 20),
        (3, "cherry", 5),
    ]
    assert _rows(spark, "shop_summary", "n_products") == [(3, 32)]
    assert _rows(spark, "shop_flags", "product_id") == [
        (1, True),
        (2, False),
        (3, True),
    ]


def test_blocking_check_failure_fails_run_and_gates_downstream(spark, pipeline_dir):
    # negative stock violates the seed's non_negative check; downstream
    # assets must not run (ref: scheduler.go:1127-1140 Blocking())
    (pipeline_dir / "assets" / "products.csv").write_text(
        "product_id,name,stock\n1,apple,-4\n"
    )
    for t in ("shop_inventory", "shop_summary", "shop_flags"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    rc = cli_main(
        ["run", str(pipeline_dir), "--start", "2024-01-01", "--end", "2024-01-02"]
    )
    assert rc == 1
    assert not spark.catalog.tableExists("shop_summary")
    assert not spark.catalog.tableExists("shop_flags")


def test_parse_pipeline_json_golden(pipeline_dir, capsys):
    # the reference's parse-whole-pipeline golden (pipeline.yml.json):
    # assert the JSON dump's load-bearing structure
    import json

    rc = cli_main(["parse", str(pipeline_dir)])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["name"] == "shop_pipeline"
    by_name = {a["name"]: a for a in doc["assets"]}
    assert set(by_name) == {"shop_products", "shop_inventory", "shop_summary", "shop_flags"}
    assert by_name["shop_inventory"]["materialization"]["strategy"] == "merge"
    assert [u["value"] for u in by_name["shop_summary"]["upstreams"]] == ["shop_inventory"]
    inv_cols = {c["name"]: c for c in by_name["shop_inventory"]["columns"]}
    assert inv_cols["product_id"]["primary_key"] is True
    assert by_name["shop_flags"]["type"] == "python"


def test_query_export_csv_and_json(spark, tmp_path):
    out_csv = tmp_path / "r.csv"
    out_json = tmp_path / "r.json"
    rc = cli_main(["query", "--query", "SELECT 1 AS a, 'x' AS b", "--export", str(out_csv)])
    assert rc == 0
    assert out_csv.read_text().splitlines() == ["a,b", "1,x"]
    rc = cli_main(["query", "--query", "SELECT 2 AS n", "--export", str(out_json)])
    assert rc == 0
    import json

    assert json.loads(out_json.read_text()) == [{"n": 2}]


def test_init_scaffold_runs_end_to_end(spark, tmp_path):
    d = tmp_path / "starter"
    rc = cli_main(["init", str(d), "--name", "starter"])
    assert rc == 0
    rc = cli_main(["init", str(d)])  # refuses to clobber
    assert rc == 2
    rc = cli_main(["run", str(d), "--start", "2024-01-01", "--end", "2024-01-02"])
    assert rc == 0
    assert _rows(spark, "user_totals", "user_id") == [(10, 65), (11, 5)]
    report = {r["user_id"]: r["is_big_spender"] for r in spark.table("user_report").collect()}
    assert report == {10: True, 11: False}


def test_clean_removes_state_and_sinks(spark, tmp_path):
    d = tmp_path / "p"
    d.mkdir()
    (d / ".bruin_state.json").write_text("{}")
    # a streaming asset's checkpoint + target table pair: they must only
    # ever be removed TOGETHER (checkpoint gone + table kept would make
    # the next run --stream re-append the whole backlog)
    ckpt = d / ".bruin_checkpoints" / "stream_tbl_cleanme"
    ckpt.mkdir(parents=True)
    spark.sql("CREATE TABLE IF NOT EXISTS stream_tbl_cleanme (x INT) USING parquet")
    spark.sql("CREATE TABLE IF NOT EXISTS stream_sink_cleanme (x INT) USING parquet")
    rc = cli_main(["clean", str(d)])
    assert rc == 0
    assert not (d / ".bruin_state.json").exists()
    # without --sinks the checkpoint/table pair survives intact
    assert ckpt.is_dir()
    assert spark.catalog.tableExists("stream_tbl_cleanme")
    rc = cli_main(["clean", str(d), "--sinks"])
    assert rc == 0
    assert not (d / ".bruin_checkpoints").exists()
    assert not spark.catalog.tableExists("stream_tbl_cleanme")
    assert not spark.catalog.tableExists("stream_sink_cleanme")
    rc = cli_main(["clean", str(d)])
    assert rc == 0  # idempotent


def test_only_checks_revalidates_without_rematerializing(spark, pipeline_dir):
    rc = cli_main(["run", str(pipeline_dir), "--start", "2024-01-01", "--end", "2024-01-02"])
    assert rc == 0
    # change the seed on disk; --only checks must validate the EXISTING
    # tables without re-running mains (ref cmd/run.go --only)
    (pipeline_dir / "assets" / "products.csv").write_text(
        "product_id,name,stock\n9,kiwi,1\n"
    )
    rc = cli_main(
        ["run", str(pipeline_dir), "--only", "checks", "--start", "2024-01-01", "--end", "2024-01-02"]
    )
    assert rc == 0
    # table still reflects the first run, not the new seed
    assert [r["product_id"] for r in spark.table("shop_products").collect()] != [9]


def test_patch_fill_asset_dependencies(tmp_path, capsys):
    d = tmp_path / "patchme"
    assets = d / "assets"
    assets.mkdir(parents=True)
    (d / "pipeline.yml").write_text("name: patchme\n")
    (assets / "base.sql").write_text(
        "/* @bruin\nname: base\ntype: spark.sql\n@bruin */\nSELECT 1 AS x\n"
    )
    (assets / "derived.sql").write_text(
        "/* @bruin\nname: derived\ntype: spark.sql\n@bruin */\n"
        "SELECT x FROM base JOIN other_table ON 1=1\n"
    )
    rc = cli_main(["patch", "fill-asset-dependencies", str(d)])
    assert rc == 0
    assert "derived: added depends base" in capsys.readouterr().out

    from bruin_spark.model import load_pipeline

    pipe = load_pipeline(str(d))
    assert [u.value for u in pipe.asset("derived").depends] == ["base"]
    # non-asset table references are NOT added
    assert "other_table" not in {u.value for u in pipe.asset("derived").depends}
    # the rewritten file still carries its SQL body
    assert "SELECT x FROM base" in (assets / "derived.sql").read_text()
    # idempotent
    rc = cli_main(["patch", "fill-asset-dependencies", str(d)])
    assert rc == 0
    assert "already declared" in capsys.readouterr().out


def test_patch_fill_columns_from_db(spark, tmp_path, capsys):
    d = tmp_path / "colpatch"
    assets = d / "assets"
    assets.mkdir(parents=True)
    (d / "pipeline.yml").write_text("name: colpatch\n")
    (assets / "widgets.sql").write_text(
        "/* @bruin\nname: widgets\ntype: spark.sql\ncolumns:\n"
        "  - name: widget_id\n    type: bigint\n@bruin */\n"
        "SELECT 1 AS widget_id, 'a' AS label, 2.5 AS price\n"
    )
    spark.sql("DROP TABLE IF EXISTS widgets")
    spark.sql("CREATE TABLE widgets USING parquet AS SELECT 1L AS widget_id, 'a' AS label, CAST(2.5 AS double) AS price")
    rc = cli_main(["patch", "fill-columns-from-db", str(d)])
    assert rc == 0
    assert "widgets: added columns label, price" in capsys.readouterr().out

    from bruin_spark.model import load_pipeline

    pipe = load_pipeline(str(d))
    cols = {c.name: c.type for c in pipe.asset("widgets").columns}
    assert cols == {"widget_id": "bigint", "label": "string", "price": "double"}


def test_docs_generation(pipeline_dir, tmp_path, capsys):
    out = tmp_path / "docs.md"
    rc = cli_main(["docs", str(pipeline_dir), "--output", str(out)])
    assert rc == 0
    doc = out.read_text()
    assert "# Pipeline: shop_pipeline" in doc
    assert "### shop_inventory" in doc
    assert "strategy: `merge`" in doc
    assert "| product_id | bigint | ✓ " in doc
    assert "depends: `shop_inventory`" in doc


def _run_args(pipeline_dir, **kw):
    from types import SimpleNamespace

    base = dict(
        pipeline=str(pipeline_dir), asset=None, select=None, downstream=False,
        only=None, tag=[], exclude_tag=[], full_refresh=False,
        apply_interval_modifiers=False, workers=1, start=None, end=None,
        run_id=None, state=str(pipeline_dir / ".s.json"), tables_dir=None,
        variant=None, environment=None, push_metadata=False, sensor_mode=None,
        continue_run=False, stream=None, var=None,
    )
    base.update(kw)
    return SimpleNamespace(**base)


def test_init_curation_template_runs(spark, tmp_path):
    """init --template curation scaffolds a pipeline that runs the
    curation funnel end-to-end: seed docs -> decision table."""
    from types import SimpleNamespace

    from bruin_spark.cli import cmd_init, cmd_run

    d = tmp_path / "curpipe"
    assert cmd_init(SimpleNamespace(dir=str(d), name=None, template="curation")) == 0
    spark.sql("DROP TABLE IF EXISTS raw_documents")
    spark.sql("DROP TABLE IF EXISTS curated_docs")
    assert cmd_run(_run_args(d)) == 0
    out = {r["doc_id"]: r for r in spark.table("curated_docs").collect()}
    assert len(out) == 5
    assert out[2]["drop_reasons"] == "exact_duplicate"  # doc 2 duplicates doc 1
    assert "repetitive" in out[4]["drop_reasons"]
    assert out[5]["keep"]
    spark.sql("DROP TABLE raw_documents")
    spark.sql("DROP TABLE curated_docs")


def test_init_streaming_template_runs(spark, tmp_path):
    from types import SimpleNamespace

    from bruin_spark.cli import cmd_init, cmd_run

    d = tmp_path / "strpipe"
    assert cmd_init(SimpleNamespace(dir=str(d), name=None, template="streaming")) == 0
    spark.sql("DROP TABLE IF EXISTS events_stream")
    assert cmd_run(_run_args(d, stream="events_stream")) == 0
    assert spark.table("events_stream").count() == 3
    spark.sql("DROP TABLE events_stream")


def test_init_unknown_template_rejected(tmp_path, capsys):
    from types import SimpleNamespace

    from bruin_spark.cli import cmd_init

    assert cmd_init(SimpleNamespace(dir=str(tmp_path / "x"), name=None, template="wat")) == 2
    assert "unknown template" in capsys.readouterr().err
