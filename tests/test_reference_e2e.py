"""Execute the reference's own materialization e2e fixtures on Spark.

The reference's integration suite (integration_test.go) drives each
``duckdb-materialization-*`` / ``duckdb-scd2-tests/*`` /
``duckdb-datavault-materialization`` pipeline through a copy-asset →
run → query → compare-CSV workflow against DuckDB. This module replays
the same workflow against OUR engine: same pipeline dirs, same asset
versions from ``resources/``, same verification queries, same golden
CSVs — the strongest end-to-end statement that a reference user's
pipelines produce identical tables here.
"""

from __future__ import annotations

import csv
import re
import os
import shutil

import pytest

from bruin_spark.cli import main as cli_main

CORPUS = "/root/reference/integration-tests/test-pipelines"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CORPUS), reason="reference corpus not present"
)


def _golden_rows(path: str) -> list[list[str]]:
    with open(path, newline="") as f:
        return [row for row in csv.reader(f) if row]


def _query_rows(spark, sql: str) -> list[list[str]]:
    df = spark.sql(sql.rstrip(";"))

    def cell(v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float) and v == int(v):
            return str(int(v))
        return str(v)

    return [list(df.columns)] + [[cell(v) for v in row] for row in df.collect()]


_TS_RE = None


def _norm(rows: list[list[str]]) -> list[list[str]]:
    import re

    global _TS_RE
    if _TS_RE is None:
        _TS_RE = re.compile(
            r"^(\d{4}-\d{2}-\d{2})[T ](\d{2}:\d{2}:\d{2})(\.\d+)?(Z|\+00:?00)?$"
        )
    out = [[c.strip().lower() for c in rows[0]]]
    for r in rows[1:]:
        norm_r = []
        for c in r:
            c = c.strip()
            m = _TS_RE.match(c)
            if m:
                # 2024-01-02T00:00:00Z == 2024-01-02 00:00:00(.000000)
                norm_r.append(f"{m.group(1)} {m.group(2)}")
                continue
            if re.fullmatch(r"\d{4}-\d{2}-\d{2}", c):
                # a DATE and its midnight-timestamp rendering are the
                # same value (DuckDB exports DATE as ...T00:00:00Z)
                norm_r.append(f"{c} 00:00:00")
                continue
            try:
                # 12.50 == 12.5 == 12.500000 (csv goldens vs Spark types)
                norm_r.append(repr(float(c)))
            except ValueError:
                norm_r.append(c)
        out.append(norm_r)
    return out


#: (fixture dir, asset file, [version files], verify query,
#:  [expected csv per phase]) — straight from integration_test.go's
#: per-fixture workflows
MAT_CASES = [
    (
        "duckdb-materialization-merge",
        "inventory.sql",
        ["inventory_v1.sql", "inventory_v2.sql"],
        "SELECT * FROM test.inventory ORDER BY item_id",
        ["initial.csv", "after_merge.csv"],
    ),
    (
        "duckdb-materialization-create-replace",
        "orders.sql",
        ["orders_v1.sql", "orders_v2.sql"],
        "SELECT * FROM test.orders ORDER BY order_id",
        ["initial.csv", "replaced.csv"],
    ),
    (
        "duckdb-materialization-append",
        "logs.sql",
        ["logs_v1.sql", "logs_v2.sql"],
        "SELECT * FROM test.logs ORDER BY log_id",
        ["initial.csv", "after_append.csv"],
    ),
    (
        "duckdb-materialization-delete-insert",
        "products.sql",
        ["products_v1.sql", "products_v2.sql"],
        "SELECT * FROM test.products ORDER BY product_id",
        ["initial.csv", "after_delete_insert.csv"],
    ),
    (
        "duckdb-materialization-truncate-insert",
        "books.sql",
        ["books_v1.sql", "books_v2.sql"],
        "SELECT * FROM test.books ORDER BY book_id",
        ["initial.csv", "after_truncate.csv"],
    ),
]


def _stage(tmp_path, fixture: str, sub: str | None = None):
    src = os.path.join(CORPUS, fixture)
    dst = tmp_path / os.path.basename(fixture)
    shutil.copytree(src, dst)
    return dst


def _run(d, *extra) -> int:
    return cli_main(
        ["run", str(d), "--start", "2024-01-01", "--end", "2024-01-02", *extra]
    )


@pytest.mark.parametrize(
    "fixture,asset,versions,query,goldens",
    MAT_CASES,
    ids=[c[0] for c in MAT_CASES],
)
def test_reference_materialization_fixture(
    spark, tmp_path, fixture, asset, versions, query, goldens
):
    d = _stage(tmp_path, fixture)
    table = query.split("FROM ", 1)[1].split()[0]
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    for phase, (version, golden) in enumerate(zip(versions, goldens)):
        shutil.copy(d / "resources" / version, d / "assets" / asset)
        rc = _run(d, *(["--full-refresh"] if phase == 0 else []))
        assert rc == 0, f"{fixture} phase {phase} run failed"
        got = _norm(_query_rows(spark, query))
        want = _norm(_golden_rows(os.path.join(CORPUS, fixture, "expectations", golden)))
        assert got == want, f"{fixture} phase {phase} ({golden}) mismatch"


@pytest.mark.parametrize(
    "fixture,query,goldens",
    [
        (
            "duckdb-scd2-tests/scd2-by-column-pipeline",
            "SELECT ID, Name, Price, _is_current FROM test.menu ORDER BY ID, _valid_from",
            [
                "scd2_by_col_expected_initial.csv",
                "scd2_by_col_expected_updated_01.csv",
                "scd2_by_col_expected_updated_02.csv",
            ],
        ),
        (
            "duckdb-scd2-tests/scd2-by-time-pipeline",
            "SELECT product_id, product_name, stock, _is_current, _valid_from "
            "FROM test.products ORDER BY product_id, _valid_from",
            [
                "scd2_by_time_expected_initial.csv",
                "scd2_by_time_expected_update_01.csv",
                "scd2_by_time_expected_update_02.csv",
            ],
        ),
    ],
    ids=["scd2-by-column", "scd2-by-time"],
)
def test_reference_scd2_fixture(spark, tmp_path, fixture, query, goldens):
    d = _stage(tmp_path, fixture)
    asset = next(f for f in os.listdir(d / "assets") if f.endswith(".sql"))
    resources = os.path.join(CORPUS, "duckdb-scd2-tests", "resources")
    stem = os.path.splitext(asset)[0]
    versions = [None] + [
        os.path.join(resources, f)
        for f in sorted(os.listdir(resources))
        if f.startswith(stem + "_updated")
    ]
    table = query.split("FROM ", 1)[1].split()[0]
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    assert len(versions) == len(goldens), (versions, goldens)
    for phase, (version, golden) in enumerate(zip(versions, goldens)):
        if version is not None:
            shutil.copy(version, d / "assets" / asset)
        rc = _run(d, *(["--full-refresh"] if phase == 0 else []))
        assert rc == 0, f"{fixture} phase {phase} run failed"
        got = _norm(_query_rows(spark, query))
        want = _norm(
            _golden_rows(os.path.join(CORPUS, fixture, "expectations", golden))
        )
        assert got == want, f"{fixture} phase {phase} ({golden}) mismatch"


def test_reference_datavault_fixture(spark, tmp_path):
    """Two-phase Data Vault load (hub + link + satellite fed by a staged
    orders view), verified against the reference's final_* goldens."""
    fixture = "duckdb-datavault-materialization"
    d = _stage(tmp_path, fixture)
    for t in (
        "rdv.hub_customer",
        "rdv.link_customer_order",
        "rdv.sat_customer_details",
        "stg.customer_orders",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP VIEW IF EXISTS {t}")
    for phase, version in enumerate(["customer_orders_v1.sql", "customer_orders_v2.sql"]):
        shutil.copy(d / "resources" / version, d / "assets" / "customer_orders.sql")
        rc = _run(d, *(["--full-refresh"] if phase == 0 else []))
        assert rc == 0, f"datavault phase {phase} run failed"
    checks = [
        (
            "SELECT customer_hk, customer_bk, date_format(load_dts, "
            "'yyyy-MM-dd HH:mm:ss') AS load_dts, record_source "
            "FROM rdv.hub_customer ORDER BY customer_hk",
            "final_hub.csv",
        ),
        (
            "SELECT customer_order_hk, customer_hk, order_hk "
            "FROM rdv.link_customer_order ORDER BY customer_order_hk",
            "final_link.csv",
        ),
    ]
    for query, golden in checks:
        got = _norm(_query_rows(spark, query))
        want = _norm(
            _golden_rows(os.path.join(CORPUS, fixture, "expectations", golden))
        )
        assert got == want, f"datavault {golden} mismatch"


def test_reference_interval_modifiers_fixture(spark, tmp_path):
    """--apply-interval-modifiers shifts the window by each asset's
    modifiers (-2h/-2h here): with a 09:30-11:30 run window only the
    08:00 and 09:00 rows survive (final_expected.json golden)."""
    import json as _json

    d = _stage(tmp_path, "interval-modifiers-pipeline")
    spark.sql("DROP TABLE IF EXISTS products")
    rc = cli_main(
        [
            "run",
            str(d),
            "--start",
            "2025-04-02T09:30:00",
            "--end",
            "2025-04-02T11:30:00",
            "--apply-interval-modifiers",
        ]
    )
    assert rc == 0
    golden = _json.load(
        open(
            os.path.join(
                CORPUS,
                "interval-modifiers-pipeline",
                "expectations",
                "final_expected.json",
            )
        )
    )
    rows = _query_rows(spark, "SELECT * FROM products ORDER BY product_id")
    want = [[str(c).lower() for c in [col["name"] for col in golden["columns"]]]] + [
        [str(v) for v in r] for r in golden["rows"]
    ]
    assert _norm(rows) == _norm(want)


def test_reference_decimal_fixture(spark, tmp_path):
    """Decimal literals keep scale/precision through a view
    materialization (expected.json golden)."""
    import json as _json

    d = _stage(tmp_path, "duckdb-decimal-pipeline")
    rc = _run(d)
    assert rc == 0
    golden = _json.load(
        open(
            os.path.join(
                CORPUS, "duckdb-decimal-pipeline", "expectations", "expected.json"
            )
        )
    )
    rows = _query_rows(spark, "SELECT * FROM simple_decimal_test")
    def cell(v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    want = [[c["name"] for c in golden["columns"]]] + [
        [cell(v) for v in r] for r in golden["rows"]
    ]
    assert _norm(rows) == _norm(want)


def test_reference_semantic_query_goldens(spark):
    """The reference's semantic-query fixtures (self-contained models
    with inline data under integration-tests/semantic/) through OUR
    loader + compiler, pinned to the reference's four expectation files:
    month-grain + filter + segment, window metric over day grain,
    single-model sort, and a joined-entity dimension."""
    import json as _json

    from bruin_spark.semantic import SemanticEngine
    from bruin_spark.semantic.loader import load_semantic_dir
    from bruin_spark.semantic.model import DimensionRef, Filter, Query, SortSpec

    sem_dir = "/root/reference/integration-tests/semantic"
    models = load_semantic_dir(sem_dir)
    model = models["orders"]
    others = [m for m in models.values() if m.name != "orders"]

    def run(q):
        return SemanticEngine(model, others).generate_sql(q)

    exp_dir = os.path.join(CORPUS, "semantic-query-pipeline", "expectations")

    # 1. cli-flags: month grain + structured filter + segment + sort
    sql = run(
        Query(
            dimensions=[DimensionRef("order_date", granularity="month")],
            metrics=["revenue", "avg_order_value"],
            segments=["completed"],
            filters=[Filter(dimension="country", operator="equals", value="US")],
            sort=[SortSpec("order_date")],
        )
    )
    golden = _json.load(open(os.path.join(exp_dir, "expected-cli-flags.json")))
    got = _norm(_query_rows(spark, sql))
    want = _norm(
        [[c["name"] for c in golden["columns"]]]
        + [[str(v) for v in r] for r in golden["rows"]]
    )
    assert got == want

    # 2. window metric (running_total partitioned by country, day grain)
    sql = run(
        Query(
            dimensions=[DimensionRef("country"), DimensionRef("order_date", granularity="day")],
            metrics=["revenue", "running_revenue"],
            segments=["completed"],
            sort=[SortSpec("country"), SortSpec("order_date")],
        )
    )
    golden = _json.load(open(os.path.join(exp_dir, "expected-window.json")))
    got = _norm(_query_rows(spark, sql))
    want = _norm(
        [[c["name"] for c in golden["columns"]]]
        + [[str(v) for v in r] for r in golden["rows"]]
    )
    assert got == want

    # 3. single-model country revenue (CSV golden)
    sql = run(
        Query(
            dimensions=[DimensionRef("country")],
            metrics=["revenue"],
            segments=["completed"],
            sort=[SortSpec("revenue", "desc")],
        )
    )
    got = _norm(_query_rows(spark, sql))
    want = _norm(_golden_rows(os.path.join(exp_dir, "expected-country.csv")))
    assert got == want

    # 4. joined entity-graph dimension (customers.country)
    sql = run(
        Query(
            dimensions=[DimensionRef("customers.country")],
            metrics=["revenue"],
            segments=["completed"],
            sort=[SortSpec("revenue", "desc")],
        )
    )
    got = _norm(_query_rows(spark, sql))
    want = _norm(
        _golden_rows(os.path.join(exp_dir, "expected-customer-country.csv"))
    )
    assert got == want


def test_reference_custom_check_count_fixtures(spark, tmp_path, capsys):
    """custom check count mode: passing fixture exits 0; failing fixture
    exits 1 and reports actual-vs-expected (ref integration suite
    custom-check-count-{true,false})."""
    d = _stage(tmp_path, "custom-check-count-true")
    spark.sql("DROP TABLE IF EXISTS products")
    assert _run(d) == 0
    capsys.readouterr()
    d = _stage(tmp_path, "custom-check-count-false")
    spark.sql("DROP TABLE IF EXISTS products")
    rc = _run(d)
    out = capsys.readouterr()
    assert rc == 1
    joined = out.out + out.err
    assert "row_count" in joined and "7" in joined and "4" in joined


def test_reference_malformed_sql_fixture(spark, tmp_path, capsys):
    """A syntax error in one asset fails the run (exit 1) with the engine
    parser's diagnostic, not a traceback (run-malformed-pipeline)."""
    d = _stage(tmp_path, "run-malformed-pipeline")
    rc = _run(d)
    out = capsys.readouterr()
    assert rc == 1
    assert "S_ELECT_" in (out.out + out.err)


def test_reference_empty_py_asset_fixture(spark, tmp_path):
    """An empty python asset runs as a no-op success (empty-py-asset)."""
    d = _stage(tmp_path, "empty-py-asset")
    assert _run(d) == 0


def test_reference_render_template_this_fixture(tmp_path, capsys):
    """{{ this }} + {{ full_refresh }} branch rendering
    (render-template-this-pipeline expectations)."""
    d = _stage(tmp_path, "render-template-this-pipeline")
    rc = cli_main(
        [
            "render",
            str(d),
            "render_this.test_full_refresh",
            "--start",
            "2024-01-15",
            "--end",
            "2024-01-31",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "'render_this.test_full_refresh' AS asset_name" in out
    assert "'INCREMENTAL_MODE' AS refresh_mode" in out
    assert "'2024-01-15' AS start_date" in out
    rc = cli_main(
        [
            "render",
            str(d),
            "render_this.test_full_refresh",
            "--full-refresh",
            "--start",
            "2024-01-15",
            "--end",
            "2024-01-31",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "'FULL_REFRESH_MODE' AS refresh_mode" in out
    assert "'2020-01-01' AS start_date" in out


def test_reference_policy_fixtures():
    """The reference's OWN policy.yml (repo-root placement, expr-lang
    criteria with Go-cased fields, indexOf, var.attr access, pipeline
    selectors) evaluates through our policy engine with the exact
    outcomes its integration suite asserts: compliant fixtures clean,
    non-compliant yields its three named failures, and the variables
    rule flips under a --var override."""
    from bruin_spark.lint.policy import PolicySpecification
    from bruin_spark.model import load_pipeline

    def errors(fx, var_override=None):
        pd = os.path.join(CORPUS, fx)
        spec = PolicySpecification.load(pd)
        assert spec is not None, f"policy.yml not found above {fx}"
        pipe = load_pipeline(pd)
        if var_override:
            pipe.variables = {**pipe.variables, **var_override}
        return [i for i in spec.lint(pipe) if i.severity == "error"]

    for fx in ("policies-builtin", "policies-custom", "policies-selector",
               "policies-variables"):
        assert errors(fx) == [], fx
    bad = errors("policies-non-compliant")
    assert {(i.rule.rsplit(":", 1)[1], i.asset) for i in bad} == {
        ("asset-has-three-columns", "non_compliant.primary"),
        ("asset-name-contains-public", "non_compliant.secondary"),
        ("asset-has-owner", "non_compliant.tertiary"),
    }
    flipped = errors("policies-variables", {"message": "This should fail"})
    assert len(flipped) == 1 and "message" in flipped[0].message


def test_reference_python_mat_fixture(spark, tmp_path):
    """Python assets with a materialize() returning a pandas DataFrame
    (and an empty generator) write their tables (python-mat fixture)."""
    d = _stage(tmp_path, "python-mat")
    # polars is not installed in this container (the reference installs
    # the fixture's requirements.txt via uv); the polars path itself is
    # covered duck-typed in _chunk_frame
    os.remove(d / "assets" / "polars_df.py")
    rc = _run(d, "--workers", "1")
    assert rc == 0
    assert spark.table("materialize.country").count() == 50
    cols = set(spark.table("materialize.country").columns)
    assert {"country_name", "population", "gdp", "country", "area"} <= cols
    # generator protocols (ref expectations: 5 dict yields, 3x2 batches,
    # schema reconciliation across mixed dict/pyarrow chunks)
    assert spark.table("mat.yield_dicts").count() == 5
    assert spark.table("mat.yield_batches").count() == 6
    assert spark.table("mat.nullable_dicts").count() == 3
    assert spark.table("mat.table_after_dict").count() == 2
    assert spark.table("mat.table_before_dict").count() == 2
    assert spark.table("mat.pyarrow_tables").count() == 4
    # None / empty returns skip materialization but succeed
    assert not spark.catalog.tableExists("mat.none_return")
    assert not spark.catalog.tableExists("mat.empty_generator")
    assert not spark.catalog.tableExists("mat.empty_list")


def test_reference_symbolic_dependency_fixture(spark, tmp_path, capsys):
    """Symbolic upstreams are lineage-only: `example` must RUN (and
    finish) even though its symbolic upstream `my-other-asset` fails —
    while the failure still fails the run overall
    (run-non-wait-symbolic; ref scheduler.go:810-817)."""
    d = _stage(tmp_path, "run-non-wait-symbolic")
    rc = _run(d)
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL my-other-asset" in out
    assert "FAIL example" not in out and "SKIP example" not in out.upper()


def test_reference_continue_fixture(spark, tmp_path, capsys):
    """The reference's continue-pipeline flow: broken asset fails the
    first run; after fixing the file, --continue re-runs only the
    failures and succeeds."""
    d = _stage(tmp_path, "continue-pipeline")
    for t in ("products", "product_categories", "product_price_summary", "shipping_providers"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.copy(
        d / "resources" / "shipping_providers_broken.sql",
        d / "assets" / "shipping_providers.sql",
    )
    rc = _run(d)
    assert rc == 1
    capsys.readouterr()
    shutil.copy(
        d / "resources" / "shipping_providers_corrected.sql",
        d / "assets" / "shipping_providers.sql",
    )
    # tracer row: if --continue wrongly re-materialized the healthy
    # asset (create+replace), this row would vanish
    n_before = spark.table("products").count()
    spark.sql(
        "INSERT INTO products SELECT * FROM products LIMIT 1"
    )
    rc = _run(d, "--continue")
    assert rc == 0
    assert spark.table("products").count() == n_before + 1
    assert spark.table("shipping_providers").count() > 0


def test_reference_asset_timeout_fixture(spark, tmp_path, capsys):
    """Per-asset `timeout:` (explicit or via the pipeline `default:`
    block) fails a stuck attempt with the reference's message
    (asset-timeout fixture; assets sleep 15s against 2s/1s budgets).
    The fixture's sleeps are trimmed so the test stays fast."""
    d = _stage(tmp_path, "asset-timeout")
    for fn in ("explicit.py", "from_default.py"):
        p = d / "assets" / fn
        p.write_text(p.read_text().replace("time.sleep(15)", "time.sleep(10)"))
    import time as _time

    t0 = _time.monotonic()
    rc = _run(d)
    elapsed = _time.monotonic() - t0
    out = capsys.readouterr().out
    assert rc == 1
    assert 'asset "asset_timeout.explicit" timed out after 2s' in out
    assert 'asset "asset_timeout.from_default" timed out after 1s' in out
    assert elapsed < 9, f"timeouts did not cut the 10s sleeps ({elapsed:.1f}s)"


def test_reference_enabled_template_fixture(spark, tmp_path, capsys):
    """Templated `enabled:` (enabled-template-pipeline): under the
    'disabled' variant the upstream is SKIPPED (its broken SELECT never
    runs) while the downstream still materializes; the parse IR resolves
    the templated bool per variant."""
    import json as _json

    d = _stage(tmp_path, "enabled-template-pipeline")
    spark.sql("DROP TABLE IF EXISTS templated_downstream")
    rc = _run(d, "--variant", "disabled")
    out = capsys.readouterr().out
    assert rc == 0
    assert "skip templated_upstream" in out
    assert spark.table("templated_downstream").count() == 1

    for variant, want in (("disabled", False), ("enabled", True)):
        rc = cli_main(["parse", str(d), "--variant", variant])
        doc = _json.loads(capsys.readouterr().out)
        assert rc == 0
        up = [a for a in doc["assets"] if a["name"] == "templated_upstream"][0]
        assert up["enabled"] is want, variant


def test_reference_sensor_timeout_fixture(spark, tmp_path, capsys):
    """A query sensor that never turns true times out after its declared
    duration and fails the run (duckdb-sensor-timeout: SELECT FALSE,
    poke 1s, timeout 3s)."""
    import time as _time

    d = _stage(tmp_path, "duckdb-sensor-timeout")
    t0 = _time.monotonic()
    rc = _run(d, "--sensor-mode", "wait")
    elapsed = _time.monotonic() - t0
    out = capsys.readouterr().out
    assert rc == 1
    assert "timed out after 3" in out.lower()
    assert elapsed < 30


def test_reference_seed_fixture(spark, tmp_path):
    """CSV seed with declared schema + checks (run-seed-data): loads
    with the declared varchar types and passes its not_null /
    accepted_values checks."""
    d = _stage(tmp_path, "run-seed-data")
    spark.sql("DROP TABLE IF EXISTS seed.raw")
    rc = _run(d)
    assert rc == 0
    rows = _query_rows(spark, "SELECT * FROM seed.raw ORDER BY name")
    assert rows[0] == ["name", "networking_through", "position", "contact_date"]
    assert [r[0] for r in rows[1:]] == ["B", "Y"]


def test_reference_query_asset_and_export_fixtures(spark, tmp_path, capsys):
    """`query --asset` renders + runs an asset's SQL and returns the
    golden rows (asset-query-pipeline/expected.json); --export writes
    the CSV golden (query-export-pipeline/expected.csv)."""
    import json as _json

    d = _stage(tmp_path, "asset-query-pipeline")
    rc = cli_main(
        ["query", "--pipeline", str(d), "--asset", "products", "--json"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    golden = _json.load(
        open(os.path.join(CORPUS, "asset-query-pipeline", "expected.json"))
    )
    got = _json.loads(out)
    got_rows = [[str(v) for v in r.values()] for r in got] if isinstance(got, list) else None
    want_rows = [[str(v) for v in r] for r in golden["rows"]]
    assert _norm([["c"] * 4] + got_rows)[1:] == _norm([["c"] * 4] + want_rows)[1:]

    d = _stage(tmp_path, "query-export-pipeline")
    export = tmp_path / "out.csv"
    rc = cli_main(
        [
            "query",
            "--pipeline",
            str(d),
            "--asset",
            "products",
            "--export",
            str(export),
        ]
    )
    capsys.readouterr()
    assert rc == 0
    got = _norm(
        [ln.split(",") for ln in export.read_text().strip().splitlines()]
    )
    want = _norm(
        _golden_rows(os.path.join(CORPUS, "query-export-pipeline", "expected.csv"))
    )
    # column order and values match; row order follows product_id
    assert sorted(map(tuple, got[1:])) == sorted(map(tuple, want[1:]))
    assert got[0] == want[0]


def test_reference_run_filters_and_downstream_fixtures(spark, tmp_path, capsys):
    """--tag/--exclude-tag selection and --asset --downstream expansion,
    with the reference's own fixtures and expectations."""
    d = _stage(tmp_path, "run-with-filters-pipeline")
    for t in ("products", "product_categories", "product_price_summary", "shipping_providers"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    rc = _run(d, "--tag", "include", "--exclude-tag", "exclude")
    out = capsys.readouterr().out
    assert rc == 0
    # tagged include minus exclude: products + shipping run; the
    # include+exclude-tagged summary and the untagged categories don't
    assert "ok   products" in out and "ok   shipping_providers" in out
    assert "product_price_summary" not in out.replace("skip product_price_summary", "")
    assert "ok   product_categories" not in out

    d = _stage(tmp_path, "run-with-downstream-pipeline")
    for t in ("products", "product_categories", "product_price_summary", "shipping_providers"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    rc = _run(d, "--asset", "products", "--downstream")
    out = capsys.readouterr().out
    assert rc == 0
    assert "ok   products" in out
    assert "ok   product_price_summary" in out
    assert "ok   products:check:price:positive" in out
    assert "ok   shipping_providers" not in out


def test_reference_date_validation_fixture(tmp_path, capsys):
    """An inverted interval is rejected before any work happens
    (date-validation-test; ref ValidateRunConfig)."""
    d = _stage(tmp_path, "date-validation-test")
    rc = cli_main(["run", str(d), "--start", "2024-01-31", "--end", "2024-01-15"])
    err = capsys.readouterr().err
    assert rc == 1
    assert "Start date cannot be after end date" in err


def test_reference_validate_time_interval_fixture(tmp_path, capsys):
    """`validate` flags interval modifiers that invert the window —
    including Jinja-templated ones — and passes the valid ones
    (validate-asset-time-interval: expects exactly 2 issues, for
    invalid_jinja.example and invalid_modifiers.example)."""
    d = _stage(tmp_path, "validate-asset-time-interval")
    rc = cli_main(["validate", str(d)])
    out = capsys.readouterr().out
    assert rc == 1
    bad = [ln for ln in out.splitlines() if "valid-time-interval" in ln]
    assert len(bad) == 2, out
    assert any("(invalid_jinja.example)" in ln for ln in bad)
    assert any("(invalid_modifiers.example)" in ln for ln in bad)
    assert not any("(valid_jinja.example)" in ln for ln in bad)
    assert not any("(valid_modifiers.example)" in ln for ln in bad)


def test_reference_nested_params_fixtures(tmp_path, capsys):
    """Nested asset parameters Jinja-render recursively with the asset
    context, and a parameters self-reference is an error
    (nested-params-rendering valid / nested-params-no-jinja-access
    invalid, with the reference's exact diagnostics)."""
    d = _stage(tmp_path, "nested-params-rendering")
    rc = cli_main(["validate", str(d)])
    capsys.readouterr()
    assert rc == 0

    d = _stage(tmp_path, "nested-params-no-jinja-access")
    rc = cli_main(["validate", str(d)])
    out = capsys.readouterr().out
    assert rc == 1
    assert "error rendering parameter 'nested'" in out
    assert "missing variable 'parameters'" in out


def test_reference_time_materialization_fixture(spark, tmp_path):
    """time_interval strategy, the reference's two-phase fixture: full
    load, then an update run whose delete window replaces only the rows
    inside the interval (initial/final JSON goldens)."""
    import json as _json

    d1 = _stage(tmp_path, "time-materialization-pipeline")
    spark.sql("DROP TABLE IF EXISTS products")
    rc = cli_main(["run", str(d1), "--full-refresh"])
    assert rc == 0
    exp = os.path.join(CORPUS, "time-materialization-pipeline", "expectations")
    golden = _json.load(open(os.path.join(exp, "initial_expected.json")))
    got = _norm(_query_rows(spark, "SELECT * FROM products ORDER BY product_id"))
    want = _norm(
        [[c["name"] for c in golden["columns"]]]
        + [[str(v) for v in r] for r in golden["rows"]]
    )
    assert got == want, "initial load mismatch"

    d2 = _stage(tmp_path, "time-materialization-update-pipeline")
    rc = cli_main(
        ["run", str(d2), "--start", "2025-03-01", "--end", "2025-03-31"]
    )
    assert rc == 0
    golden = _json.load(open(os.path.join(exp, "final_expected.json")))
    got = _norm(_query_rows(spark, "SELECT * FROM products ORDER BY product_id"))
    want = _norm(
        [[c["name"] for c in golden["columns"]]]
        + [[str(v) for v in r] for r in golden["rows"]]
    )
    assert got == want, "post-update state mismatch"


def test_reference_missing_upstream_json_golden(tmp_path, capsys):
    """`validate -o json` emits the reference's issues document shape,
    with the same dependency diagnostic (missing-upstream-pipeline
    golden)."""
    import json as _json

    d = _stage(tmp_path, "missing-upstream-pipeline")
    rc = cli_main(["validate", str(d), "-o", "json"])
    out = capsys.readouterr().out
    assert rc == 1
    doc = _json.loads(out)
    golden = _json.load(
        open(
            os.path.join(
                CORPUS,
                "missing-upstream-pipeline",
                "expectations",
                "missing_upstream.json",
            )
        )
    )
    want = golden[0]["issues"]["nonexistent"][0]
    got = doc[0]["issues"]["nonexistent"][0]
    assert got == want


def test_reference_hooks_fixture(spark, tmp_path):
    """Pre/post hooks run around the main write in declared order
    (hook_log.csv golden)."""
    d = _stage(tmp_path, "duckdb-hooks-pipeline")
    spark.sql("DROP TABLE IF EXISTS hooks_test.hook_log")
    rc = _run(d)
    assert rc == 0
    got = _norm(_query_rows(spark, "SELECT step FROM hooks_test.hook_log ORDER BY step"))
    want = _norm(
        _golden_rows(
            os.path.join(CORPUS, "duckdb-hooks-pipeline", "expectations", "hook_log.csv")
        )
    )
    assert got == want
