"""BI-catalog importers (Tableau / QuickSight), pinned against the
reference's own test tables (cmd/import_tableau_test.go,
cmd/import_quicksight_test.go) plus end-to-end fixture-replay imports
whose emitted pipelines must LOAD with resolving dependencies."""

import json
import os

import pytest

from bruin_spark.model.bi_import import (
    QuickSightDashboard,
    QuickSightDataset,
    TableauDashboard,
    build_table_reference,
    dashboard_asset_name,
    datasource_asset_name,
    import_quicksight_assets,
    import_tableau_dashboards,
    map_quicksight_column_type,
    sanitize_folder_name,
    sanitize_quicksight_name,
    workbook_asset_name,
)


# -- reference test tables (import_tableau_test.go) -------------------------


@pytest.mark.parametrize(
    "view,workbook,expected",
    [
        ("Sales Dashboard", "", "sales_dashboard"),
        ("Revenue", "Financial Reports", "financial_reports_revenue"),
        (
            "Sales & Marketing (2024)",
            "Company-Reports",
            "company_reports_sales__marketing_2024",
        ),
        ("", "", "tableau_dashboard"),
        ("@#$%", "", "tableau_dashboard"),
    ],
)
def test_generate_asset_name_from_dashboard(view, workbook, expected):
    assert dashboard_asset_name(view, workbook) == expected


@pytest.mark.parametrize(
    "inp,expected",
    [
        ("My Project", "my_project"),
        ("Sales & Marketing (2024)", "sales_and_marketing_2024"),
        ("Project   Name", "project_name"),
        ("Project--Name", "project_name"),
        ("", "unnamed"),
        ("@#$%", "unnamed"),
        ("_project_", "project"),
    ],
)
def test_sanitize_folder_name(inp, expected):
    assert sanitize_folder_name(inp) == expected


@pytest.mark.parametrize(
    "inp,expected",
    [
        ("Sales Data", "datasource_sales_data"),
        ("Sales & Marketing (2024)", "datasource_sales__marketing_2024"),
        ("", "tableau_datasource"),
        ("@#$%", "tableau_datasource"),
    ],
)
def test_create_datasource_asset_name(inp, expected):
    assert datasource_asset_name(inp) == expected


@pytest.mark.parametrize(
    "inp,expected",
    [
        ("Financial Reports", "workbook_financial_reports"),
        ("Q4-2024 Reports", "workbook_q4_2024_reports"),
        ("", "tableau_workbook"),
        ("@#$%", "tableau_workbook"),
    ],
)
def test_create_workbook_asset_name(inp, expected):
    assert workbook_asset_name(inp) == expected


# -- reference test tables (import_quicksight_test.go) ----------------------


@pytest.mark.parametrize(
    "inp,expected",
    [
        ("my_dataset", "my_dataset"),
        ("My Sales Data", "my_sales_data"),
        ("my-sales-data", "my_sales_data"),
        ("data@source#1", "datasource1"),
        ("my___data___set", "my_data_set"),
        ("_my_data_", "my_data"),
        ("", "unnamed"),
        ("@#$%", "unnamed"),
        ("schema.table.name", "schema_table_name"),
        ("path/to/data", "path_to_data"),
    ],
)
def test_sanitize_quicksight_name(inp, expected):
    assert sanitize_quicksight_name(inp) == expected


def test_build_table_reference():
    assert build_table_reference("public", "orders") == "public.orders"
    assert build_table_reference("", "orders") == "orders"


@pytest.mark.parametrize(
    "inp,expected",
    [
        ("STRING", "STRING"),
        ("INTEGER", "INTEGER"),
        ("DECIMAL", "FLOAT"),
        ("DATETIME", "TIMESTAMP"),
        ("GEO", "GEO"),
    ],
)
def test_map_quicksight_column_type(inp, expected):
    assert map_quicksight_column_type(inp) == expected


# -- end-to-end fixture-replay imports ---------------------------------------


def _pipeline_dir(tmp_path):
    d = tmp_path / "pipe"
    (d / "assets").mkdir(parents=True)
    (d / "pipeline.yml").write_text("name: bi_test\n")
    return str(d)


TABLEAU_FIXTURE = {
    "host": "tableau.example.com",
    "site_id": "acme",
    "dashboards": [
        {
            "view_id": "v1",
            "view_name": "Revenue",
            "workbook_id": "wb1",
            "workbook_name": "Financial Reports",
            "content_url": "FinancialReports/sheets/Revenue",
            "project_path": ["Finance", "Q4 (2024)"],
            "project_id": "p1",
            "owner_name": "ana",
            "tags": ["finance"],
            "data_sources": [
                {"id": "ds1", "name": "Sales Data"},
                {"id": "ds2", "name": "Ledger"},
            ],
        },
        {
            "view_id": "v2",
            "view_name": "Churn",
            "workbook_id": "wb2",
            "workbook_name": "Growth",
            "data_sources": [{"id": "ds1", "name": "Sales Data"}],
        },
        {"view_id": "v3", "view_name": "Orphan View", "data_sources": []},
    ],
}


def test_tableau_import_end_to_end(tmp_path):
    pipe = _pipeline_dir(tmp_path)
    dashboards = [TableauDashboard(**d) for d in TABLEAU_FIXTURE["dashboards"]]
    created, skipped = import_tableau_dashboards(
        pipe, dashboards, host="tableau.example.com", site_id="acme"
    )
    assert not skipped
    rel = sorted(os.path.relpath(p, pipe) for p in created)
    # reference folder layout: data_sources/, workbooks/, project folders,
    # root/ -> assets/tableau directly for projectless dashboards
    assert rel == [
        "assets/tableau/data_sources/datasource_ledger.asset.yml",
        "assets/tableau/data_sources/datasource_sales_data.asset.yml",
        "assets/tableau/finance/q4_2024/financial_reports_revenue.asset.yml",
        "assets/tableau/growth_churn.asset.yml",
        "assets/tableau/orphan_view.asset.yml",
        "assets/tableau/workbooks/workbook_financial_reports.asset.yml",
        "assets/tableau/workbooks/workbook_growth.asset.yml",
    ]

    # the emitted pipeline LOADS and dependencies resolve
    from bruin_spark.model import load_pipeline

    loaded = load_pipeline(pipe)
    assert not loaded.load_errors
    by_name = {a.name: a for a in loaded.assets}
    dash = by_name["financial_reports_revenue"]
    assert dash.type == "tableau.dashboard"
    assert sorted(u.value for u in dash.depends) == [
        "tableau.data_sources.datasource_ledger",
        "tableau.data_sources.datasource_sales_data",
        "tableau.workbooks.workbook_financial_reports",
    ]
    for u in dash.depends:
        assert u.value in by_name, f"unresolved dependency {u.value}"
    assert dash.owner == "ana" and dash.tags == ["finance"]
    assert dash.parameters["url"] == (
        "https://tableau.example.com/#/site/acme/views/FinancialReports/Revenue"
    )

    # re-import skips everything already present
    created2, skipped2 = import_tableau_dashboards(
        pipe, dashboards, host="tableau.example.com", site_id="acme"
    )
    assert not created2 and len(skipped2) == 7


def test_tableau_import_filters(tmp_path):
    pipe = _pipeline_dir(tmp_path)
    dashboards = [TableauDashboard(**d) for d in TABLEAU_FIXTURE["dashboards"]]
    created, _ = import_tableau_dashboards(pipe, dashboards, workbook_filter="growth")
    names = sorted(os.path.basename(p) for p in created)
    assert names == ["datasource_sales_data.asset.yml", "growth_churn.asset.yml",
                     "workbook_growth.asset.yml"]


QS_FIXTURE = {
    "datasets": [
        {
            "id": "d1",
            "arn": "arn:ds:d1",
            "name": "My Sales Data",
            "import_mode": "SPICE",
            "columns": [
                {"name": "region", "type": "STRING"},
                {"name": "amount", "type": "DECIMAL"},
                {"name": "sold_at", "type": "DATETIME"},
            ],
            "physical_tables": [
                {"schema": "public", "table": "orders"},
                {"schema": "", "table": "events", "sql": "SELECT * FROM raw.events"},
            ],
        }
    ],
    "dashboards": [
        {
            "id": "db1",
            "name": "Exec Overview",
            "dataset_arns": ["arn:ds:d1", "arn:ds:unselected"],
            "sheets": [
                {
                    "visuals": [
                        {
                            "name": "Rev by Region",
                            "type": "BAR",
                            "dataset_id": "arn:ds:d1",
                            "dimensions": ["region"],
                            "metrics": ["amount"],
                        },
                        {"type": "KPI", "metrics": ["amount"]},
                    ]
                }
            ],
        }
    ],
}


def test_quicksight_import_end_to_end(tmp_path):
    pipe = _pipeline_dir(tmp_path)
    datasets = [QuickSightDataset(**d) for d in QS_FIXTURE["datasets"]]
    dashboards = [QuickSightDashboard(**d) for d in QS_FIXTURE["dashboards"]]
    unselected = QuickSightDataset(arn="arn:ds:unselected", name="Side Data")
    created, skipped = import_quicksight_assets(
        pipe, datasets, dashboards, dataset_summaries=[unselected]
    )
    assert not skipped
    rel = sorted(os.path.relpath(p, pipe) for p in created)
    assert rel == [
        "assets/quicksight/dashboards/dashboard_exec_overview.asset.yml",
        "assets/quicksight/datasets/dataset_my_sales_data.asset.yml",
    ]

    from bruin_spark.model import load_pipeline

    loaded = load_pipeline(pipe)
    assert not loaded.load_errors
    by_name = {a.name: a for a in loaded.assets}

    ds = by_name["quicksight.datasets.dataset_my_sales_data"]
    assert ds.type == "quicksight.dataset"
    assert {c.name: c.type for c in ds.columns} == {
        "region": "STRING", "amount": "FLOAT", "sold_at": "TIMESTAMP",
    }
    assert ds.parameters["custom_sql"] == "SELECT * FROM raw.events"
    assert sorted(u.value for u in ds.depends) == ["events", "public.orders"]

    db = by_name["quicksight.dashboards.dashboard_exec_overview"]
    assert db.parameters["chart_count"] == "2"
    assert db.parameters["charts[0].name"] == "Rev by Region"
    assert db.parameters["charts[0].dataset"] == (
        "quicksight.datasets.dataset_my_sales_data"
    )
    assert db.parameters["charts[1].name"] == "KPI_1"
    # unselected dataset referenced BY NAME (datasetArnMap fallback)
    assert sorted(u.value for u in db.depends) == [
        "quicksight.datasets.dataset_my_sales_data",
        "quicksight.datasets.dataset_side_data",
    ]
    # dashboard columns: dimensions STRING, metrics FLOAT, deduped
    assert {c.name: c.type for c in db.columns} == {
        "region": "STRING", "amount": "FLOAT",
    }


def test_cli_bi_import_fixture_replay(tmp_path, capsys):
    """`bruin import --tableau --fixture-dir D <pipe>` end-to-end
    through the CLI entrypoint (no Spark session involved)."""
    from bruin_spark.cli import main

    pipe = _pipeline_dir(tmp_path)
    fixdir = tmp_path / "export"
    fixdir.mkdir()
    (fixdir / "tableau.json").write_text(json.dumps(TABLEAU_FIXTURE))
    rc = main(
        ["import", pipe, "--tableau", "--fixture-dir", str(fixdir)]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "workbook_financial_reports.asset.yml" in out
    # missing fixture dir is a clear error, not a traceback
    rc2 = main(["import", pipe, "--quicksight"])
    assert rc2 == 2


def test_tableau_name_collisions_uniquified(tmp_path):
    """Two distinct workbooks (different ids) whose names sanitize
    identically must not overwrite each other's assets; dashboard
    dependencies follow the per-id names."""
    pipe = _pipeline_dir(tmp_path)
    dashboards = [
        TableauDashboard(view_id="v1", view_name="A", workbook_id="wb1",
                         workbook_name="Sales", data_sources=[]),
        TableauDashboard(view_id="v2", view_name="A", workbook_id="wb2",
                         workbook_name="Sales!", data_sources=[]),
    ]
    created, skipped = import_tableau_dashboards(pipe, dashboards)
    assert not skipped and len(created) == len(set(created)) == 4
    from bruin_spark.model import load_pipeline

    loaded = load_pipeline(pipe)
    names = {a.name for a in loaded.assets}
    assert "tableau.workbooks.workbook_sales" in names
    assert "tableau.workbooks.workbook_sales_2" in names
    by_name = {a.name: a for a in loaded.assets}
    assert [u.value for u in by_name["sales_a"].depends] == [
        "tableau.workbooks.workbook_sales"
    ]
    assert [u.value for u in by_name["sales_a_2"].depends] == [
        "tableau.workbooks.workbook_sales_2"
    ]


def test_quicksight_unselected_fallback_name_matches_selected_naming(tmp_path):
    """A dashboard's by-name dep on an UNSELECTED dataset must equal the
    name that dataset would get if imported — incl. degenerate names."""
    pipe = _pipeline_dir(tmp_path)
    weird = QuickSightDataset(id="dx", arn="arn:weird", name="##")
    db = QuickSightDashboard(id="db", name="D", dataset_arns=["arn:weird"])
    import_quicksight_assets(pipe, [], [db], dataset_summaries=[weird])
    import_quicksight_assets(pipe, [weird], [])
    from bruin_spark.model import load_pipeline

    loaded = load_pipeline(pipe)
    by_name = {a.name: a for a in loaded.assets}
    dep = by_name["quicksight.dashboards.dashboard_d"].depends[0].value
    assert dep in by_name, f"unresolved fallback dependency {dep}"


def test_cli_bi_import_malformed_pipeline_yaml_is_clean_error(tmp_path, capsys):
    from bruin_spark.cli import main

    pipe = tmp_path / "pipe"
    (pipe / "assets").mkdir(parents=True)
    (pipe / "pipeline.yml").write_text("name: [unclosed\n  bad: ::::\n\tx")
    fixdir = tmp_path / "export"
    fixdir.mkdir()
    (fixdir / "tableau.json").write_text(json.dumps(TABLEAU_FIXTURE))
    rc = main(["import", str(pipe), "--tableau", "--fixture-dir", str(fixdir)])
    assert rc == 2
    assert "BI import failed" in capsys.readouterr().err
