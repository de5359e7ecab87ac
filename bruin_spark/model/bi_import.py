"""BI-catalog importers: Tableau and QuickSight dashboards/datasets
imported as Bruin asset scaffolds.

Reference parity: ``bruin import tableau`` (cmd/import_tableau.go:18-973)
and ``bruin import quicksight`` (cmd/import_quicksight.go:45-680).  The
reference fetches over the vendors' HTTP APIs and offers an interactive
TUI picker; this environment has no network, so the fetch layer is
FIXTURE-REPLAY — a local export directory of the same JSON shapes the
APIs return (``--fixture-dir`` / ``$BRUIN_BI_FIXTURE_DIR``), exactly
like the SaaS ingestion tail — and ``--all`` replaces the picker.  The
naming, sanitization, folder-layout and dependency-wiring semantics ARE
the reference's, pinned by harvesting its own test tables
(import_tableau_test.go, import_quicksight_test.go) in
tests/test_bi_import.py.

Emitted artifacts (same tree as the reference):

- tableau:    assets/tableau/data_sources/datasource_*.asset.yml,
              assets/tableau/workbooks/workbook_*.asset.yml,
              assets/tableau/<sanitized project path>/<dashboard>.asset.yml
              (dashboards depend on their workbook + data sources via the
              full dotted path)
- quicksight: assets/quicksight/datasets/dataset_*.asset.yml (typed
              columns, custom_sql, physical-table upstreams),
              assets/quicksight/dashboards/dashboard_*.asset.yml
              (charts[i].* parameters, dimension/metric columns,
              dataset upstreams)

All emitted types are BI placeholder types (lint _BI_PLACEHOLDER_TYPES):
no-op mains in the scheduler, checks still run.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from bruin_spark.model.formatter import _canonical_meta, _dump_yaml

# -- shared name sanitizers (reference semantics, test-table pinned) ---------


def sanitize_folder_name(name: str) -> str:
    """Project-folder names (ref import_tableau.go:524-589): '&'→'_and_',
    '+'→'_plus_', '@'→'_at_', other punctuation→'_', consecutive
    underscores collapsed, trimmed; no alphanumerics at all → 'unnamed'."""
    if not any(c.isascii() and c.isalnum() for c in name):
        return "unnamed"
    s = name.lower()
    for ch in " -.,()[]{}":
        s = s.replace(ch, "_")
    s = s.replace("&", "_and_").replace("+", "_plus_").replace("@", "_at_")
    for ch in "#$%^*!~`'\";:?<>|/\\":
        s = s.replace(ch, "_")
    while "__" in s:
        s = s.replace("__", "_")
    s = s.strip("_")
    return s or "unnamed"


def _strict_name(s: str, also_slashes: bool = True) -> str:
    """Lowercase; spaces/dashes (and slashes unless disabled) to '_';
    keep only [a-z0-9_].  Consecutive underscores are NOT collapsed —
    the reference's dashboard names keep them ('sales__marketing_2024')."""
    s = s.lower().replace(" ", "_").replace("-", "_")
    if also_slashes:
        s = s.replace("/", "_").replace("\\", "_")
    return "".join(c for c in s if c == "_" or ("a" <= c <= "z") or ("0" <= c <= "9"))


def dashboard_asset_name(view_name: str, workbook_name: str = "") -> str:
    """Ref import_tableau.go:589-634 generateAssetNameFromDashboard."""
    base = _strict_name(view_name or "tableau_dashboard") or "tableau_dashboard"
    if workbook_name:
        # the workbook prefix replaces only spaces/dashes (slashes are
        # dropped by the character filter, not underscored)
        prefix = _strict_name(workbook_name, also_slashes=False)
        if prefix:
            return prefix + "_" + base
    return base


def workbook_asset_name(workbook_name: str) -> str:
    """Ref import_tableau.go:636-664 createWorkbookAssetName."""
    if not workbook_name:
        return "tableau_workbook"
    s = _strict_name(workbook_name)
    return ("workbook_" + s) if s else "tableau_workbook"


def datasource_asset_name(datasource_name: str) -> str:
    """Ref import_tableau.go:666-694 createDataSourceAssetName."""
    if not datasource_name:
        return "tableau_datasource"
    s = _strict_name(datasource_name)
    return ("datasource_" + s) if s else "tableau_datasource"


def sanitize_quicksight_name(name: str) -> str:
    """Ref import_quicksight.go:618-643: like _strict_name plus dots
    underscored, consecutive underscores collapsed, trimmed, 'unnamed'
    fallback."""
    s = name.lower()
    for ch in " -./\\":
        s = s.replace(ch, "_")
    s = "".join(c for c in s if c == "_" or ("a" <= c <= "z") or ("0" <= c <= "9"))
    while "__" in s:
        s = s.replace("__", "_")
    s = s.strip("_")
    return s or "unnamed"


def build_table_reference(schema: str, table: str) -> str:
    """Ref import_quicksight.go:645-650."""
    return f"{schema}.{table}" if schema else table


def map_quicksight_column_type(qs_type: str) -> str:
    """Ref import_quicksight.go:652-665."""
    return {
        "STRING": "STRING",
        "INTEGER": "INTEGER",
        "DECIMAL": "FLOAT",
        "DATETIME": "TIMESTAMP",
    }.get(qs_type.upper(), qs_type)


# -- Tableau --------------------------------------------------------------


@dataclass
class TableauDashboard:
    """One Tableau view/dashboard as the enhanced fetch returns it
    (ref import_tableau.go:73-343 fetchTableauDashboardsEnhanced)."""

    view_id: str = ""
    view_name: str = ""
    workbook_id: str = ""
    workbook_name: str = ""
    workbook_url: str = ""
    content_url: str = ""
    project_id: str = ""
    project_path: list[str] = field(default_factory=list)
    owner_name: str = ""
    tags: list[str] = field(default_factory=list)
    #: [{"id": ..., "name": ...}]
    data_sources: list[dict] = field(default_factory=list)


def load_tableau_fixture(fixture_dir: str) -> tuple[list[TableauDashboard], dict]:
    """Fixture-replay fetch: ``<dir>/tableau.json`` holds
    {"host": ..., "site_id": ..., "dashboards": [...]} with dashboard
    dicts in the dataclass's field names."""
    path = os.path.join(fixture_dir, "tableau.json")
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    dashboards = [TableauDashboard(**d) for d in doc.get("dashboards", [])]
    site = {"host": doc.get("host", ""), "site_id": doc.get("site_id", "")}
    return dashboards, site


def _existing_asset_names(pipeline_path: str) -> set[str]:
    from bruin_spark.model import load_pipeline

    return {a.name for a in load_pipeline(pipeline_path).assets}


def _write_asset(path: str, meta: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write(_dump_yaml(_canonical_meta(meta)))


def import_tableau_dashboards(
    pipeline_path: str,
    dashboards: list[TableauDashboard],
    host: str = "",
    site_id: str = "",
    workbook_filter: str = "",
    project_filter: str = "",
) -> tuple[list[str], list[str]]:
    """Write asset scaffolds for the given dashboards plus their unique
    workbooks and data sources (ref import_tableau.go:345-522
    importSelectedTableauDashboardsEnhanced).  Returns (created paths,
    skipped asset names).

    Deviation from the reference, by necessity of this loader: asset
    names are written EXPLICITLY (the reference derives dotted names
    from the file path; this loader uses the file stem), so dashboard
    dependencies — full dotted paths like ``tableau.workbooks.x`` —
    resolve inside the emitted pipeline.
    """
    if workbook_filter:
        dashboards = [
            d for d in dashboards
            if workbook_filter.lower() in (d.workbook_name or "").lower()
        ]
    if project_filter:
        dashboards = [
            d for d in dashboards
            if any(project_filter.lower() in p.lower() for p in d.project_path)
        ]
    existing = _existing_asset_names(pipeline_path)
    created: list[str] = []
    skipped: list[str] = []
    # DISTINCT BI objects whose names sanitize identically must not
    # overwrite each other's files: the first occurrence keeps the
    # canonical name (the test-table-pinned form), later ones get _2,
    # _3, ... — and every dashboard dependency follows the per-ID map.
    taken: set[str] = set()

    def _uniq(name: str) -> str:
        if name not in taken:
            taken.add(name)
            return name
        i = 2
        while f"{name}_{i}" in taken:
            i += 1
        taken.add(f"{name}_{i}")
        return f"{name}_{i}"

    # unique data sources / workbooks (first occurrence wins)
    unique_ds: dict[str, dict] = {}
    unique_wb: dict[str, TableauDashboard] = {}
    for d in dashboards:
        for ds in d.data_sources:
            unique_ds.setdefault(ds["id"], ds)
        if d.workbook_id and d.workbook_name:
            unique_wb.setdefault(d.workbook_id, d)

    ds_asset_names: dict[str, str] = {}
    for ds_id, ds in unique_ds.items():
        name = _uniq(datasource_asset_name(ds.get("name", "")))
        ds_asset_names[ds_id] = name
        full = "tableau.data_sources." + name
        if full in existing:
            skipped.append(full)
            continue
        params = {
            "datasource_id": ds_id,
            "datasource_name": ds.get("name", ""),
            "refresh": "false",
        }
        if host:
            params["url"] = f"https://{host}/#/site/{site_id}/datasources/{ds_id}"
        path = os.path.join(
            pipeline_path, "assets", "tableau", "data_sources", name + ".asset.yml"
        )
        _write_asset(
            path,
            {
                "name": full,
                "type": "tableau.datasource",
                "description": "Tableau data source: " + ds.get("name", ""),
                "parameters": params,
            },
        )
        created.append(path)

    wb_asset_names: dict[str, str] = {}
    for wb_id, d in unique_wb.items():
        name = _uniq(workbook_asset_name(d.workbook_name))
        wb_asset_names[wb_id] = name
        full = "tableau.workbooks." + name
        if full in existing:
            skipped.append(full)
            continue
        params = {
            "workbook_id": wb_id,
            "workbook_name": d.workbook_name,
            "refresh": "false",
        }
        if d.workbook_url:
            params["url"] = d.workbook_url
        elif host and wb_id:
            params["url"] = f"https://{host}/#/site/{site_id}/workbooks/{wb_id}"
        desc = "Tableau workbook: " + d.workbook_name
        if d.project_path:
            desc += f" [Project: {' > '.join(d.project_path)}]"
        meta: dict = {
            "name": full,
            "type": "tableau.workbook",
            "description": desc,
            "parameters": params,
        }
        if d.project_path:
            meta["meta"] = {"project_hierarchy": ",".join(d.project_path)}
            if d.project_id:
                meta["meta"]["project_id"] = d.project_id
        if d.owner_name:
            meta["owner"] = d.owner_name
        if d.tags:
            meta["tags"] = list(d.tags)
        path = os.path.join(
            pipeline_path, "assets", "tableau", "workbooks", name + ".asset.yml"
        )
        _write_asset(path, meta)
        created.append(path)

    for d in dashboards:
        name = dashboard_asset_name(d.view_name, d.workbook_name)
        if name in existing:
            skipped.append(name)
            continue
        name = _uniq(name)
        folder = (
            os.path.join(*[sanitize_folder_name(p) for p in d.project_path])
            if d.project_path
            else "root"
        )
        params = {
            "dashboard_id": d.view_id,
            "dashboard_name": d.view_name,
            "refresh": "false",
        }
        if d.workbook_id:
            params["workbook_id"] = d.workbook_id
        if d.workbook_name:
            params["workbook_name"] = d.workbook_name
        if d.content_url and host:
            content = d.content_url.replace("/sheets/", "/", 1)
            params["url"] = f"https://{host}/#/site/{site_id}/views/{content}"
        desc = "Tableau dashboard: " + d.view_name
        if d.workbook_name:
            desc += f" (Workbook: {d.workbook_name})"
        if d.project_path:
            desc += f" [Project: {' > '.join(d.project_path)}]"
        depends = []
        if d.workbook_id and d.workbook_id in wb_asset_names:
            depends.append("tableau.workbooks." + wb_asset_names[d.workbook_id])
        for ds in d.data_sources:
            if ds["id"] in ds_asset_names:
                depends.append("tableau.data_sources." + ds_asset_names[ds["id"]])
        meta = {
            "name": name,
            "type": "tableau.dashboard",
            "description": desc,
            "parameters": params,
        }
        if depends:
            meta["depends"] = depends
        if d.owner_name:
            meta["owner"] = d.owner_name
        if d.tags:
            meta["tags"] = list(d.tags)
        dash_dir = os.path.join(pipeline_path, "assets", "tableau")
        if folder != "root":
            dash_dir = os.path.join(dash_dir, folder)
        path = os.path.join(dash_dir, name + ".asset.yml")
        _write_asset(path, meta)
        created.append(path)

    return created, skipped


# -- QuickSight -----------------------------------------------------------


@dataclass
class QuickSightDataset:
    """Ref pkg/quicksight DataSetDetail (import_quicksight.go:435-500)."""

    id: str = ""
    arn: str = ""
    name: str = ""
    import_mode: str = ""
    #: [{"name": ..., "type": ...}]
    columns: list[dict] = field(default_factory=list)
    #: [{"schema": ..., "table": ..., "sql": ...}]
    physical_tables: list[dict] = field(default_factory=list)


@dataclass
class QuickSightDashboard:
    """Ref pkg/quicksight DashboardDetail (import_quicksight.go:502-616)."""

    id: str = ""
    name: str = ""
    #: [{"visuals": [{"name", "type", "dataset_id", "dimensions", "metrics"}]}]
    sheets: list[dict] = field(default_factory=list)
    dataset_arns: list[str] = field(default_factory=list)


def load_quicksight_fixture(
    fixture_dir: str,
) -> tuple[list[QuickSightDataset], list[QuickSightDashboard]]:
    """Fixture-replay fetch: ``<dir>/quicksight.json`` holds
    {"datasets": [...], "dashboards": [...]}."""
    path = os.path.join(fixture_dir, "quicksight.json")
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    return (
        [QuickSightDataset(**d) for d in doc.get("datasets", [])],
        [QuickSightDashboard(**d) for d in doc.get("dashboards", [])],
    )


def import_quicksight_assets(
    pipeline_path: str,
    datasets: list[QuickSightDataset],
    dashboards: list[QuickSightDashboard],
    dataset_summaries: list[QuickSightDataset] | None = None,
) -> tuple[list[str], list[str]]:
    """Write dataset + dashboard asset scaffolds (ref
    import_quicksight.go:272-616).  ``datasets`` are the SELECTED ones
    (written as assets); ``dataset_summaries`` covers the full listing —
    a dashboard referencing an unselected dataset depends on it BY NAME
    without an asset being written (the reference's datasetArnMap
    fallback).  Returns (created paths, skipped asset names)."""
    existing = _existing_asset_names(pipeline_path)
    created: list[str] = []
    skipped: list[str] = []

    # distinct datasets/dashboards whose names sanitize identically get
    # _2, _3, ... instead of overwriting each other's files (first one
    # keeps the canonical, test-table-pinned name)
    taken: set[str] = set()

    def _uniq(name: str) -> str:
        if name not in taken:
            taken.add(name)
            return name
        i = 2
        while f"{name}_{i}" in taken:
            i += 1
        taken.add(f"{name}_{i}")
        return f"{name}_{i}"

    # dataset ARN (and id) -> full asset name, for dashboard wiring
    ds_names: dict[str, str] = {}
    summaries: dict[str, QuickSightDataset] = {
        s.arn: s for s in (dataset_summaries or [])
    }
    for ds in datasets:
        full = "quicksight.datasets." + _uniq(
            sanitize_quicksight_name("dataset_" + ds.name)
        )
        ds_names[ds.arn] = full
        if ds.id:
            ds_names[ds.id] = full
        summaries.setdefault(ds.arn, ds)

    for ds in datasets:
        full = ds_names[ds.arn]
        if full in existing:
            skipped.append(full)
            continue
        params: dict = {
            "dataset_id": ds.id,
            "dataset_name": ds.name,
            "import_mode": ds.import_mode,
            "refresh": "false",
        }
        for pt in ds.physical_tables:
            if pt.get("sql"):
                params["custom_sql"] = pt["sql"]
                break
        columns = [
            {"name": c["name"], "type": map_quicksight_column_type(c.get("type", ""))}
            for c in ds.columns
        ]
        depends: list[str] = []
        seen: set[str] = set()
        for pt in ds.physical_tables:
            if pt.get("table"):
                ref = build_table_reference(pt.get("schema", ""), pt["table"])
                if ref not in seen:
                    seen.add(ref)
                    depends.append(ref)
        meta: dict = {
            "name": full,
            "type": "quicksight.dataset",
            "description": "QuickSight dataset: " + ds.name,
            "parameters": params,
        }
        if columns:
            meta["columns"] = columns
        if depends:
            meta["depends"] = depends
        path = os.path.join(
            pipeline_path,
            "assets",
            "quicksight",
            "datasets",
            full.rsplit(".", 1)[1] + ".asset.yml",
        )
        _write_asset(path, meta)
        created.append(path)

    for db in dashboards:
        asset_name = sanitize_quicksight_name("dashboard_" + db.name)
        if "quicksight.dashboards." + asset_name in existing:
            skipped.append("quicksight.dashboards." + asset_name)
            continue
        asset_name = _uniq(asset_name)
        full = "quicksight.dashboards." + asset_name
        params = {"dashboard_id": db.id, "dashboard_name": db.name}
        chart_idx = 0
        columns = []
        col_seen: set[str] = set()
        for sheet in db.sheets:
            for visual in sheet.get("visuals", []):
                prefix = f"charts[{chart_idx}]."
                chart_name = visual.get("name") or f"{visual.get('type', '')}_{chart_idx}"
                params[prefix + "name"] = chart_name
                params[prefix + "type"] = visual.get("type", "")
                vds = visual.get("dataset_id", "")
                if vds and vds in ds_names:
                    params[prefix + "dataset"] = ds_names[vds]
                dims = visual.get("dimensions") or []
                mets = visual.get("metrics") or []
                if dims:
                    params[prefix + "dimensions"] = ",".join(dims)
                if mets:
                    params[prefix + "metrics"] = ",".join(mets)
                for dim in dims:
                    if dim and dim not in col_seen:
                        col_seen.add(dim)
                        columns.append({"name": dim, "type": "STRING"})
                for m in mets:
                    if m and m not in col_seen:
                        col_seen.add(m)
                        columns.append({"name": m, "type": "FLOAT"})
                chart_idx += 1
        if chart_idx:
            params["chart_count"] = str(chart_idx)
        depends = []
        seen = set()
        for arn in db.dataset_arns:
            if arn in ds_names:
                name = ds_names[arn]
            elif arn in summaries:
                # by-name reference for a dataset that was NOT selected
                # for import — composed EXACTLY like a selected dataset's
                # asset name, so importing it later resolves the dep
                name = "quicksight.datasets." + sanitize_quicksight_name(
                    "dataset_" + summaries[arn].name
                )
            else:
                continue
            if name not in seen:
                seen.add(name)
                depends.append(name)
        meta = {
            "name": full,
            "type": "quicksight.dashboard",
            "description": "QuickSight dashboard: " + db.name,
            "parameters": params,
        }
        if columns:
            meta["columns"] = columns
        if depends:
            meta["depends"] = depends
        path = os.path.join(
            pipeline_path, "assets", "quicksight", "dashboards", asset_name + ".asset.yml"
        )
        _write_asset(path, meta)
        created.append(path)

    return created, skipped
