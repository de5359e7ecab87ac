"""Scaffold Bruin assets from an existing warehouse catalog.

Reference parity: ``bruin import database`` (cmd/import.go:59-140,
createAsset :720-800) walks a connection's schemas/tables and writes
``<pipeline>/assets/<schema>/<table>.asset.yml`` source placeholders —
asset name ``<schema>.<table>`` (lowercased), column metadata filled
from the warehouse unless ``--no-columns``, views with a recoverable
definition emitted as ``.sql`` assets with ``materialization: view``.

Here the "connection" is the SparkSession's catalog: databases come
from ``spark.catalog.listDatabases()``, tables/views from
``listTables``, columns from ``listColumns``, and view definitions from
``SHOW CREATE TABLE``.  Catalog listings are driver-side metadata calls
(no data scan), so importing a warehouse with thousands of tables costs
metastore RPCs only.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

from bruin_spark.model.formatter import _canonical_meta, _dump_yaml

#: placeholder type for imported tables — a NoOp DAG node carrying
#: lineage/metadata, like the reference's platform source types
#: (cmd/import.go assetType; pkg/pipeline/pipeline.go source types)
SOURCE_TYPE = "spark.source"

_AS_SELECT_RE = re.compile(r"\bAS\b\s+(SELECT\b.*)", re.IGNORECASE | re.DOTALL)


def _view_definition(spark: SparkSession, qualified: str) -> str:
    """Best-effort view SELECT body via SHOW CREATE TABLE ('' if not
    recoverable — permanent views only; some catalogs refuse)."""
    try:
        ddl = spark.sql(f"SHOW CREATE TABLE {qualified}").collect()[0][0]
    except Exception:
        return ""
    m = _AS_SELECT_RE.search(ddl)
    return m.group(1).strip() if m else ""


def import_database(
    spark: SparkSession,
    pipeline_path: str,
    schema: str | None = None,
    fill_columns: bool = True,
    overwrite: bool = False,
) -> tuple[list[str], list[str]]:
    """Write asset scaffolds for every (non-temp) table the catalog
    knows.  Returns (created_paths, skipped_paths) — existing files are
    skipped unless ``overwrite`` (the reference merges columns into
    existing assets; skipping is the conservative analog)."""
    if not os.path.exists(os.path.join(pipeline_path, "pipeline.yml")):
        raise ValueError(f"not a pipeline directory (no pipeline.yml): {pipeline_path}")
    assets_path = os.path.join(pipeline_path, "assets")
    schemas = [schema] if schema else [d.name for d in spark.catalog.listDatabases()]
    created, skipped = [], []
    for db in schemas:
        for t in spark.catalog.listTables(db):
            if t.isTemporary:
                continue
            schema_folder = os.path.join(assets_path, db.lower())
            qualified = f"{db}.{t.name}"
            asset_name = qualified.lower()
            view_sql = (
                _view_definition(spark, qualified) if t.tableType == "VIEW" else ""
            )
            meta: dict = {"name": asset_name, "type": SOURCE_TYPE}
            if t.description:
                meta["description"] = t.description
            if fill_columns:
                cols = []
                for c in spark.catalog.listColumns(qualified):
                    col: dict = {"name": c.name, "type": c.dataType}
                    if c.description:
                        col["description"] = c.description
                    cols.append(col)
                if cols:
                    meta["columns"] = cols
            if view_sql:
                # views become runnable SQL assets (ref import.go:723-744)
                meta["type"] = "spark.sql"
                meta["materialization"] = {"type": "view"}
                path = os.path.join(schema_folder, f"{t.name.lower()}.sql")
                block = _dump_yaml(_canonical_meta(meta))
                content = f"/* @bruin\n{block}@bruin */\n\n{view_sql}\n"
            else:
                path = os.path.join(schema_folder, f"{t.name.lower()}.asset.yml")
                content = _dump_yaml(_canonical_meta(meta))
            if os.path.exists(path) and not overwrite:
                skipped.append(path)
                continue
            os.makedirs(schema_folder, exist_ok=True)
            with open(path, "w", encoding="utf-8") as f:
                f.write(content)
            created.append(path)
    return created, skipped


def import_tables_dir(
    spark: SparkSession,
    pipeline_path: str,
    tables_dir: str,
    schema_name: str = "raw",
    overwrite: bool = False,
) -> tuple[list[str], list[str]]:
    """Spark-native variant: scaffold source assets from a directory of
    parquet tables (the lakehouse-without-a-metastore case).  Column
    types come from the parquet footers — ``spark.read.parquet`` schema
    inference reads metadata only, no data scan."""
    if not os.path.exists(os.path.join(pipeline_path, "pipeline.yml")):
        raise ValueError(f"not a pipeline directory (no pipeline.yml): {pipeline_path}")
    schema_folder = os.path.join(pipeline_path, "assets", schema_name)
    created, skipped = [], []
    for fn in sorted(os.listdir(tables_dir)):
        if not fn.endswith(".parquet"):
            continue
        tname = fn[: -len(".parquet")].lower()
        sch = spark.read.parquet(os.path.join(tables_dir, fn)).schema
        meta = {
            "name": f"{schema_name}.{tname}",
            "type": SOURCE_TYPE,
            "columns": [
                {"name": f.name, "type": f.dataType.simpleString()} for f in sch.fields
            ],
        }
        path = os.path.join(schema_folder, f"{tname}.asset.yml")
        if os.path.exists(path) and not overwrite:
            skipped.append(path)
            continue
        os.makedirs(schema_folder, exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            f.write(_dump_yaml(_canonical_meta(meta)))
        created.append(path)
    return created, skipped
