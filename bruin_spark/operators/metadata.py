"""Metadata push: asset/column documentation into the Spark catalog.

The reference uploads docs to the warehouse catalog as a separate
metadata-push task instance (ref: pkg/bigquery/operator.go:217-221,
scheduler.go:92-97). On Spark: table COMMENT + TBLPROPERTIES + per-column
COMMENTs via ALTER TABLE.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from bruin_spark.mat.strategies import quote_ident
from bruin_spark.model.pipeline import Asset


def _q(s: str) -> str:
    return s.replace("'", "''")


def push_metadata(spark: SparkSession, asset: Asset) -> int:
    """Apply descriptions/owner/tags to the materialized table.

    Returns the number of ALTER statements issued. No-op (0) when the
    table doesn't exist (e.g. view-only or NONE materialization).
    """
    if not spark.catalog.tableExists(asset.name):
        return 0
    t = quote_ident(asset.name)
    stmts: list[str] = []
    if asset.description:
        stmts.append(f"COMMENT ON TABLE {t} IS '{_q(asset.description)}'")
    # namespaced keys: bare "owner" is reserved by Spark's catalog
    props = {}
    if asset.owner:
        props["bruin.owner"] = asset.owner
    if asset.tags:
        props["bruin.tags"] = ",".join(asset.tags)
    if asset.tier:
        props["bruin.tier"] = asset.tier
    if props:
        kv = ", ".join(f"'{_q(k)}' = '{_q(v)}'" for k, v in props.items())
        stmts.append(f"ALTER TABLE {t} SET TBLPROPERTIES ({kv})")
    existing = {f.name for f in spark.table(t).schema.fields}
    for col in asset.columns:
        if col.description and col.name in existing:
            stmts.append(
                f"ALTER TABLE {t} ALTER COLUMN {quote_ident(col.name)} "
                f"COMMENT '{_q(col.description)}'"
            )
    for stmt in stmts:
        spark.sql(stmt)
    return len(stmts)
