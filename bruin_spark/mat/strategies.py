"""Materialization strategy → Spark SQL script generation.

Behavioral parity with the reference's Spark dialect
(ref: pkg/spark/materialization.go:48-436 layered over
pkg/sail/materialization.go:58-163; dispatch pkg/pipeline/materializer.go:23-55)
— re-expressed from scratch in Python.

These generators emit the *DML path*: real ``MERGE INTO`` / ``DELETE`` /
``TRUNCATE`` statements that need an ACID table provider (Delta /
Iceberg). On plain parquet catalogs the engine instead executes the
equivalent DataFrame programs in :mod:`bruin_spark.mat.executor`; both
paths share this module's validation rules.

SCD2 reserved columns: ``_valid_from``, ``_valid_until``, ``_is_current``;
open rows use TIMESTAMP '9999-12-31 00:00:00'
(ref: pkg/spark/materialization.go:14).
"""

from __future__ import annotations

from bruin_spark.model.pipeline import (
    FULL_REFRESH_KEEP,
    Asset,
    MaterializationType,
    Strategy,
)

SCD2_VALID_UNTIL = "TIMESTAMP '9999-12-31 00:00:00'"


def quote_ident(name: str) -> str:
    """Backtick-quote a (possibly dotted) identifier for Spark SQL."""
    return ".".join("`" + p.replace("`", "``") + "`" for p in name.split("."))


def _strip(query: str) -> str:
    return query.strip().rstrip(";").strip()


class MaterializationError(ValueError):
    pass


def render_materialization(asset: Asset, query: str, full_refresh: bool = False) -> list[str]:
    """Render the SQL statement list for an asset's materialization.

    ``full_refresh`` overrides the strategy to create+replace except for
    DDL and Data Vault strategies (ref: pkg/pipeline/materializer.go:30-43).
    """
    mat = asset.materialization
    if mat.type == MaterializationType.NONE:
        # a raw script may hold SEVERAL statements (USE x; SET ...;
        # SELECT ...) and trailing comments: split on top-level
        # semicolons, strip comments, drop empties — each statement
        # executes separately, session statements in place (reference:
        # pkg/query SplitQueriesPreservingSessionStatements)
        from bruin_spark.parser.sqlutil import split_statements, strip_sql_comments

        stmts = [strip_sql_comments(s).strip() for s in split_statements(query)]
        return [s for s in stmts if s]
    if mat.type == MaterializationType.VIEW:
        return [f"CREATE OR REPLACE VIEW {quote_ident(asset.name)} AS\n{_strip(query)}"]

    strategy = mat.strategy or Strategy.CREATE_REPLACE
    if full_refresh and strategy not in FULL_REFRESH_KEEP:
        return _create_replace(asset, query, original_strategy=strategy)

    builder = {
        Strategy.CREATE_REPLACE: lambda: _create_replace(asset, query),
        Strategy.APPEND: lambda: [f"INSERT INTO {quote_ident(asset.name)}\n{_strip(query)}"],
        Strategy.TRUNCATE_INSERT: lambda: [
            f"TRUNCATE TABLE {quote_ident(asset.name)}",
            f"INSERT INTO {quote_ident(asset.name)}\n{_strip(query)}",
        ],
        Strategy.DELETE_INSERT: lambda: _delete_insert(asset, query),
        Strategy.TIME_INTERVAL: lambda: _time_interval(asset, query),
        Strategy.MERGE: lambda: _merge(asset, query),
        Strategy.DDL: lambda: _ddl(asset),
        Strategy.SCD2_BY_COLUMN: lambda: _scd2_by_column(asset, query),
        Strategy.SCD2_BY_TIME: lambda: _scd2_by_time(asset, query),
        Strategy.DATAVAULT_HUB: lambda: _datavault_hub_link(asset, query, "hash_key"),
        Strategy.DATAVAULT_LINK: lambda: _datavault_hub_link(asset, query, "link_hash_key"),
        Strategy.DATAVAULT_SATELLITE: lambda: _datavault_satellite(asset, query),
    }.get(strategy)
    if builder is None:
        raise MaterializationError(f"unsupported strategy: {strategy}")
    return builder()


# --------------------------------------------------------------------------
# simple strategies


def _create_replace(asset: Asset, query: str, original_strategy: Strategy | None = None) -> list[str]:
    strategy = original_strategy or asset.materialization.strategy
    if strategy == Strategy.SCD2_BY_COLUMN:
        return _scd2_full_refresh(asset, query, by_time=False)
    if strategy == Strategy.SCD2_BY_TIME:
        return _scd2_full_refresh(asset, query, by_time=True)

    return _replace_table(asset, _strip(query))


def _replace_table(asset: Asset, select_query: str) -> list[str]:
    mat = asset.materialization
    name = quote_ident(asset.name)
    create = f"CREATE TABLE {name}"
    if mat.bucket_by and mat.buckets:
        # hash-bucketed layout: co-bucketed tables sort-merge join with
        # no Exchange (plan-gated in tests/test_plans.py). Bucketing is
        # a datasource-table feature, so the provider is explicit; the
        # clause order (USING, PARTITIONED BY, CLUSTERED BY) is Spark's.
        create += "\nUSING parquet"
    if mat.partition_by:
        create += f"\nPARTITIONED BY ({mat.partition_by})"
    if mat.bucket_by and mat.buckets:
        cols = ", ".join(quote_ident(c) for c in mat.bucket_by)
        create += f"\nCLUSTERED BY ({cols}) SORTED BY ({cols}) INTO {mat.buckets} BUCKETS"
    create += f"\nAS\n{select_query}"
    stmts = [f"DROP TABLE IF EXISTS {name}", create]
    if mat.cluster_by:
        stmts.append(f"ALTER TABLE {name} WRITE ORDERED BY {', '.join(mat.cluster_by)}")
    return stmts


def _delete_insert(asset: Asset, query: str) -> list[str]:
    mat = asset.materialization
    if not mat.incremental_key:
        raise MaterializationError("delete+insert strategy requires incremental_key")
    q = _strip(query)
    name = quote_ident(asset.name)
    key = quote_ident(mat.incremental_key)
    return [
        f"DELETE FROM {name}\nWHERE {key} IN (\n    SELECT DISTINCT {key}\n    FROM ({q}) AS new_data\n)",
        f"INSERT INTO {name}\nSELECT * FROM ({q}) AS new_data",
    ]


def _time_interval(asset: Asset, query: str) -> list[str]:
    mat = asset.materialization
    if not mat.incremental_key:
        raise MaterializationError("incremental_key is required for time_interval strategy")
    if mat.time_granularity not in ("date", "timestamp"):
        raise MaterializationError("time_granularity must be either 'date', or 'timestamp'")
    prefix = "DATE" if mat.time_granularity == "date" else "TIMESTAMP"
    # Jinja vars intentionally survive rendering here: the reference
    # re-renders the materialized script against the run interval
    # (ref: pkg/duckdb/operator.go:89-100) — our executor does the same.
    var = "{{start_date}}", "{{end_date}}"
    if prefix == "TIMESTAMP":
        var = "{{start_timestamp}}", "{{end_timestamp}}"
    name = quote_ident(asset.name)
    key = quote_ident(mat.incremental_key)
    return [
        f"DELETE FROM {name}\nWHERE {key} BETWEEN {prefix} '{var[0]}' AND {prefix} '{var[1]}'",
        f"INSERT INTO {name}\n{_strip(query)}",
    ]


def _ddl(asset: Asset) -> list[str]:
    if not asset.columns:
        raise MaterializationError("ddl strategy requires the `columns` field to be set")
    defs = []
    for col in asset.columns:
        d = f"    {quote_ident(col.name)} {col.sql_type()}"
        if col.description:
            d += " COMMENT '{}'".format(col.description.replace("'", "''"))
        defs.append(d)
    mat = asset.materialization
    stmt = f"CREATE TABLE IF NOT EXISTS {quote_ident(asset.name)} (\n" + ",\n".join(defs) + "\n)"
    if mat.partition_by:
        stmt += f"\nPARTITIONED BY ({mat.partition_by})"
    stmts = [stmt]
    if mat.cluster_by:
        stmts.append(
            f"ALTER TABLE {quote_ident(asset.name)} WRITE ORDERED BY {', '.join(mat.cluster_by)}"
        )
    return stmts


# --------------------------------------------------------------------------
# merge


def _merge_update_columns(asset: Asset) -> list:
    return [c for c in asset.columns if c.update_on_merge or c.merge_sql]


def _merge(asset: Asset, query: str) -> list[str]:
    if not asset.columns:
        raise MaterializationError("merge strategy requires the `columns` field to be set")
    pks = asset.primary_keys()
    if not pks:
        raise MaterializationError("merge strategy requires the `primary_key` field on at least one column")

    on = [f"source.{quote_ident(k)} <=> target.{quote_ident(k)}" for k in pks]
    if asset.materialization.incremental_predicate:
        on.append(f"({asset.materialization.incremental_predicate})")

    cols = [quote_ident(c.name) for c in asset.columns]
    src_cols = [f"source.{c}" for c in cols]

    lines = [
        f"MERGE INTO {quote_ident(asset.name)} target",
        f"USING ({_strip(query)}) source",
        "ON " + " AND ".join(on),
    ]
    updates = [
        f"target.{quote_ident(c.name)} = " + (c.merge_sql or f"source.{quote_ident(c.name)}")
        for c in _merge_update_columns(asset)
    ]
    if updates:
        lines.append("WHEN MATCHED THEN UPDATE SET " + ", ".join(updates))
    lines.append(
        f"WHEN NOT MATCHED THEN INSERT ({', '.join(cols)}) VALUES ({', '.join(src_cols)})"
    )
    return ["\n".join(lines)]


# --------------------------------------------------------------------------
# SCD2


def _validate_scd2(asset: Asset, require_incremental_key: bool) -> list[str]:
    mat = asset.materialization
    if require_incremental_key and not mat.incremental_key:
        raise MaterializationError("incremental_key is required for scd2_by_time strategy")
    pks = asset.primary_keys()
    if not pks:
        raise MaterializationError("scd2 strategy requires the `primary_key` field on at least one column")
    key_found = False
    for col in asset.columns:
        if col.name.lower() in ("_valid_from", "_valid_until", "_is_current"):
            raise MaterializationError(f"column name {col.name} is reserved for SCD2")
        if require_incremental_key and col.name.lower() == mat.incremental_key.lower():
            key_found = True
            if col.type.strip().lower() not in ("timestamp", "date"):
                raise MaterializationError(
                    "incremental_key must be TIMESTAMP or DATE in scd2_by_time strategy"
                )
    if require_incremental_key and not key_found:
        raise MaterializationError(
            "incremental_key must reference a declared column in scd2_by_time strategy"
        )
    return pks


def _scd2_layout(asset: Asset, pks: list[str]) -> tuple[str, list[str]]:
    mat = asset.materialization
    partition_by = mat.partition_by or "days(_valid_from)"
    cluster_by = mat.cluster_by or (["_is_current"] + [quote_ident(k) for k in pks])
    return partition_by, cluster_by


def _scd2_full_refresh(asset: Asset, query: str, by_time: bool) -> list[str]:
    pks = _validate_scd2(asset, by_time)
    mat = asset.materialization
    if by_time or mat.incremental_key:
        valid_from = f"CAST(src.{quote_ident(mat.incremental_key)} AS TIMESTAMP)"
    else:
        valid_from = "CURRENT_TIMESTAMP()"
    select_query = (
        f"SELECT\n  {valid_from} AS _valid_from,\n  src.*,\n"
        f"  {SCD2_VALID_UNTIL} AS _valid_until,\n  TRUE AS _is_current\nFROM (\n{_strip(query)}\n) AS src"
    )
    partition_by, cluster_by = _scd2_layout(asset, pks)
    from dataclasses import replace

    shadow = Asset(
        name=asset.name,
        materialization=replace(
            asset.materialization, partition_by=partition_by, cluster_by=cluster_by
        ),
    )
    return _replace_table(shadow, select_query)


def _scd2_merge(
    asset: Asset,
    query: str,
    pks: list[str],
    source_change_cond: str,
    target_change_cond: str,
    valid_until: str,
    insert_cols: list[str],
    insert_vals: list[str],
) -> list[str]:
    """Shared SCD2 MERGE skeleton.

    Source duplication trick (ref: pkg/spark/materialization.go:373-436):
    every source row appears once with _is_current=TRUE (matches & expires
    the live target row when changed) and changed rows appear a second
    time with _is_current=FALSE (never matches → inserts the new version).
    Rows missing from the source expire via NOT MATCHED BY SOURCE.
    """
    name = quote_ident(asset.name)
    pk_join = " AND ".join(f"t1.{quote_ident(k)} <=> s1.{quote_ident(k)}" for k in pks)
    target_join = (
        " AND ".join(f"target.{quote_ident(k)} <=> source.{quote_ident(k)}" for k in pks)
        + " AND target._is_current AND source._is_current"
    )
    return [
        f"""MERGE INTO {name} AS target
USING (
  WITH s1 AS (
    {_strip(query)}
  )
  SELECT s1.*, TRUE AS _is_current
  FROM s1
  UNION ALL
  SELECT s1.*, FALSE AS _is_current
  FROM s1
  JOIN {name} AS t1
    ON {pk_join}
  WHERE t1._is_current AND ({source_change_cond})
) AS source
ON {target_join}
WHEN MATCHED AND ({target_change_cond}) THEN
  UPDATE SET
    target._valid_until = {valid_until},
    target._is_current = FALSE
WHEN NOT MATCHED THEN
  INSERT ({', '.join(insert_cols)})
  VALUES ({', '.join(insert_vals)})
WHEN NOT MATCHED BY SOURCE AND target._is_current THEN
  UPDATE SET
    target._valid_until = CURRENT_TIMESTAMP(),
    target._is_current = FALSE"""
    ]


def _scd2_by_column(asset: Asset, query: str) -> list[str]:
    pks = _validate_scd2(asset, require_incremental_key=False)
    mat = asset.materialization

    insert_cols, insert_vals, src_changes, tgt_changes = [], [], [], []
    for col in asset.columns:
        q = quote_ident(col.name)
        insert_cols.append(q)
        insert_vals.append(f"source.{q}")
        if not col.primary_key:
            src_changes.append(f"NOT (t1.{q} <=> s1.{q})")
            tgt_changes.append(f"NOT (target.{q} <=> source.{q})")

    valid_from = valid_until = "CURRENT_TIMESTAMP()"
    if mat.incremental_key:
        valid_from = valid_until = f"CAST(source.{quote_ident(mat.incremental_key)} AS TIMESTAMP)"
    insert_cols += ["_valid_from", "_valid_until", "_is_current"]
    insert_vals += [valid_from, SCD2_VALID_UNTIL, "TRUE"]

    return _scd2_merge(
        asset,
        query,
        pks,
        " OR ".join(src_changes) or "FALSE",
        " OR ".join(tgt_changes) or "FALSE",
        valid_until,
        insert_cols,
        insert_vals,
    )


def _scd2_by_time(asset: Asset, query: str) -> list[str]:
    pks = _validate_scd2(asset, require_incremental_key=True)
    key = quote_ident(asset.materialization.incremental_key)

    insert_cols = [quote_ident(c.name) for c in asset.columns]
    insert_vals = [f"source.{quote_ident(c.name)}" for c in asset.columns]
    insert_cols += ["_valid_from", "_valid_until", "_is_current"]
    insert_vals += [f"CAST(source.{key} AS TIMESTAMP)", SCD2_VALID_UNTIL, "TRUE"]

    return _scd2_merge(
        asset,
        query,
        pks,
        f"t1._valid_from < CAST(s1.{key} AS TIMESTAMP)",
        f"target._valid_from < CAST(source.{key} AS TIMESTAMP)",
        f"CAST(source.{key} AS TIMESTAMP)",
        insert_cols,
        insert_vals,
    )


# --------------------------------------------------------------------------
# Data Vault (insert-only → runs as plain SQL even on parquet tables)
# semantics ref: pkg/duckdb/datavault_materialization.go:11-237


def _dv_by_roles(asset: Asset, roles: list[str], exclude: list = ()):
    ex = {id(c) for c in exclude}
    return [
        c for c in asset.columns if c.datavault_role in roles and id(c) not in ex
    ]


def _dv_by_suffix(asset: Asset, suffix: str, exclude: list = ()):
    """Columns matching a name-convention suffix, minus exclusions."""
    ex = {id(c) for c in exclude}
    return [
        c
        for c in asset.columns
        if c.name.lower().endswith(suffix) and id(c) not in ex
    ]


def _dv_hash_key(asset: Asset, roles: list[str], preferred: str):
    """Hash-key resolution, reference order (datavault_materialization.go
    :476-498): explicit role → the single primary_key (ambiguous with
    several) → a UNIQUE ``_hk`` name suffix.

    Role candidates are checked in PRIORITY order (link_hash_key beats
    hash_key for a link) rather than declaration order — the reference
    takes the first declared column matching ANY candidate role, which
    silently keys a link on a hub's hash_key when both are tagged; the
    priority scan picks the explicitly intended column in that case and
    is identical whenever roles are unambiguous (the documented form).
    """
    for role in roles:
        tagged = _dv_by_roles(asset, [role])
        if tagged:
            return tagged[0]
    pks = [c for c in asset.columns if c.primary_key]
    if len(pks) > 1:
        raise MaterializationError(
            f"datavault cannot determine which of the primary key columns "
            f"({', '.join(c.name for c in pks)}) is the hash key; mark it "
            f"with datavault_role: {preferred}"
        )
    if pks:
        return pks[0]
    by_suffix = _dv_by_suffix(asset, "_hk")
    if len(by_suffix) == 1:
        return by_suffix[0]
    raise MaterializationError(
        f"datavault requires a hash key column with datavault_role: "
        f"{preferred} or primary_key: true"
    )


def _dv_single(asset: Asset, roles: list[str], names: list[str], what: str):
    """Role first, then exact-name convention (load_dts / record_source /
    hashdiff — datavault_materialization.go:459-474,310-316)."""
    tagged = _dv_by_roles(asset, roles)
    if tagged:
        return tagged[0]
    for c in asset.columns:
        if c.name.lower() in names:
            return c
    raise MaterializationError(
        f"datavault requires a {what} column with datavault_role: {roles[0]}"
    )


def _dv_multi(asset: Asset, roles: list[str], suffix: str, exclude: list, what: str):
    """Role-tagged columns plus suffix-convention fallbacks
    (datavault_materialization.go:521-547)."""
    cols = _dv_by_roles(asset, roles, exclude)
    seen = {c.name.lower() for c in cols}
    for c in _dv_by_suffix(asset, suffix, exclude):
        if c.name.lower() not in seen:
            seen.add(c.name.lower())
            cols.append(c)
    if not cols:
        raise MaterializationError(
            f"datavault requires at least one {what} column with "
            f"datavault_role: {roles[0]}"
        )
    return cols


def _datavault_hub_link(asset: Asset, query: str, key_role: str) -> list[str]:
    if not asset.columns:
        raise MaterializationError("datavault strategies require the `columns` field to be set")
    kind = "hub" if key_role == "hash_key" else "link"
    if kind == "hub":
        hash_key = _dv_hash_key(asset, ["hash_key", "hub_hash_key"], "hash_key")
        related = _dv_multi(
            asset, ["business_key"], "_bk", [hash_key], "business key"
        )
    else:
        hash_key = _dv_hash_key(asset, ["link_hash_key", "hash_key"], "link_hash_key")
        related = _dv_multi(
            asset,
            ["hub_hash_key", "parent_hash_key", "foreign_hash_key"],
            "_hk",
            [hash_key],
            "related hash key",
        )
    load_dt = _dv_single(
        asset,
        ["load_datetime", "load_dts"],
        ["load_dts", "load_datetime", "loaded_at"],
        "load datetime",
    )
    record_src = _dv_single(
        asset, ["record_source"], ["record_source"], "record source"
    )

    mandatory = [hash_key, load_dt, record_src] + related
    all_cols = ", ".join(quote_ident(c.name) for c in asset.columns)
    src_cols = ", ".join(f"source.{quote_ident(c.name)}" for c in asset.columns)
    not_null = " AND ".join(f"source.{quote_ident(c.name)} IS NOT NULL" for c in mandatory)
    name = quote_ident(asset.name)
    hk = quote_ident(hash_key.name)

    return [
        f"""WITH __bruin_source AS (
{_strip(query)}
),
__bruin_ranked AS (
  SELECT
    {src_cols},
    ROW_NUMBER() OVER (PARTITION BY source.{hk} ORDER BY source.{quote_ident(load_dt.name)} ASC) AS __bruin_row_number
  FROM __bruin_source AS source
  WHERE {not_null}
),
__bruin_dedup AS (
  SELECT {all_cols}
  FROM __bruin_ranked AS source
  WHERE source.__bruin_row_number = 1
)
INSERT INTO {name} ({all_cols})
SELECT {src_cols}
FROM __bruin_dedup AS source
WHERE NOT EXISTS (
  SELECT 1
  FROM {name} AS target
  WHERE target.{hk} = source.{hk}
)"""
    ]


def _datavault_satellite(asset: Asset, query: str) -> list[str]:
    if not asset.columns:
        raise MaterializationError("datavault strategies require the `columns` field to be set")
    hash_key = _dv_hash_key(
        asset, ["parent_hash_key", "hub_hash_key", "hash_key"], "parent_hash_key"
    )
    hash_diff = _dv_single(
        asset, ["hashdiff", "hash_diff"], ["hashdiff", "hash_diff"], "hashdiff"
    )
    load_dt = _dv_single(
        asset,
        ["load_datetime", "load_dts"],
        ["load_dts", "load_datetime", "loaded_at"],
        "load datetime",
    )
    record_src = _dv_single(
        asset, ["record_source"], ["record_source"], "record source"
    )

    mandatory = [hash_key, hash_diff, load_dt, record_src]
    all_cols = ", ".join(quote_ident(c.name) for c in asset.columns)
    src_cols = ", ".join(f"source.{quote_ident(c.name)}" for c in asset.columns)
    not_null = " AND ".join(f"source.{quote_ident(c.name)} IS NOT NULL" for c in mandatory)
    name = quote_ident(asset.name)
    hk, hd, ld = quote_ident(hash_key.name), quote_ident(hash_diff.name), quote_ident(load_dt.name)

    return [
        f"""WITH __bruin_source AS (
{_strip(query)}
),
__bruin_valid AS (
  SELECT {src_cols}
  FROM __bruin_source AS source
  WHERE {not_null}
),
__bruin_dedup AS (
  SELECT {all_cols}
  FROM (
    SELECT
      valid.*,
      ROW_NUMBER() OVER (PARTITION BY valid.{hk}, valid.{ld} ORDER BY valid.{hd}) AS __bruin_pk_row_number
    FROM __bruin_valid AS valid
  ) AS ranked
  WHERE ranked.__bruin_pk_row_number = 1
),
__bruin_ordered AS (
  SELECT
    dedup.*,
    LAG(dedup.{hd}) OVER (PARTITION BY dedup.{hk} ORDER BY dedup.{ld}, dedup.{hd}) AS __bruin_previous_hashdiff,
    ROW_NUMBER() OVER (PARTITION BY dedup.{hk} ORDER BY dedup.{ld}, dedup.{hd}) AS __bruin_row_number
  FROM __bruin_dedup AS dedup
),
__bruin_latest AS (
  SELECT {hk}, {hd}
  FROM (
    SELECT
      target.{hk},
      target.{hd},
      ROW_NUMBER() OVER (PARTITION BY target.{hk} ORDER BY target.{ld} DESC) AS __bruin_latest_row_number
    FROM {name} AS target
    WHERE target.{hk} IS NOT NULL
  ) AS ranked_latest
  WHERE ranked_latest.__bruin_latest_row_number = 1
)
INSERT INTO {name} ({all_cols})
SELECT {src_cols}
FROM __bruin_ordered AS source
LEFT JOIN __bruin_latest AS latest
  ON latest.{hk} = source.{hk}
WHERE (
    (
      source.__bruin_row_number = 1
      AND (latest.{hk} IS NULL OR NOT (latest.{hd} <=> source.{hd}))
    )
    OR (
      source.__bruin_row_number > 1
      AND NOT (source.__bruin_previous_hashdiff <=> source.{hd})
    )
  )
  AND NOT EXISTS (
    SELECT 1
    FROM {name} AS target
    WHERE target.{hk} = source.{hk} AND target.{ld} = source.{ld}
  )"""
    ]
