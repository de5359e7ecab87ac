"""Pipeline-level column-lineage fold.

Re-expresses the reference's ``pkg/lineage/lineage.go`` (the machinery
behind ``bruin internal parse-pipeline -c`` and ``bruin patch``):
walk each SQL asset upstream-first, run per-query column lineage with
the upstream assets' declared+inferred columns as the schema, then fold
the result back into the pipeline model —

- columns the query produces are ADDED to the asset if undeclared,
  inheriting type/description from the upstream column they derive from
  (lineage.go:280-360 processLineageColumns / addColumnToAsset);
- a ``SELECT *`` copies every upstream column (lineage.go:193-216
  mergeAsteriskColumns), resetting primary_key/checks/foreign-key/
  default, which are properties of the upstream's own definition;
- each declared column's ``upstreams`` list is filled with
  ``{column, table}`` records (lineage.go:402-409, dedup 478-487);
- each DAG edge's ``columns`` list gets usage records for every
  upstream column the query touches, selected or not
  (lineage.go:218-269 mergeNonSelectedColumns).

The per-query resolver is :mod:`bruin_spark.parser.lineage`; this module
is pure model folding on top of it.
"""

from __future__ import annotations

from bruin_spark.model.pipeline import Asset, Column, Pipeline
from bruin_spark.parser.lineage import get_column_lineage


def _resolve_upstream_asset(pipe: Pipeline, table: str) -> Asset | None:
    """Case-insensitive asset lookup by table reference
    (lineage.go:53-67 resolveUpstreamAsset)."""
    low = table.lower()
    for a in pipe.assets:
        if a.name.lower() == low:
            return a
    return None


def _derived_copy(src: Column, new_name: str, up_table: str, up_col: str) -> Column:
    """A derived column inherits metadata but NOT identity properties:
    primary_key/checks/default belong to the upstream's own definition
    (lineage.go:203-208, 340-352)."""
    return Column(
        name=new_name,
        type=src.type,
        description=src.description,
        primary_key=False,
        update_on_merge=src.update_on_merge,
        nullable=src.nullable,
        checks=[],
        upstreams=[{"column": up_col, "table": up_table}],
        tags=list(src.tags),
        precision=src.precision,
        scale=src.scale,
        length=src.length,
    )


def _merge_into_asset(asset: Asset, new_col: Column) -> None:
    """addColumnToAsset (lineage.go:365-420): append when undeclared;
    otherwise back-fill empty metadata and union the upstreams list
    (case-insensitive dedup, lineage.go:478-487)."""
    existing = None
    for c in asset.columns:
        if c.name.lower() == new_col.name.lower():
            existing = c
            break
    if existing is None:
        asset.columns.append(new_col)
        return
    if not existing.description:
        existing.description = new_col.description
    if not existing.type:
        existing.type = new_col.type
    if existing.precision is None:
        existing.precision = new_col.precision
    if existing.scale is None:
        existing.scale = new_col.scale
    if existing.length is None:
        existing.length = new_col.length
    for tag in new_col.tags:
        if tag not in existing.tags:
            existing.tags.append(tag)
    existing.update_on_merge = new_col.update_on_merge
    have = {(u["column"].lower(), u["table"].lower()) for u in existing.upstreams}
    for u in new_col.upstreams:
        if (u["column"].lower(), u["table"].lower()) not in have:
            have.add((u["column"].lower(), u["table"].lower()))
            existing.upstreams.append(u)


def _merge_edge_columns(asset: Asset, lineage: dict) -> None:
    """mergeNonSelectedColumns (lineage.go:218-269): record which of each
    upstream's columns the query touches, on the DAG edge itself."""
    for up in asset.depends:
        seen = {c["name"].lower() for c in up.columns}

        def record(table: str, column: str) -> None:
            if table.lower() != up.value.lower() or column == "*":
                return
            if column.lower() in seen:
                return
            seen.add(column.lower())
            up.columns.append({"name": column, "usage": ""})

        for nsc in lineage["non_selected_columns"]:
            if nsc["name"] == "*":
                continue
            for u in nsc["upstream"]:
                # non-selected columns record the name as written
                record(u["table"], nsc["name"])
        for col in lineage["columns"]:
            if col["name"] != "*":
                for u in col["upstream"]:
                    record(u["table"], u["column"])
                continue
            # '*': the asset's (already-expanded) own columns stand in
            # (lineage.go:258-263)
            for own in asset.columns:
                record(own.name, own.name)


def _fold_asset(pipe: Pipeline, asset: Asset, lineage: dict) -> None:
    """processLineageColumns (lineage.go:276-362)."""
    for col in lineage["columns"]:
        if col["name"] == "*":
            # copy every column of the upstream the star expands over
            for u in col["upstream"]:
                if u["column"] != "*":
                    continue
                ua = _resolve_upstream_asset(pipe, u["table"])
                if ua is None:
                    continue
                for uc in ua.columns:
                    _merge_into_asset(
                        asset, _derived_copy(uc, uc.name, ua.name, uc.name)
                    )
            continue
        if not col["upstream"]:
            _merge_into_asset(asset, Column(name=col["name"]))
            continue
        for u in col["upstream"]:
            if u["column"] == "*":
                continue
            ua = _resolve_upstream_asset(pipe, u["table"])
            if ua is None:
                _merge_into_asset(
                    asset,
                    Column(
                        name=col["name"],
                        upstreams=[
                            {"column": u["column"], "table": u["table"].lower()}
                        ],
                    ),
                )
                continue
            uc = next(
                (c for c in ua.columns if c.name.lower() == u["column"].lower()),
                None,
            )
            if uc is None:
                _merge_into_asset(
                    asset,
                    Column(
                        name=col["name"],
                        upstreams=[{"column": u["column"], "table": ua.name}],
                    ),
                )
            else:
                _merge_into_asset(
                    asset, _derived_copy(uc, col["name"], ua.name, u["column"])
                )
    _merge_edge_columns(asset, lineage)


def extract_pipeline_lineage(pipe: Pipeline, render=None) -> list[str]:
    """Fold column lineage into every SQL asset of ``pipe``, upstream
    assets first so inferred columns propagate down chains
    (lineage.go:101-131 ColumnLineage recursive walk).

    ``render``: optional ``fn(asset) -> rendered_sql``; defaults to the
    raw query text (the reference renders with a yesterday-interval
    context — callers with Jinja assets should pass a real renderer).
    Returns a list of per-asset issue strings; the fold continues past
    failing assets like the reference does.
    """
    issues: list[str] = []
    processed: set[str] = set()

    def walk(asset: Asset) -> None:
        if asset.name in processed:
            return
        processed.add(asset.name)
        for up in asset.depends:
            ua = pipe.asset(up.value)
            if ua is not None:
                walk(ua)
        if asset.type != "sql" and not asset.type.endswith(".sql"):
            return
        schema = {
            ua.name: [c.name for c in ua.columns]
            for up in asset.depends
            if up.type == "asset" and (ua := pipe.asset(up.value)) is not None
            if ua.columns
        }
        try:
            sql = render(asset) if render is not None else asset.query
        except Exception as exc:
            issues.append(f"{asset.name}: failed to render query: {exc}")
            return
        lineage = get_column_lineage(sql, schema=schema or None)
        if lineage["errors"]:
            issues.append(f"{asset.name}: {'; '.join(lineage['errors'])}")
            return
        _fold_asset(pipe, asset, lineage)

    for a in list(pipe.assets):
        walk(a)
    return issues
