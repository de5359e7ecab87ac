"""YAML loader for semantic models — the `semantic/` directory of a repo
(ref: semantic-engine/loader.go:60-83 LoadDirFS; file schema exercised by
semantic-engine/testdata/project/semantic/*.yml: `schema: v1`, `name`,
`source.table`, `dimensions` with type + named granularity expressions,
`metrics` with expression / filter / window, `segments`, `joins`).
"""

from __future__ import annotations

import os

import yaml

from bruin_spark.semantic.model import (
    Dimension,
    Join,
    Metric,
    Model,
    Segment,
    WindowSpec,
)


def model_from_dict(d: dict) -> Model:
    source = d.get("source") or {}
    dims = [
        Dimension(
            name=x["name"],
            type=x.get("type", "string"),
            expression=x.get("expression", "") or x.get("sql", ""),
            granularities=dict(x.get("granularities") or {}),
            hidden=bool(x.get("hidden", False)),
        )
        for x in d.get("dimensions") or []
    ]
    mets = []
    for x in d.get("metrics") or []:
        w = x.get("window") or None
        win = (
            WindowSpec(
                type=w.get("type", ""),
                order_by=w.get("order_by", ""),
                partition_by=list(w.get("partition_by") or []),
                offset=int(w.get("offset", 1)),
            )
            if w
            else None
        )
        mets.append(
            Metric(
                name=x["name"],
                expression=x.get("expression", ""),
                filter=x.get("filter", ""),
                window=win,
                hidden=bool(x.get("hidden", False)),
            )
        )
    joins = [
        Join(
            name=x["name"],
            model=x.get("model", ""),
            relationship=x.get("relationship", "many_to_one"),
            foreign_key=x.get("foreign_key", ""),
            target_key=x.get("target_key", ""),
            sql=x.get("sql", ""),
        )
        for x in d.get("joins") or []
    ]
    segs = [
        Segment(name=x["name"], filter=x.get("filter", ""))
        for x in d.get("segments") or []
    ]
    return Model(
        name=d["name"],
        table=source.get("table", "") or d.get("table", ""),
        primary_key=d.get("primary_key", "") or source.get("primary_key", ""),
        joins=joins,
        dimensions=dims,
        metrics=mets,
        segments=segs,
    )


def load_semantic_file(path: str) -> Model:
    with open(path) as f:
        d = yaml.safe_load(f) or {}
    return model_from_dict(d)


def load_semantic_dir(dir_path: str) -> dict[str, Model]:
    """Load every `*.yml`/`*.yaml` under ``dir_path`` -> {name: Model}.
    Duplicate model names error, like the reference (loader.go:76-78)."""
    models: dict[str, Model] = {}
    if not os.path.isdir(dir_path):
        return models
    for root, _dirs, files in os.walk(dir_path):
        for fn in sorted(files):
            if not fn.endswith((".yml", ".yaml")):
                continue
            m = load_semantic_file(os.path.join(root, fn))
            if m.name in models:
                raise ValueError(f"duplicate semantic model name {m.name!r}")
            models[m.name] = m
    return models
