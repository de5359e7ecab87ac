"""Developer environments: schema-prefixed materialization.

Running with ``--environment dev`` (where the environment declares a
``schema_prefix``) makes every asset materialize into
``<prefix><schema>.<table>`` instead of the production schema, and
rewrites rendered queries so table references resolve to the dev copy
WHEN IT EXISTS in the catalog, falling back to the production table
otherwise — you only rebuild what you changed, reads of everything else
hit prod data.

Reference parity:
- name prefixing: pkg/pipeline/pipeline.go:1524-1554
  (prefixSchemaComponent / PrefixSchema / PrefixUpstreams, applied by
  cmd/run.go:800-807)
- query rewriting: pkg/devenv/modifier.go:29-198 (UsedTables →
  existence-gated RenameTables, incl. the self-reference mapping)

Environments are declared in pipeline.yml (the reference keeps them in
.bruin.yml; a single-file layout collapses that here):

.. code-block:: yaml

    environments:
      dev:
        schema_prefix: dev_
"""

from __future__ import annotations

from dataclasses import dataclass

from bruin_spark.model.pipeline import Pipeline
from bruin_spark.parser.sqlutil import rename_tables, used_tables


@dataclass
class Environment:
    name: str
    schema_prefix: str = ""
    tables_dir: str = ""
    shuffle_partitions: int = 0
    # lineage-materialization strategy for the iterative pipelines
    # (see bruin_spark.checkpointing): '' = leave the process default
    checkpoint_mode: str = ""
    checkpoint_dir: str = ""


def _env_from_spec(name: str, spec: dict) -> Environment:
    return Environment(
        name=name,
        schema_prefix=str(spec.get("schema_prefix", "") or ""),
        tables_dir=str(spec.get("tables_dir", "") or ""),
        shuffle_partitions=int(spec.get("shuffle_partitions", 0) or 0),
        checkpoint_mode=str(spec.get("checkpoint_mode", "") or ""),
        checkpoint_dir=str(spec.get("checkpoint_dir", "") or ""),
    )


def load_environment(
    pipeline: Pipeline, name: str, search_dir: str | None = None
) -> Environment:
    """Resolve a named environment: the pipeline's own ``environments:``
    block first, then the nearest ``.bruin.yml`` walking up from
    ``search_dir`` (ref: cmd/environments.go keeps them in .bruin.yml)."""
    envs = (pipeline.raw or {}).get("environments", {}) or {}
    spec = envs.get(name)
    if spec is not None:
        return _env_from_spec(name, spec or {})
    if search_dir is not None:
        from bruin_spark.projectconfig import load_config

        cfg = load_config(search_dir)
        if name in cfg.environments:
            return _env_from_spec(name, cfg.environments[name])
    raise ValueError(
        f"unknown environment {name!r}; declare it under `environments:` "
        f"in pipeline.yml or in a project .bruin.yml"
    )


def default_environment_name(search_dir: str) -> str:
    """The project config's default_environment ('' when none)."""
    from bruin_spark.projectconfig import load_config

    return load_config(search_dir).default_environment


def prefix_schema_component(name: str, prefix: str) -> str:
    """table -> table; schema.table -> <prefix>schema.table;
    cat.schema.table -> cat.<prefix>schema.table (pipeline.go:1524)."""
    parts = name.split(".")
    if len(parts) < 2:
        return name
    parts[-2] = prefix + parts[-2]
    return ".".join(parts)


def apply_dev_environment(pipeline: Pipeline, env: Environment) -> None:
    """Prefix every asset name and asset-type upstream IN PLACE, exactly
    like cmd/run.go:800-807 does before scheduling."""
    if not env.schema_prefix:
        return
    for a in pipeline.assets:
        a.name = prefix_schema_component(a.name, env.schema_prefix)
        for up in a.depends:
            if getattr(up, "type", "asset") == "asset":
                up.value = prefix_schema_component(up.value, env.schema_prefix)


def modify_query_for_dev(spark, asset_name: str, query: str, env: Environment) -> str:
    """Rewrite table references in a rendered query for the dev env.

    For each referenced ``schema.table`` / ``cat.schema.table``: rename
    to the prefixed schema ONLY if that dev table exists in the catalog
    (modifier.go:146-188).  Unqualified single-part names are left alone
    (temp views).  Also maps the asset's own un-prefixed name to the
    prefixed one so self-referencing queries keep working
    (modifier.go:134-144).
    """
    if not env.schema_prefix:
        return query
    mapping: dict[str, str] = {}

    parts = asset_name.split(".")
    if len(parts) >= 2 and parts[-2].startswith(env.schema_prefix):
        original = parts.copy()
        original[-2] = original[-2][len(env.schema_prefix):]
        mapping[".".join(original)] = asset_name

    for ref in used_tables(query):
        rparts = ref.split(".")
        if len(rparts) not in (2, 3):
            continue
        dev = prefix_schema_component(ref, env.schema_prefix)
        if dev == ref or ref in mapping:
            continue
        try:
            exists = spark.catalog.tableExists(dev)
        except Exception:  # malformed identifier etc.
            exists = False
        if exists:
            mapping[ref] = dev
    if not mapping:
        return query
    return rename_tables(query, mapping)
