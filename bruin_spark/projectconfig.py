"""Project-level configuration — the ``.bruin.yml`` analog.

Reference parity: the reference keeps named environments (and their
connections) in a repo-root ``.bruin.yml`` managed by
``bruin environments list/create/update/delete/clone``
(cmd/environments.go:17-547) and selected per run with
``--environment`` (cmd/run.go).  A Spark deployment has one engine
instead of per-warehouse connections, so an environment here carries
the knobs that vary between dev/staging/prod on a cluster:

.. code-block:: yaml

    default_environment: default
    environments:
      default:
        schema_prefix: ""
      dev:
        schema_prefix: dev_
        tables_dir: /root/testdata/sf0.001   # parquet tables to register
        shuffle_partitions: 8                # cluster sizing override
      prod:
        checkpoint_mode: reliable            # durable checkpoint(dir) for
        checkpoint_dir: s3://bucket/ckpt     # the iterative CC/LSH pipelines

Resolution order for ``--environment``: the pipeline's own
``pipeline.yml`` ``environments:`` block first (single-file layout),
then the nearest ``.bruin.yml`` walking up from the pipeline directory
(repo layout).  ``default_environment`` applies when no
``--environment`` flag is given.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import yaml

CONFIG_FILENAME = ".bruin.yml"


@dataclass
class ProjectConfig:
    path: str = ""
    default_environment: str = ""
    environments: dict[str, dict] = field(default_factory=dict)

    def to_dict(self) -> dict:
        out: dict = {}
        if self.default_environment:
            out["default_environment"] = self.default_environment
        out["environments"] = self.environments
        return out


def find_config_file(start_dir: str) -> str | None:
    """Walk up from ``start_dir`` to the filesystem root looking for
    ``.bruin.yml`` (the reference anchors at the git repo root; walking
    up subsumes that without requiring git)."""
    d = os.path.abspath(start_dir)
    while True:
        cand = os.path.join(d, CONFIG_FILENAME)
        if os.path.isfile(cand):
            return cand
        parent = os.path.dirname(d)
        if parent == d:
            return None
        d = parent


def load_config(path_or_dir: str) -> ProjectConfig:
    """Load a config file (or find one upward from a directory).
    Returns an empty config (path='') when none exists."""
    path = (
        path_or_dir
        if os.path.isfile(path_or_dir)
        else find_config_file(path_or_dir)
    )
    if not path:
        return ProjectConfig()
    with open(path, encoding="utf-8") as f:
        d = yaml.safe_load(f) or {}
    return ProjectConfig(
        path=path,
        default_environment=str(d.get("default_environment", "") or ""),
        environments={
            str(k): dict(v or {}) for k, v in (d.get("environments") or {}).items()
        },
    )


def save_config(cfg: ProjectConfig, path: str | None = None) -> str:
    path = path or cfg.path
    if not path:
        raise ValueError("no config path to save to")
    if os.path.isdir(path):
        # callers pass directories wherever load_config accepts them
        # (it walks up from a dir); save into the dir's .bruin.yml
        path = os.path.join(path, CONFIG_FILENAME)
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False, default_flow_style=False)
    cfg.path = path
    return path


# --- management operations (cmd/environments.go semantics) ---


def create_environment(cfg: ProjectConfig, name: str, schema_prefix: str = "") -> None:
    if name in cfg.environments:
        raise ValueError(f"environment {name!r} already exists")
    spec: dict = {}
    if schema_prefix:
        spec["schema_prefix"] = schema_prefix
    cfg.environments[name] = spec
    if not cfg.default_environment:
        cfg.default_environment = name


def update_environment(
    cfg: ProjectConfig,
    name: str,
    new_name: str | None = None,
    schema_prefix: str | None = None,
) -> None:
    if name not in cfg.environments:
        raise ValueError(f"unknown environment {name!r}")
    spec = cfg.environments[name]
    if schema_prefix is not None:
        if schema_prefix:
            spec["schema_prefix"] = schema_prefix
        else:
            spec.pop("schema_prefix", None)
    if new_name and new_name != name:
        if new_name in cfg.environments:
            raise ValueError(f"environment {new_name!r} already exists")
        cfg.environments[new_name] = cfg.environments.pop(name)
        if cfg.default_environment == name:
            cfg.default_environment = new_name


def delete_environment(cfg: ProjectConfig, name: str) -> None:
    if name not in cfg.environments:
        raise ValueError(f"unknown environment {name!r}")
    del cfg.environments[name]
    if cfg.default_environment == name:
        cfg.default_environment = next(iter(cfg.environments), "")


def clone_environment(
    cfg: ProjectConfig, source: str, target: str, schema_prefix: str | None = None
) -> None:
    if source not in cfg.environments:
        raise ValueError(f"unknown environment {source!r}")
    if target in cfg.environments:
        raise ValueError(f"environment {target!r} already exists")
    spec = dict(cfg.environments[source])
    if schema_prefix is not None:
        if schema_prefix:
            spec["schema_prefix"] = schema_prefix
        else:
            spec.pop("schema_prefix", None)
    cfg.environments[target] = spec
