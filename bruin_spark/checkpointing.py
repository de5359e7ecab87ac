"""Lineage-materialization strategy for the iterative / multi-reference
pipelines (connected-components star rounds, LSH candidate sets, BPE
merge rounds, k-means centroids, semantic-dedup assignment).

Those pipelines must periodically truncate plan lineage (iterative
plans grow without bound) or pin a subtree referenced by several
downstream branches (re-execution otherwise).  HOW the truncation is
materialized is a deployment decision, not an algorithm decision:

- ``local`` (default): ``df.localCheckpoint(eager)`` — block-manager
  storage on the executors that computed the partitions.  Fastest (no
  DFS write), correct on a static cluster and in local mode — but the
  partitions die with their executor: dynamic allocation, spot kills,
  or any executor churn on a real cluster fails the job mid-pipeline.
- ``reliable``: ``df.checkpoint(eager)`` into a configured checkpoint
  directory (HDFS/S3/DBFS on a cluster).  Survives executor loss; the
  production setting for long dedup/CC jobs on 100 TB.  Requires
  ``checkpoint_dir`` (``.bruin.yml`` environment key, ``set_mode``, or
  ``$BRUIN_SPARK_CHECKPOINT_DIR``).
- ``none``: return the plan unchanged.  Keeps the FULL lineage visible
  to plan audits — ``optimizedPlan().toString()`` hides everything
  upstream of a checkpoint behind a LogicalRDD leaf, so the plan-lint
  sweep runs in this mode to lint the pre-checkpoint stages.  Not for
  real execution of the iterative pipelines (unbounded plan growth,
  and multi-reference subtrees re-execute per branch).

Selection: ``set_mode()`` / the ``checkpoint_scope`` context manager
(tests, plan lint), else ``$BRUIN_SPARK_CHECKPOINT_MODE`` /
``$BRUIN_SPARK_CHECKPOINT_DIR``, else ``local``.  The ``.bruin.yml``
environment keys ``checkpoint_mode`` / ``checkpoint_dir`` are applied
by the CLI when an environment is selected (see ``cli.py``).

Reference parity: the reference delegates fault tolerance to its
warehouses (a BigQuery MERGE survives worker loss for free); on Spark
the engine owns it, so the knob lives here.  Ref anchor for the config
surface: /root/reference/cmd/environments.go:17 (.bruin.yml
environments carry per-deployment connection knobs).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame

MODES = ("local", "reliable", "none")

#: process-wide strategy; None = fall back to the environment variables
_mode: str | None = None
_dir: str | None = None


def set_mode(mode: str, checkpoint_dir: str | None = None) -> None:
    """Select the materialization strategy process-wide.

    ``reliable`` requires a ``checkpoint_dir`` (here, previously set, or
    ``$BRUIN_SPARK_CHECKPOINT_DIR``).
    """
    global _mode, _dir
    if mode not in MODES:
        raise ValueError(f"checkpoint mode must be one of {MODES}, got {mode!r}")
    if checkpoint_dir:
        _dir = checkpoint_dir
    if mode == "reliable" and not (_dir or os.environ.get("BRUIN_SPARK_CHECKPOINT_DIR")):
        raise ValueError(
            "checkpoint mode 'reliable' needs a checkpoint_dir "
            "(set_mode(..., checkpoint_dir=...), .bruin.yml environment "
            "key checkpoint_dir, or $BRUIN_SPARK_CHECKPOINT_DIR)"
        )
    _mode = mode


def get_mode() -> str:
    if _mode is not None:
        return _mode
    env = os.environ.get("BRUIN_SPARK_CHECKPOINT_MODE", "").strip().lower()
    return env if env in MODES else "local"


def get_checkpoint_dir() -> str | None:
    return _dir or os.environ.get("BRUIN_SPARK_CHECKPOINT_DIR") or None


@contextmanager
def checkpoint_scope(mode: str, checkpoint_dir: str | None = None):
    """Temporarily switch strategy (tests, the plan-lint sweep)."""
    global _mode, _dir
    prev = (_mode, _dir)
    try:
        set_mode(mode, checkpoint_dir)
        yield
    finally:
        _mode, _dir = prev


def materialize(df: DataFrame, eager: bool = True, required: bool = False) -> DataFrame:
    """Truncate ``df``'s lineage per the selected strategy.

    ``eager=False`` keeps the lazy one-pass pattern (materialize +
    first downstream action in ONE job); eager=True is required when
    the result feeds multiple subtrees of a single downstream job.

    ``required=True`` marks sites where truncation is a FEASIBILITY
    need, not an optimization: driver-side iteration whose plan
    references itself multiple times per round (CC star rounds, BPE
    merges) grows exponentially without a cut — in 'none' mode those
    sites fall back to 'local' instead of OOMing the planner.  Their
    per-round plans get targeted lint tests instead of the sweep.
    """
    mode = get_mode()
    if mode == "none":
        if not required:
            return df
        mode = "local"
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        want = get_checkpoint_dir()
        # setCheckpointDir is idempotent per dir; only (re)set when the
        # configured dir differs from the context's current one
        current = sc._jsc.sc().getCheckpointDir()
        current_dir = current.get() if current.isDefined() else None
        if want and (current_dir is None or not current_dir.startswith(want)):
            sc.setCheckpointDir(want)
        elif current_dir is None:
            raise RuntimeError(
                "checkpoint mode 'reliable' but no checkpoint dir is set "
                "on the SparkContext and none is configured"
            )
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
