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
#: per-THREAD stack of active pinned_scope buckets: materialize()
#: registers its result in the calling thread's innermost scope so
#: harnesses can free everything a query pinned once it is consumed.
#: Thread-local, not global: the scheduler runs operators on worker
#: threads, and a global stack would let thread A's scope exit release
#: blocks thread B is still computing with (and pop B's bucket).
import threading as _threading

_scope_stacks = _threading.local()


def _active_scopes() -> list[list[DataFrame]]:
    stack = getattr(_scope_stacks, "stack", None)
    if stack is None:
        stack = _scope_stacks.stack = []
    return stack
#: the raw (pre-qualification) dir we last passed to setCheckpointDir.
#: Spark qualifies the dir (``/tmp/ck`` -> ``file:/tmp/ck/<uuid>``), so
#: comparing the configured path against ``sc.getCheckpointDir`` never
#: matches for schemeless paths and would re-run setCheckpointDir on
#: every materialize(), orphaning a fresh UUID subdirectory each call.
#: Tracking what WE set, Python-side, makes the check exact.
_dir_set_on_context: str | None = None


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
    check_not_released(df)
    mode = get_mode()
    if mode == "none":
        if not required:
            return df
        mode = "local"
    out = _materialize(df, eager, mode)
    stack = _active_scopes()
    if stack:
        stack[-1].append(out)
    return out


def _materialize(df: DataFrame, eager: bool, mode: str) -> DataFrame:
    if mode == "reliable":
        global _dir_set_on_context
        sc = df.sparkSession.sparkContext
        want = get_checkpoint_dir()
        if not want:
            # A context dir that WE never set came from outside bruin —
            # spark.checkpoint.dir in spark-defaults or embedding code
            # calling sc.setCheckpointDir() — and is a legitimate
            # deployment configuration: honor it.  But a defined dir
            # when _dir_set_on_context is not None is a LEFTOVER from a
            # previous checkpoint_scope whose Python config was restored
            # (possibly a deleted pytest tmp dir): refusing matters,
            # because writing there fails mid-job or strands files in
            # the wrong storage tier.  (If an external dir existed AND a
            # bruin scope later overwrote it, the two are no longer
            # distinguishable — the conservative raise applies.)
            if _dir_set_on_context is None and sc._jsc.sc().getCheckpointDir().isDefined():
                return df.checkpoint(eager=eager)
            raise RuntimeError(
                "checkpoint mode 'reliable' but no checkpoint_dir is "
                "configured (set_mode(..., checkpoint_dir=...), .bruin.yml "
                "environment key checkpoint_dir, or "
                "$BRUIN_SPARK_CHECKPOINT_DIR)"
            )
        # setCheckpointDir creates a fresh UUID subdir per call; re-set
        # only when the configured dir changed or the context was
        # replaced (a new context starts with no dir defined)
        if _dir_set_on_context != want or not sc._jsc.sc().getCheckpointDir().isDefined():
            sc.setCheckpointDir(want)
            _dir_set_on_context = want
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


@contextmanager
def pinned_scope():
    """Collect every ``materialize()`` result created inside the block
    and :func:`release` them all on exit.

    The lazy-DataFrame API cannot know when a caller is done with a
    query, so a pipeline like ``minhash_dedup_clusters`` — which pins an
    O(corpus-rows) (id, _tkey) projection that its returned plan still
    references — would otherwise leak one pinned block set per call in
    a long-lived session (scheduler, bench, notebook).  Harnesses wrap
    build+consume in this scope::

        with pinned_scope():
            df = fn(spark, sf_dir)
            df.count()
        # everything the query pinned is now freed

    Iterative loops that already release superseded rounds themselves
    are unaffected: release() is idempotent (deleting missing checkpoint
    files and unpersisting unpersisted RDDs are no-ops).  Scopes are
    per-thread: a scope only collects (and only releases) what ITS
    thread materialized.

    Do NOT keep a reference to a materialized DataFrame past the scope
    exit: a later action on it recomputes from block-manager (local
    mode, usually still works) but in 'reliable' mode the checkpoint
    FILES are gone, and the action fails executor-side with an opaque
    ``FileNotFoundException: .../rdd-<id>/part-...``.  That exception
    means "this DataFrame was release()d" — feeding such a DataFrame
    back into :func:`materialize` raises a descriptive error instead
    (see :func:`check_not_released`)."""
    stack = _active_scopes()
    bucket: list[DataFrame] = []
    stack.append(bucket)
    try:
        yield bucket
    finally:
        # LIFO pop, NOT remove(bucket): list.remove compares by equality
        # and all empty buckets are equal, so nested scopes could drop
        # the OUTER bucket. Context-manager exits are LIFO per thread,
        # so the top of this thread's stack is always ours.
        popped = stack.pop()
        assert popped is bucket, "pinned_scope stack corrupted"
        for d in bucket:
            release(d)


#: (application id, rdd id) pairs whose checkpoint state release() has
#: torn down.  A later action on such a DataFrame fails with an
#: executor-side FileNotFoundException on rdd-<id> files ('reliable'
#: mode) — hard to diagnose — so materialize() consults this set to
#: raise a clear error instead.  Keyed per APPLICATION (rdd ids restart
#: from 0 with a new SparkContext — a bare id would poison a fresh
#: context's unrelated RDDs), and release() records only RDDs that
#: actually held checkpoint files or persisted blocks (releasing a
#: plain createDataFrame LogicalRDD is the documented no-op and must
#: not taint it).  Entries are bounded: one per materialize call.
_released_rdd_ids: set[tuple[str, int]] = set()


def check_not_released(df: DataFrame) -> None:
    """Raise a descriptive error if ``df`` is a checkpoint that
    :func:`release` already tore down (its ``rdd-<id>`` files /
    blocks are gone; any action would fail executor-side with an
    opaque FileNotFoundException)."""
    try:
        jplan = df._jdf.queryExecution().analyzed()
        if jplan.getClass().getSimpleName() != "LogicalRDD":
            return
        key = (df.sparkSession.sparkContext.applicationId, jplan.rdd().id())
    except Exception:  # noqa: BLE001 — diagnosis must never fail the job
        return
    if key in _released_rdd_ids:
        raise RuntimeError(
            f"this DataFrame's checkpoint (rdd-{key[1]}) was already "
            "release()d — typically it escaped a pinned_scope() block. "
            "Re-run the query that produced it inside the current scope "
            "instead of reusing the released handle."
        )


def release(df: DataFrame) -> None:
    """Free the resources pinned by a previous ``materialize()`` result
    once an iteration no longer needs it.

    ``unpersist()`` drops block-manager storage (local checkpoints,
    caches) but NOT reliable checkpoint files: those are only removed by
    the ContextCleaner when ``spark.cleaner.referenceTracking.
    cleanCheckpoints=true`` (default false) AND the RDD is GC'd — so an
    n-round loop in 'reliable' mode would strand O(n) ``rdd-<id>``
    file sets on the DFS.  This deletes the round's checkpoint files
    explicitly via the RDD's own ``getCheckpointFile`` (best-effort: a
    failure to delete is harmless leftover data, never a correctness
    issue; local checkpoints report no file and skip the delete).
    """
    try:
        jplan = df._jdf.queryExecution().analyzed()
        if jplan.getClass().getSimpleName() == "LogicalRDD":
            sc = df.sparkSession.sparkContext
            jrdd = jplan.rdd()
            sl = jrdd.getStorageLevel()
            cf = jrdd.getCheckpointFile()
            if cf.isDefined() or sl.useMemory() or sl.useDisk():
                # only a df that actually held checkpoint files or
                # persisted blocks becomes unusable after this teardown
                _released_rdd_ids.add((sc.applicationId, jrdd.id()))
            if cf.isDefined():
                path = sc._jvm.org.apache.hadoop.fs.Path(cf.get())
                fs = path.getFileSystem(sc._jsc.sc().hadoopConfiguration())
                fs.delete(path, True)
            # Dataset.unpersist only clears CacheManager entries; a
            # local checkpoint's blocks are pinned on the UNDERLYING
            # RDD and need an RDD-level unpersist to be freed
            jrdd.unpersist(False)
    except Exception:  # noqa: BLE001 — cleanup must never fail the job
        pass
    try:
        # also guarded: on a stopped SparkContext this py4j call raises,
        # and a release inside pinned_scope's finally must not mask the
        # query's own exception or skip the rest of the bucket
        df.unpersist()
    except Exception:  # noqa: BLE001
        pass
