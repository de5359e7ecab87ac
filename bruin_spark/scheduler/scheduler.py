"""DAG scheduler/executor: assets explode into task instances, a worker
pool drains a ready-queue, blocking checks gate downstream assets.

Run-time model mirrors the reference scheduler
(pkg/scheduler/scheduler.go:99-115 TaskInstance, :82-90 statuses,
:665-731 instance explosion, :795-835 edges, :943-979 tick loop,
:1127-1140 readiness, :1152-1249 state/continue) re-expressed with
Python threads sharing one SparkSession — Spark schedules the actual
stages; the pool only bounds concurrent driver-side actions.

Efficiency note: the reference runs every check as its own warehouse
query. Here all column checks of an asset are fused into ONE aggregation
scan (checks/checks.py) computed when the first check instance of the
asset runs; sibling instances read the memoized result. Instance-level
status/blocking/retry semantics are preserved, but the table is scanned
once instead of once per check — the difference between 1 and N scans of
a 100 TB table.
"""

from __future__ import annotations

import enum
import json
import os
import queue
import threading
import time
import traceback
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import SparkSession

from bruin_spark.checks.checks import CheckResult, run_asset_checks
from bruin_spark.mat.executor import Materializer
from bruin_spark.model.pipeline import Asset, MaterializationType, Pipeline
from bruin_spark.render.jinja import RenderContext, render_asset_query


class AssetTimeout(TimeoutError):
    """Per-attempt `timeout:` expiry. Never retried: the abandoned
    attempt's thread may outlive the cancellation and race a retry."""


class InstanceType(str, enum.Enum):
    MAIN = "main"
    COLUMN_CHECK = "column_check"
    CUSTOM_CHECK = "custom_check"


class InstanceStatus(str, enum.Enum):
    PENDING = "pending"
    QUEUED = "queued"
    RUNNING = "running"
    SUCCEEDED = "succeeded"
    FAILED = "failed"
    UPSTREAM_FAILED = "upstream_failed"
    SKIPPED = "skipped"


_TERMINAL = {
    InstanceStatus.SUCCEEDED,
    InstanceStatus.FAILED,
    InstanceStatus.UPSTREAM_FAILED,
    InstanceStatus.SKIPPED,
}


@dataclass
class TaskInstance:
    id: str  # "asset", "asset:check:col:name", "asset:custom:name"
    asset: Asset
    type: InstanceType
    column: str = ""
    check: str = ""
    blocking: bool = True
    status: InstanceStatus = InstanceStatus.PENDING
    upstreams: list[str] = field(default_factory=list)  # instance ids
    attempts: int = 0
    error: str = ""
    duration_s: float = 0.0


@dataclass
class RunResult:
    succeeded: list[str]
    failed: list[str]
    upstream_failed: list[str]
    skipped: list[str]
    check_results: list[CheckResult]
    #: failed instances that are warn-only (non-blocking checks): they
    #: appear in ``failed`` for visibility but do not flip ``ok`` — a
    #: warn-only failure must not halt a backfill or fail the run
    #: (checks.py's raise_on_failure applies the same rule)
    warn_only_failed: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        hard = set(self.failed) - set(self.warn_only_failed)
        return not hard and not self.upstream_failed


@dataclass
class PipelineState:
    """Persisted per-run status for --continue (ref: scheduler.go:117-163)."""

    run_id: str
    statuses: dict[str, str]

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"run_id": self.run_id, "statuses": self.statuses}, f, indent=1)

    @classmethod
    def load(cls, path: str) -> "PipelineState":
        with open(path) as f:
            d = json.load(f)
        return cls(run_id=d["run_id"], statuses=d["statuses"])


_REF_JINJA = ("{{", "{%", "{#")


def _match_selector(asset: Asset, only: set[str] | None, tags: set[str], exclude_tags: set[str]) -> bool:
    if only is not None and asset.name not in only:
        return False
    if tags and not (tags & set(asset.tags)):
        return False
    if exclude_tags & set(asset.tags):
        return False
    return True


class Scheduler:
    """Explodes a pipeline into task instances and runs them."""

    def __init__(
        self,
        spark: SparkSession,
        pipeline: Pipeline,
        context: RenderContext | None = None,
        workers: int | None = None,
        full_refresh: bool = False,
        retries: int | None = None,
        operators: dict[str, Callable[[SparkSession, Asset, RenderContext], Any]] | None = None,
        push_metadata: bool = False,
        environment=None,
        stream_mode: bool = False,
        apply_interval_modifiers: bool = True,
        sensor_mode: str = "",
        connection_limits: dict[str, int] | None = None,
    ):
        # stream_mode=True is `bruin run --stream <asset>`: the single
        # streaming asset is the intended target, so no exclusion
        self.stream_mode = stream_mode
        self.push_metadata = push_metadata
        # dev environment (bruin_spark.devenv.Environment): rendered SQL
        # gets existence-gated schema-prefix rewriting before execution
        self.environment = environment
        self.spark = spark
        self.pipeline = pipeline
        self.context = context or RenderContext(pipeline_name=pipeline.name)
        self.workers = workers or pipeline.concurrency or 16
        self.full_refresh = full_refresh
        # ref cmd/run.go:553-562: interval modifiers are opt-in on manual
        # runs and always ignored under --full-refresh
        self.apply_interval_modifiers = apply_interval_modifiers and not full_refresh
        if sensor_mode and sensor_mode not in ("wait", "once", "skip"):
            raise ValueError("sensor_mode must be one of wait|once|skip")
        self.sensor_mode = sensor_mode
        self.retries = pipeline.retries if retries is None else retries
        # per-connection concurrency limits (ref: scheduler.go:400-520
        # SetConnectionLimitsFromDetails + canAcquireConnectionSlots): a
        # pending task dispatches only when EVERY limited connection it
        # consumes has a free slot; usage counts queued+running tasks
        self.connection_limits: dict[str, int] = {}
        for cname, lim in (connection_limits or {}).items():
            if int(lim) <= 0:
                raise ValueError(
                    f'connection "{cname}" has concurrency limit {lim}, '
                    "must be greater than 0"
                )
            self.connection_limits[cname] = int(lim)
        self.operators = operators or {}
        self.instances: dict[str, TaskInstance] = {}
        self._check_batches: dict[str, dict[tuple[str, str], CheckResult]] = {}
        self._batch_lock = threading.Lock()
        # per-asset locks held across the fused check scan: sibling check
        # instances dispatched together must WAIT for the one scan, not
        # each run their own (the one-scan-per-asset design)
        self._check_scan_locks: dict[str, threading.Lock] = {}
        # user-supplied interval overrides are honored; everything else is
        # recomputed per run so a reused Pipeline (e.g. backfill chunks)
        # never inherits a previous run's bounds
        self._user_intervals: dict[str, dict[str, str]] = {
            a.name: {
                k: a.parameters[k]
                for k in ("_interval_start", "_interval_end")
                if k in a.parameters
            }
            for a in pipeline.assets
        }
        self._build_instances()

    # -- DAG construction ----------------------------------------------------

    def _build_instances(self) -> None:
        by_asset_main: dict[str, str] = {}
        for a in self.pipeline.assets:
            main = TaskInstance(id=a.name, asset=a, type=InstanceType.MAIN)
            self.instances[main.id] = main
            by_asset_main[a.name] = main.id

        for a in self.pipeline.assets:
            main = self.instances[a.name]
            # asset -> asset edges; symbolic upstreams are lineage-only
            # (ref: scheduler.go:810-817)
            for up in a.depends:
                if getattr(up, "mode", "full") == "symbolic":
                    continue
                if up.value in by_asset_main:
                    main.upstreams.append(up.value)
                    # blocking checks of the upstream gate this asset too
                    for inst in self._check_instances_of(up.value):
                        if inst.blocking:
                            main.upstreams.append(inst.id)
            # main -> its checks
            for col in a.columns:
                for check in col.checks:
                    inst = TaskInstance(
                        id=f"{a.name}:check:{col.name}:{check.name}",
                        asset=a,
                        type=InstanceType.COLUMN_CHECK,
                        column=col.name,
                        check=check.name,
                        blocking=check.blocking,
                        upstreams=[a.name],
                    )
                    self.instances[inst.id] = inst
            for custom in a.custom_checks:
                inst = TaskInstance(
                    id=f"{a.name}:custom:{custom.name}",
                    asset=a,
                    type=InstanceType.CUSTOM_CHECK,
                    check=custom.name,
                    blocking=custom.blocking,
                    upstreams=[a.name],
                )
                self.instances[inst.id] = inst

        # second pass: check instances were created after mains referenced
        # them; rebuild upstream lists that need blocking-check edges
        for a in self.pipeline.assets:
            main = self.instances[a.name]
            extra: list[str] = []
            for up in a.depends:
                if getattr(up, "mode", "full") == "symbolic":
                    continue
                for inst in self._check_instances_of(up.value):
                    if inst.blocking and inst.id not in main.upstreams:
                        extra.append(inst.id)
            main.upstreams.extend(extra)

    def _mods(self, asset: Asset) -> dict:
        return asset.interval_modifiers if self.apply_interval_modifiers else {}

    def _check_instances_of(self, asset_name: str) -> list[TaskInstance]:
        prefix_a = f"{asset_name}:check:"
        prefix_b = f"{asset_name}:custom:"
        return [
            i
            for i in self.instances.values()
            if i.id.startswith(prefix_a) or i.id.startswith(prefix_b)
        ]

    # -- filtering / state -----------------------------------------------------

    def apply_filters(
        self,
        only: list[str] | None = None,
        downstream: bool = False,
        tags: list[str] | None = None,
        exclude_tags: list[str] | None = None,
        select: str | None = None,
        only_types: list[str] | None = None,
    ) -> None:
        """Mark filtered-out assets SKIPPED (they satisfy readiness).

        ``select`` takes a full selector expression (``+name``, ``tag:x``,
        ``path:...``, comma intersection, ``@`` closure — see
        scheduler/selector.py, ref pkg/pipeline/selector.go).

        ``only_types`` restricts by INSTANCE kind (``main`` / ``checks``),
        the reference's ``--only`` flag (cmd/run.go): ``--only checks``
        re-validates existing tables without re-materializing (skipped
        mains satisfy readiness, so checks still run)."""
        if select:
            from bruin_spark.scheduler.selector import resolve_selector_assets

            matched = {a.name for a in resolve_selector_assets(select, self.pipeline)}
            only = sorted(matched | set(only or []))
        selected: set[str] | None = None
        if only:
            selected = set(only)
            if downstream:
                frontier = list(only)
                children: dict[str, list[str]] = {}
                for a in self.pipeline.assets:
                    for up in a.depends:
                        # symbolic edges are lineage-only: the scheduler
                        # creates no execution edge for them, so
                        # downstream expansion must not follow them
                        if getattr(up, "mode", "full") == "symbolic":
                            continue
                        children.setdefault(up.value, []).append(a.name)
                while frontier:
                    cur = frontier.pop()
                    for ch in children.get(cur, []):
                        if ch not in selected:
                            selected.add(ch)
                            frontier.append(ch)
        for a in self.pipeline.assets:
            if not _match_selector(a, selected, set(tags or []), set(exclude_tags or [])):
                self.instances[a.name].status = InstanceStatus.SKIPPED
                for inst in self._check_instances_of(a.name):
                    inst.status = InstanceStatus.SKIPPED
        if only_types:
            kinds = set(only_types)
            for inst in self.instances.values():
                kind = "main" if inst.type == InstanceType.MAIN else "checks"
                if kind not in kinds:
                    inst.status = InstanceStatus.SKIPPED

    def restore(self, state: PipelineState) -> None:
        """--continue: keep prior successes, re-run everything else."""
        for iid, status in state.statuses.items():
            inst = self.instances.get(iid)
            if inst is None:
                continue
            if status == InstanceStatus.SUCCEEDED.value:
                inst.status = InstanceStatus.SUCCEEDED
            elif status == InstanceStatus.SKIPPED.value:
                inst.status = InstanceStatus.SKIPPED

    def state(self) -> PipelineState:
        return PipelineState(
            run_id=self.context.run_id,
            statuses={iid: inst.status.value for iid, inst in self.instances.items()},
        )

    # -- execution ---------------------------------------------------------------

    def _ready(self, inst: TaskInstance) -> bool:
        if inst.status != InstanceStatus.PENDING:
            return False
        for up in inst.upstreams:
            u = self.instances[up]
            if u.status == InstanceStatus.SUCCEEDED:
                continue
            if u.status == InstanceStatus.SKIPPED:
                continue  # skipped counts as satisfied (scheduler.go:1127-1140)
            if u.status in (InstanceStatus.FAILED, InstanceStatus.UPSTREAM_FAILED):
                return False  # handled by propagation
            return False
        return True

    def _propagate_failures(self) -> None:
        changed = True
        while changed:
            changed = False
            for inst in self.instances.values():
                if inst.status != InstanceStatus.PENDING:
                    continue
                for up in inst.upstreams:
                    if self.instances[up].status in (
                        InstanceStatus.FAILED,
                        InstanceStatus.UPSTREAM_FAILED,
                    ):
                        inst.status = InstanceStatus.UPSTREAM_FAILED
                        changed = True
                        break

    def _skip_streaming_assets(self) -> int:
        """Keep continuously-running streaming assets out of a batch run:
        they never terminate, so including one would hang the pool.  They
        are launched with ``--stream <asset>`` instead (stream_mode).
        Ref: cmd/run.go:3147-3170 SkipStreamingAssets."""
        if self.stream_mode:
            return 0
        from bruin_spark.sources.uri import is_streaming_asset

        skipped = 0
        for a in self.pipeline.assets:
            if not is_streaming_asset(a):
                continue
            inst = self.instances[a.name]
            if inst.status is InstanceStatus.PENDING:
                inst.status = InstanceStatus.SKIPPED
                skipped += 1
            for check in self._check_instances_of(a.name):
                if check.status is InstanceStatus.PENDING:
                    check.status = InstanceStatus.SKIPPED
        return skipped

    def _skip_disabled_assets(self) -> int:
        """Assets whose ``enabled:`` resolves false are marked SKIPPED
        (checks too) before execution; skip satisfies downstreams
        (ref: cmd/run.go SkipDisabledAssets + TemplatedBool,
        pipeline.go:1302,1343-1358)."""
        from bruin_spark.model.pipeline import asset_enabled

        skipped = 0
        for a in self.pipeline.assets:
            try:
                if asset_enabled(a, self.context.variables):
                    continue
            except Exception as exc:  # noqa: BLE001 - bad template/value
                # an unresolvable enabled: template fails the ASSET with
                # a named error, not the whole run with a traceback
                # (ref: SkipDisabledAssets error wrapping, cmd/run.go)
                inst = self.instances[a.name]
                inst.status = InstanceStatus.FAILED
                inst.error = f"failed to resolve enabled for asset {a.name!r}: {exc}"
                continue
            inst = self.instances[a.name]
            if inst.status is InstanceStatus.PENDING:
                inst.status = InstanceStatus.SKIPPED
                skipped += 1
            for check in self._check_instances_of(a.name):
                if check.status is InstanceStatus.PENDING:
                    check.status = InstanceStatus.SKIPPED
        return skipped

    def run(self, state_path: str = "") -> RunResult:
        self._skip_streaming_assets()
        self._skip_disabled_assets()
        work: queue.Queue[TaskInstance | None] = queue.Queue()
        lock = threading.Lock()
        done_event = threading.Event()
        check_results: list[CheckResult] = []

        def enqueue_ready() -> None:
            self._propagate_failures()
            usage: dict[str, int] = {}
            if self.connection_limits:
                for i2 in self.instances.values():
                    if i2.status in (InstanceStatus.QUEUED, InstanceStatus.RUNNING):
                        for c in self._limited_connections(i2):
                            usage[c] = usage.get(c, 0) + 1
            for inst in self.instances.values():
                if self._ready(inst):
                    if self.connection_limits:
                        names = self._limited_connections(inst)
                        if any(
                            usage.get(c, 0) >= self.connection_limits[c]
                            for c in names
                        ):
                            continue  # stays PENDING; retried as slots free
                        for c in names:
                            usage[c] = usage.get(c, 0) + 1
                    inst.status = InstanceStatus.QUEUED
                    work.put(inst)
            statuses = [i.status for i in self.instances.values()]
            stuck = not any(
                s in (InstanceStatus.QUEUED, InstanceStatus.RUNNING) for s in statuses
            ) and any(s is InstanceStatus.PENDING for s in statuses)
            if stuck:
                # nothing running, nothing ready, work remaining: a
                # dependency cycle (or dangling upstream) would hang the
                # pool forever — fail those instances instead
                for inst in self.instances.values():
                    if inst.status is InstanceStatus.PENDING:
                        inst.status = InstanceStatus.FAILED
                        inst.error = (
                            "unrunnable: dependency cycle or unsatisfiable upstreams"
                        )
            if all(i.status in _TERMINAL for i in self.instances.values()):
                done_event.set()
                for _ in range(self.workers):
                    work.put(None)

        def worker() -> None:
            while not done_event.is_set():
                try:
                    inst = work.get(timeout=0.2)
                except queue.Empty:
                    continue
                if inst is None:
                    return
                inst.status = InstanceStatus.RUNNING
                t0 = time.perf_counter()
                try:
                    res = self._execute_with_timeout(inst)
                    if isinstance(res, CheckResult):
                        with lock:
                            check_results.append(res)
                        if not res.passed:
                            raise RuntimeError(res.error() or f"check failed: {inst.id}")
                    inst.status = InstanceStatus.SUCCEEDED
                except Exception as exc:  # noqa: BLE001 - task boundary
                    from bruin_spark.operators.sensors import SensorSkip

                    if isinstance(exc, SensorSkip):
                        inst.status = InstanceStatus.SKIPPED
                    else:
                        inst.attempts += 1
                        if isinstance(exc, AssetTimeout):
                            # never RETRY a timed-out attempt: the
                            # abandoned thread may still be alive and
                            # could submit new Spark jobs (cancelJobGroup
                            # only stops RUNNING jobs) — a retry would
                            # race it on the same target table
                            inst.status = InstanceStatus.FAILED
                            inst.error = str(exc)
                        elif inst.attempts <= self.retries:
                            # rerun_cooldown: wait before the re-attempt
                            # (ref: pipeline.go rerun_cooldown ->
                            # retries_delay; the reference parses it,
                            # we also honor it at run time)
                            delay = inst.asset.retries_delay_s()
                            if delay:
                                done_event.wait(delay)
                            inst.status = InstanceStatus.PENDING  # retry
                        else:
                            inst.status = InstanceStatus.FAILED
                            inst.error = (
                                f"{type(exc).__name__}: {exc}\n{traceback.format_exc(limit=3)}"
                            )
                finally:
                    inst.duration_s += time.perf_counter() - t0
                    with lock:
                        enqueue_ready()

        with lock:
            enqueue_ready()
        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.workers)]
        for t in threads:
            t.start()
        try:
            for t in threads:
                t.join()
        except KeyboardInterrupt:
            # graceful cancel (ref: scheduler.go
            # TestScheduler_RunReturnsPartialResultsOnCancellation): stop
            # dispatching, give in-flight tasks a short drain, return
            # partial results — pending work stays PENDING in the saved
            # state so --continue can resume it
            done_event.set()
            for _ in range(self.workers):
                work.put(None)
            deadline = time.monotonic() + 5.0
            for t in threads:
                t.join(max(0.0, deadline - time.monotonic()))

        if state_path:
            self.state().save(state_path)

        by_status: dict[InstanceStatus, list[str]] = {s: [] for s in InstanceStatus}
        for inst in self.instances.values():
            by_status[inst.status].append(inst.id)
        return RunResult(
            succeeded=sorted(by_status[InstanceStatus.SUCCEEDED]),
            failed=sorted(by_status[InstanceStatus.FAILED]),
            upstream_failed=sorted(by_status[InstanceStatus.UPSTREAM_FAILED]),
            skipped=sorted(by_status[InstanceStatus.SKIPPED]),
            check_results=check_results,
            warn_only_failed=sorted(
                i
                for i in by_status[InstanceStatus.FAILED]
                if self.instances[i].type is not InstanceType.MAIN
                and not self.instances[i].blocking
            ),
        )

    # -- connection slots ----------------------------------------------------

    def _primary_connection(self, asset: Asset) -> str:
        """Asset override, else the pipeline default for the asset's
        type/platform family (ref: pipeline.go GetConnectionNameForAsset)."""
        if asset.connection:
            return asset.connection
        dc = self.pipeline.default_connections
        fam = asset.type.split(".")[0] if asset.type else ""
        return dc.get(asset.type) or dc.get(fam) or ""

    def _task_connections(self, inst: TaskInstance) -> list[str]:
        """Connection names a task consumes (ref: pipeline.go
        GetAllConnectionNamesForAsset): main ingestr tasks hold BOTH the
        source and destination; python tasks hold secret connections plus
        their own/destination connection; checks hold only the primary."""
        a = inst.asset
        if inst.type is not InstanceType.MAIN:
            c = self._primary_connection(a)
            return [c] if c else []
        if a.type == "ingestr" or "source_connection" in a.parameters:
            src = str(a.parameters.get("source_connection", "") or "")
            dst = self._primary_connection(a)
            return [n for n in (dst, src) if n]
        if a.type == "python" or a.type.endswith(".python"):
            names = [str(sec.get("secret_key", "") or "") for sec in a.secrets]
            if a.connection:
                names.append(a.connection)
            elif a.materialization.type is not MaterializationType.NONE:
                names.append(self._primary_connection(a))
            return [n for n in names if n]
        c = self._primary_connection(a)
        return [c] if c else []

    def _limited_connections(self, inst: TaskInstance) -> list[str]:
        if not self.connection_limits:
            return []
        return [c for c in self._task_connections(inst) if c in self.connection_limits]

    # -- operators -----------------------------------------------------------------

    def _execute_with_timeout(self, inst: TaskInstance):
        """Enforce the asset's per-attempt ``timeout:`` (Go duration
        string; pipeline ``default: timeout:`` inherits — ref
        test-pipelines/asset-timeout). The attempt runs in a watcher
        thread; on expiry its Spark job group is cancelled (the JVM-side
        work actually stops) and the attempt fails with the reference's
        message. A pure-Python busy attempt cannot be killed in-process
        — its thread is abandoned as a daemon, which matches the
        reference's behavior of abandoning the asset process."""
        timeout = inst.asset.timeout_s()
        if not timeout:
            return self._execute(inst)
        import threading as _threading

        box: dict = {}
        group = f"bruin-timeout-{inst.id}"

        def target() -> None:
            try:
                self.spark.sparkContext.setJobGroup(group, inst.id, True)
                box["res"] = self._execute(inst)
            except BaseException as exc:  # noqa: BLE001 - re-raised below
                box["exc"] = exc

        t = _threading.Thread(target=target, daemon=True)
        t.start()
        t.join(timeout)
        if t.is_alive():
            try:
                self.spark.sparkContext.cancelJobGroup(group)
            except Exception:  # noqa: BLE001 - cancellation is best-effort
                pass
            raise AssetTimeout(
                f'asset "{inst.asset.name}" timed out after {inst.asset.timeout}'
            )
        if "exc" in box:
            raise box["exc"]
        return box.get("res")

    def _execute(self, inst: TaskInstance):
        if inst.type == InstanceType.MAIN:
            return self._run_main(inst.asset)
        return self._run_check(inst)

    def _run_main(self, asset: Asset):
        self.spark.sparkContext.setJobDescription(f"{self.pipeline.name}:{asset.name}")
        # tier -> fair-scheduler pool: lets high-tier assets' Spark jobs
        # get scheduling weight (connection-slot analog, scheduler.go:1016)
        self.spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", asset.tier or None
        )
        op = self.operators.get(asset.type)
        if op is not None:
            return op(self.spark, asset, self.context)
        # platform collapse: `<platform>.sql` from any of the reference's
        # ~40 platforms executes on the one Spark backend (SURVEY §1.1)
        if asset.type in ("spark.sql", "sql") or asset.type.endswith(".sql"):
            # interval modifiers are applied exactly ONCE, inside
            # render_asset_query; `ctx` here stays unshifted and the
            # time_interval bounds are derived from the same single
            # shift so the delete window always matches the rendered SQL
            ctx = self.context.with_modifiers({})
            ctx.this = asset.name
            ctx.full_refresh = self.full_refresh
            if not ctx.macros and self.pipeline.macros:
                ctx.macros = self.pipeline.macros
            from bruin_spark.model.pipeline import Strategy

            interval: tuple[str, str] | None = None
            if asset.materialization.strategy == Strategy.TIME_INTERVAL:
                # delete window = the SAME single-shifted interval the SQL
                # renders with; passed to the Materializer rather than
                # written into the shared Asset (a reused Pipeline — e.g.
                # backfill chunks — must not inherit a prior run's bounds)
                fmt = (
                    "%Y-%m-%d"
                    if asset.materialization.time_granularity == "date"
                    else "%Y-%m-%d %H:%M:%S"
                )
                shifted = ctx.with_modifiers(self._mods(asset))
                user = self._user_intervals.get(asset.name, {})
                interval = (
                    user.get("_interval_start", shifted.start.strftime(fmt)),
                    user.get("_interval_end", shifted.end.strftime(fmt)),
                )
            rendered = render_asset_query(asset, ctx)
            if self.environment is not None:
                from bruin_spark.devenv import modify_query_for_dev

                rendered = modify_query_for_dev(
                    self.spark, asset.name, rendered, self.environment
                )
            mat = Materializer(self.spark, full_refresh=self.full_refresh, interval=interval)
            for pre in asset.hooks.get("pre", []):
                self.spark.sql(pre)
            mat.run(asset, rendered)
            for post in asset.hooks.get("post", []):
                self.spark.sql(post)
            if self.push_metadata:
                from bruin_spark.operators.metadata import push_metadata

                push_metadata(self.spark, asset)
            return None
        if asset.type in (
            "spark.sensor.query", "spark.sensor.table", "spark.sensor.path"
        ) or asset.type.endswith((".sensor.query", ".sensor.table")):
            from bruin_spark.model.pipeline import parse_duration_s
            from bruin_spark.operators import sensors

            kind = asset.type.rsplit(".", 1)[1]
            # sensor parameters are Jinja-rendered against the asset's
            # context (a sensor query may reference {{ start_date }} —
            # ref cmd/const.go renderAssetParamsMutator)
            from bruin_spark.render.jinja import render_parameters

            params = render_parameters(asset, self.context)
            kwargs = dict(
                # a run-level sensor_mode overrides every sensor's own
                # mode (ref cmd/run.go:607 --sensor-mode)
                mode=self.sensor_mode or params.get("mode", "wait"),
                poke_interval_s=float(params.get("poke_interval", 30)),
                # accepts bare seconds or Go duration strings ("3s")
                timeout_s=(
                    parse_duration_s(str(params["timeout"]))
                    if params.get("timeout")
                    else None
                ),
            )
            if kind == "query":
                return sensors.query_sensor(self.spark, params["query"], **kwargs)
            if kind == "table":
                return sensors.table_sensor(self.spark, params["table"], **kwargs)
            return sensors.path_sensor(self.spark, params["path"], **kwargs)
        if asset.type in ("spark.seed", "seed") or asset.type.endswith(".seed"):
            from bruin_spark.operators.assets_ops import run_seed

            return run_seed(self.spark, asset, self.context)
        if asset.type == "python":
            from bruin_spark.operators.assets_ops import run_python_asset

            ctx = self.context.with_modifiers(self._mods(asset))
            ctx.full_refresh = self.full_refresh
            return run_python_asset(self.spark, asset, ctx)
        if asset.type == "ingestr":
            from bruin_spark.sources.ingest import run_ingestr_asset
            from bruin_spark.sources.uri import is_streaming_asset

            if self.stream_mode and is_streaming_asset(asset):
                # `run --stream <asset>`: execute the streaming query
                # itself (availableNow drains the backlog then stops —
                # the managed never-terminating form belongs to a
                # supervisor, not a batch scheduler run)
                from bruin_spark.streaming.streaming import run_streaming_asset

                return run_streaming_asset(self.spark, asset, self.pipeline)
            # streaming ingestr assets were routed out of the batch DAG
            # by _skip_streaming_assets; only one-shot loads reach here.
            # Parameters render against the asset's context (interval
            # templates in source URIs / table names) on a COPY — the
            # shared Asset must not carry one run's rendered values.
            import dataclasses as _dc

            from bruin_spark.render.jinja import render_parameters

            rendered = _dc.replace(
                asset, parameters=render_parameters(asset, self.context)
            )
            return run_ingestr_asset(self.spark, rendered, self.pipeline)
        if asset.type == "r":
            from bruin_spark.operators.r_ops import run_r_asset

            ctx = self.context.with_modifiers(self._mods(asset))
            ctx.full_refresh = self.full_refresh
            return run_r_asset(self.spark, asset, ctx)
        from bruin_spark.lint.rules import _BI_PLACEHOLDER_TYPES

        if (
            asset.type.endswith(".source")
            or asset.type in ("noop", "metadata", "empty")
            or asset.type in _BI_PLACEHOLDER_TYPES
        ):
            return None  # NoOp main; checks still run (executor/defaults.go:10-95)
        raise RuntimeError(f"no operator for asset type: {asset.type}")

    def _run_check(self, inst: TaskInstance) -> CheckResult:
        batch = self._check_batch(inst.asset)
        if inst.type == InstanceType.COLUMN_CHECK:
            key = (inst.column, inst.check)
        else:
            key = ("", inst.check)
        res = batch.get(key)
        if res is None:
            raise RuntimeError(f"check result missing for {inst.id}")
        return res

    def _check_batch(self, asset: Asset) -> dict[tuple[str, str], CheckResult]:
        """Run the asset's fused check scan once; memoize per asset.

        The per-asset scan lock is held ACROSS the scan: sibling check
        instances dispatched together block on it and then read the
        memoized result — without it, N workers each miss the cache and
        run N full scans, defeating the one-scan-per-asset design."""
        with self._batch_lock:
            scan_lock = self._check_scan_locks.setdefault(
                asset.name, threading.Lock()
            )
        with scan_lock:
            return self._check_batch_locked(asset)

    def _check_batch_locked(self, asset: Asset) -> dict[tuple[str, str], CheckResult]:
        with self._batch_lock:
            cached = self._check_batches.get(asset.name)
            if cached is not None:
                return cached
        if any(m in c.query for c in asset.custom_checks for m in _REF_JINJA):
            # custom-check SQL is Jinja-rendered with the run context
            # (ref: pkg/ansisql/checks.go:283-315)
            import dataclasses

            from bruin_spark.render.jinja import render_sql

            ctx = self.context.with_modifiers(self._mods(asset))
            ctx.this = asset.name
            asset = dataclasses.replace(
                asset,
                custom_checks=[
                    dataclasses.replace(c, query=render_sql(c.query, ctx))
                    for c in asset.custom_checks
                ],
            )
        results = run_asset_checks(self.spark, asset, raise_on_failure=False)
        batch: dict[tuple[str, str], CheckResult] = {}
        for r in results:
            batch[(r.column or "", r.check)] = r
        with self._batch_lock:
            self._check_batches[asset.name] = batch
        return batch


def run_pipeline(
    spark: SparkSession,
    pipeline: Pipeline,
    context: RenderContext | None = None,
    state_path: str = "",
    continue_from: str = "",
    **kwargs,
) -> RunResult:
    """One-call entry: schedule + execute a pipeline, optionally resuming."""
    sched = Scheduler(spark, pipeline, context=context, **kwargs)
    if continue_from and os.path.exists(continue_from):
        sched.restore(PipelineState.load(continue_from))
    return sched.run(state_path=state_path)


def backfill(
    spark: SparkSession,
    pipeline: Pipeline,
    start,
    end,
    granularity: str = "day",
    state_dir: str = "",
    **kwargs,
) -> list[RunResult]:
    """Catchup/backfill: split [start, end) into schedule-interval chunks
    and run the pipeline once per chunk, oldest first
    (ref: scheduler.go:126-129 --backfill-id/--backfill-total).

    Each chunk gets its own RenderContext window and (optionally) its own
    state file, so a failed chunk can be resumed with --continue without
    disturbing completed ones.
    """
    from datetime import timedelta

    step = {
        "hour": timedelta(hours=1),
        "day": timedelta(days=1),
        "week": timedelta(weeks=1),
        "month": timedelta(days=30),
    }.get(granularity)
    if step is None:
        raise ValueError(f"unknown granularity: {granularity}")

    results: list[RunResult] = []
    cur = start
    i = 0
    while cur < end:
        nxt = min(cur + step, end)
        ctx = RenderContext(
            start=cur,
            end=nxt,
            run_id=f"backfill_{i}_{cur:%Y%m%dT%H%M}",
            pipeline_name=pipeline.name,
        )
        state_path = (
            os.path.join(state_dir, f"state_{i:05d}.json") if state_dir else ""
        )
        res = run_pipeline(spark, pipeline, context=ctx, state_path=state_path, **kwargs)
        results.append(res)
        if not res.ok:
            break  # stop the backfill at the first failed interval
        cur, i = nxt, i + 1
    return results
