"""Seed and Python asset operators.

- **Seed** (ref: pkg/spark/seed.go:34-183): load a CSV/JSON/parquet file
  shipped with the pipeline into a table, schema driven by the asset's
  declared columns (never inferred when declared — the reference derives
  Arrow types from declared columns the same way).
- **Python asset** (ref: pkg/python/uv.go:371-530, operator.go:80-199):
  the asset file is a Python script. With a materialization, it must
  expose ``materialize()`` returning a pandas DataFrame, a pyarrow
  Table, a Spark DataFrame, or a generator of the first two; the result
  is written with the asset's §2.2 strategy. The script sees the
  BRUIN_* context env vars. We run in-process with the live
  SparkSession (the reference isolates under uv + ships Arrow IPC;
  in-process Spark makes the Arrow hop unnecessary).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from bruin_spark.mat.executor import Materializer
from bruin_spark.model.pipeline import Asset, Materialization, MaterializationType, Strategy
from bruin_spark.render.jinja import RenderContext

#: python-asset strategies supported by the reference's ingestr bridge
#: (pkg/python/materialization_mapping.go:24-30)
PYTHON_STRATEGIES = {
    Strategy.CREATE_REPLACE,
    Strategy.APPEND,
    Strategy.MERGE,
    Strategy.DELETE_INSERT,
}


def declared_schema(asset: Asset) -> str | None:
    """Spark DDL schema string from declared columns ('' columns -> None)."""
    if not asset.columns:
        return None
    return ", ".join(f"{c.name} {c.sql_type()}" for c in asset.columns)


def run_seed(spark: SparkSession, asset: Asset, ctx: RenderContext | None = None) -> None:
    """Load the seed file into the asset's table (create+replace default)."""
    rel = asset.parameters.get("path") or asset.parameters.get("file") or ""
    if not rel:
        raise ValueError(f"seed asset {asset.name}: parameters.path is required")
    base = os.path.dirname(asset.file_path) if asset.file_path else "."
    path = rel if os.path.isabs(rel) else os.path.join(base, rel)
    ext = os.path.splitext(path)[1].lower()
    schema = declared_schema(asset)

    if ext == ".csv":
        reader = spark.read.option("header", "true")
        df = reader.csv(path, schema=schema) if schema else reader.option(
            "inferSchema", "true"
        ).csv(path)
    elif ext in (".json", ".jsonl", ".ndjson"):
        df = spark.read.json(path, schema=schema) if schema else spark.read.json(path)
    elif ext == ".parquet":
        df = spark.read.parquet(path)
        if schema:
            cols = [f"CAST({c.name} AS {c.sql_type()}) AS {c.name}" for c in asset.columns]
            df = df.selectExpr(*cols)
    else:
        raise ValueError(f"seed asset {asset.name}: unsupported file type {ext}")

    _write_df(spark, asset, df)


def run_python_asset(
    spark: SparkSession, asset: Asset, ctx: RenderContext | None = None
) -> Any:
    """Execute the asset's Python script; materialize() output if declared."""
    src = asset.query
    if not src and asset.file_path:
        with open(asset.file_path) as f:
            src = f.read()
    env = _context_env(asset, ctx)
    _export_env(env)
    from bruin_spark.operators.python_sdk import bruin_module_scope

    # connections the SDK's get_connection()/query(connection=) accept:
    # the asset's default plus its injected secret keys
    # (docs/assets/python-sdk.md "Asset Setup")
    known = {s.get("secret_key") for s in asset.secrets if s.get("secret_key")}
    if getattr(asset, "connection", None):
        known.add(asset.connection)
    try:
        ns: dict[str, Any] = {"__name__": f"bruin_asset_{asset.name}", "spark": spark}
        # the scope covers the materialize() CALL too — a late
        # `import bruin` inside materialize() must still resolve.  env
        # rides along as the thread's own overlay: the SDK context
        # reads IT, not the process-global os.environ, so concurrent
        # assets on scheduler worker threads never see each other's
        # BRUIN_* values
        with bruin_module_scope(spark, known, env):
            exec(compile(src, asset.file_path or asset.name, "exec"), ns)  # noqa: S102
            if asset.materialization.type == MaterializationType.NONE:
                return ns.get("result")
            fn = ns.get("materialize")
            if fn is None:
                raise ValueError(
                    f"python asset {asset.name}: materialization declared but no materialize()"
                )
            strategy = asset.materialization.strategy or Strategy.CREATE_REPLACE
            if strategy not in PYTHON_STRATEGIES:
                raise ValueError(
                    f"python asset {asset.name}: strategy {strategy.value} not supported"
                )
            df = _to_spark_df(spark, fn())
        if df is None:
            print("materialize() returned None, skipping materialization")
            return None
        _write_df(spark, asset, df)
        return None
    finally:
        _restore_env(env)


# -- refcounted BRUIN_* export -----------------------------------------------
# os.environ is process-global while assets run on scheduler worker
# threads: a naive per-run snapshot/restore would let a FINISHING asset
# delete or clobber the keys a still-running asset just exported.  Each
# key carries a depth count; the pre-any-run original is restored only
# when the LAST exporter leaves.  Concurrent values still last-writer-
# win (unavoidable for a process-global env — the SDK context reads the
# per-thread overlay instead), but keys are never torn down mid-run.

import threading as _threading

_ENV_LOCK = _threading.Lock()
_ENV_DEPTH: dict[str, int] = {}
_ENV_ORIGINAL: dict[str, str | None] = {}


def _export_env(env: dict[str, str]) -> None:
    with _ENV_LOCK:
        for k, v in env.items():
            if _ENV_DEPTH.get(k, 0) == 0:
                _ENV_ORIGINAL[k] = os.environ.get(k)
            _ENV_DEPTH[k] = _ENV_DEPTH.get(k, 0) + 1
            os.environ[k] = v


def _restore_env(env: dict[str, str]) -> None:
    with _ENV_LOCK:
        for k in env:
            depth = _ENV_DEPTH.get(k, 0) - 1
            if depth <= 0:
                _ENV_DEPTH.pop(k, None)
                original = _ENV_ORIGINAL.pop(k, None)
                if original is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = original
            else:
                _ENV_DEPTH[k] = depth


def _context_env(asset: Asset, ctx: RenderContext | None) -> dict[str, str]:
    """BRUIN_* env contract (ref: pkg/jinja/jinja.go:96-119) + secret
    injection (ref: pkg/python/operator.go:144-182 — secrets resolve from
    the secrets backend, here the parent process environment, and are
    injected under ``inject_as`` or their own key)."""
    if ctx is None:
        return {}
    import json as _json

    def ts(dt) -> str:
        # Go layout '2006-01-02T15:04:05.000000Z07:00' (jinja.go:100)
        base = dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        off = dt.strftime("%z")
        if not off or off in ("+0000", "-0000"):
            return base + "Z"
        return f"{base}{off[:3]}:{off[3:]}"

    def fam(prefix, dt) -> dict[str, str]:
        return {
            f"BRUIN_{prefix}_DATE": dt.strftime("%Y-%m-%d"),
            f"BRUIN_{prefix}_DATETIME": dt.strftime("%Y-%m-%dT%H:%M:%S"),
            f"BRUIN_{prefix}_TIMESTAMP": ts(dt),
        }

    env = {
        **fam("START", ctx.start),
        **fam("END", ctx.end),
        # execution == start, same convention as RenderContext.to_jinja
        **fam("EXECUTION", ctx.start),
        "BRUIN_RUN_ID": ctx.run_id,
        "BRUIN_PIPELINE": ctx.pipeline_name,
        "BRUIN_FULL_REFRESH": "1" if ctx.full_refresh else "",
        "BRUIN_THIS": asset.name,
        "BRUIN_ASSET": asset.name,
        "BRUIN_COMMIT_HASH": ctx.commit_hash or "",
        "BRUIN_VARS": _json.dumps(ctx.variables or {}),
        "PYTHONUNBUFFERED": "1",
    }
    if getattr(asset, "connection", None):
        env["BRUIN_CONNECTION"] = asset.connection
    for s in asset.secrets:
        key = s.get("secret_key", "")
        if not key:
            continue
        val = os.environ.get(key)
        if val is None:
            raise ValueError(f"there's no secret with the name {key!r}")
        env[s.get("injected_key") or s.get("inject_as") or key] = val
    return env


def _chunk_frame(chunk: Any):
    """Normalize ONE materialize() chunk to a pandas DataFrame.

    The protocol accepts pandas/pyarrow/polars frames, single row dicts,
    and lists of row dicts (ref: pkg/python/uv.go:371-530 — ingestr
    normalizes the same shapes from the Arrow IPC stream). Returns None
    for empty chunks.
    """
    import pandas as pd

    try:
        import pyarrow as pa

        if isinstance(chunk, pa.Table):
            return chunk.to_pandas()
    except ImportError:
        pass
    if isinstance(chunk, pd.DataFrame):
        return chunk
    # polars (duck-typed; the lib isn't a dependency here)
    if type(chunk).__module__.split(".")[0] == "polars" and hasattr(chunk, "to_pandas"):
        return chunk.to_pandas()
    if isinstance(chunk, dict):
        return pd.DataFrame([chunk])
    if isinstance(chunk, list):
        if not chunk:
            return None
        return pd.DataFrame(chunk)
    raise TypeError(
        f"materialize() must return/yield pandas/pyarrow/polars data, "
        f"dicts, or lists of dicts; got {type(chunk).__name__}"
    )


def _to_spark_df(spark: SparkSession, result: Any) -> DataFrame | None:
    """Normalize a materialize() result to a Spark DataFrame.

    Returns None when there is nothing to write (None return, empty
    list, generator that yields nothing) — the reference skips the
    materialization and the asset still succeeds
    ('materialize() returned None, skipping materialization')."""
    import pandas as pd

    if result is None:
        return None
    if isinstance(result, DataFrame):
        return result
    if hasattr(result, "__iter__") and not isinstance(
        result, (str, bytes, dict, list, pd.DataFrame)
    ) and type(result).__module__.split(".")[0] not in ("pyarrow", "polars"):
        frames = [f for f in (_chunk_frame(c) for c in result) if f is not None]
        if not frames:
            return None
        # mixed-batch schema reconciliation: a null-only column in an
        # early dict chunk takes its type from a later typed chunk
        # (table_after_dict / nullable_dicts fixtures); object columns
        # left over from None-buffering re-infer after the concat
        merged = pd.concat(frames, ignore_index=True)
        merged = merged.infer_objects()
        return spark.createDataFrame(merged)
    frame = _chunk_frame(result)
    if frame is None or len(frame.columns) == 0:
        return None
    return spark.createDataFrame(frame)


def _write_df(spark: SparkSession, asset: Asset, df: DataFrame) -> None:
    """Write a DataFrame with the asset's materialization strategy by
    routing through the SQL materializer over a temp view."""
    if asset.materialization.type == MaterializationType.NONE:
        asset = Asset(
            name=asset.name,
            type=asset.type,
            materialization=Materialization(
                type=MaterializationType.TABLE, strategy=Strategy.CREATE_REPLACE
            ),
            columns=asset.columns,
            file_path=asset.file_path,
            parameters=asset.parameters,
        )
    view = f"__bruin_src_{asset.name.replace('.', '_')}"
    df.createOrReplaceTempView(view)
    try:
        Materializer(spark).run(asset, f"SELECT * FROM {view}")
    finally:
        spark.catalog.dropTempView(view)
