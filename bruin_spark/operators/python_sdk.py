"""In-process `bruin` SDK for Python assets.

The reference ships a ``bruin-sdk`` PyPI package that Python assets
import (``from bruin import query, context, get_connection`` —
documented contract: /root/reference/docs/assets/python-sdk.md).  This
engine executes Python assets in-process, so the same import surface is
provided by installing a synthetic ``bruin`` module into
``sys.modules`` around each asset run (operators/assets_ops.py).

Concurrency: the scheduler runs Python assets on WORKER THREADS, and
``sys.modules`` / ``os.environ`` are process-global — so the installed
module is a process-wide SINGLETON whose functions resolve the ACTIVE
PER-THREAD state (SparkSession, allowed connections, BRUIN_* values) at
call time.  Each asset's ``bruin_module_scope`` pushes its state onto a
``threading.local`` stack; two assets running concurrently each see
their own context even though they share one module object.  The
module is installed when the first scope enters and removed when the
last exits (refcounted; a user-shadowed pre-existing ``bruin`` module
is saved and restored).  Inside a scope, ``context.*`` reads ONLY the
asset's own overlay — never the process env, whose BRUIN_* keys may
belong to a concurrent asset; outside any scope it reads
``os.environ`` (REPL / plain import).  Threads the ASSET ITSELF spawns
(a ThreadPoolExecutor over query()) resolve to the single active asset
when only one is running; with several concurrent assets a spawned
thread is unattributable and SDK calls from it raise.  The env vars
are still exported for scripts that read them directly, with
last-writer-wins semantics under concurrency (the reference avoids
this by running each asset in a separate OS process).

Contract parity (python-sdk.md "API Reference"):

- ``context.*`` properties read the BRUIN_* values AT ACCESS TIME and
  return ``None`` when missing (``is_full_refresh`` → False, ``vars``
  → {}).  Dates parse to ``datetime.date``, datetimes to naive
  ``datetime``, timestamps to tz-aware ``datetime``; variable TYPES
  survive the BRUIN_VARS JSON round-trip.
- ``query(sql, connection=None)`` returns a pandas DataFrame for
  data-returning statements (the reference's IsLikelyResultQuery
  classifier: SELECT / WITH / SHOW / DESCRIBE / DESC / EXPLAIN /
  PRAGMA first keyword, or a top-level RETURNING) and ``None`` for
  DDL/DML — executed either way.  Failures raise ``QueryError``.
- ``get_connection(name)`` / ``query(connection=...)`` accept only the
  asset's declared connections (its ``connection:`` field and
  ``secrets:`` keys — python-sdk.md "Asset Setup"); anything else
  raises ``ConnectionNotFoundError``.  The returned ``Connection``'s
  lazy ``client`` is this engine's SparkSession — the single-dialect
  analog of the SDK's per-warehouse clients.
- ``bruin.exceptions`` exposes the documented hierarchy
  (BruinError base; ConnectionNotFoundError / ConnectionParseError /
  ConnectionTypeError / QueryError).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import types
from datetime import date, datetime


class BruinError(Exception):
    """Base class for SDK errors (python-sdk.md Exceptions)."""


class ConnectionNotFoundError(BruinError):
    pass


class ConnectionParseError(BruinError):
    pass


class ConnectionTypeError(BruinError):
    pass


class QueryError(BruinError):
    pass


# -- per-thread active-asset state ---------------------------------------------

_state = threading.local()  # .stack: list[(spark, known, env_overlay, pre_idents)]
#: every entry active ANYWHERE in the process, for the spawned-thread
#: fallback below (guarded by _install_lock)
_all_active: list = []


def _stack() -> list:
    st = getattr(_state, "stack", None)
    if st is None:
        st = _state.stack = []
    return st


def _resolve():
    """The calling thread's asset entry, or None.

    An asset may spawn its OWN worker threads (ThreadPoolExecutor over
    query()) — those threads have an empty thread-local stack, so when
    exactly ONE asset is active process-wide AND the calling thread
    started AFTER that asset's scope opened (its ident is not in the
    scope's entry-time snapshot of live threads), the entry is the
    unambiguous answer.  The snapshot closes the orphan hole: a stray
    thread left over from a FINISHED asset predates the next scope and
    is never attributed to it (it raises instead of silently
    inheriting the wrong connections/context), and the main/REPL
    thread keeps its outside-any-scope behavior.  With several
    concurrent assets a spawned thread cannot be attributed at all."""
    st = _stack()
    if st:
        return st[-1]
    with _install_lock:
        if len(_all_active) == 1:
            entry = _all_active[0]
            if threading.get_ident() not in entry[3]:
                return entry
    return None


def _active():
    entry = _resolve()
    if entry is None:
        raise BruinError(
            "the bruin SDK is only available while a Python asset is "
            "running (no active asset on this thread; with several "
            "assets running concurrently, call the SDK from the "
            "asset's main thread)"
        )
    return entry


def _env_get(key: str) -> str | None:
    """The running asset's own BRUIN_* value.  Inside an active scope
    a NON-EMPTY overlay is AUTHORITATIVE — never fall through to the
    process env, whose BRUIN_* keys may belong to a concurrent asset
    (an asset without a `connection:` must see None, not a neighbor's
    BRUIN_CONNECTION).  An EMPTY overlay means the asset ran without a
    RenderContext — nothing engine-set to protect, so externally
    exported BRUIN_* vars stay readable.  Outside any scope (REPL /
    plain import), read the process env."""
    entry = _resolve()
    if entry is not None and entry[2]:
        return entry[2].get(key) or None
    return os.environ.get(key) or None


def _parse_date(v: str | None) -> date | None:
    if not v:
        return None
    return datetime.strptime(v[:10], "%Y-%m-%d").date()


def _parse_datetime(v: str | None) -> datetime | None:
    if not v:
        return None
    return datetime.strptime(v[:19], "%Y-%m-%dT%H:%M:%S")


def _parse_timestamp(v: str | None) -> datetime | None:
    if not v:
        return None
    s = v.replace("Z", "+00:00")
    for fmt in ("%Y-%m-%dT%H:%M:%S.%f%z", "%Y-%m-%dT%H:%M:%S%z"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ConnectionParseError(f"unparseable timestamp {v!r}")


class _Context:
    """Lazy state-backed run context (python-sdk.md `context` table)."""

    @property
    def start_date(self):
        return _parse_date(_env_get("BRUIN_START_DATE"))

    @property
    def start_datetime(self):
        return _parse_datetime(_env_get("BRUIN_START_DATETIME"))

    @property
    def start_timestamp(self):
        return _parse_timestamp(_env_get("BRUIN_START_TIMESTAMP"))

    @property
    def end_date(self):
        return _parse_date(_env_get("BRUIN_END_DATE"))

    @property
    def end_datetime(self):
        return _parse_datetime(_env_get("BRUIN_END_DATETIME"))

    @property
    def end_timestamp(self):
        return _parse_timestamp(_env_get("BRUIN_END_TIMESTAMP"))

    @property
    def execution_date(self):
        return _parse_date(_env_get("BRUIN_EXECUTION_DATE"))

    @property
    def execution_datetime(self):
        return _parse_datetime(_env_get("BRUIN_EXECUTION_DATETIME"))

    @property
    def execution_timestamp(self):
        return _parse_timestamp(_env_get("BRUIN_EXECUTION_TIMESTAMP"))

    @property
    def run_id(self):
        return _env_get("BRUIN_RUN_ID")

    @property
    def pipeline(self):
        return _env_get("BRUIN_PIPELINE")

    @property
    def asset_name(self):
        return _env_get("BRUIN_ASSET")

    @property
    def connection(self):
        return _env_get("BRUIN_CONNECTION")

    @property
    def is_full_refresh(self) -> bool:
        return (_env_get("BRUIN_FULL_REFRESH") or "") not in ("", "0", "false")

    @property
    def commit_hash(self):
        return _env_get("BRUIN_COMMIT_HASH")

    @property
    def vars(self) -> dict:
        raw = _env_get("BRUIN_VARS")
        if not raw:
            return {}
        try:
            return json.loads(raw)
        except json.JSONDecodeError as exc:
            raise ConnectionParseError(f"invalid BRUIN_VARS JSON: {exc}") from exc


def _data_returning(sql: str) -> bool:
    """Statements whose results come back as a DataFrame (python-sdk.md
    `query` returns) — the reference's IsLikelyResultQuery classifier
    (pkg/query/statement.go:9-18), shared with the parser services."""
    from bruin_spark.parser.sqlutil import is_likely_result_query

    return is_likely_result_query(sql or "")


class Connection:
    """Single-engine connection: ``client`` is the SparkSession."""

    def __init__(self, name: str, spark):
        self.name = name
        self.type = "spark"
        self.raw: dict = {"name": name, "type": "spark"}
        self._spark = spark

    @property
    def client(self):
        return self._spark

    def query(self, sql: str):
        return _run_query(self._spark, sql)


def _run_query(spark, sql: str):
    try:
        df = spark.sql(sql)
        if _data_returning(sql):
            return df.toPandas()
        df.collect()  # force DDL/DML side effects
        return None
    except BruinError:
        raise
    except Exception as exc:
        raise QueryError(str(exc)) from exc


def _check_connection(name: str, known: set[str]) -> None:
    if name not in known:
        raise ConnectionNotFoundError(
            f"connection {name!r} is not available to this asset "
            f"(declare it under `secrets:` or as the asset connection)"
        )


def _sdk_query(sql: str, connection: str | None = None):
    spark, known, _env, _pre = _active()
    if connection is not None:
        _check_connection(connection, known)
    return _run_query(spark, sql)


def _sdk_get_connection(name: str) -> Connection:
    spark, known, _env, _pre = _active()
    _check_connection(name, known)
    return Connection(name, spark)


def _build_singleton() -> types.ModuleType:
    exceptions = types.ModuleType("bruin.exceptions")
    exceptions.BruinError = BruinError
    exceptions.ConnectionNotFoundError = ConnectionNotFoundError
    exceptions.ConnectionParseError = ConnectionParseError
    exceptions.ConnectionTypeError = ConnectionTypeError
    exceptions.QueryError = QueryError

    mod = types.ModuleType("bruin")
    mod.query = _sdk_query
    mod.get_connection = _sdk_get_connection
    mod.context = _Context()
    mod.exceptions = exceptions
    mod.Connection = Connection
    return mod


_singleton: types.ModuleType | None = None
_install_lock = threading.Lock()
_scope_count = 0
_shadowed: dict = {}


class bruin_module_scope:
    """Install the synthetic ``bruin`` module for the duration of an
    asset exec.  Refcounted and thread-state-scoped: concurrent assets
    share the singleton module but resolve their OWN SparkSession /
    connections / BRUIN_* values; a pre-existing user ``bruin`` module
    is saved when the first scope enters and restored when the last
    exits."""

    def __init__(self, spark, known_connections: set[str] | None = None,
                 env: dict | None = None):
        # the 4th element is filled at __enter__: idents of threads
        # alive BEFORE the scope opened (see _resolve)
        self._entry = (spark, set(known_connections or ()), dict(env or {}), set())

    def __enter__(self):
        global _singleton, _scope_count
        self._entry[3].clear()
        self._entry[3].update(t.ident for t in threading.enumerate() if t.ident)
        with _install_lock:
            if _singleton is None:
                _singleton = _build_singleton()
            if _scope_count == 0:
                for name in ("bruin", "bruin.exceptions"):
                    _shadowed[name] = sys.modules.get(name)
                sys.modules["bruin"] = _singleton
                sys.modules["bruin.exceptions"] = _singleton.exceptions
            _scope_count += 1
            _all_active.append(self._entry)
        _stack().append(self._entry)
        return _singleton

    def __exit__(self, *exc):
        global _scope_count
        st = _stack()
        if st and st[-1] is self._entry:
            st.pop()
        with _install_lock:
            _scope_count -= 1
            if self._entry in _all_active:
                _all_active.remove(self._entry)
            if _scope_count == 0:
                for name, prev in _shadowed.items():
                    if prev is None:
                        sys.modules.pop(name, None)
                    else:
                        sys.modules[name] = prev
                _shadowed.clear()
        return False
