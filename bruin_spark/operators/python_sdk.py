"""In-process `bruin` SDK for Python assets.

The reference ships a ``bruin-sdk`` PyPI package that Python assets
import (``from bruin import query, context, get_connection`` —
documented contract: /root/reference/docs/assets/python-sdk.md).  This
engine executes Python assets in-process, so the same import surface is
provided by injecting a synthetic ``bruin`` module into ``sys.modules``
for the duration of the asset's exec (operators/assets_ops.py).

Contract parity (python-sdk.md "API Reference"):

- ``context.*`` properties read the ``BRUIN_*`` env vars AT ACCESS TIME
  and return ``None`` when the var is missing (``is_full_refresh`` →
  False, ``vars`` → {}).  Dates parse to ``datetime.date``, datetimes
  to naive ``datetime``, timestamps to tz-aware ``datetime``; variable
  TYPES survive the BRUIN_VARS JSON round-trip.
- ``query(sql, connection=None)`` returns a pandas DataFrame for
  data-returning statements (the reference's IsLikelyResultQuery
  classifier: SELECT / WITH / SHOW / DESCRIBE / DESC / EXPLAIN /
  PRAGMA first keyword, or a top-level RETURNING) and ``None`` for
  DDL/DML — executed either way.  Failures raise ``QueryError``.
- ``get_connection(name)`` returns a ``Connection`` whose lazy
  ``client`` is this engine's SparkSession — the single-dialect analog
  of the SDK's per-warehouse clients.  Unknown names (neither the
  asset's default connection nor an injected secret) raise
  ``ConnectionNotFoundError``.
- ``bruin.exceptions`` exposes the documented hierarchy
  (BruinError base; ConnectionNotFoundError / ConnectionParseError /
  ConnectionTypeError / QueryError).
"""

from __future__ import annotations

import json
import os
import sys
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
    """Lazy env-backed run context (python-sdk.md `context` table)."""

    @property
    def start_date(self):
        return _parse_date(os.environ.get("BRUIN_START_DATE"))

    @property
    def start_datetime(self):
        return _parse_datetime(os.environ.get("BRUIN_START_DATETIME"))

    @property
    def start_timestamp(self):
        return _parse_timestamp(os.environ.get("BRUIN_START_TIMESTAMP"))

    @property
    def end_date(self):
        return _parse_date(os.environ.get("BRUIN_END_DATE"))

    @property
    def end_datetime(self):
        return _parse_datetime(os.environ.get("BRUIN_END_DATETIME"))

    @property
    def end_timestamp(self):
        return _parse_timestamp(os.environ.get("BRUIN_END_TIMESTAMP"))

    @property
    def execution_date(self):
        return _parse_date(os.environ.get("BRUIN_EXECUTION_DATE"))

    @property
    def execution_datetime(self):
        return _parse_datetime(os.environ.get("BRUIN_EXECUTION_DATETIME"))

    @property
    def execution_timestamp(self):
        return _parse_timestamp(os.environ.get("BRUIN_EXECUTION_TIMESTAMP"))

    @property
    def run_id(self):
        return os.environ.get("BRUIN_RUN_ID")

    @property
    def pipeline(self):
        return os.environ.get("BRUIN_PIPELINE")

    @property
    def asset_name(self):
        return os.environ.get("BRUIN_ASSET")

    @property
    def connection(self):
        return os.environ.get("BRUIN_CONNECTION")

    @property
    def is_full_refresh(self) -> bool:
        return os.environ.get("BRUIN_FULL_REFRESH", "") not in ("", "0", "false")

    @property
    def commit_hash(self):
        return os.environ.get("BRUIN_COMMIT_HASH")

    @property
    def vars(self) -> dict:
        raw = os.environ.get("BRUIN_VARS")
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


def make_bruin_module(spark, known_connections: set[str] | None = None) -> types.ModuleType:
    """Build the synthetic ``bruin`` module (plus ``bruin.exceptions``)
    bound to this SparkSession.  ``known_connections`` is the set of
    names get_connection() accepts — the asset's default connection and
    its injected secret keys (python-sdk.md "Asset Setup")."""
    known = set(known_connections or ())

    def query(sql: str, connection: str | None = None):
        if connection is not None and known and connection not in known:
            raise ConnectionNotFoundError(
                f"connection {connection!r} is not available to this asset "
                f"(declare it under `secrets:` or as the asset connection)"
            )
        return _run_query(spark, sql)

    def get_connection(name: str) -> Connection:
        if known and name not in known:
            raise ConnectionNotFoundError(
                f"connection {name!r} is not available to this asset "
                f"(declare it under `secrets:` or as the asset connection)"
            )
        return Connection(name, spark)

    exceptions = types.ModuleType("bruin.exceptions")
    exceptions.BruinError = BruinError
    exceptions.ConnectionNotFoundError = ConnectionNotFoundError
    exceptions.ConnectionParseError = ConnectionParseError
    exceptions.ConnectionTypeError = ConnectionTypeError
    exceptions.QueryError = QueryError

    mod = types.ModuleType("bruin")
    mod.query = query
    mod.get_connection = get_connection
    mod.context = _Context()
    mod.exceptions = exceptions
    mod.Connection = Connection
    return mod


class bruin_module_scope:
    """Context manager: install the synthetic ``bruin`` module for the
    duration of an asset exec, restoring whatever was there before."""

    def __init__(self, spark, known_connections: set[str] | None = None):
        self._mod = make_bruin_module(spark, known_connections)
        self._saved: dict = {}

    def __enter__(self):
        for name in ("bruin", "bruin.exceptions"):
            self._saved[name] = sys.modules.get(name)
        sys.modules["bruin"] = self._mod
        sys.modules["bruin.exceptions"] = self._mod.exceptions
        return self._mod

    def __exit__(self, *exc):
        for name, prev in self._saved.items():
            if prev is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = prev
        return False
