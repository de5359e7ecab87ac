"""The in-process `bruin` SDK for Python assets, pinned against the
reference's documented contract (docs/assets/python-sdk.md API
Reference): context property types and None-defaults, query()'s
DataFrame-vs-None return split, connection gating, and the exceptions
hierarchy — all through a REAL python asset run."""

from __future__ import annotations

import textwrap
from datetime import date, datetime, timezone

import pytest

from bruin_spark.model.pipeline import Asset
from bruin_spark.operators.assets_ops import run_python_asset
from bruin_spark.render.jinja import RenderContext


def _asset(body: str, **meta) -> Asset:
    d = {"name": "sdk_probe", "type": "python", **meta}
    return Asset.from_dict(d, query=textwrap.dedent(body))


CTX = RenderContext(
    start=datetime(2024, 6, 1),
    end=datetime(2024, 6, 2),
    run_id="run-42",
    pipeline_name="sdkpipe",
    variables={"segment": "enterprise", "horizon": 30, "cohorts": [{"a": 1}]},
)


def test_context_properties_match_docs(spark):
    a = _asset(
        """
        from bruin import context

        result = {
            "start_date": context.start_date,
            "end_date": context.end_date,
            "start_datetime": context.start_datetime,
            "start_timestamp": context.start_timestamp,
            "execution_date": context.execution_date,
            "run_id": context.run_id,
            "pipeline": context.pipeline,
            "asset_name": context.asset_name,
            "connection": context.connection,
            "is_full_refresh": context.is_full_refresh,
            "vars": context.vars,
        }
        """,
        connection="warehouse",
    )
    out = run_python_asset(spark, a, CTX)
    assert out["start_date"] == date(2024, 6, 1)
    assert out["end_date"] == date(2024, 6, 2)
    assert out["start_datetime"] == datetime(2024, 6, 1, 0, 0, 0)
    assert out["start_timestamp"] == datetime(2024, 6, 1, tzinfo=timezone.utc)
    assert out["execution_date"] == date(2024, 6, 1)  # execution == start
    assert out["run_id"] == "run-42"
    assert out["pipeline"] == "sdkpipe"
    assert out["asset_name"] == "sdk_probe"
    assert out["connection"] == "warehouse"
    assert out["is_full_refresh"] is False
    # variable TYPES survive the BRUIN_VARS JSON round-trip (docs: str,
    # int, list[dict])
    assert out["vars"] == {"segment": "enterprise", "horizon": 30, "cohorts": [{"a": 1}]}


def test_context_none_defaults_outside_a_run():
    """Docs: properties return None when the env var is missing
    (is_full_refresh False, vars {})."""
    from bruin_spark.operators.python_sdk import _Context

    import os

    saved = {k: os.environ.pop(k) for k in list(os.environ) if k.startswith("BRUIN_")}
    try:
        c = _Context()
        assert c.start_date is None and c.end_timestamp is None
        assert c.run_id is None and c.asset_name is None
        assert c.is_full_refresh is False
        assert c.vars == {}
    finally:
        os.environ.update(saved)


def test_query_returns_dataframe_or_none(spark):
    a = _asset(
        """
        from bruin import query

        df = query("SELECT 1 AS x UNION ALL SELECT 2 ORDER BY x")
        query("CREATE OR REPLACE TEMP VIEW sdk_tmp AS SELECT 5 AS v")
        none_result = query("CREATE OR REPLACE TEMP VIEW sdk_tmp2 AS SELECT 6 AS v")
        df2 = query("WITH c AS (SELECT v FROM sdk_tmp) SELECT * FROM c")
        result = (list(df["x"]), none_result, list(df2["v"]), type(df).__name__)
        """
    )
    xs, none_result, vs, typename = run_python_asset(spark, a, CTX)
    assert xs == [1, 2]
    assert none_result is None  # DDL -> None, but executed:
    assert vs == [5]
    assert typename == "DataFrame"  # pandas


def test_query_error_and_connection_gating(spark):
    a = _asset(
        """
        from bruin import get_connection, query
        from bruin.exceptions import BruinError, ConnectionNotFoundError, QueryError

        conn = get_connection("warehouse")
        got = {"name": conn.name, "type": conn.type}
        got["client_is_spark"] = conn.client is spark
        got["via_conn"] = list(conn.query("SELECT 7 AS n")["n"])

        try:
            get_connection("nope")
        except ConnectionNotFoundError as e:
            got["unknown_conn"] = "not found" in str(e) or "not available" in str(e)

        try:
            query("SELECT definitely_not_a_column FROM range(1)")
        except QueryError as e:
            got["query_error_is_bruin"] = isinstance(e, BruinError)
        result = got
        """,
        connection="warehouse",
        secrets=[],
    )
    got = run_python_asset(spark, a, CTX)
    assert got["name"] == "warehouse" and got["type"] == "spark"
    assert got["client_is_spark"] is True
    assert got["via_conn"] == [7]
    assert got["unknown_conn"] is True
    assert got["query_error_is_bruin"] is True


def test_sdk_materialize_with_late_import(spark):
    """materialize() runs AFTER the script body — a `from bruin import
    query` inside it must still resolve (the module scope covers the
    call), and the returned frame materializes."""
    a = _asset(
        """
        def materialize():
            from bruin import query

            return query("SELECT 1 AS a UNION ALL SELECT 2 ORDER BY a")
        """,
        materialization={"type": "table"},
    )
    run_python_asset(spark, a, CTX)
    assert spark.table("sdk_probe").count() == 2


def test_sdk_module_restored_after_run(spark):
    import sys

    a = _asset("from bruin import query\nresult = 1\n")
    assert run_python_asset(spark, a, CTX) == 1
    assert "bruin" not in sys.modules
    with pytest.raises(ImportError):
        import bruin  # noqa: F401


def test_unknown_connection_raises_even_with_no_declared_connections(spark):
    """An asset that declares NO connections gets ConnectionNotFoundError
    for any get_connection/query(connection=) name — empty is not
    'anything goes'."""
    a = _asset(
        """
        from bruin import get_connection, query
        from bruin.exceptions import ConnectionNotFoundError

        got = {}
        try:
            get_connection("prod_pg_typo")
        except ConnectionNotFoundError:
            got["gc"] = True
        try:
            query("SELECT 1", connection="prod_pg_typo")
        except ConnectionNotFoundError:
            got["q"] = True
        # the default-connection path still works without a name
        got["plain"] = int(query("SELECT 3 AS v")["v"][0])
        result = got
        """
    )
    got = run_python_asset(spark, a, CTX)
    assert got == {"gc": True, "q": True, "plain": 3}


def test_concurrent_assets_see_their_own_context(spark):
    """Two Python assets running on different threads (the scheduler's
    worker-pool shape) must each see their OWN context and connection
    set through the shared singleton module."""
    import threading

    barrier = threading.Barrier(2, timeout=30)
    results: dict = {}
    errors: list = []

    body = """
import threading as _t
from bruin import context, query, get_connection
from bruin.exceptions import ConnectionNotFoundError

_barrier.wait()   # both assets are now INSIDE their scopes
name1 = context.asset_name
sd = context.start_date
_barrier.wait()   # overlap again after the other thread also read
try:
    get_connection(_other_conn)
    leaked = True
except ConnectionNotFoundError:
    leaked = False
own = get_connection(_own_conn).name
result = {"name": name1, "start": str(sd), "leaked": leaked, "own": own}
"""

    def run(tag, conn, other, start):
        try:
            a = Asset.from_dict(
                {"name": f"conc_{tag}", "type": "python", "connection": conn},
                query=body,
            )
            ctx = RenderContext(
                start=start, end=datetime(2030, 1, 1), run_id=f"r-{tag}",
                pipeline_name="conc",
            )
            import bruin_spark.operators.assets_ops as ao

            # inject the barrier + names into the exec namespace via a
            # tiny prelude (the script is plain source)
            src = (
                f"_barrier = __import__('tests_conc_shared').barrier\n"
                f"_own_conn = {conn!r}\n_other_conn = {other!r}\n" + body
            )
            import sys as _sys
            import types as _types

            shared = _types.ModuleType("tests_conc_shared")
            shared.barrier = barrier
            _sys.modules.setdefault("tests_conc_shared", shared)
            a.query = src
            results[tag] = ao.run_python_asset(spark, a, ctx)
        except Exception as e:  # noqa: BLE001
            errors.append((tag, repr(e)))

    t1 = threading.Thread(
        target=run, args=("a", "conn_a", "conn_b", datetime(2024, 1, 1))
    )
    t2 = threading.Thread(
        target=run, args=("b", "conn_b", "conn_a", datetime(2025, 6, 15))
    )
    t1.start(); t2.start(); t1.join(30); t2.join(30)
    assert not errors, errors
    assert results["a"]["name"] == "conc_a" and results["b"]["name"] == "conc_b"
    assert results["a"]["start"] == "2024-01-01"
    assert results["b"]["start"] == "2025-06-15"
    assert results["a"]["leaked"] is False and results["b"]["leaked"] is False
    assert results["a"]["own"] == "conn_a" and results["b"]["own"] == "conn_b"


def test_asset_spawned_threads_resolve_single_active_asset(spark):
    """An asset's OWN worker threads (empty thread-local stack) resolve
    to the single active asset's state."""
    a = _asset(
        """
        from concurrent.futures import ThreadPoolExecutor

        from bruin import context, query

        def probe(i):
            return (int(query(f"SELECT {i} AS v")["v"][0]), context.asset_name)

        with ThreadPoolExecutor(2) as ex:
            result = sorted(ex.map(probe, [1, 2]))
        """
    )
    out = run_python_asset(spark, a, CTX)
    assert out == [(1, "sdk_probe"), (2, "sdk_probe")]


def test_overlay_is_authoritative_inside_scope(spark):
    """An asset WITHOUT a connection sees context.connection None even
    while another (sequentially prior) asset exported BRUIN_CONNECTION
    into the process env — inside a scope the overlay never falls
    through to os.environ."""
    import os

    os.environ["BRUIN_CONNECTION"] = "leaked-from-elsewhere"
    try:
        a = _asset("from bruin import context\nresult = context.connection\n")
        assert run_python_asset(spark, a, CTX) is None
    finally:
        os.environ.pop("BRUIN_CONNECTION", None)


def test_orphan_thread_from_finished_asset_is_not_attributed(spark):
    """A thread that OUTLIVES its asset must not inherit the NEXT
    asset's connections/context: it predates the next scope (it is in
    that scope's entry-time thread snapshot), so SDK calls raise
    instead of leaking."""
    import threading
    import time

    from bruin_spark.operators.python_sdk import BruinError, bruin_module_scope

    leak: dict = {}
    release = threading.Event()
    started = threading.Event()

    def orphan():
        from bruin_spark.operators import python_sdk as sdk

        started.set()
        release.wait(10)  # survives past asset A, fires during asset B
        try:
            sdk._sdk_get_connection("conn_b")
            leak["got"] = "connection"
        except BruinError as e:
            leak["got"] = type(e).__name__

    # asset A spawns the orphan inside its scope, then finishes
    with bruin_module_scope(spark, {"conn_a"}, {"BRUIN_ASSET": "a"}):
        t = threading.Thread(target=orphan, daemon=True)
        t.start()
        started.wait(10)
    # asset B is now the single active scope; the orphan wakes up
    with bruin_module_scope(spark, {"conn_b"}, {"BRUIN_ASSET": "b"}):
        release.set()
        t.join(10)
    assert leak["got"] == "BruinError"
