"""Named connections: the .bruin.yml connection store -> source URIs.

Reference parity: the reference keeps typed connections per environment
in .bruin.yml (``environments.<env>.connections.<type>[]``, managed by
``bruin connections list/add/delete``, cmd/connections.go) and each
connector package's ``GetIngestrURI()`` collapses a typed config into
the URI that addresses it (pkg/*/config.go).  Here the engine's native
addressing IS the URI (sources/ingest.py), so a connection is either:

- a plain URI string — used verbatim, or
- a typed mapping — ``{type: postgres, host: ..., port: ..., username:
  ..., password: ..., database: ...}`` plus arbitrary extra keys, which
  this module renders to the exact URI the reference's builder would
  produce (db families -> authority form; API families -> query-param
  form).

Resolution order for an asset's ``source_connection`` name: the
pipeline's own ``default_connections`` map first, then the active
environment's ``connections`` in the project .bruin.yml.
"""

from __future__ import annotations

from urllib.parse import quote, urlencode

#: connection types addressed authority-style (db families; the JDBC /
#: embedded / connector schemes sources/ingest.py understands)
_DB_TYPES = {
    "postgres", "postgresql", "mysql", "mariadb", "mssql", "sqlserver",
    "oracle", "redshift", "snowflake", "clickhouse", "trino", "db2",
    "hana", "vertica", "doris", "starrocks", "planetscale", "vitess",
    "cratedb", "databricks", "athena", "fabric", "mongodb", "cassandra",
    "elasticsearch", "couchbase", "kafka", "duckdb", "sqlite",
}

#: keys consumed structurally for db-style URIs; everything else
#: becomes a query parameter
_STRUCTURAL = {"type", "name", "host", "port", "username", "password", "database", "path"}


def connection_uri(spec) -> str:
    """Render one connection spec (string or typed mapping) to a URI."""
    if isinstance(spec, str):
        return spec
    d = dict(spec)
    typ = str(d.get("type", "") or "")
    if not typ:
        # keys only — the values can hold credentials and this message
        # may be printed in warnings
        raise ValueError(
            f"connection spec needs a 'type' (or be a URI string); keys: {sorted(d)}"
        )
    extras = {k: v for k, v in d.items() if k not in _STRUCTURAL and v is not None}
    query = f"?{urlencode(extras)}" if extras else ""
    if typ in ("duckdb", "sqlite"):
        return f"{typ}://{d.get('path', d.get('database', ''))}{query}"
    if typ in _DB_TYPES:
        auth = ""
        if d.get("username"):
            auth = quote(str(d["username"]), safe="")
            if d.get("password"):
                auth += ":" + quote(str(d["password"]), safe="")
            auth += "@"
        host = d.get("host", "")
        port = f":{d['port']}" if d.get("port") else ""
        db = f"/{d['database']}" if d.get("database") else ""
        return f"{typ}://{auth}{host}{port}{db}{query}"
    # API family: scheme://[host]?params (ref pkg/<type>/config.go)
    host = d.get("host", "")
    return f"{typ}://{host}{query}"


def environment_connection_specs(cfg, env_name: str) -> dict:
    """All named connections of one environment, as raw specs (URI
    string or typed mapping).

    Accepts both layouts: a flat ``connections: {name: spec}`` map and
    the reference's grouped ``connections: {type: [specs-with-name]}``.
    """
    spec = (cfg.environments or {}).get(env_name, {}) or {}
    raw = spec.get("connections", {}) or {}
    out: dict = {}
    for key, val in raw.items():
        if isinstance(val, list):  # reference layout: type -> [ {name: ...} ]
            for item in val:
                item = dict(item or {})
                name = str(item.get("name", "") or "")
                if not name:
                    continue
                item.setdefault("type", key)
                out[name] = item
        else:  # flat layout: name -> uri-string | typed mapping
            out[str(key)] = val
    return out


def connection_fields(spec) -> dict:
    """A connection spec as a template-visible field mapping
    (``{{ bruin.connection("name").host }}`` in `bruin curl`, ref
    cmd/curl.go connectionFields): typed mappings expose their fields
    plus the rendered ``uri``; URI strings expose just ``uri``."""
    if isinstance(spec, str):
        return {"uri": spec}
    out = dict(spec)
    out["uri"] = connection_uri(spec)
    return out


def environment_connections(cfg, env_name: str) -> dict[str, str]:
    """All named connections of one environment, rendered to URIs."""
    return {
        name: connection_uri(spec)
        for name, spec in environment_connection_specs(cfg, env_name).items()
    }
