"""Declarative source registry: every ingestr URI scheme the reference
can construct, mapped to how Spark would read it.

Reference parity: the reference's ~140 connector packages each expose
``GetIngestrURI()`` building ``<scheme>://[host]?<params>`` (per-package
``pkg/*/config.go``; scheme routing pkg/ingestr/operator.go:439-454).
The warehouse families collapse into Spark readers (JDBC / connector
formats); the SaaS-API tail are HTTP clients, not engine features — for
those this registry validates and constructs the normalized source
options (scheme, host, auth/config params) exactly as the reference
does, and the fetch itself is stubbed behind ``ApiSourceUnavailable``
(no network / no vendored API clients in this container).  Option
construction is the testable surface: a user's asset with a wrong or
incomplete URI fails here with the same missing-parameter errors the
reference produces.

Categories:
- ``JDBC_FAMILY``   — extra database schemes mapped onto Spark's JDBC
  reader (adds trino/db2/vertica/doris/starrocks/... to sources/ingest.py's
  core map).
- ``CONNECTOR_SOURCES`` — NoSQL / warehouse systems with a dedicated
  Spark connector format (mongodb, cassandra, elasticsearch, bigquery,
  iceberg, ...): we construct the reader format + option dict; loading
  requires the connector jar on the cluster (jar-gated, clear error).
- ``STREAM_SCHEMES`` — kafka/kinesis/rabbitmq: rejected for batch reads
  with a pointer to the streaming API.
- ``API_SOURCES``   — the SaaS tail: scheme -> required query params
  (the auth/config params the reference's URI builder always sets).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from bruin_spark.sources.uri import parse_uri

# --- extra JDBC-wire databases (scheme -> (jdbc subprotocol, driver)) ---
#: merged into sources.ingest's core map at import time
JDBC_FAMILY: dict[str, tuple[str, str]] = {
    "vertica": ("vertica", "com.vertica.jdbc.Driver"),
    "doris": ("mysql", "com.mysql.cj.jdbc.Driver"),  # MySQL wire protocol
    "starrocks": ("mysql", "com.mysql.cj.jdbc.Driver"),
    "planetscale": ("mysql", "com.mysql.cj.jdbc.Driver"),
    "ps_mysql": ("mysql", "com.mysql.cj.jdbc.Driver"),  # planetscale alias
    "vitess": ("mysql", "com.mysql.cj.jdbc.Driver"),
    "cratedb": ("postgresql", "org.postgresql.Driver"),  # PG wire protocol
    "databricks": ("databricks", "com.databricks.client.jdbc.Driver"),
    "athena": ("awsathena", "com.simba.athena.jdbc.Driver"),
    "fabric": ("sqlserver", "com.microsoft.sqlserver.jdbc.SQLServerDriver"),
}


@dataclass
class ConnectorSpec:
    """A system with a first-class Spark connector format."""

    format: str  # value for spark.read.format(...)
    option_map: dict[str, str] = field(default_factory=dict)  # uri part -> option
    needs_jar: str = ""  # human name of the required connector package


#: scheme -> how to build the Spark reader
CONNECTOR_SOURCES: dict[str, ConnectorSpec] = {
    "mongodb": ConnectorSpec(
        format="mongodb",
        option_map={"uri": "spark.mongodb.read.connection.uri", "table": "collection"},
        needs_jar="mongo-spark-connector",
    ),
    "mongodb+srv": ConnectorSpec(
        format="mongodb",
        option_map={"uri": "spark.mongodb.read.connection.uri", "table": "collection"},
        needs_jar="mongo-spark-connector",
    ),
    "cassandra": ConnectorSpec(
        format="org.apache.spark.sql.cassandra",
        option_map={"host": "spark.cassandra.connection.host", "table": "table"},
        needs_jar="spark-cassandra-connector",
    ),
    "elasticsearch": ConnectorSpec(
        format="es",
        option_map={"host": "es.nodes", "table": "es.resource"},
        needs_jar="elasticsearch-spark",
    ),
    "couchbase": ConnectorSpec(
        format="couchbase.query",
        option_map={"host": "spark.couchbase.connectionString", "table": "bucket"},
        needs_jar="spark-connector-couchbase",
    ),
    "bigquery": ConnectorSpec(
        format="bigquery",
        option_map={"table": "table", "project_id": "parentProject"},
        needs_jar="spark-bigquery-connector",
    ),
    "iceberg": ConnectorSpec(format="iceberg", option_map={"table": "path"}),
    "dynamodb": ConnectorSpec(
        format="dynamodb",
        option_map={
            "table": "tableName",
            "access_key_id": "accessKey",
            "secret_access_key": "secretKey",
        },
        needs_jar="spark-dynamodb",
    ),
    "influxdb": ConnectorSpec(
        format="influxdb",
        option_map={"host": "url", "token": "token", "bucket": "bucket", "org": "org"},
        needs_jar="influxdb client (fetch via mapInPandas HTTP reader)",
    ),
    "spanner": ConnectorSpec(
        format="cloud-spanner",
        option_map={
            "project_id": "projectId",
            "instance_id": "instanceId",
            "database": "databaseId",
            "table": "table",
        },
        needs_jar="spark-spanner-connector",
    ),
}

#: streaming-only schemes — batch reads must be rejected with a pointer
STREAM_SCHEMES = {"kafka", "kinesis", "rabbitmq"}

#: SaaS-API tail: scheme -> query params the reference's URI builder
#: always sets (pkg/<name>/config.go GetIngestrURI). '' host means the
#: scheme carries no meaningful authority component.
API_SOURCES: dict[str, tuple[str, ...]] = {
    "adapty": ("api_key",),
    "adjust": ("api_key",),
    "adls": ("account_name",),  # Azure Data Lake gen2 (ref pkg/adls/config.go:38)
    "amplitude": ("api_key", "secret_key"),
    "airtable": ("access_token", "base_id"),
    "allium": ("api_key",),
    "anthropic": ("api_key",),
    "apifootball": ("api_key",),
    "appleads": ("client_id", "team_id", "key_id"),
    "applovin": ("api_key",),
    "applovinmax": ("api_key",),
    "appsflyer": ("api_key",),
    "appstore": ("key_id", "issuer_id"),
    "asana": ("access_token",),
    "attio": ("api_key",),
    "balldontlie": (),
    "braze": ("api_key", "endpoint"),
    "chargebee": ("api_key",),
    "chess": (),
    "clevertap": (),
    "clickup": ("api_token",),
    "cursor": ("api_key",),
    "customerio": ("api_key",),
    "docebo": ("base_url", "client_id", "client_secret"),
    "dune": ("api_key",),
    "espn": (),
    "facebookads": ("access_token", "account_id"),
    "fastspring": (),
    "fireflies": ("api_key",),
    "fluxx": ("client_id", "client_secret"),
    "footballdata": (),
    "frankfurter": (),
    "freshdesk": (),
    "fundraiseup": ("api_key",),
    "g2": ("api_token",),
    "github": ("owner", "repo"),
    "gitlab": ("access_token",),
    "googleads": ("dev_token",),
    "googleanalytics": ("property_id",),
    "gorgias": ("api_key", "email"),
    "granola": (),
    "gsc": (),
    "gsheets": (),
    "hostaway": ("api_key",),
    "hubspot": ("api_key",),
    "indeed": ("client_id", "client_secret", "employer_id"),
    "intercom": ("access_token",),
    "isocpulse": (),
    "jira": ("api_token", "email"),
    "jobtread": ("grant_key", "organization_id"),
    "kalshi": (),
    "klaviyo": ("api_key",),
    "linear": (),
    "linkedinads": ("access_token", "account_ids"),
    "mailchimp": ("api_key", "server"),
    "manifold": (),
    "mixpanel": ("project_id",),
    "monday": ("api_token",),
    "notion": ("api_key",),
    "onelake": ("tenant_id", "client_id", "client_secret"),  # ref pkg/onelake/config.go:32
    "paddle": ("api_key",),
    "payrails": (),
    "personio": ("client_id", "client_secret"),
    "phantombuster": ("api_key",),
    "pinterest": (),
    "pipedrive": ("api_token",),
    "plusvibeai": ("api_key", "workspace_id"),
    "polymarket": (),
    "posthog": ("personal_api_key", "project_id"),
    "primer": ("api_key",),
    "quickbooks": (),
    "recurly": ("api_key",),
    "redditads": (),
    "revenuecat": ("api_key", "project_id"),
    "salesforce": (),
    "sendgrid": ("api_key",),
    "sftp": (),
    "sharepoint": (),
    "shopify": ("api_key",),
    "slack": ("api_key",),
    "smartsheet": ("access_token",),
    "snapchatads": ("client_id", "client_secret", "refresh_token"),
    "socrata": ("app_token",),
    "solidgate": ("public_key", "secret_key"),
    "square": ("access_token",),
    "stripe": ("api_key",),
    "surveymonkey": ("access_token",),
    "tiktok": ("access_token", "advertiser_ids"),
    "trello": ("api_key", "token"),
    "trustpilot": ("api_key",),
    "twilio": ("account_sid",),
    "typeform": ("token",),
    "wise": ("api_key",),
    "wistia": ("access_token",),
    "zendesk": (),
    "zoom": (),
}


class ApiSourceUnavailable(NotImplementedError):
    """The source's options were constructed and validated, but fetching
    needs an HTTP API client / network, which this deployment stubs.
    Carries the validated options so callers (and tests) can assert the
    construction is correct."""

    def __init__(self, scheme: str, options: dict):
        self.scheme = scheme
        self.options = options
        super().__init__(
            f"{scheme}:// source options validated ({sorted(options)}); "
            f"the {scheme} API fetch is not available in this deployment — "
            f"stage the extract to parquet/object storage and ingest that"
        )


def api_source_options(uri: str) -> dict:
    """Validate an API-source URI and return its normalized options:
    ``{'scheme', 'host', <query params...>}``.  Raises ValueError on an
    unknown scheme or missing required params — mirroring the reference's
    per-connector config validation."""
    p = parse_uri(uri)
    if p.scheme not in API_SOURCES:
        raise ValueError(f"unknown API source scheme: {p.scheme}")
    opts: dict = {"scheme": p.scheme, "host": p.netloc}
    opts.update(p.query_dict())
    missing = [k for k in API_SOURCES[p.scheme] if not opts.get(k)]
    if missing:
        raise ValueError(
            f"{p.scheme}:// source is missing required parameter(s): "
            f"{', '.join(missing)}"
        )
    return opts


def connector_read_options(
    uri: str, table: str | None = None
) -> tuple[str, dict[str, str], str]:
    """(spark_format, options, needs_jar) for a connector-format source."""
    p = parse_uri(uri)
    spec = CONNECTOR_SOURCES.get(p.scheme)
    if spec is None:
        raise ValueError(f"not a connector source: {p.scheme}")
    parts: dict[str, str] = {
        "uri": uri,
        "host": p.netloc,
        "table": table or p.path.lstrip("/"),
    }
    parts.update(p.query_dict())
    opts = {
        target: parts[src]
        for src, target in spec.option_map.items()
        if parts.get(src)
    }
    return spec.format, opts, spec.needs_jar


def all_known_schemes() -> set[str]:
    """Every scheme this engine recognizes (for lint + docs)."""
    from bruin_spark.sources.ingest import _FILE_FORMATS, _JDBC_SUBPROTOCOL, _OBJECT_STORES

    return (
        set(_FILE_FORMATS)
        | set(_OBJECT_STORES)
        | set(_JDBC_SUBPROTOCOL)
        | set(JDBC_FAMILY)
        | set(CONNECTOR_SOURCES)
        | STREAM_SCHEMES
        | set(API_SOURCES)
        | {"http", "https", "duckdb", "sqlite", "jdbc"}
    )
