"""Ingestion: source URIs -> Spark readers -> strategy writers.

Re-expresses the reference's ingestr bridge (pkg/ingestr/
operator.go:184-437 URI dispatch, :507-575 flag mapping;
pkg/python/materialization_mapping.go:9-30 strategy names) without the
subprocess: every source becomes a Spark DataFrame and every
"incremental strategy" reuses the §2.2 materialization writers.

Source URI grammar (ref scheme routing: pkg/ingestr/operator.go:439-454
seed file schemes; the database families mirror ingestr's URI builders):
- file formats: ``csv:// json:// jsonl:// ndjson:// parquet:// avro://``
  (also bare paths with an extension; ``file_type`` overrides)
- object stores: ``s3:// s3a:// gs:// gcs:// abfss:// wasbs://`` paths —
  format inferred from the extension / ``file_type``; the cloud FS jars
  must be on the cluster (path+format resolution is testable without)
- http(s): CSV/JSON fetched to a local temp file, then read
- databases: ``postgres:// mysql:// mssql:// oracle:// redshift://
  snowflake:// clickhouse:// trino:// db2://``, raw ``jdbc:...``
  passthrough — mapped to ``spark.read.format("jdbc")`` options with
  ``partitionColumn``/``numPartitions`` parallel reads
- local embedded: ``duckdb://path.db``, ``sqlite://path.db`` via Arrow/
  pandas (no JDBC needed)
- ``kafka:// kinesis:// rabbitmq://`` are rejected here with a pointer
  to the streaming API (streaming sources never run under the batch
  reader)
- everything else the reference can address (the full ~140-scheme
  ingestr surface) resolves through ``sources/registry.py``: extra
  JDBC-wire databases fold into the JDBC map, connector-format systems
  (mongodb/cassandra/elasticsearch/bigquery/iceberg/...) build their
  Spark reader options (jar-gated), and the SaaS-API tail validates +
  constructs options, with the fetch stubbed (``ApiSourceUnavailable``)

Strategies (ingestr names): replace | append | merge | delete+insert |
truncate+insert.
"""

from __future__ import annotations

import os
from urllib.parse import parse_qs, unquote, urlparse

from pyspark.sql import DataFrame, SparkSession

from bruin_spark.model.pipeline import (
    Asset,
    Column,
    Materialization,
    MaterializationType,
    Strategy,
)

_JDBC_SUBPROTOCOL = {
    "postgres": "postgresql",
    "postgresql": "postgresql",
    "mysql": "mysql",
    "mariadb": "mariadb",
    "mssql": "sqlserver",
    "sqlserver": "sqlserver",
    "oracle": "oracle:thin",
    "redshift": "redshift",
    "snowflake": "snowflake",
    "clickhouse": "clickhouse",
    "trino": "trino",
    "db2": "db2",
    "hana": "sap",
}

_JDBC_DRIVER = {
    "postgresql": "org.postgresql.Driver",
    "mysql": "com.mysql.cj.jdbc.Driver",
    "mariadb": "org.mariadb.jdbc.Driver",
    "sqlserver": "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    "oracle:thin": "oracle.jdbc.OracleDriver",
    "redshift": "com.amazon.redshift.jdbc42.Driver",
    "snowflake": "net.snowflake.client.jdbc.SnowflakeDriver",
    "clickhouse": "com.clickhouse.jdbc.ClickHouseDriver",
    "trino": "io.trino.jdbc.TrinoDriver",
    "db2": "com.ibm.db2.jcc.DB2Driver",
    "sap": "com.sap.db.jdbc.Driver",
}


def _merge_jdbc_family() -> None:
    """Fold the registry's extra JDBC-wire schemes (vertica, doris,
    starrocks, cratedb, databricks, athena, ...) into the core maps."""
    from bruin_spark.sources.registry import JDBC_FAMILY

    for scheme, (sub, driver) in JDBC_FAMILY.items():
        _JDBC_SUBPROTOCOL.setdefault(scheme, sub)
        _JDBC_DRIVER.setdefault(sub, driver)


_merge_jdbc_family()

#: file_type / extension token -> Spark reader format
#: (ref seedFileSchemes, operator.go:441-449; avro needs spark-avro jar)
_FILE_FORMATS = {
    "csv": "csv",
    "parquet": "parquet",
    "pq": "parquet",
    "json": "json",
    "jsonl": "json",
    "ndjson": "json",
    "avro": "avro",
}

#: object-store scheme -> Hadoop filesystem scheme
_OBJECT_STORES = {"s3": "s3a", "s3a": "s3a", "gs": "gs", "gcs": "gs", "abfss": "abfss", "wasbs": "wasbs"}

#: ingestr --incremental-strategy -> §2.2 strategy
STRATEGY_MAP = {
    "replace": Strategy.CREATE_REPLACE,
    "append": Strategy.APPEND,
    "merge": Strategy.MERGE,
    "delete+insert": Strategy.DELETE_INSERT,
    "truncate+insert": Strategy.TRUNCATE_INSERT,
}


def jdbc_options(uri: str, table: str | None = None, query: str | None = None) -> dict[str, str]:
    """Spark JDBC reader options from an ingestr-style database URI."""
    if uri.startswith("jdbc:"):
        opts = {"url": uri}
    else:
        p = urlparse(uri)
        sub = _JDBC_SUBPROTOCOL.get(p.scheme)
        if sub is None:
            raise ValueError(f"not a database URI: {uri}")
        host = p.hostname or "localhost"
        port = f":{p.port}" if p.port else ""
        db = p.path.lstrip("/")
        if sub == "sqlserver":
            url = f"jdbc:sqlserver://{host}{port};databaseName={db}"
        elif sub == "snowflake":
            # snowflake JDBC takes the database as a ?db= parameter
            url = f"jdbc:snowflake://{host}{port}/?db={db}" if db else f"jdbc:snowflake://{host}{port}/"
        else:
            url = f"jdbc:{sub}://{host}{port}/{db}"
        opts = {"url": url}
        if p.username:
            opts["user"] = unquote(p.username)
        if p.password:
            opts["password"] = unquote(p.password)
        if sub in _JDBC_DRIVER:
            opts["driver"] = _JDBC_DRIVER[sub]
        for k, v in parse_qs(p.query).items():
            opts[k] = v[0]
    if query:
        opts["query"] = query
    elif table:
        opts["dbtable"] = table
    return opts


def _pdf_to_spark(spark: SparkSession, pdf) -> DataFrame:
    """createDataFrame that survives an EMPTY extract: Spark cannot infer
    a schema from zero rows, so the pandas dtypes are mapped explicitly
    (an empty source table is a normal condition for incremental loads)."""
    if len(pdf):
        return spark.createDataFrame(pdf)
    fields = []
    for col, dt in pdf.dtypes.items():
        s = str(dt)
        if "int" in s:
            typ = "bigint"
        elif "float" in s:
            typ = "double"
        elif "datetime" in s:
            typ = "timestamp"
        elif "bool" in s:
            typ = "boolean"
        else:
            typ = "string"
        fields.append(f"`{col}` {typ}")
    return spark.createDataFrame([], ", ".join(fields) or "`_empty` string")


def resolve_file_source(uri: str, file_type: str | None = None) -> tuple[str, str] | None:
    """``(format, load_path)`` for a file-like URI, else None.

    Handles format schemes (``csv:// parquet:// jsonl:// ...``), bare
    paths with a known extension, and object-store paths (``s3://`` →
    ``s3a://`` etc.) whose format comes from the extension or the
    explicit ``file_type`` parameter.  Pure resolution — no I/O — so the
    cloud-path mapping is testable without the FS jars.
    """
    scheme = uri.split("://", 1)[0] if "://" in uri else ""
    rest = uri.split("://", 1)[1] if "://" in uri else uri

    if scheme in _FILE_FORMATS:
        return _FILE_FORMATS[scheme], rest
    if scheme in _OBJECT_STORES:
        path = f"{_OBJECT_STORES[scheme]}://{rest}"
        ext = os.path.splitext(rest)[1].lstrip(".").lower()
        fmt = _FILE_FORMATS.get((file_type or "").lower()) or _FILE_FORMATS.get(ext)
        if fmt is None:
            raise ValueError(
                f"cannot infer file format for {uri!r}; pass file_type "
                f"(one of {sorted(set(_FILE_FORMATS))})"
            )
        return fmt, path
    if not scheme:
        ext = os.path.splitext(rest)[1].lstrip(".").lower()
        fmt = _FILE_FORMATS.get((file_type or "").lower()) or _FILE_FORMATS.get(ext)
        if fmt:
            return fmt, rest
    return None


def _read_file_format(spark: SparkSession, fmt: str, path: str, schema: str | None) -> DataFrame:
    if fmt == "csv":
        reader = spark.read.option("header", "true")
        if schema:
            return reader.csv(path, schema=schema)
        return reader.option("inferSchema", "true").csv(path)
    if fmt == "json":
        return spark.read.json(path, schema=schema) if schema else spark.read.json(path)
    if fmt == "parquet":
        from bruin_spark.session import read_parquet

        return read_parquet(spark, path)
    return spark.read.format(fmt).load(path)  # avro etc. (jar-gated)


def _fetch_http(uri: str) -> str:
    """Download an http(s) source to a local temp file (the reference
    passes http URLs straight to ingestr, which does the same)."""
    import tempfile
    import urllib.request

    suffix = os.path.splitext(urlparse(uri).path)[1] or ".dat"
    fd, local = tempfile.mkstemp(prefix="bruin_http_", suffix=suffix)
    with os.fdopen(fd, "wb") as out, urllib.request.urlopen(uri) as resp:  # noqa: S310
        out.write(resp.read())
    return local


#: replication-feed query params set by apply_cdc_parameters — they
#: configure the CDC FEED and must not leak into a snapshot read.
#: Transport-level options (``tls`` and sslmode-style keys) are NOT in
#: this set: on mysql-family sources ``tls`` is also a legitimate base
#: connection option, and stripping it would silently downgrade the
#: snapshot connection's transport security relative to what the user
#: configured. Only feed-exclusive params are stripped.
_CDC_FEED_PARAMS = {
    "publication", "slot", "grpc_port", "grpc_host", "grpc_tls",
    "server_id", "capture_instance", "poll_interval",
    "max_await_time", "schema_sample_size", "dest_schema", "state_id",
}


def snapshot_source_uri(uri: str) -> str:
    """Base-connection form of a CDC feed URI.

    A BATCH run of a CDC asset is the initial snapshot: it reads the
    base connection (ingestr's first CDC run snapshots the same way).
    The ``+cdc``/``+ct`` scheme suffix and the feed-only query params
    (publication/slot/...) configure replication, not the snapshot, so
    both are stripped before reader dispatch. Non-CDC URIs pass through
    unchanged.
    """
    scheme = uri.split("://", 1)[0] if "://" in uri else ""
    base, sep, suffix = scheme.partition("+")
    if not sep or suffix not in ("cdc", "ct"):
        return uri
    from bruin_spark.sources.uri import parse_uri

    p = parse_uri(uri)
    p.scheme = base
    p.query = [(k, v) for k, v in p.query if k not in _CDC_FEED_PARAMS]
    return p.render()


def _read_api_fixture(
    spark: SparkSession, scheme: str, table: str | None, schema: str | None
) -> DataFrame | None:
    """Replay mode for the network-gated SaaS sources: when
    ``BRUIN_SOURCE_FIXTURE_DIR`` is set, a SaaS read resolves to recorded
    data at ``<dir>/<scheme>/<table>.{parquet,json,csv}`` (or
    ``<dir>/<scheme>.<ext>`` when table-agnostic) — the same rows a real
    ``ingestr`` extract would land (ref: pkg/ingestr/operator.go:184-437
    produces a table per --source-table). Returns None when no fixture
    directory is configured or no file matches, in which case the caller
    raises the usual ApiSourceUnavailable."""
    fdir = os.environ.get("BRUIN_SOURCE_FIXTURE_DIR")
    if not fdir:
        return None
    candidates = []
    if table:
        candidates += [os.path.join(fdir, scheme, table)]
    candidates += [os.path.join(fdir, scheme)]
    for base in candidates:
        for ext, fmt in (
            (".parquet", "parquet"),
            (".json", "json"),
            (".jsonl", "json"),
            (".csv", "csv"),
        ):
            path = base + ext
            if os.path.exists(path):
                return _read_file_format(spark, fmt, path, schema)
    return None


def read_source(
    spark: SparkSession,
    uri: str,
    table: str | None = None,
    query: str | None = None,
    schema: str | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    file_type: str | None = None,
) -> DataFrame:
    """Load a source URI as a DataFrame.

    For JDBC sources, ``partition_column`` + ``num_partitions`` enable
    parallel reads (Spark splits the key range across executors) —
    without them a database read is a single connection no matter the
    cluster size.
    """
    from bruin_spark.sources.registry import (
        API_SOURCES,
        CONNECTOR_SOURCES,
        STREAM_SCHEMES,
        ApiSourceUnavailable,
        api_source_options,
        connector_read_options,
    )

    uri = snapshot_source_uri(uri)
    scheme = uri.split("://", 1)[0] if "://" in uri else ""
    path = uri.split("://", 1)[1] if "://" in uri else uri

    if scheme in STREAM_SCHEMES:
        raise ValueError(
            f"{scheme}:// is a streaming source; use "
            "bruin_spark.streaming.stream_kafka_source (batch runs skip "
            "streaming assets entirely)"
        )
    if scheme in CONNECTOR_SOURCES:
        fmt, opts, needs_jar = connector_read_options(uri, table)
        reader = spark.read.format(fmt)
        for k, v in opts.items():
            reader = reader.option(k, v)
        try:
            return reader.load()
        except Exception as e:  # connector jar absent on this cluster
            raise ValueError(
                f"{scheme}:// needs the {needs_jar or fmt} connector on "
                f"the cluster (options constructed: {sorted(opts)})"
            ) from e
    if scheme in API_SOURCES:
        # validates + constructs options first: a misconfigured URI must
        # fail the same way with or without a fixture directory
        opts = api_source_options(uri)
        fixture = _read_api_fixture(spark, scheme, table, schema)
        if fixture is not None:
            return fixture
        # fetch itself is stubbed — no network (registry.py)
        raise ApiSourceUnavailable(scheme, opts)
    if scheme in ("http", "https"):
        local = _fetch_http(uri)
        resolved = resolve_file_source(local, file_type)
        if resolved is None:
            raise ValueError(f"cannot infer file format for {uri!r}; pass file_type")
        return _read_file_format(spark, resolved[0], resolved[1], schema)

    resolved = resolve_file_source(uri, file_type)
    if resolved is not None:
        return _read_file_format(spark, resolved[0], resolved[1], schema)

    if scheme == "duckdb":
        import duckdb

        con = duckdb.connect(path, read_only=True)
        try:
            rel = con.execute(query or f"SELECT * FROM {table}")
            return _pdf_to_spark(spark, rel.fetch_arrow_table().to_pandas())
        finally:
            con.close()
    if scheme == "sqlite":
        import sqlite3

        import pandas as pd

        con = sqlite3.connect(path)
        try:
            pdf = pd.read_sql_query(query or f"SELECT * FROM {table}", con)
            return _pdf_to_spark(spark, pdf)
        finally:
            con.close()
    if scheme in _JDBC_SUBPROTOCOL or uri.startswith("jdbc:"):
        opts = jdbc_options(uri, table, query)
        if partition_column and num_partitions:
            # Spark requires ALL of partitionColumn/lowerBound/upperBound/
            # numPartitions; when the caller gave no bounds (URI query
            # params may carry them), probe them with one tiny bounds
            # query over the same connection — the standard pattern for
            # range-partitioned JDBC extraction.
            if "lowerBound" not in opts or "upperBound" not in opts:
                src = f"({query}) AS _b" if query else table
                b_opts = {
                    k: v for k, v in opts.items() if k not in ("dbtable", "query")
                }
                b_opts["query"] = (
                    f"SELECT MIN({partition_column}) AS mn, "
                    f"MAX({partition_column}) AS mx FROM {src}"
                )
                b_reader = spark.read.format("jdbc")
                for k, v in b_opts.items():
                    b_reader = b_reader.option(k, v)
                row = b_reader.load().collect()[0]
                if row["mn"] is None or row["mx"] is None:
                    partition_column = None  # empty table: single read
                else:
                    opts["lowerBound"] = str(row["mn"])
                    opts["upperBound"] = str(row["mx"])
        reader = spark.read.format("jdbc")
        for k, v in opts.items():
            reader = reader.option(k, v)
        if partition_column and num_partitions:
            reader = (
                reader.option("partitionColumn", partition_column)
                .option("numPartitions", str(num_partitions))
            )
        return reader.load()
    raise ValueError(f"unsupported source URI: {uri}")


def ingest(
    spark: SparkSession,
    source_uri: str,
    dest_table: str,
    source_table: str | None = None,
    source_query: str | None = None,
    strategy: str = "replace",
    incremental_key: str = "",
    primary_keys: list[str] | None = None,
    partition_by: str = "",
    schema: str | None = None,
    file_type: str | None = None,
    mask_rules: list[tuple[str, str]] | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
) -> None:
    """One-shot ingest: read source, write with the named strategy
    (the `bruin run` path for ingestr assets, minus the subprocess).
    ``mask_rules`` apply between read and write, so masked columns
    never persist raw (sources/masking.py; ref --mask flags,
    pkg/python/helper.go:138-176)."""
    strat = STRATEGY_MAP.get(strategy)
    if strat is None:
        raise ValueError(f"unknown strategy {strategy!r}; one of {sorted(STRATEGY_MAP)}")
    df = read_source(
        spark,
        source_uri,
        table=source_table,
        query=source_query,
        schema=schema,
        file_type=file_type,
        partition_column=partition_column,
        num_partitions=num_partitions,
    )
    if mask_rules:
        from bruin_spark.sources.masking import apply_masks

        df = apply_masks(df, mask_rules)
    pks = set(primary_keys or [])
    # non-PK columns update on merge (the reference leaves this per-column;
    # for ingestion "merge" means upsert the whole row)
    columns = [
        Column(
            name=name,
            type=dtype,
            primary_key=name in pks,
            update_on_merge=name not in pks,
        )
        for name, dtype in df.dtypes
    ]
    asset = Asset(
        name=dest_table,
        type="ingestr",
        columns=columns,
        materialization=Materialization(
            type=MaterializationType.TABLE,
            strategy=strat,
            incremental_key=incremental_key,
            partition_by=partition_by,
        ),
    )
    from bruin_spark.operators.assets_ops import _write_df

    _write_df(spark, asset, df)


# -- ingestr-type assets -------------------------------------------------------


def resolve_ingestr_plan(asset, pipeline=None) -> tuple[str, str, dict]:
    """(source_uri, strategy, params) for an ingestr asset.

    Mirrors the reference's operator prologue (pkg/ingestr/
    operator.go:210-330): the source URI comes from an explicit
    ``source_uri`` parameter or from ``source_connection`` resolved
    against the pipeline's connection map; CDC mode rewrites the URI
    scheme + query parameters and defaults the strategy to merge.
    Pure — no I/O — so connection/CDC resolution is testable without
    live sources.
    """
    from bruin_spark.sources.uri import apply_cdc_parameters, normalize

    params = dict(asset.parameters or {})
    uri = params.get("source_uri")
    if not uri and pipeline is not None:
        conn = params.get("source_connection", "")
        uri = (getattr(pipeline, "default_connections", None) or {}).get(conn)
    if not uri:
        raise ValueError(
            f"ingestr asset {asset.name}: no source_uri parameter and no "
            "resolvable source_connection"
        )
    uri = normalize(str(uri))
    uri, params = apply_cdc_parameters(uri, params)
    strategy = params.get("incremental_strategy", "replace")
    return uri, strategy, params


def run_ingestr_asset(spark: SparkSession, asset, pipeline=None) -> None:
    """Execute a batch ingestr asset: resolve the URI, read the source,
    write with the asset's incremental strategy.  (Streaming ingestr
    assets never reach here — the scheduler routes them out of the batch
    DAG, cmd/run.go:3147-3170.)"""
    from bruin_spark.sources.masking import collect_mask_rules

    uri, strategy, params = resolve_ingestr_plan(asset, pipeline)
    pks = [c.name for c in asset.columns if getattr(c, "primary_key", False)]
    ingest(
        spark,
        uri,
        dest_table=asset.name,
        mask_rules=collect_mask_rules(asset),
        source_table=params.get("source_table"),
        source_query=params.get("source_query"),
        partition_column=params.get("partition_column"),
        num_partitions=int(params["num_partitions"]) if params.get("num_partitions") else None,
        strategy=strategy,
        incremental_key=params.get("incremental_key", ""),
        primary_keys=pks or [str(k) for k in params.get("primary_keys", [])],
        partition_by=params.get("partition_by", ""),
        file_type=params.get("file_type"),
    )
