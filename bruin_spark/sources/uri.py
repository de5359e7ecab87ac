"""Ingestion URI handling: normalization, parsing, CDC scheme rewriting,
and the streaming-asset classifier.

Re-expresses the reference's ingestr URI layer:
- normalize / scheme-tolerant parse: pkg/ingestruri/uri.go:74-116
  (hand-split scheme so ``ps_mysql://`` parses; url stdlib rejects it)
- CDC scheme map: pkg/ingestruri/uri.go:118-149
- CDC parameter application (publication/slot/grpc/server_id/
  capture_instance/..., mssql change-tracking ``+ct``, auto merge
  strategy, ``cdc_mode: stream`` alias): pkg/ingestr/operator.go:229-320
- streaming classifier: pkg/ingestr/operator.go:584-609
  (IsStreamingAsset — the single predicate the run command uses to route
  never-terminating assets out of the batch DAG, cmd/run.go:3147-3170)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import parse_qsl, quote, urlencode, urlparse


def normalize(uri: str) -> str:
    """``scheme:rest`` -> ``scheme://rest`` (already-``//`` left alone).
    Raw ``jdbc:<subprotocol>://...`` URIs pass through VERBATIM — they
    are already in the form the JDBC reader wants, and inserting ``//``
    after ``jdbc`` would corrupt them."""
    if uri.startswith("jdbc:"):
        return uri
    parts = uri.split(":", 1)
    if len(parts) != 2 or parts[1].startswith("//"):
        return uri
    return parts[0] + "://" + parts[1]


@dataclass
class SourceURI:
    """A parsed ingestr URI that tolerates non-stdlib schemes
    (``ps_mysql``, ``mysql+pymysql``, ``postgres+cdc`` ...)."""

    scheme: str
    netloc: str = ""
    path: str = ""
    query: list[tuple[str, str]] = field(default_factory=list)
    fragment: str = ""

    def query_dict(self) -> dict[str, str]:
        return dict(self.query)

    def set_param(self, key: str, value: str) -> None:
        self.query = [(k, v) for k, v in self.query if k != key]
        self.query.append((key, value))

    def render(self) -> str:
        out = f"{self.scheme}://{self.netloc}{self.path}"
        if self.query:
            out += "?" + urlencode(self.query, quote_via=quote)
        if self.fragment:
            out += "#" + self.fragment
        return out


def parse_uri(uri: str) -> SourceURI:
    scheme, sep, rest = uri.partition("://")
    if not sep:
        raise ValueError(f"uri {uri!r} has no scheme")
    # parse the remainder under a placeholder scheme, then restore —
    # urllib refuses underscores/plus-suffixes in schemes it validates
    p = urlparse("placeholder://" + rest)
    return SourceURI(
        scheme=scheme,
        netloc=p.netloc,
        path=p.path,
        query=parse_qsl(p.query, keep_blank_values=True),
        fragment=p.fragment,
    )


# -- CDC ---------------------------------------------------------------------

_CDC_PREFIXES = ("mysql", "mariadb", "vitess", "ps_mysql", "mongodb", "mssql", "sqlserver")

#: sources that carry a CDC op ENVELOPE in their payload rather than a
#: database replication feed — cdc: true passes through unchanged
_ENVELOPE_SCHEMES = {
    "csv", "json", "jsonl", "ndjson", "parquet", "avro", "file",
    "kafka", "kinesis", "rabbitmq",
    "s3", "s3a", "gs", "gcs", "abfss", "wasbs", "http", "https",
}


def cdc_scheme(scheme: str) -> tuple[str, bool]:
    """CDC counterpart of a scheme (uri.go:118-132). Returns
    (scheme, supported)."""
    if scheme.endswith("+cdc"):
        return scheme, True
    if "postgresql" in scheme:
        return scheme.replace("postgresql", "postgres+cdc"), True
    if "postgres" in scheme:
        return scheme.replace("postgres", "postgres+cdc"), True
    if scheme.startswith(_CDC_PREFIXES):
        return scheme + "+cdc", True
    return scheme, False


def to_cdc(uri: str) -> str:
    """Rewrite a URI onto its CDC scheme; error when unsupported."""
    p = parse_uri(uri)
    scheme, ok = cdc_scheme(p.scheme)
    if not ok:
        raise ValueError(f"scheme {p.scheme!r} does not support change data capture")
    p.scheme = scheme
    return p.render()


def _is_mssql(scheme: str) -> bool:
    return scheme.startswith(("mssql", "sqlserver"))


def _is_mongodb(scheme: str) -> bool:
    return scheme.startswith("mongodb")


def apply_cdc_parameters(source_uri: str, params: dict) -> tuple[str, dict]:
    """CDC mode: rewrite the source URI and derive run parameters
    (operator.go:229-320).

    Returns ``(rewritten_uri, updated_params)``; ``params`` is not
    mutated.  No-op unless ``params["cdc"] == "true"``.
    """
    params = dict(params)
    if str(params.get("cdc", "")).lower() != "true":
        return source_uri, params

    p = parse_uri(normalize(source_uri))
    base_scheme = p.scheme
    p.scheme, _supported = cdc_scheme(base_scheme)
    if not _supported and base_scheme.split("+")[0] not in _ENVELOPE_SCHEMES:
        # a DATABASE scheme without CDC support would silently degrade
        # to a plain full-table read while the user believes they
        # configured change data capture; file/stream sources instead
        # carry the op envelope themselves and pass through unchanged
        raise ValueError(
            f"cdc: true on scheme {base_scheme!r}, which does not support "
            "change data capture"
        )

    # SQL Server Change Tracking is selected per-asset; the +ct source
    # takes no query parameters
    change_tracking = _is_mssql(base_scheme) and params.get("cdc_sql_capture") == "change_tracking"
    if change_tracking:
        p.scheme = p.scheme.removesuffix("+cdc") + "+ct"

    def fwd(param: str, qkey: str) -> None:
        v = params.get(param)
        if v:
            p.set_param(qkey, str(v))

    fwd("cdc_publication", "publication")  # PostgreSQL logical replication
    fwd("cdc_slot", "slot")
    fwd("cdc_grpc_port", "grpc_port")  # Vitess VStream
    fwd("cdc_grpc_host", "grpc_host")
    fwd("cdc_grpc_tls", "grpc_tls")
    fwd("cdc_server_id", "server_id")  # MySQL binlog
    fwd("cdc_tls", "tls")
    if _is_mssql(base_scheme) and not change_tracking:
        fwd("cdc_capture_instance", "capture_instance")
        fwd("cdc_poll_interval", "poll_interval")
    if _is_mongodb(base_scheme):
        fwd("cdc_max_await_time", "max_await_time")
        fwd("cdc_schema_sample_size", "schema_sample_size")
    fwd("cdc_dest_schema", "dest_schema")
    fwd("cdc_state_id", "state_id")

    # cdc_mode: stream is the deprecated alias for continuous ingestion
    if params.get("cdc_mode") == "stream":
        params["stream"] = "true"
    # CDC implies upsert-by-key unless the asset chose otherwise
    params.setdefault("incremental_strategy", "merge")
    return p.render(), params


# -- streaming classifier ----------------------------------------------------


def is_streaming_asset(asset) -> bool:
    """True when an ingestr asset runs as a continuous, never-terminating
    stream rather than a one-shot batch load (operator.go:596-609):
    ``stream: true``, or CDC with ``cdc_mode: stream``.  The batch
    scheduler uses this single predicate to route streaming assets out of
    the DAG (cmd/run.go:3147-3170)."""
    if asset is None or getattr(asset, "type", "") != "ingestr":
        return False
    params = getattr(asset, "parameters", {}) or {}
    if str(params.get("stream", "")).lower() == "true":
        return True
    if str(params.get("cdc", "")).lower() == "true":
        return params.get("cdc_mode") == "stream"
    return False
