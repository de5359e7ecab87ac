"""Secrets backends: resolve named connections from a secrets store
instead of the project .bruin.yml.

Reference parity: ``--secrets-backend {vault,doppler,aws,azure}``
(cmd/secrets_backend.go, env-configured clients in pkg/secrets/*.go).
Each backend validates the exact same ``BRUIN_*`` environment
configuration the reference requires. ``vault`` (token auth) and
``doppler`` perform a LIVE fetch over plain HTTP(S) matching the
reference's wire contract (KV-v2 read / secrets download); vault's
Kubernetes role auth and the aws/azure backends need an in-cluster
identity or a cloud SDK and stay gated
(``SecretsBackendUnavailable`` carries the validated config so callers
and tests can assert construction). An additional ``env`` backend is
fully functional with zero dependencies: each connection lives in a
``BRUIN_CONNECTION_<NAME>`` environment variable as a URI string or a
JSON typed mapping — the natural backend for CI and for clusters where
the scheduler injects secrets into the driver environment.

Selection: the ``--secrets-backend`` CLI flag or the
``BRUIN_SECRETS_BACKEND`` environment variable (flag wins), mirroring
the reference's flag/env sourcing.
"""

from __future__ import annotations

import json
import os

#: backend -> (required env vars, optional env vars) — the reference's
#: FromEnv constructors (pkg/secrets/{vault,doppler,aws_secretsmanager,
#: azure_keyvault}.go)
_BACKEND_ENV: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    "vault": (
        ("BRUIN_VAULT_HOST", "BRUIN_VAULT_PATH", "BRUIN_VAULT_MOUNT_PATH"),
        ("BRUIN_VAULT_TOKEN", "BRUIN_VAULT_ROLE", "BRUIN_VAULT_K8S_AUTH_MOUNT"),
    ),
    # project + config are required, matching NewDopplerClientFromEnv
    # (pkg/secrets/doppler.go:86-99 errors when any is missing)
    "doppler": (
        ("BRUIN_DOPPLER_TOKEN", "BRUIN_DOPPLER_PROJECT", "BRUIN_DOPPLER_CONFIG"),
        (),
    ),
    "aws": (
        ("BRUIN_AWS_ACCESS_KEY_ID", "BRUIN_AWS_SECRET_ACCESS_KEY", "BRUIN_AWS_REGION"),
        ("BRUIN_AWS_SESSION_TOKEN",),
    ),
    "azure": (
        ("BRUIN_AZURE_KEYVAULT_URL",),
        (
            "BRUIN_AZURE_AUTH_METHOD",
            "BRUIN_AZURE_TENANT_ID",
            "BRUIN_AZURE_CLIENT_ID",
            "BRUIN_AZURE_CLIENT_SECRET",
        ),
    ),
}


#: every valid --secrets-backend value
KNOWN_BACKENDS = frozenset({"env", *_BACKEND_ENV})


class SecretsBackendUnavailable(NotImplementedError):
    """The backend's configuration validated, but the store client /
    network is not available in this deployment."""

    def __init__(self, backend: str, config: dict):
        self.backend = backend
        self.config = config
        super().__init__(
            f"secrets backend {backend!r} configured ({sorted(config)}); its "
            f"client is not available in this deployment — use the 'env' "
            f"backend (BRUIN_CONNECTION_<NAME> vars) or the project .bruin.yml"
        )


def selected_backend(flag_value: str | None = None) -> str:
    """The active backend name: flag first, then BRUIN_SECRETS_BACKEND."""
    return (flag_value or os.environ.get("BRUIN_SECRETS_BACKEND", "")).strip()


def lookup_connection(backend: str, name: str):
    """Resolve one named connection spec (URI string or typed mapping)
    from ``backend``. Raises ValueError on unknown backend / missing
    config / unknown connection; SecretsBackendUnavailable when the
    validated backend needs a client this deployment lacks."""
    if backend == "env":
        key = f"BRUIN_CONNECTION_{name.upper().replace('-', '_')}"
        raw = os.environ.get(key)
        if raw is None:
            raise ValueError(
                f"unknown connection {name!r} in secrets backend 'env' "
                f"(no {key} environment variable)"
            )
        raw = raw.strip()
        if raw.startswith("{"):
            try:
                return json.loads(raw)
            except json.JSONDecodeError as exc:
                raise ValueError(f"{key} holds invalid JSON: {exc}") from exc
        return raw
    if backend not in _BACKEND_ENV:
        raise ValueError(
            f"unknown secrets backend {backend!r}; expected one of: "
            f"env, {', '.join(sorted(_BACKEND_ENV))}"
        )
    required, optional = _BACKEND_ENV[backend]
    missing = [v for v in required if not os.environ.get(v, "").strip()]
    if missing:
        raise ValueError(
            f"secrets backend {backend!r} is missing required environment "
            f"variable(s): {', '.join(missing)}"
        )
    config = {
        v: os.environ[v]
        for v in (*required, *optional)
        if os.environ.get(v, "").strip()
    }
    if backend == "vault":
        return _fetch_vault(name, config)
    if backend == "doppler":
        return _fetch_doppler(name, config)
    # aws/azure need the cloud SDK + request signing — still gated
    raise SecretsBackendUnavailable(backend, config)


def _http_get_json(url: str, headers: dict[str, str], timeout: float = 10.0):
    import urllib.request

    req = urllib.request.Request(url, headers=headers)  # noqa: S310 - configured host
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        return json.loads(resp.read().decode("utf-8"))


def _fetch_vault(name: str, config: dict):
    """Live KV-v2 read: GET {host}/v1/{mount}/data/{path}/{name} with
    X-Vault-Token; the secret payload must carry ``type`` (non-empty
    string) + ``details`` (object) exactly like the reference's client
    (pkg/secrets/vault.go:446-466). Kubernetes role auth (BRUIN_VAULT_ROLE
    without a token) needs an in-cluster service account and stays gated."""
    import urllib.error

    token = config.get("BRUIN_VAULT_TOKEN", "")
    if not token:
        raise SecretsBackendUnavailable("vault", config)
    host = config["BRUIN_VAULT_HOST"].rstrip("/")
    mount = config["BRUIN_VAULT_MOUNT_PATH"].strip("/")
    path = config["BRUIN_VAULT_PATH"].strip("/")
    url = f"{host}/v1/{mount}/data/{path}/{name}"
    try:
        payload = _http_get_json(url, {"X-Vault-Token": token})
    except urllib.error.HTTPError as exc:
        if exc.code == 404:
            raise ValueError(f"secret {name!r} not found in Vault") from exc
        # no response body in the message: it could echo secret material
        raise ValueError(
            f"failed to read secret {name!r} from Vault (HTTP {exc.code})"
        ) from exc
    except OSError as exc:
        raise ValueError(
            f"failed to reach Vault at {host}: {type(exc).__name__}"
        ) from exc
    data = (payload.get("data") or {}).get("data") or {}
    typ = data.get("type")
    details = data.get("details")
    if not isinstance(typ, str) or not typ.strip() or not isinstance(details, dict):
        raise ValueError(
            f"secret {name!r} must contain both 'type' (non-empty string) "
            "and 'details' (object)"
        )
    return {"type": typ, **details}


def _fetch_doppler(name: str, config: dict):
    """Live Doppler fetch: one secrets-download call, the named secret's
    value is itself a JSON object (pkg/secrets/doppler.go:31-74).
    ``BRUIN_DOPPLER_API_URL`` overrides the API base (tests/self-hosted
    proxies); default matches the reference's hardcoded endpoint."""
    import urllib.error
    from urllib.parse import urlencode

    base = os.environ.get(
        "BRUIN_DOPPLER_API_URL", "https://api.doppler.com/v3"
    ).rstrip("/")
    qs = urlencode(
        {
            "project": config["BRUIN_DOPPLER_PROJECT"],
            "config": config["BRUIN_DOPPLER_CONFIG"],
            "format": "json",
        }
    )
    url = f"{base}/configs/config/secrets/download?{qs}"
    try:
        payload = _http_get_json(
            url, {"Authorization": f"Bearer {config['BRUIN_DOPPLER_TOKEN']}"}
        )
    except urllib.error.HTTPError as exc:
        raise ValueError(f"doppler API returned status {exc.code}") from exc
    except OSError as exc:
        raise ValueError(
            f"failed to reach Doppler: {type(exc).__name__}"
        ) from exc
    if name not in payload:
        raise ValueError(f"secret {name!r} not found in Doppler")
    value = payload[name]
    if not isinstance(value, str):
        raise ValueError(f"secret {name!r} is not a string")
    try:
        return json.loads(value)
    except json.JSONDecodeError as exc:
        raise ValueError(f"failed to parse secret {name!r} as JSON") from exc
