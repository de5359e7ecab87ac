"""Secrets backends: resolve named connections from a secrets store
instead of the project .bruin.yml.

Reference parity: ``--secrets-backend {vault,doppler,aws,azure}``
(cmd/secrets_backend.go, env-configured clients in pkg/secrets/*.go).
Those four are network clients against external services; here each
backend validates the exact same ``BRUIN_*`` environment configuration
the reference requires, and the fetch itself is gated: unavailable in
this deployment unless the relevant client library + service exist
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
    "doppler": (("BRUIN_DOPPLER_TOKEN",), ("BRUIN_DOPPLER_PROJECT", "BRUIN_DOPPLER_CONFIG")),
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
    raise SecretsBackendUnavailable(backend, config)
