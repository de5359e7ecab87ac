"""Secret masking of run output (ref: pkg/mask/mask.go + the logOutput
sink wiring in cmd/run.go:1223,2786-2812): every credential value a run
could print — in any of the forms it can appear as — is replaced with
``****`` before it reaches the terminal or the log file.

Forms per secret (mask.go:19-45): the {raw, base64} × {plain,
query-escaped, path-escaped} matrix, so a password is masked whether it
is printed bare, inside a URI, or base64'd.

Secrets are harvested from connection specs (mask.go's
credentialKeyMarkers matching with separators stripped; values shorter
than 8 chars are skipped so common words are never redacted,
mask.go:117-121) and from URI userinfo/query credentials.
"""

from __future__ import annotations

import base64
import io
from urllib.parse import quote, quote_plus

MASK = "****"

#: option keys whose values are secrets, matched with separators removed
#: (mask.go credentialKeyMarkers)
_CREDENTIAL_MARKERS = (
    "password", "passwd", "pwd", "passphrase", "secret", "token", "credential",
    "apikey", "accountkey", "accesskey", "privatekey", "sessionkey", "signature",
)

#: shortest value treated as a secret (mask.go minCredentialLength)
MIN_CREDENTIAL_LENGTH = 8


def secret_forms(secret: str) -> list[str]:
    """Distinct string forms one secret can appear as in output."""
    out: list[str] = []
    seen: set[str] = set()

    def add(s: str) -> None:
        if s and s not in seen:
            seen.add(s)
            out.append(s)

    b64 = base64.b64encode(secret.encode()).decode()
    for v in (secret, b64):
        add(v)
        add(quote_plus(v))
        add(quote(v, safe=""))
    return out


def _credential_key(key: str) -> bool:
    flat = "".join(ch for ch in key.lower() if ch.isalnum())
    return any(m in flat for m in _CREDENTIAL_MARKERS)


def connection_secrets(spec) -> list[str]:
    """Secret values inside one connection spec (URI string or typed
    mapping): the URI password/credential query params, or mapping
    values under credential-shaped keys.

    Every harvested value respects ``MIN_CREDENTIAL_LENGTH``: masking is
    plain find-and-replace over the whole run output, so a short
    password like ``pg`` would scrub that substring out of every asset
    name and SQL line (mask.go:117-121). URI passwords are harvested
    percent-DECODED — that is the form drivers receive and echo in
    errors; ``secret_forms`` re-derives the escaped variants.
    """
    from urllib.parse import unquote

    out: list[str] = []

    def add(v: str) -> None:
        if len(v) >= MIN_CREDENTIAL_LENGTH:
            out.append(v)

    if isinstance(spec, str):
        if "://" not in spec:
            return out
        try:
            from bruin_spark.sources.uri import parse_uri

            p = parse_uri(spec)
        except ValueError:
            return out
        if "@" in p.netloc:
            userinfo = p.netloc.rsplit("@", 1)[0]
            if ":" in userinfo:
                add(unquote(userinfo.split(":", 1)[1]))
        for k, v in p.query:
            if _credential_key(k):
                add(unquote(v))
        return out
    if isinstance(spec, dict):
        for k, v in spec.items():
            if isinstance(v, str) and (k.lower() == "password" or _credential_key(k)):
                add(v)
    return out


class Masker:
    """Replaces every form of every secret with ``****``; longest form
    first so substrings of longer secrets don't leave fragments."""

    def __init__(self, values: list[str]):
        self._seen: set[str] = set()
        self._forms: list[str] = []
        self.extend(values)

    def extend(self, values: list[str]) -> None:
        """Add more secrets (e.g. resolved later from a secrets backend);
        already-wrapped streams pick them up immediately. Safe against
        concurrent ``mask()`` from scheduler worker threads: the form
        list is rebuilt and swapped atomically (a single reference
        assignment), never sorted in place under an iterating reader —
        an in-place mutate could make the reader skip a form and let a
        secret fragment through."""
        new_forms = None
        for v in values:
            for f in secret_forms(v):
                if f not in self._seen:
                    self._seen.add(f)
                    if new_forms is None:
                        new_forms = list(self._forms)
                    new_forms.append(f)
        if new_forms is not None:
            new_forms.sort(key=len, reverse=True)
            self._forms = new_forms

    def mask(self, text: str) -> str:
        for f in self._forms:
            if f in text:
                text = text.replace(f, MASK)
        return text

    def wrap(self, stream) -> "LineMaskingWriter":
        return LineMaskingWriter(self, stream)


class LineMaskingWriter(io.TextIOBase):
    """Line-buffering writer: masks complete lines before forwarding, so
    a secret split across two ``write()`` calls is still caught
    (mask.go LineWriter). Lock-guarded: scheduler worker threads share
    the wrapped stream, and an unsynchronized buffer could interleave
    another thread's newline into the middle of a secret — leaving
    fragments no mask form matches."""

    def __init__(self, masker: Masker, sink):
        import threading

        self._masker = masker
        self._sink = sink
        self._buf = ""
        self._lock = threading.Lock()

    def write(self, s: str) -> int:
        with self._lock:
            self._buf += s
            while "\n" in self._buf:
                line, self._buf = self._buf.split("\n", 1)
                self._sink.write(self._masker.mask(line) + "\n")
        return len(s)

    def flush(self) -> None:
        with self._lock:
            if self._buf:
                self._sink.write(self._masker.mask(self._buf))
                self._buf = ""
            self._sink.flush()

    def writable(self) -> bool:
        return True
