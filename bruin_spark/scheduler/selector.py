"""Asset selector expressions (ref: pkg/pipeline/selector.go:29-600).

Grammar, identical to the reference:

- whitespace-separated terms UNION; comma-separated parts within a term
  INTERSECT: ``"a,tag:daily b"`` = (a AND tagged daily) OR b
- graph operators around a core selector:
  ``+name`` all ancestors, ``2+name`` ancestors to depth 2,
  ``name+`` all descendants, ``name+3`` descendants to depth 3,
  ``@name`` the connected closure (base + descendants + all of their
  ancestors) — cannot combine ``@`` with ``+``
- core matchers: bare value matches name/file/path/fqn; or explicit
  ``tag:``, ``path:``, ``file:``, ``fqn:`` methods
- values support Go ``path.Match`` wildcards (``*`` ``?`` ``[...]``,
  ``*`` does not cross ``/``)
"""

from __future__ import annotations

import os
import re

from bruin_spark.model.pipeline import Asset, Pipeline

_METHODS = ("tag", "path", "file", "fqn")


class SelectorError(ValueError):
    pass


def _has_wildcard(pattern: str) -> bool:
    return any(ch in pattern for ch in "*?[")


def _go_path_match(pattern: str, candidate: str) -> bool:
    """Go path.Match: '*' and '?' never cross a '/'."""
    out = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "*":
            out.append("[^/]*")
        elif ch == "?":
            out.append("[^/]")
        elif ch == "[":
            j = i + 1
            if j < len(pattern) and pattern[j] == "^":
                j += 1
            if j < len(pattern) and pattern[j] == "]":
                j += 1
            while j < len(pattern) and pattern[j] != "]":
                j += 1
            if j >= len(pattern):
                return False  # malformed class: Go returns ErrBadPattern
            cls = pattern[i + 1 : j].replace("\\", "\\\\")
            out.append("[" + cls + "]")
            i = j
        else:
            out.append(re.escape(ch))
        i += 1
    return re.fullmatch("".join(out), candidate) is not None


def _match_scalar(pattern: str, candidate: str) -> bool:
    if not _has_wildcard(pattern):
        return pattern == candidate
    return _go_path_match(pattern, candidate)


def _match_path(pattern: str, candidate: str) -> bool:
    pattern = pattern.replace(os.sep, "/")
    pattern = pattern.removeprefix("./").removeprefix("/")
    if not _has_wildcard(pattern):
        pattern = pattern.rstrip("/")
        return candidate == pattern or candidate.startswith(pattern + "/")
    if _go_path_match(pattern, candidate):
        return True
    prefix = os.path.dirname(candidate)
    while prefix not in (".", "/", "", candidate):
        if _go_path_match(pattern, prefix):
            return True
        prefix = os.path.dirname(prefix)
    return False


def _trim_all_extensions(name: str) -> str:
    while True:
        stem, ext = os.path.splitext(name)
        if not ext:
            return name
        name = stem


class _Resolver:
    def __init__(self, pipeline: Pipeline):
        self.pipeline = pipeline
        self.pipeline_dir = pipeline.path or ""
        by_name = {a.name: a for a in pipeline.assets}
        self.upstream: dict[str, list[Asset]] = {a.name: [] for a in pipeline.assets}
        self.downstream: dict[str, list[Asset]] = {a.name: [] for a in pipeline.assets}
        for a in pipeline.assets:
            for up in a.depends:
                if getattr(up, "type", "asset") not in ("", "asset"):
                    continue
                # symbolic edges are lineage-only: the scheduler creates
                # no execution edge, so selector expansion must agree
                if getattr(up, "mode", "full") == "symbolic":
                    continue
                parent = by_name.get(up.value)
                if parent is None:
                    continue
                if parent not in self.upstream[a.name]:
                    self.upstream[a.name].append(parent)
                if a not in self.downstream[parent.name]:
                    self.downstream[parent.name].append(a)

    # -- candidates ---------------------------------------------------------

    def _path_candidates(self, a: Asset) -> list[str]:
        out: list[str] = []
        if a.file_path:
            raw = os.path.normpath(a.file_path)
            cands = [raw.replace(os.sep, "/")]
            if self.pipeline_dir:
                try:
                    cands.append(
                        os.path.normpath(os.path.relpath(raw, self.pipeline_dir)).replace(os.sep, "/")
                    )
                except ValueError:
                    pass
            for c in cands:
                c = c.removeprefix("./").removeprefix("/")
                if c and c not in out:
                    out.append(c)
        return out

    def _file_candidates(self, a: Asset) -> list[str]:
        out: list[str] = []
        if a.file_path:
            base = os.path.basename(a.file_path)
            for c in (base, _trim_all_extensions(base)):
                if c and c not in out:
                    out.append(c)
        return out

    def _fqn_candidates(self, a: Asset) -> list[str]:
        out: list[str] = []

        def add(c: str) -> None:
            c = c.strip(".")
            if c and c not in out:
                out.append(c)

        add(a.name)
        if self.pipeline.name:
            add(f"{self.pipeline.name}.{a.name}")
        for p in self._path_candidates(a):
            dotted = _trim_all_extensions(p).replace("/", ".")
            add(dotted)
            if self.pipeline.name:
                add(f"{self.pipeline.name}.{dotted}")
        return out

    # -- matching ------------------------------------------------------------

    def _matches(self, a: Asset, method: str, value: str) -> bool:
        if method == "tag":
            return any(_match_scalar(value, t) for t in a.tags)
        if method == "path":
            return any(_match_path(value, c) for c in self._path_candidates(a))
        if method == "file":
            return any(_match_scalar(value, c) for c in self._file_candidates(a))
        if method == "fqn":
            return any(_match_scalar(value, c) for c in self._fqn_candidates(a))
        # default: name, then file, then path, then fqn
        return (
            _match_scalar(value, a.name)
            or any(_match_scalar(value, c) for c in self._file_candidates(a))
            or any(_match_path(value, c) for c in self._path_candidates(a))
            or any(_match_scalar(value, c) for c in self._fqn_candidates(a))
        )

    def _match_core(self, core: str) -> set[str]:
        method, value = "", core
        if ":" in core:
            cand, _, rest = core.partition(":")
            if cand in _METHODS:
                method, value = cand, rest
        if not value:
            raise SelectorError(f"invalid selector {core!r}")
        return {a.name for a in self.pipeline.assets if self._matches(a, method, value)}

    # -- graph expansion -------------------------------------------------------

    def _expand(self, base: set[str], graph: dict[str, list[Asset]], depth: int) -> set[str]:
        expanded: set[str] = set()
        queue = [(n, 0) for n in base]
        visited = {n: 0 for n in base}
        while queue:
            name, d = queue.pop(0)
            if depth >= 0 and d >= depth:
                continue
            for nxt in graph.get(name, []):
                nd = d + 1
                if nxt.name in visited and visited[nxt.name] <= nd:
                    continue
                visited[nxt.name] = nd
                expanded.add(nxt.name)
                queue.append((nxt.name, nd))
        return expanded

    def _expand_at(self, base: set[str]) -> set[str]:
        resolved = set(base)
        descendants = self._expand(base, self.downstream, -1)
        resolved |= descendants
        resolved |= self._expand(base, self.upstream, -1)
        resolved |= self._expand(descendants, self.upstream, -1)
        return resolved

    # -- terms ------------------------------------------------------------------

    def _resolve_single(self, raw: str) -> set[str]:
        selector = raw.strip()
        at = selector.startswith("@")
        if at:
            selector = selector[1:]
        up_depth, selector = _parse_prefix_depth(selector)
        down_depth, selector = _parse_suffix_depth(selector)
        selector = selector.strip()
        if not selector:
            raise SelectorError(f"invalid selector {raw!r}")
        if at and (up_depth or down_depth):
            raise SelectorError(f"invalid selector {raw!r}: cannot combine @ with +")
        base = self._match_core(selector)
        if at:
            return self._expand_at(base)
        resolved = set(base)
        if up_depth:
            resolved |= self._expand(base, self.upstream, up_depth)
        if down_depth:
            resolved |= self._expand(base, self.downstream, down_depth)
        return resolved

    def _resolve_union_term(self, term: str) -> set[str]:
        current: set[str] | None = None
        for part in term.split(","):
            part = part.strip()
            if not part:
                raise SelectorError(f"invalid selector {term!r}")
            resolved = self._resolve_single(part)
            current = resolved if current is None else (current & resolved)
        return current or set()


def _parse_prefix_depth(selector: str) -> tuple[int, str]:
    if not selector:
        return 0, selector
    if selector[0] == "+":
        return -1, selector[1:]
    i = 0
    while i < len(selector) and selector[i].isdigit():
        i += 1
    if i == 0 or i >= len(selector) or selector[i] != "+":
        return 0, selector
    depth = int(selector[:i])
    if depth <= 0:
        raise SelectorError(f"invalid selector {selector!r}")
    return depth, selector[i + 1 :]


def _parse_suffix_depth(selector: str) -> tuple[int, str]:
    if not selector:
        return 0, selector
    if selector.endswith("+"):
        return -1, selector[:-1]
    i = len(selector) - 1
    while i >= 0 and selector[i].isdigit():
        i -= 1
    if i < 0 or i == len(selector) - 1 or selector[i] != "+":
        return 0, selector
    depth = int(selector[i + 1 :])
    if depth <= 0:
        raise SelectorError(f"invalid selector {selector!r}")
    return depth, selector[:i]


def resolve_selector_assets(selector: str, pipeline: Pipeline) -> list[Asset]:
    """Resolve a selector expression to assets in pipeline order; raises
    SelectorError for empty/invalid selectors or zero matches."""
    selector = (selector or "").strip()
    if not selector:
        raise SelectorError("selector cannot be empty")
    resolver = _Resolver(pipeline)
    resolved: set[str] = set()
    for term in selector.split():
        resolved |= resolver._resolve_union_term(term)
    ordered = [a for a in pipeline.assets if a.name in resolved]
    if not ordered:
        raise SelectorError(f"selector {selector!r} matched no assets")
    return ordered
