"""Shared parser for the reference's Go test tables.

Reads ``tests := []struct{...}{ {...}, ... }`` slices out of a Go test
function at TEST time (data-only harvesting — no code is copied; the
reference's expectations become our gates). Used by
test_jinja_reference_cases.py and test_builtins_reference_cases.py.
"""

from __future__ import annotations

import re
from pathlib import Path


def func_block(ref: Path, name: str) -> str:
    src = ref.read_text()
    m = re.search(rf"func {name}\(t \*testing\.T\) \{{\n(.*?)\n\}}\n", src, re.S)
    assert m, f"reference test func {name} not found in {ref} — tables moved?"
    return m.group(1)


def split_top(text: str, sep: str = ",") -> list[str]:
    """Split on `sep` at brace/bracket/paren depth 0, string-aware."""
    parts, depth, start, i = [], 0, 0, 0
    in_str = in_raw = False
    while i < len(text):
        c = text[i]
        if in_str:
            if c == "\\":
                i += 1
            elif c == '"':
                in_str = False
        elif in_raw:
            if c == "`":
                in_raw = False
        elif c == '"':
            in_str = True
        elif c == "`":
            in_raw = True
        elif c in "{[(":
            depth += 1
        elif c in "}])":
            depth -= 1
        elif c == sep and depth == 0:
            parts.append(text[start:i])
            start = i + 1
        i += 1
    tail = text[start:]
    if tail.strip():
        parts.append(tail)
    return parts


def unquote(v: str):
    """Interpret one Go value: string / raw string / bool / int /
    []string / Context map / test-stub func / bare identifier."""
    v = v.strip()
    if v.startswith('"'):
        body = v[1:-1]
        return body.encode().decode("unicode_escape")
    if v.startswith("`"):
        return v[1:-1]
    if v in ("true", "false"):
        return v == "true"
    if re.fullmatch(r"-?\d+", v):
        return int(v)
    if v.startswith("[]string{"):
        inner = v[len("[]string{") : v.rfind("}")]
        return [unquote(p) for p in split_top(inner) if p.strip()]
    if v.startswith("Context{"):
        inner = v[len("Context{") : v.rfind("}")]
        out = {}
        for pair in split_top(inner):
            if not pair.strip():
                continue
            k, _, val = pair.partition(":")
            out[unquote(k)] = unquote(val)
        return out
    if v.startswith("func("):
        # harvest the constant a test stub returns: `return "X"`
        m = re.search(r'return\s+"((?:[^"\\]|\\.)*)"', v)
        assert m, f"unsupported func literal in reference table: {v[:80]}"
        ret = m.group(1).encode().decode("unicode_escape")
        return lambda *a, **kw: ret
    if re.fullmatch(r"[\w.]+", v):
        return v  # bare identifier (e.g. jinja.PlatformSpark)
    raise AssertionError(f"unsupported Go value in reference table: {v[:80]}")


def entries(block: str) -> list[dict]:
    """Parse `tests := []struct{...}{ {...}, ... }` into dicts."""
    m = re.search(r"tests := \[\]struct \{.*?\n\t\}\{\n(.*)\n\t\}\n\s*for ", block, re.S)
    assert m, "tests table not found"
    body = m.group(1)
    out = []
    for item in split_top(body):
        item = item.strip()
        if not item:
            continue
        assert item.startswith("{") and item.endswith("}"), item[:60]
        fields = {}
        for pair in split_top(item[1:-1]):
            if not pair.strip():
                continue
            k, _, val = pair.partition(":")
            fields[k.strip()] = unquote(val)
        out.append(fields)
    return out
