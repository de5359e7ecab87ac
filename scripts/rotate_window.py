#!/usr/bin/env python3
"""Regenerate the driver correctness window (r8 verdict ask #1).

The driver's per-round correctness gate verifies only the FIRST 50
entries of ``collect_queries()``.  This script rewrites the generated
block in ``bruin_spark/workloads/__init__.py`` so that the window is:

    1. ``_ROTATION_PINS`` — entries whose plan/values changed this
       round (set by hand each round), in pin order;
    2. every other registry entry ordered by STALENESS: the round of
       its newest green driver verdict ascending (never-verified
       entries first), canonical registry order as the tiebreak.

Green = ``hash_match is True`` in a committed ``CORRECTNESS_r*.json``.
With ~110 registry entries and 50 slots, every entry re-earns a driver
verdict every ~2-3 rounds.  ``tests/test_rotation.py`` recomputes this
deterministically and fails when the committed window is stale, so a
round cannot silently skip the rotation.

Usage:  python scripts/rotate_window.py [--check]
        --check: exit 1 if the committed window differs (no rewrite).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WINDOW_SIZE = 50

sys.path.insert(0, str(REPO))


def last_green_rounds(
    repo: Path = REPO, max_round: int | None = None
) -> tuple[dict[str, int], int]:
    """(entry -> newest round with a green driver verdict, newest round
    seen).  Entries with no green verdict are absent from the dict.

    ``max_round`` caps which files CONTRIBUTE verdicts (the returned
    ``basis`` still reflects the newest file on disk): the rotation test
    replays the window against the history as of its recorded basis, and
    an entry that went green in a NEWER round must fall back to its
    newest verdict <= basis — not be treated as never-verified, which
    would spuriously reorder the expected window the moment the driver
    commits its own post-round CORRECTNESS file."""
    last: dict[str, int] = {}
    basis = 0
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        basis = max(basis, rnd)
        if max_round is not None and rnd > max_round:
            continue
        for name, v in json.loads(f.read_text()).items():
            if v.get("hash_match") is True:
                last[name] = max(last.get(name, 0), rnd)
    return last, basis


def compute_window(
    registry_order: list[str],
    pins: tuple[str, ...],
    last_green: dict[str, int],
) -> list[str]:
    missing = [p for p in pins if p not in registry_order]
    if missing:
        raise ValueError(f"_ROTATION_PINS not in the registry: {missing}")
    idx = {n: i for i, n in enumerate(registry_order)}
    rest = [n for n in registry_order if n not in pins]
    rest.sort(key=lambda n: (last_green.get(n, -1), idx[n]))
    return (list(pins) + rest)[:WINDOW_SIZE]


def render_block(window: list[str], basis: int, last_green: dict[str, int]) -> str:
    lines = [
        "# --- BEGIN GENERATED WINDOW (scripts/rotate_window.py; do not hand-edit) ---",
        "#: newest CORRECTNESS_r*.json round the window below was computed from",
        f"_ROTATION_BASIS = {basis}",
        "_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (",
    ]
    for n in window:
        green = last_green.get(n)
        tag = f"green r{green:02d}" if green else "never driver-verified"
        lines.append(f'    "{n}",  # {tag}')
    lines.append(")")
    lines.append("# --- END GENERATED WINDOW ---")
    return "\n".join(lines)


def main(argv: list[str]) -> int:
    check_only = "--check" in argv
    from bruin_spark.workloads import _ROTATION_PINS, collect_registry

    registry_order = list(collect_registry())
    last_green, basis = last_green_rounds()
    window = compute_window(registry_order, _ROTATION_PINS, last_green)
    block = render_block(window, basis, last_green)

    target = REPO / "bruin_spark" / "workloads" / "__init__.py"
    src = target.read_text()
    pat = re.compile(
        r"# --- BEGIN GENERATED WINDOW.*?# --- END GENERATED WINDOW ---",
        re.DOTALL,
    )
    if not pat.search(src):
        print("generated-window markers not found", file=sys.stderr)
        return 2
    new = pat.sub(lambda _: block, src, count=1)
    if new == src:
        print(f"window up to date (basis r{basis:02d}, {len(window)} entries)")
        return 0
    if check_only:
        print("window is STALE — run scripts/rotate_window.py", file=sys.stderr)
        return 1
    target.write_text(new)
    never = [n for n in window if n not in last_green]
    print(
        f"rewrote window: basis r{basis:02d}, {len(window)} entries, "
        f"{len(never)} never-verified first: {never}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
