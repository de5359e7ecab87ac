#!/usr/bin/env python
"""Fresh-session A/B for bench outliers: run each named entry in its
OWN subprocess (fresh JVM, fresh codegen cache, empty old-gen) and
record the per-entry best-of-2 next to the shared-session number from
the last full suite run.

Why this exists: the r12 driver session showed five carried entries at
2.3-3.8x their r11 numbers with byte-identical plan hashes — classic
cross-entry interference in a single long-lived JVM running a grown
67-entry suite, not a code regression.  This script produces the
isolation evidence: if the fresh-session time matches the standing
reference while the shared-session time is inflated, the regression is
the harness environment, not the plan.

Usage:  python scripts/bench_fresh_ab.py [entry ...]
        (default: the r12 adjudication list)

Results are merged into bench_details.json under "fresh_session_ab"
as {entry: {"fresh_sec": ..., "shared_sec": ...}}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: the r12 VERDICT adjudication list (plan hashes byte-identical to
#: r11, driver session 2.3-3.8x the r11 standing reference)
DEFAULT_ENTRIES = [
    "dedup_spans_incremental",
    "text_bpe_encode",
    "diff_top_values",
    "text_lm_perplexity",
    "text_tfidf_terms",
]


def main() -> int:
    entries = sys.argv[1:] or DEFAULT_ENTRIES
    sidecar_path = os.path.join(REPO, "bench_details.json")
    try:
        with open(sidecar_path) as f:
            sidecar = json.load(f)
    except Exception:
        sidecar = {}
    shared = sidecar.get("queries", {})

    ab: dict[str, dict] = {}
    failed = False
    for name in entries:
        # one entry per process: fresh JVM, nothing else has run
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), name],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        # scan stdout in REVERSE for the first line that parses to the
        # bench contract dict: a trailing diagnostic print after the
        # JSON line must not discard a successful run's evidence
        res = {}
        if proc.returncode == 0:
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    cand = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(cand, dict) and "queries" in cand:
                    res = cand
                    break
        got = res.get("queries", {})
        if name not in got:
            # keep going: each completed entry cost a full fresh-JVM
            # bench — merge the partial evidence rather than losing it
            print(f"# {name}: bench subprocess failed (rc={proc.returncode})")
            print(proc.stderr[-2000:])
            failed = True
            continue
        ab[name] = {
            "fresh_sec": got[name],
            "shared_sec": shared.get(name),
        }
        print(f"# {name}: fresh={got[name]}s shared={shared.get(name)}s")

    if ab:
        sidecar.setdefault("fresh_session_ab", {}).update(ab)
        with open(sidecar_path, "w") as f:
            json.dump(sidecar, f, indent=1)
        print(f"# merged fresh_session_ab ({len(ab)} entries) -> {sidecar_path}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
