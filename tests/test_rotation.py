"""The driver-window rotation gate (r8 verdict ask #1).

The driver verifies only the first 50 registry entries per round, so a
window that stops rotating leaves the other ~60 entries without fresh
driver verdicts.  These tests make the rotation mechanical: the
committed ``_DRIVER_WINDOW_PRIORITY`` must equal what
``scripts/rotate_window.py`` computes from the committed
``CORRECTNESS_r*.json`` history, and the basis round must stay within
one round of the newest file — so a round that ends without re-running
the script fails here at the NEXT round's start, never silently.
"""

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location(
    "rotate_window", REPO / "scripts" / "rotate_window.py"
)
rotate_window = importlib.util.module_from_spec(spec)
sys.modules["rotate_window"] = rotate_window
spec.loader.exec_module(rotate_window)


def _workloads():
    from bruin_spark import workloads

    return workloads


def test_window_matches_rotation_of_committed_history():
    w = _workloads()
    # replay against the history as of the recorded basis: files newer
    # than the basis (the driver's own post-round CORRECTNESS commit)
    # must not contribute verdicts, but an entry green BOTH before and
    # after the basis keeps its newest pre-basis round — dropping it
    # entirely would recompute it as never-verified and spuriously
    # reorder the expected window (found in r10 review)
    last_green, _ = rotate_window.last_green_rounds(max_round=w._ROTATION_BASIS)
    expected = rotate_window.compute_window(
        list(w.collect_registry()), w._ROTATION_PINS, last_green
    )
    assert list(w._DRIVER_WINDOW_PRIORITY) == expected, (
        "driver window is stale — run scripts/rotate_window.py "
        "(and pin this round's plan-changed entries in _ROTATION_PINS)"
    )


def test_post_round_correctness_commit_does_not_invalidate_window(tmp_path):
    """The driver commits CORRECTNESS_r{N+1}.json after the round whose
    basis is rN; entries re-verified in it must keep their newest
    pre-basis verdict when replaying the window, not become
    'never-verified' (the r10 review bug)."""
    import json

    g = {"hash_match": True, "rows_match": True, "schema_match": True}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({"a": g, "b": g}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"b": g}))
    # post-round commit: 'a' goes green again in r03, newer than basis r02
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({"a": g}))
    capped, basis = rotate_window.last_green_rounds(tmp_path, max_round=2)
    assert basis == 3  # freshness check still sees the newest file
    assert capped == {"a": 1, "b": 2}  # 'a' falls back, not dropped
    uncapped, _ = rotate_window.last_green_rounds(tmp_path)
    assert uncapped == {"a": 3, "b": 2}


def test_rotation_basis_is_fresh():
    w = _workloads()
    _, newest = rotate_window.last_green_rounds()
    assert newest - w._ROTATION_BASIS <= 1, (
        f"rotation basis r{w._ROTATION_BASIS:02d} lags the newest "
        f"CORRECTNESS file r{newest:02d} by more than one round — a "
        f"round ended without re-running scripts/rotate_window.py"
    )


def test_window_is_50_unique_registry_names():
    w = _workloads()
    names = w._DRIVER_WINDOW_PRIORITY
    assert len(names) == 50 and len(set(names)) == 50
    reg = set(w.collect_registry())
    assert set(names) <= reg
    assert set(w._ROTATION_PINS) <= reg
    # pins lead the window in pin order
    assert names[: len(w._ROTATION_PINS)] == w._ROTATION_PINS


def test_every_registry_entry_rewindows_within_four_rounds():
    """The staleness sort guarantees bounded re-verification latency:
    any entry excluded this round has last_green >= every included
    non-pin entry's, so after ~ceil((N - pins) / (50 - pins)) rounds it
    must re-enter.  The bound was 3 rounds up to 150 registry entries;
    crossing 150 in r12b made 3 mechanically impossible with the
    driver's fixed 50-slot window, so the gate is now 4.  Affordable
    pins under the 4-round bound: N <= 200 - 3*pins (at 154 entries up
    to 15 pins; from ~197 entries even one pin breaks the bound) —
    still prefer proving plans unchanged over pinning."""
    w = _workloads()
    n = len(w.collect_registry())
    slots = 50 - len(w._ROTATION_PINS)
    rounds_to_cover = -(-(n - len(w._ROTATION_PINS)) // slots)
    assert rounds_to_cover <= 4
