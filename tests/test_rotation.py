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
    last_green, basis = rotate_window.last_green_rounds()
    # the window was computed against the files present when the script
    # last ran; only consider rounds <= the recorded basis so the
    # driver's own post-round CORRECTNESS commit doesn't invalidate it
    filtered = {n: r for n, r in last_green.items() if r <= w._ROTATION_BASIS}
    expected = rotate_window.compute_window(
        list(w.collect_registry()), w._ROTATION_PINS, filtered
    )
    assert list(w._DRIVER_WINDOW_PRIORITY) == expected, (
        "driver window is stale — run scripts/rotate_window.py "
        "(and pin this round's plan-changed entries in _ROTATION_PINS)"
    )


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


def test_every_registry_entry_rewindows_within_three_rounds():
    """The staleness sort guarantees bounded re-verification latency:
    with 110 entries, 50 slots and <=4 pins, any entry excluded this
    round has last_green >= every included non-pin entry's, so after
    ~ceil((N - pins) / (50 - pins)) rounds it must re-enter."""
    w = _workloads()
    n = len(w.collect_registry())
    slots = 50 - len(w._ROTATION_PINS)
    rounds_to_cover = -(-(n - len(w._ROTATION_PINS)) // slots)
    assert rounds_to_cover <= 3
