"""The driver-window rotation tool (tools/rotate_window.py) — VERDICT r4
item 5: the FIRST-50 prefix the driver checks is generated, not
hand-maintained, so a manual slot burn (r4 spent 3 slots on entries that
could never go driver-green) cannot recur."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from rotate_window import (  # noqa: E402
    PINNED_THROUGH_ROUND,
    WINDOW,
    compute_window,
    load_history,
)

import __spark_entry__ as entry  # noqa: E402


def test_pinned_window_matches_generator():
    # capped at the history the window was generated FROM — the driver
    # landing this round's CORRECTNESS file must not retro-fail the pin
    registry = list(entry._queries_raw().keys())
    oracled = set(entry.oracle_sql().keys())
    want = compute_window(
        registry, oracled, load_history(max_round=PINNED_THROUGH_ROUND)
    )
    assert list(entry._DRIVER_WINDOW_FIRST) == want


def test_window_is_valid_prefix():
    registry = set(entry._queries_raw().keys())
    w = entry._DRIVER_WINDOW_FIRST
    assert len(w) == WINDOW == len(set(w))
    assert set(w) <= registry
    # queries() actually serves the window as its head
    assert list(entry.queries().keys())[:WINDOW] == list(w)


def test_oracled_before_rows_only():
    oracled = set(entry.oracle_sql().keys())
    flags = [n in oracled for n in entry._DRIVER_WINDOW_FIRST]
    # once a rows-only entry appears, no oracled entry may follow
    assert flags == sorted(flags, reverse=True)


def test_policy_on_synthetic_history():
    registry = ["a", "b", "c", "d", "e"]
    oracled = {"a", "c", "e"}
    hist = {"a": [{"hash_match": True}]}
    got = compute_window(registry, oracled, hist, size=3)
    assert got == ["c", "e", "b"]  # never-checked oracled first, then rows-only


def test_topup_uses_green_anchors():
    registry = ["a", "b", "c", "d"]
    oracled = set(registry)
    hist = {
        "a": [{"hash_match": True}],
        "b": [{"hash_match": False}],
        "c": [{"hash_match": True}],
    }
    got = compute_window(registry, oracled, hist, size=3)
    # d is the only never-checked; top-up skips non-green b
    assert got[0] == "d" and set(got[1:]) <= {"a", "c"} and len(got) == 3
