"""Stale-green guard (VERDICT r5 item 6, PARITY.md "Correctness
rotation"): a query whose operator or oracle code changed since its last
driver-green row MUST be scheduled inside the next 50-entry driver
window — otherwise its green row predates the code it claims to
validate. tools/green_state.py holds the mechanism; green_state.json
was initialized from the ACTUAL historical trees (fingerprints computed
at the round-4 and round-5 final commits, matched to each query's last
green round in CORRECTNESS_r*.json)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.green_state import (  # noqa: E402
    WINDOW_SIZE,
    check,
    fingerprints,
    load_state,
)


def test_state_file_covers_every_query():
    from ml_hadoop_experiment_spark.queries import QUERIES

    state = load_state()
    missing = sorted(set(QUERIES) - set(state))
    # a query may legitimately have no recorded green yet (added this
    # round) — then it must be in the next window, UNLESS the window is
    # already saturated by changed+new entries (check() encodes the
    # policy; overflowed new queries must sit directly after the
    # boundary, first in line for the next round's window)
    names = list(QUERIES)
    overflow_new = [q for q in missing if q not in set(names[:WINDOW_SIZE])]
    for q in overflow_new:
        assert names.index(q) < WINDOW_SIZE + len(overflow_new) + 2, (
            f"new query {q} is parked deep outside the window "
            f"(position {names.index(q)}) — move it to just after the "
            "boundary so it enters the next window first"
        )


def test_changed_queries_are_scheduled_in_next_window():
    bad = check()
    assert not bad, (
        f"STALE-GREEN: {bad} changed since their last driver-green row "
        f"but sit outside the first {WINDOW_SIZE} entries of QUERIES — "
        "reorder ml_hadoop_experiment_spark/queries/__init__.py"
    )


def test_fingerprints_are_stable_within_a_session():
    # determinism sanity: two computations agree (guards against
    # accidentally hashing dict iteration order or file mtimes)
    a, b = fingerprints(), fingerprints()
    assert a == b
