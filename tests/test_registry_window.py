"""Pin the driver's 50-slot correctness window.

The driver checks exactly ``list(queries())[:50]`` each round.
Round-12 rotation policy (executing the plan the r11 verdict
recorded): the window = ``R12_PLAN`` (the 5 never-driver-checked r11
registrations + the 10 committed r7-stale rechecks) + r12-new
registrations + family anchors + the alphabetical r7-stale backlog
filling the tail. Whatever the 50 slots cannot hold forms
``R13_PLAN`` — spill is recorded, never silent.
"""

from __future__ import annotations

from datafusion_delta_queries_spark.operators import (
    DRIVER_WINDOW_PRIORITY,
    LATE_R12,
    FAMILY_ANCHORS_R11,
    FAMILY_ANCHORS_R12,
    NEW_THIS_ROUND_R11,
    NEW_THIS_ROUND_R12,
    R11_PLAN,
    R11_WINDOW,
    R12_PLAN,
    R12_WINDOW,
    R13_PLAN,
    RECHECK_R7,
    RECHECK_R7_REMAINING,
    registry,
)

QUERIES, ORACLES = registry()
WINDOW = list(QUERIES)[:50]


def test_priority_names_resolve():
    assert not set(DRIVER_WINDOW_PRIORITY) - set(QUERIES)
    assert not set(R12_PLAN) - set(QUERIES)
    assert not set(R13_PLAN) - set(QUERIES)
    assert not set(RECHECK_R7_REMAINING) - set(QUERIES)


def test_priority_is_duplicate_free():
    combined = (
        R12_PLAN
        + NEW_THIS_ROUND_R12
        + FAMILY_ANCHORS_R12
        + RECHECK_R7_REMAINING
    )
    assert len(set(combined)) == len(combined)


def test_window_is_the_r12_rotation():
    assert WINDOW == list(R12_WINDOW) == list(DRIVER_WINDOW_PRIORITY)
    # the committed plan leads, in order
    assert WINDOW[: len(R12_PLAN)] == list(R12_PLAN)


def test_r12_plan_is_exactly_the_r11_commitment():
    """R12_PLAN = r11 registrations the r11 window could not hold
    (never driver-checked — they lead) + the 10 committed r7-stale
    rechecks. Fully inside this round's window: executing it makes
    every pre-r12 registration ever-driver-checked."""
    expected = tuple(
        n for n in NEW_THIS_ROUND_R11 if n not in R11_WINDOW
    ) + tuple(
        n
        for n in FAMILY_ANCHORS_R11 + RECHECK_R7
        if n not in R11_WINDOW and n not in R11_PLAN
    )
    assert list(R12_PLAN) == list(expected)
    assert len(R12_PLAN) == 15
    assert set(R12_PLAN) <= set(WINDOW)
    assert not set(R12_PLAN) & set(R11_WINDOW)


def test_new_r12_registrations_in_window():
    """r12 registrations are never-driver-checked: they must be in
    this round's window (they fit — no spill) or lead R13_PLAN."""
    for n in NEW_THIS_ROUND_R12:
        assert n in set(WINDOW) | set(R13_PLAN), n
    assert set(NEW_THIS_ROUND_R12) <= set(WINDOW)


def test_window_overflow_is_exactly_r13_plan():
    overflow = list(LATE_R12) + [
        n for n in NEW_THIS_ROUND_R12 if n not in set(WINDOW)
    ] + [
        n
        for n in (FAMILY_ANCHORS_R12 + RECHECK_R7_REMAINING)
        if n not in set(WINDOW)
    ]
    assert overflow == list(R13_PLAN)
    # late registrations are never-driver-checked: they LEAD r13
    assert list(R13_PLAN[: len(LATE_R12)]) == list(LATE_R12)
    assert not set(LATE_R12) & set(WINDOW)
    # the r7-stale backlog shrinks: at most a handful spill to r13
    assert len(R13_PLAN) <= 12


def test_window_covers_major_families():
    """Every major family must have at least one query in the driver
    window each round, so a family-wide regression is always visible
    to the external gate."""
    families = ("llm_", "delta_", "streaming_", "signed_", "events_")
    in_window = set(WINDOW)
    for fam in families:
        assert any(
            q.startswith(fam) for q in in_window
        ), f"no in-window query for family {fam!r}"


def test_rotation_ledger_has_no_latest_check_failures():
    """Every query's NEWEST driver row must be green — the eleven-round
    zero-failure record is an invariant, not an accident. (Recomputed
    from the committed CORRECTNESS series; tools/rotation_report.py
    prints the full ledger.)"""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "rotation_report",
        os.path.join(
            os.path.dirname(__file__), "..", "tools", "rotation_report.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    latest = mod.latest_checks()
    assert latest, "no CORRECTNESS series found"
    bad = sorted(n for n, (_, ok) in latest.items() if not ok)
    assert not bad, bad
