"""Pin the driver's 50-slot correctness window.

The driver checks exactly ``list(queries())[:50]`` each round.
Round-13 rotation policy (executing the plan the r12 verdict
recorded): the window = ``R13_PLAN`` (the 3 never-driver-checked
late-r12 registrations + the 8 committed r7-stale rechecks) +
r13-new registrations + family anchors + the verdict-priority r8
rechecks + the alphabetical r8-stale backlog filling the tail.
Whatever the 50 slots cannot hold forms ``R14_PLAN`` — spill is
recorded, never silent.
"""

from __future__ import annotations

from datafusion_delta_queries_spark.operators import (
    DRIVER_WINDOW_PRIORITY,
    LATE_R12,
    FAMILY_ANCHORS_R12,
    FAMILY_ANCHORS_R13,
    NEW_THIS_ROUND_R12,
    NEW_THIS_ROUND_R13,
    R12_WINDOW,
    R13_PLAN,
    R13_WINDOW,
    R14_PLAN,
    RECHECK_R7_REMAINING,
    RECHECK_R8_PRIORITY,
    RECHECK_R8_REMAINING,
    registry,
)

QUERIES, ORACLES = registry()
WINDOW = list(QUERIES)[:50]


def test_priority_names_resolve():
    assert not set(DRIVER_WINDOW_PRIORITY) - set(QUERIES)
    assert not set(R13_PLAN) - set(QUERIES)
    assert not set(R14_PLAN) - set(QUERIES)
    assert not set(RECHECK_R8_REMAINING) - set(QUERIES)


def test_priority_is_duplicate_free():
    combined = (
        R13_PLAN
        + NEW_THIS_ROUND_R13
        + FAMILY_ANCHORS_R13
        + RECHECK_R8_PRIORITY
        + RECHECK_R8_REMAINING
    )
    assert len(set(combined)) == len(combined)


def test_window_is_the_r13_rotation():
    assert WINDOW == list(R13_WINDOW) == list(DRIVER_WINDOW_PRIORITY)
    # the committed plan leads, in order
    assert WINDOW[: len(R13_PLAN)] == list(R13_PLAN)


def test_r13_plan_is_exactly_the_r12_commitment():
    """R13_PLAN = the late-r12 registrations the r12 window could not
    hold (never driver-checked — they lead) + the 8 r7-stale rechecks
    the r12 tail displaced. Fully inside this round's window:
    executing it ends r7 staleness for good."""
    expected = tuple(LATE_R12) + tuple(
        n for n in NEW_THIS_ROUND_R12 if n not in R12_WINDOW
    ) + tuple(
        n
        for n in FAMILY_ANCHORS_R12 + RECHECK_R7_REMAINING
        if n not in R12_WINDOW
    )
    assert list(R13_PLAN) == list(expected)
    assert len(R13_PLAN) == 11
    assert set(R13_PLAN) <= set(WINDOW)
    assert not set(R13_PLAN) & set(R12_WINDOW)
    # late registrations are never-driver-checked: they LEAD r13
    assert WINDOW[: len(LATE_R12)] == list(LATE_R12)


def test_new_r13_registrations_in_window():
    """r13 registrations are never-driver-checked: they must be in
    this round's window (they fit — no spill) or lead R14_PLAN."""
    for n in NEW_THIS_ROUND_R13:
        assert n in set(WINDOW) | set(R14_PLAN), n


def test_window_overflow_is_exactly_r14_plan():
    overflow = [
        n for n in NEW_THIS_ROUND_R13 if n not in set(WINDOW)
    ] + [
        n
        for n in (
            FAMILY_ANCHORS_R13 + RECHECK_R8_PRIORITY + RECHECK_R8_REMAINING
        )
        if n not in set(WINDOW)
    ]
    assert overflow == list(R14_PLAN)
    # The r8-stale backlog still drains (the r13 window takes its
    # head), but the late-r13 operator tranche (12 registrations
    # after the original window froze: substring span detector +
    # cleaner + signed dupspan, MV join/filtered/maintained rewrites,
    # gopher rules, prefix-filtered complete Jaccard, triangle count
    # + dense/sparse signed triangle maintenance, snowflake chain
    # agg) leads the window as never-driver-checked and displaces
    # that many rechecks — the spill is committed here, never silent,
    # and every R14_PLAN member is an already-green r8 recheck, not a
    # new op. Never-driver-checked outranks stale-recheck per the
    # standing rotation rule; the recheck tail drains across r14.
    assert len(R14_PLAN) <= 33
    assert not set(R14_PLAN) & set(NEW_THIS_ROUND_R13)


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
    """Every query's NEWEST driver row must be green — the twelve-round
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
