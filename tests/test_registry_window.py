"""Pin the driver's 50-slot correctness window.

The driver checks exactly ``list(queries())[:50]`` each round.
Round-14 rotation policy (executing the plan the r13 verdict
recorded): the window = ``R14_PLAN`` (the 32 r8-stale rechecks the
r13 window displaced — draining it ends ALL rotation staleness) +
the two family anchors (stalest r9 rows in delta_/events_) +
r14-new registrations filling the 16 tail slots. Whatever the 50
slots cannot hold forms ``R15_PLAN`` — spill is recorded, never
silent.
"""

from __future__ import annotations

from datafusion_delta_queries_spark.operators import (
    DRIVER_WINDOW_PRIORITY,
    FAMILY_ANCHORS_R13,
    FAMILY_ANCHORS_R14,
    NEW_THIS_ROUND_R13,
    NEW_THIS_ROUND_R14,
    R13_WINDOW,
    R14_PLAN,
    R14_WINDOW,
    R15_PLAN,
    RECHECK_R8_PRIORITY,
    RECHECK_R8_REMAINING,
    registry,
)

QUERIES, ORACLES = registry()
WINDOW = list(QUERIES)[:50]


def test_priority_names_resolve():
    assert not set(DRIVER_WINDOW_PRIORITY) - set(QUERIES)
    assert not set(R14_PLAN) - set(QUERIES)
    assert not set(R15_PLAN) - set(QUERIES)
    assert not set(NEW_THIS_ROUND_R14) - set(QUERIES)


def test_priority_is_duplicate_free():
    from datafusion_delta_queries_spark.operators import RECHECK_R9_HEAD

    combined = (
        R14_PLAN + FAMILY_ANCHORS_R14 + NEW_THIS_ROUND_R14 + RECHECK_R9_HEAD
    )
    assert len(set(combined)) == len(combined)


def test_window_is_the_r14_rotation():
    assert WINDOW[: len(R14_WINDOW)] == list(R14_WINDOW) == list(
        DRIVER_WINDOW_PRIORITY
    )
    # the committed plan leads, in order
    assert WINDOW[: len(R14_PLAN)] == list(R14_PLAN)
    # with the r9 recheck head the window is exactly full
    assert len(R14_WINDOW) == 50


def test_r14_plan_is_exactly_the_r13_commitment():
    """R14_PLAN = the r8-stale rechecks the r13 window displaced
    (computed then, frozen now). Fully inside this round's window:
    executing it ends r8 staleness — the LAST stale tranche — for
    good. No r13 registration spilled, so the plan is rechecks only.
    """
    expected = tuple(
        n for n in NEW_THIS_ROUND_R13 if n not in R13_WINDOW
    ) + tuple(
        n
        for n in FAMILY_ANCHORS_R13 + RECHECK_R8_PRIORITY + RECHECK_R8_REMAINING
        if n not in R13_WINDOW
    )
    assert list(R14_PLAN) == list(expected)
    assert len(R14_PLAN) == 32
    assert set(R14_PLAN) <= set(WINDOW)
    assert not set(R14_PLAN) & set(R13_WINDOW)
    assert not set(R14_PLAN) & set(NEW_THIS_ROUND_R13)


def test_anchors_in_window():
    """The two family anchors (stalest r9 rows in the delta_/events_
    families, which R14_PLAN does not cover) sit right behind the
    plan — they can never spill."""
    assert set(FAMILY_ANCHORS_R14) <= set(WINDOW)
    assert WINDOW[len(R14_PLAN) : len(R14_PLAN) + len(FAMILY_ANCHORS_R14)] == list(
        FAMILY_ANCHORS_R14
    )


def test_new_r14_registrations_in_window():
    """r14 registrations are never-driver-checked: they must be in
    this round's window or lead R15_PLAN (spill recorded, never
    silent). Registration is capped at 16 so nothing spills."""
    for n in NEW_THIS_ROUND_R14:
        assert n in set(WINDOW) | set(R15_PLAN), n
    assert len(NEW_THIS_ROUND_R14) <= 16


def test_window_overflow_is_exactly_r15_plan():
    overflow = [
        n
        for n in FAMILY_ANCHORS_R14 + NEW_THIS_ROUND_R14
        if n not in set(WINDOW)
    ]
    assert overflow == list(R15_PLAN)


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
    """Every query's NEWEST driver row must be green — the
    thirteen-round zero-failure record is an invariant, not an
    accident. (Recomputed from the committed CORRECTNESS series;
    tools/rotation_report.py prints the full ledger.)"""
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
