"""Pin the driver's 50-slot correctness window.

The driver checks exactly ``list(queries())[:50]`` each round.
Round-11 rotation policy (executing the plan the r10 verdict
recorded): the window = ``R11_PLAN`` (the 36 r10 registrations with
no driver row yet + the 3-name R10_PLAN spill) + r11-new
registrations + the stalest r7-checked rechecks filling the tail.
Whatever the 50 slots cannot hold forms ``R12_PLAN`` — spill is
recorded, never silent.
"""

from __future__ import annotations

from datafusion_delta_queries_spark.operators import (
    DRIVER_WINDOW_PRIORITY,
    FAMILY_ANCHORS_R11,
    NEW_THIS_ROUND_R10,
    NEW_THIS_ROUND_R11,
    R10_PLAN,
    R10_WINDOW,
    R11_PLAN,
    R11_WINDOW,
    R12_PLAN,
    RECHECK_R7,
    registry,
)

QUERIES, ORACLES = registry()
WINDOW = list(QUERIES)[:50]


def test_priority_names_resolve():
    assert not set(DRIVER_WINDOW_PRIORITY) - set(QUERIES)
    assert not set(R11_PLAN) - set(QUERIES)
    assert not set(R12_PLAN) - set(QUERIES)
    assert not set(RECHECK_R7) - set(QUERIES)


def test_priority_is_duplicate_free():
    combined = (
        R11_PLAN + FAMILY_ANCHORS_R11 + NEW_THIS_ROUND_R11 + RECHECK_R7
    )
    assert len(set(combined)) == len(combined)


def test_window_is_the_r11_rotation():
    assert WINDOW == list(R11_WINDOW) == list(DRIVER_WINDOW_PRIORITY)
    # the committed plan leads, in order
    assert WINDOW[: len(R11_PLAN)] == list(R11_PLAN)


def test_r11_plan_is_exactly_the_r10_spill():
    """R11_PLAN = r10-new registrations (never driver-checked — they
    lead) + the R10_PLAN tail r10's 50 slots could not hold. Fully
    inside this round's window: this is the round that zeroes the
    never-driver-checked backlog."""
    assert list(R11_PLAN) == list(NEW_THIS_ROUND_R10) + list(R10_PLAN)[50:]
    assert set(R11_PLAN) <= set(WINDOW)
    assert not set(R11_PLAN) & set(R10_WINDOW)


def test_new_r11_registrations_never_silently_dropped():
    """Every r11 registration is either in this round's window or at
    the head of the committed R12_PLAN."""
    for n in NEW_THIS_ROUND_R11:
        assert n in set(WINDOW) | set(R12_PLAN), n
    # window overflow is exactly the recorded R12_PLAN, with the
    # never-driver-checked r11 registrations LEADING it
    overflow = [
        n for n in NEW_THIS_ROUND_R11 if n not in set(WINDOW)
    ] + [
        n
        for n in (FAMILY_ANCHORS_R11 + RECHECK_R7)
        if n not in set(WINDOW)
    ]
    assert overflow == list(R12_PLAN)
    assert not [n for n in R11_PLAN if n not in set(WINDOW)]


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
