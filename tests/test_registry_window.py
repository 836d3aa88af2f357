"""Pin the driver's 50-slot correctness window.

The driver checks exactly ``list(queries())[:50]`` each round.
Round-10 rotation policy (executing the plan the r9 verdict
recorded): the window IS ``R10_PLAN[:50]`` — the 16 late-r9
registrations with no driver row yet lead, then the recheck tranche
the r9 window displaced, then the r6-stale relational basics. The
3-name spill plus any r10-new registrations form ``R11_PLAN`` —
spill is recorded, never silent.
"""

from __future__ import annotations

from datafusion_delta_queries_spark.operators import (
    DEFERRED_FROM_R8,
    DRIVER_WINDOW_PRIORITY,
    NEVER_DRIVER_CHECKED,
    NEVER_DRIVER_CHECKED_R10,
    NEW_THIS_ROUND,
    NEW_THIS_ROUND_R10,
    R9_WINDOW,
    R10_PLAN,
    R10_PLAN_BASE,
    R11_PLAN,
    RECHECK_R6,
    registry,
)

QUERIES, ORACLES = registry()
WINDOW = list(QUERIES)[:50]


def test_priority_names_resolve():
    assert not set(DRIVER_WINDOW_PRIORITY) - set(QUERIES)
    assert not set(R10_PLAN) - set(QUERIES)
    assert not set(R11_PLAN) - set(QUERIES)


def test_priority_is_duplicate_free():
    combined = (
        NEVER_DRIVER_CHECKED + NEW_THIS_ROUND + DEFERRED_FROM_R8
        + RECHECK_R6 + R10_PLAN_BASE + NEVER_DRIVER_CHECKED_R10
        + NEW_THIS_ROUND_R10
    )
    assert len(set(combined)) == len(combined)


def test_window_is_the_r10_plan_head():
    assert WINDOW == list(R10_PLAN)[:50]
    assert WINDOW[:len(NEVER_DRIVER_CHECKED_R10)] == list(
        NEVER_DRIVER_CHECKED_R10
    )


def test_never_checked_r10_always_fits():
    """A query still waiting for its first driver row (late-r9
    registration) must never fall off the window."""
    assert set(NEVER_DRIVER_CHECKED_R10) <= set(WINDOW)


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


def test_r10_plan_structure():
    """R10_PLAN = the 16 late-r9 registrations, then every committed
    r9-priority query the r9 window could not hold, then the 22
    r6-stale basics. Nothing silently dropped."""
    combined = (
        NEVER_DRIVER_CHECKED + NEW_THIS_ROUND + DEFERRED_FROM_R8
        + RECHECK_R6
    )
    displaced = [n for n in combined if n not in set(R9_WINDOW)]
    assert list(R10_PLAN) == (
        list(NEVER_DRIVER_CHECKED_R10) + displaced + list(R10_PLAN_BASE)
    )


def test_r11_plan_is_exactly_the_spill():
    """R11_PLAN = r10-new registrations (never driver-checked — they
    lead) + the R10_PLAN tail the 50 slots cannot hold. Nothing
    overlaps the window; nothing is silently dropped."""
    assert list(R11_PLAN) == list(NEW_THIS_ROUND_R10) + list(R10_PLAN)[50:]
    assert not set(R11_PLAN) & set(WINDOW)
