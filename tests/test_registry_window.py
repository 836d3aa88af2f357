"""Pin the driver's 50-slot correctness window.

The driver checks exactly ``list(queries())[:50]`` each round. Round-9
rotation policy: queries with no driver CORRECTNESS row yet lead the
window (late-r8 registrations, then r9-new), then the oldest-row
deferrals, then the head of the r6-stale recheck tranche; whatever the
rechecks cannot fit is committed to ``R10_PLAN`` — spill is recorded,
never silent.
"""

from __future__ import annotations

from datafusion_delta_queries_spark.operators import (
    DEFERRED_FROM_R8,
    DRIVER_WINDOW_PRIORITY,
    NEVER_DRIVER_CHECKED,
    NEVER_DRIVER_CHECKED_R10,
    NEW_THIS_ROUND,
    R10_PLAN,
    R10_PLAN_BASE,
    RECHECK_R6,
    registry,
)

QUERIES, ORACLES = registry()
WINDOW = list(QUERIES)[:50]


def test_priority_names_resolve():
    assert not set(DRIVER_WINDOW_PRIORITY) - set(QUERIES)
    assert not set(R10_PLAN) - set(QUERIES)


def test_priority_is_duplicate_free():
    combined = (
        NEVER_DRIVER_CHECKED + NEW_THIS_ROUND + DEFERRED_FROM_R8
        + RECHECK_R6 + R10_PLAN_BASE + NEVER_DRIVER_CHECKED_R10
    )
    assert len(set(combined)) == len(combined)


def test_window_leads_with_priority():
    n = min(len(DRIVER_WINDOW_PRIORITY), 50)
    assert WINDOW[:n] == list(DRIVER_WINDOW_PRIORITY)[:n]


def test_never_checked_and_new_queries_always_fit():
    """Truncation may only ever drop recheck tail — a query still
    waiting for its first driver row (late-r8 or r9-new) and the
    oldest-row deferrals must never fall off the window."""
    must_fit = (
        set(NEVER_DRIVER_CHECKED)
        | set(NEW_THIS_ROUND)
        | set(DEFERRED_FROM_R8)
    )
    assert must_fit <= set(WINDOW)


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


def test_r10_plan_is_exactly_the_spill():
    """R10_PLAN = the late-r9 registrations (no driver row yet — they
    lead), then every committed-priority query the 50 slots cannot
    hold (displaced recheck tail, then the 22 r6-stale basics).
    Nothing overlaps the window; nothing is silently dropped."""
    combined = (
        NEVER_DRIVER_CHECKED + NEW_THIS_ROUND + DEFERRED_FROM_R8
        + RECHECK_R6
    )
    displaced = [n for n in combined if n not in set(DRIVER_WINDOW_PRIORITY)]
    assert list(R10_PLAN) == (
        list(NEVER_DRIVER_CHECKED_R10) + displaced + list(R10_PLAN_BASE)
    )
    assert not set(R10_PLAN) & set(WINDOW)
