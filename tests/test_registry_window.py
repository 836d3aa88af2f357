"""Pin the driver's 50-slot correctness window.

The driver checks exactly ``list(queries())[:50]`` each round. Rotation
policy: queries with no driver CORRECTNESS row yet lead the window
(new-this-round included), then the families whose last driver row is
oldest, then a cross-family canary tail of already-green queries (so
regressions in evicted families stay visible to the external gate, not
just the local one).
"""

from __future__ import annotations

from datafusion_delta_queries_spark.operators import (
    CANARIES,
    DRIVER_WINDOW_PRIORITY,
    NEVER_DRIVER_CHECKED,
    NEW_THIS_ROUND,
    NEXT_WINDOW_ROTATION,
    RECHECK,
    registry,
)

QUERIES, ORACLES = registry()
WINDOW = list(QUERIES)[:50]


def test_priority_names_resolve():
    assert not set(DRIVER_WINDOW_PRIORITY) - set(QUERIES)


def test_priority_is_duplicate_free():
    combined = NEVER_DRIVER_CHECKED + NEW_THIS_ROUND + RECHECK + CANARIES
    assert len(set(combined)) == len(combined)


def test_window_leads_with_priority():
    n = min(len(DRIVER_WINDOW_PRIORITY), 50)
    assert WINDOW[:n] == list(DRIVER_WINDOW_PRIORITY)[:n]


def test_never_checked_and_new_queries_always_fit():
    """Truncation may only ever drop canaries — a query still waiting
    for its first driver row must never fall off the window."""
    must_fit = set(NEVER_DRIVER_CHECKED) | set(NEW_THIS_ROUND) | set(RECHECK)
    assert must_fit <= set(WINDOW)


def test_window_covers_major_families():
    """Every major family must have at least one query in the driver
    window each round (via recheck or canary), so a family-wide
    regression is always visible to the external gate."""
    families = ("llm_", "delta_", "streaming_", "join_", "events_")
    in_window = set(WINDOW)
    for fam in families:
        assert any(
            q.startswith(fam) for q in in_window
        ), f"no in-window query for family {fam!r}"
    # Canaries must themselves survive truncation — a canary outside
    # the window checks nothing.
    assert set(CANARIES) <= in_window


def test_rotation_is_exactly_the_truncated_tail():
    combined = NEVER_DRIVER_CHECKED + NEW_THIS_ROUND + RECHECK + CANARIES
    assert list(NEXT_WINDOW_ROTATION) == [
        n for n in combined if n not in set(DRIVER_WINDOW_PRIORITY)
    ]
    assert not set(NEXT_WINDOW_ROTATION) & set(WINDOW)
