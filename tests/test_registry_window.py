"""Pin the driver's 50-slot correctness window.

The driver checks exactly ``list(queries())[:50]`` each round.
Round-15 rotation policy (executing the plan the r14 verdict
recorded): the window = ``RECHECK_R9_ALL`` (the 40 rows whose latest
driver row is r9 — draining them lifts the registry staleness floor
to r10) + the events_ family anchor + r15-new registrations, with
the stalest-r10 recheck head filling whatever the registrations
leave of the 50 slots. The [:50] truncation drops from the recheck
head ONLY — never a never-checked name; drops are recorded in the
ledger comments, not silent.
"""

from __future__ import annotations

from datafusion_delta_queries_spark.operators import (
    DRIVER_WINDOW_PRIORITY,
    FAMILY_ANCHORS_R15,
    NEW_THIS_ROUND_R15,
    R14_WINDOW,
    R15_WINDOW,
    R16_PLAN,
    RECHECK_R9_ALL,
    RECHECK_R10_HEAD,
    registry,
)

QUERIES, ORACLES = registry()
WINDOW = list(QUERIES)[:50]


def test_priority_names_resolve():
    assert not set(DRIVER_WINDOW_PRIORITY) - set(QUERIES)
    assert not set(RECHECK_R9_ALL) - set(QUERIES)
    assert not set(RECHECK_R10_HEAD) - set(QUERIES)
    assert not set(NEW_THIS_ROUND_R15) - set(QUERIES)
    assert not set(R16_PLAN) - set(QUERIES)


def test_priority_is_duplicate_free():
    combined = (
        RECHECK_R9_ALL
        + FAMILY_ANCHORS_R15
        + NEW_THIS_ROUND_R15
        + RECHECK_R10_HEAD
    )
    assert len(set(combined)) == len(combined)


def test_window_is_the_r15_rotation():
    assert WINDOW[: len(R15_WINDOW)] == list(R15_WINDOW) == list(
        DRIVER_WINDOW_PRIORITY
    )
    # the committed r9 drain leads, in order
    assert WINDOW[: len(RECHECK_R9_ALL)] == list(RECHECK_R9_ALL)
    # the window is exactly full
    assert len(R15_WINDOW) == 50


def test_r9_drain_is_complete_and_in_window():
    """All 40 r9-stale rows (recomputed from the committed
    CORRECTNESS series at the r15 open) are in this round's window —
    executing it lifts the registry-wide staleness floor from r9 to
    r10. The two names the r14 [:50] truncation dropped lead."""
    assert len(RECHECK_R9_ALL) == 40
    assert set(RECHECK_R9_ALL) <= set(WINDOW)
    assert RECHECK_R9_ALL[0] == "signed_continuous_agg"
    assert RECHECK_R9_ALL[1] == "streaming_dedup_watermarked"
    # nothing in the drain was already covered by the executed r14
    # window (those rows got r14 rows; the drain is the remainder)
    assert not set(RECHECK_R9_ALL) & set(R14_WINDOW)


def test_r9_drain_matches_the_correctness_series():
    """RECHECK_R9_ALL must equal the EXACT set of rows whose latest
    committed driver row is r9 — the frozen tuple cannot silently
    diverge from the series it was computed from."""
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
    stale9 = {n for n, (rnd, _) in latest.items() if rnd == 9}
    # after the driver writes CORRECTNESS_r15 the set drains to empty;
    # before that it must be exactly the committed tranche
    assert stale9 in (set(RECHECK_R9_ALL), set()), sorted(
        stale9 ^ set(RECHECK_R9_ALL)
    )


def test_anchor_in_window():
    """The events_ anchor (stalest r10 row of the one mandatory
    family the r9 drain does not cover) sits right behind the drain —
    it can never spill."""
    assert set(FAMILY_ANCHORS_R15) <= set(WINDOW)
    assert WINDOW[
        len(RECHECK_R9_ALL) : len(RECHECK_R9_ALL) + len(FAMILY_ANCHORS_R15)
    ] == list(FAMILY_ANCHORS_R15)


def test_new_r15_registrations_in_window():
    """r15 registrations are never-driver-checked: they must be in
    this round's window or lead R16_PLAN (spill recorded, never
    silent). Registration is capped at 9 so nothing spills."""
    for n in NEW_THIS_ROUND_R15:
        assert n in set(WINDOW) | set(R16_PLAN), n
    assert len(NEW_THIS_ROUND_R15) <= 9


def test_truncation_drops_recheck_tail_only():
    """The [:50] truncation must never drop a never-checked name or a
    committed-plan name — only RECHECK_R10_HEAD tail entries."""
    full = (
        RECHECK_R9_ALL
        + FAMILY_ANCHORS_R15
        + NEW_THIS_ROUND_R15
        + RECHECK_R10_HEAD
    )
    dropped = set(full) - set(R15_WINDOW)
    assert dropped <= set(RECHECK_R10_HEAD), dropped


def test_window_overflow_is_exactly_r16_plan():
    overflow = [
        n
        for n in FAMILY_ANCHORS_R15 + NEW_THIS_ROUND_R15
        if n not in set(WINDOW)
    ]
    assert overflow == list(R16_PLAN)


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
    fourteen-round zero-failure record is an invariant, not an
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
