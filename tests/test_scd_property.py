"""Property test: SCD2 apply vs a pure-Python interval model.

Random CDC sequences (upserts/deletes, arbitrary batch splits) applied
through ``scd2_apply`` must produce exactly the history a direct
interval simulation produces, and a point-in-time probe at every
boundary-straddling timestamp must agree — batching is an
implementation detail the algebra must not observe (the associativity
``apply(apply(h, b1), b2) == apply(h, b1 ∪ b2)`` generalized to any
split).
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_delta_queries_spark.operators.scd import (
    point_in_time_join,
    scd2_apply,
    scd2_initialize,
)

KEYS = [1, 2, 3]
BASE_YEAR = 2020
HIGH = datetime.datetime(9999, 12, 31)


def _ts(i: int) -> datetime.datetime:
    return datetime.datetime(BASE_YEAR + i, 1, 1)


# A CDC sequence: per step (key, op, value). Effective timestamps are
# the step index + 1 (strictly increasing — the documented per-key
# monotonicity precondition holds for any subsequence). Batch split
# points are arbitrary.
_steps = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.sampled_from(["upsert", "delete"]),
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=1,
    max_size=8,
)
_splits = st.lists(st.booleans(), min_size=8, max_size=8)


def _model_history(steps):
    """Pure-Python interval model: replay the full change log per key."""
    log = {k: [(datetime.datetime(BASE_YEAR, 1, 1), "init", "v0")] for k in KEYS}
    for i, (k, op, val) in enumerate(steps):
        log[k].append((_ts(i + 1), op, val))
    hist = {}
    for k, entries in log.items():
        rows = []
        for idx, (ts, op, val) in enumerate(entries):
            nxt = entries[idx + 1][0] if idx + 1 < len(entries) else HIGH
            if op != "delete":
                rows.append((("v0" if op == "init" else val), ts, nxt))
        hist[k] = sorted(rows, key=lambda r: r[1])
    return hist


def _model_pit(hist, k, ts):
    for val, lo, hi in hist.get(k, []):
        if lo <= ts < hi:
            return val
    return None


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(steps=_steps, splits=_splits)
def test_scd2_apply_matches_interval_model(spark, steps, splits):
    dim = spark.createDataFrame([(k, "v0") for k in KEYS], "k int, val string")
    hist = scd2_initialize(dim, ["k"], ["val"], f"{BASE_YEAR}-01-01")

    batch, n_applied = [], 0
    all_batches = []
    for i, (k, op, val) in enumerate(steps):
        batch.append(
            (k, None if op == "delete" else val, _ts(i + 1), op)
        )
        if splits[i % len(splits)]:
            all_batches.append(batch)
            batch = []
    if batch:
        all_batches.append(batch)
    for b in all_batches:
        changes = spark.createDataFrame(
            b, "k int, val string, effective_ts timestamp, op string"
        )
        hist = scd2_apply(hist, changes, ["k"], ["val"])
        n_applied += len(b)
    assert n_applied == len(steps)

    got = {}
    for r in hist.collect():
        got.setdefault(r.k, []).append((r.val, r.valid_from, r.valid_to))
    got = {k: sorted(v, key=lambda x: x[1]) for k, v in got.items()}
    expected = _model_history(steps)
    assert got == {k: v for k, v in expected.items() if v}

    # PIT probes: every half-year between boundaries, every key
    probes = [
        (pid, k, datetime.datetime(BASE_YEAR + i, 7, 1))
        for pid, (i, k) in enumerate(
            (i, k) for i in range(len(steps) + 1) for k in KEYS
        )
    ]
    facts = spark.createDataFrame(probes, "pid int, fk int, ts timestamp")
    joined = point_in_time_join(facts, hist, [("fk", "k")], "ts")
    got_pit = {r.pid: r.val for r in joined.collect()}
    for pid, k, ts in probes:
        want = _model_pit(expected, k, ts)
        assert got_pit.get(pid) == want, (pid, k, ts, steps)
