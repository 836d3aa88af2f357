"""Local correctness gate for the PENDING (round-17) registration
tranche: the five stored twins built in round 16.

These are deliberately NOT in the registry yet — the r16 driver
window is saturated by the r10 staleness drain (see the rotation
ledger) — but they are held to the same bar as registered queries
from day one: DuckDB-oracle parity here, persisted-state scan audits
and row-identity vs the recompute siblings in test_stored_state.py.
The r17 builder merges ``pending_queries_and_oracles`` into the
registry and gives each a window slot.
"""

from __future__ import annotations

import pytest

from datafusion_delta_queries_spark.operators import registry
from datafusion_delta_queries_spark.operators.signed_queries import (
    pending_queries_and_oracles,
)
from datafusion_delta_queries_spark.oracle import compare, run_oracle

from .conftest import SF_SMALL

PENDING_Q, PENDING_O = pending_queries_and_oracles()


def test_pending_tranche_is_fully_oracled():
    assert set(PENDING_Q) == set(PENDING_O)
    assert len(PENDING_Q) == 5


def test_pending_stays_out_of_the_registry_this_round():
    """Registering ahead of window room would break the
    never-driver-checked = 0 invariant; the tranche waits for r17.
    (When the r17 builder merges them, flip this assertion to demand
    they ARE registered and delete the pending surface.)"""
    queries, _ = registry()
    assert not set(PENDING_Q) & set(queries)


@pytest.mark.parametrize("name", sorted(PENDING_Q))
def test_pending_query_matches_oracle(spark, name):
    df = PENDING_Q[name](spark, SF_SMALL)
    oracle = run_oracle(PENDING_O[name], SF_SMALL)
    ok, msg = compare(df, oracle)
    assert ok, f"{name}: {msg}"
