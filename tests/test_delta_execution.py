"""Execution-level IVM correctness: full(T ∪ ΔT) == full(T) ∪ delta(T, ΔT).

The reference never executes a delta plan (all its MemTables are empty,
optimizer_rules/mod.rs:219); these tests run the identity on real data
for every delta query we ship, comparing multisets.
"""

from __future__ import annotations

import pytest

from datafusion_delta_queries_spark.operators.delta_queries import (
    _COMPOSITE_IR,
    _CROSS_IR,
    _JOIN_IR,
    _JOIN_THETA_IR,
    _PF_IR,
    _SEMI_IR,
    _UNION_IR,
)
from datafusion_delta_queries_spark.plans import (
    DeltaCatalog,
    compile_delta,
    compile_plan,
    compile_snapshot,
)

from .conftest import SF_SMALL

IRS = {
    "projection_filter": _PF_IR,
    "join": _JOIN_IR,
    "join_theta": _JOIN_THETA_IR,
    "cross_join": _CROSS_IR,
    "union": _UNION_IR,
    "composite": _COMPOSITE_IR,
    # The semi-join delta rule is the one rewrite invented beyond the
    # reference — keep its IVM identity in the deterministic set, not
    # just the Hypothesis property sweep.
    "semi_join": _SEMI_IR,
}


def _multiset(df):
    return sorted(tuple(row) for row in df.collect())


@pytest.mark.parametrize("name", sorted(IRS))
def test_ivm_identity(spark, name):
    ir = IRS[name]
    cat = DeltaCatalog(spark, SF_SMALL)
    full_new = _multiset(compile_plan(ir, cat))
    full_old = _multiset(compile_snapshot(ir, cat))
    delta = _multiset(compile_delta(ir, cat))
    assert len(delta) > 0, "vacuous: delta batch produced no new output rows"
    assert sorted(full_old + delta) == full_new


def test_compile_delta_refuses_unsupported(spark):
    from datafusion_delta_queries_spark.plans import Scan
    from datafusion_delta_queries_spark.plans.nodes import PosDelta, PosDeltaScan

    cat = DeltaCatalog(spark, SF_SMALL)
    with pytest.raises(ValueError, match="no positive-delta derivation"):
        compile_delta(PosDelta(PosDeltaScan(Scan("orders"))), cat)
