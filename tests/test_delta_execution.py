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


def test_agg_maintenance_identity_any_split(spark):
    """agg(T ∪ ΔT) == merge(agg(T), agg(ΔT)) for EVERY split of the
    input, not just the fixture's — the decomposable-aggregate identity
    behind q_delta_agg_maintenance, exercised over several moduli.

    count/min/max merge exactly; the double-sum merge is compared under
    a 1e-6 relative tolerance (re-aggregation reorders float addition).
    """
    from pyspark.sql import functions as F

    from datafusion_delta_queries_spark.catalog import load_table

    orders = load_table(spark, SF_SMALL, "orders")

    def partial(df):
        return df.groupBy("o_orderpriority").agg(
            F.sum("o_totalprice").alias("p_total"),
            F.count("*").alias("p_n"),
            F.max("o_totalprice").alias("p_max"),
            F.min("o_totalprice").alias("p_min"),
        )

    def merge(*parts):
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u.groupBy("o_orderpriority").agg(
            F.sum("p_total").alias("total"),
            F.sum("p_n").alias("n"),
            F.max("p_max").alias("mx"),
            F.min("p_min").alias("mn"),
        )

    for m in (2, 3, 7):
        old = orders.where(f"o_orderkey % {m} != 0")
        delta = orders.where(f"o_orderkey % {m} = 0")
        assert old.count() > 0 and delta.count() > 0, m
        merged = {
            r.o_orderpriority: r for r in merge(partial(old), partial(delta)).collect()
        }
        full = {r.o_orderpriority: r for r in merge(partial(orders)).collect()}
        assert set(merged) == set(full), m
        for k in full:
            a, b = merged[k], full[k]
            assert a.n == b.n and a.mx == b.mx and a.mn == b.mn, (m, k)
            assert abs(a.total - b.total) <= 1e-6 * abs(b.total), (m, k)
