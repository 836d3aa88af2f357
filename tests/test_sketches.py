"""Sketch aggregates: approximation error bounds vs exact answers.

approx_count_distinct (HyperLogLog++) and approx_percentile (quantile
sketch) are the one-pass, mergeable-partials forms of NDV and quantile
at 100 TB — exact distinct/percentile must shuffle or sort the world.
No SQL oracle (sketches are engine-specific by design); the gate is
bounded relative error against the in-repo exact computation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_queries_spark.catalog import load_table

from .conftest import SF_SMALL


def test_hll_ndv_within_rsd(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
    ).first()
    rel_err = abs(row.approx - row.exact) / row.exact
    assert rel_err < 0.05, f"HLL NDV off by {rel_err:.3%}"


def test_approx_percentile_close_to_exact(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("approx_p50"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("exact_p99"),
        F.expr("approx_percentile(l_extendedprice, 0.99, 10000)").alias("approx_p99"),
    ).first()
    assert abs(row.approx_p50 - row.exact_p50) / row.exact_p50 < 0.02
    assert abs(row.approx_p99 - row.exact_p99) / row.exact_p99 < 0.02


def test_incremental_ndv_maintenance(spark):
    """Mergeable-HLL NDV: estimates from merged old+delta partials must
    land within the sketch's error bound of the exact per-group NDV —
    maintaining distinct counts from delta batches without rescanning
    the old snapshot (the approximate analog of delta_agg_maintenance).
    """
    from datafusion_delta_queries_spark.functions.sketches import (
        ndv_merge,
        ndv_partial,
    )

    li = load_table(spark, SF_SMALL, "lineitem")
    old = li.where("l_orderkey % 4 != 0")
    delta = li.where("l_orderkey % 4 = 0")

    merged = ndv_merge(
        ndv_partial(old, ["l_returnflag"], "l_partkey"),
        ndv_partial(delta, ["l_returnflag"], "l_partkey"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact")
    )
    rows = merged.join(exact, "l_returnflag").collect()
    assert rows
    for r in rows:
        assert abs(r.ndv - r.exact) / r.exact < 0.03, r


def test_ndv_merge_preserves_disjoint_groups(spark):
    """Groups present in only one partial survive the merge."""
    from datafusion_delta_queries_spark.functions.sketches import (
        ndv_merge,
        ndv_partial,
    )

    li = load_table(spark, SF_SMALL, "lineitem")
    a = ndv_partial(li.where("l_linenumber = 1"), ["l_linenumber"], "l_partkey")
    b = ndv_partial(li.where("l_linenumber = 2"), ["l_linenumber"], "l_partkey")
    got = {r.l_linenumber: r.ndv for r in ndv_merge(a, b).collect()}
    assert set(got) == {1, 2} and all(v > 0 for v in got.values())


# --- portable register-level HLL (functions/sketches.py) -----------------
#
# Register determinism and merge==rebuild are driver-oracle rows
# (sketch_hll_ndv, delta_hll_maintenance); here we gate what the
# oracle deliberately excludes — the float ESTIMATE's accuracy — plus
# the merge identity as a local property.

from datafusion_delta_queries_spark.functions.sketches import (  # noqa: E402
    hll_estimate,
    hll_merge_registers,
    hll_portable_registers,
    hll_summary,
)

from .conftest import SF_MED  # noqa: E402


def test_portable_hll_estimate_accuracy(spark):
    """p=8 gives ~6.5% RSD; demand < 15% (≈ 2.3 sigma) per group at
    NDV ≈ 1000 — loose enough to be stable, tight enough to catch any
    register-mapping bug (those throw estimates off by >2x)."""
    orders = load_table(spark, SF_MED, "orders")
    regs = hll_portable_registers(orders, ["o_orderpriority"], "o_custkey")
    est = hll_estimate(hll_summary(regs, ["o_orderpriority"]), ["o_orderpriority"])
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact")
    )
    rows = est.join(exact, "o_orderpriority").collect()
    assert rows
    for r in rows:
        rel = abs(r.ndv_est - r.exact) / r.exact
        assert rel < 0.15, f"{r.o_orderpriority}: est {r.ndv_est} vs {r.exact}"


def test_portable_hll_merge_equals_rebuild(spark):
    """Union-then-sketch == sketch-then-max-merge, register for
    register (the exact identity incremental maintenance relies on)."""
    orders = load_table(spark, SF_MED, "orders")
    lo = orders.where(F.col("o_orderkey") % 3 == 0)
    hi = orders.where(F.col("o_orderkey") % 3 != 0)
    merged = hll_merge_registers(
        hll_portable_registers(lo, ["o_orderpriority"], "o_custkey"),
        hll_portable_registers(hi, ["o_orderpriority"], "o_custkey"),
    )
    full = hll_portable_registers(orders, ["o_orderpriority"], "o_custkey")
    diff = merged.exceptAll(full).union(full.exceptAll(merged))
    assert diff.count() == 0


def test_portable_hll_register_bounds(spark):
    """bucket in [0, 256), rho in [1, 41] — the integer envelope the
    s_scaled arithmetic depends on for exactness."""
    orders = load_table(spark, SF_MED, "orders")
    regs = hll_portable_registers(orders, ["o_orderpriority"], "o_custkey")
    bad = regs.where(
        (F.col("bucket") < 0) | (F.col("bucket") >= 256)
        | (F.col("rho") < 1) | (F.col("rho") > 41)
    )
    assert bad.count() == 0
