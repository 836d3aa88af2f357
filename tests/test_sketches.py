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
