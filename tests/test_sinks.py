"""Layout sinks: partition pruning and exchange-free bucketed joins."""

from __future__ import annotations

from datafusion_delta_queries_spark.catalog import load_table
from datafusion_delta_queries_spark.sources.sinks import (
    bucketed_join,
    write_bucketed,
    write_partitioned,
)

from .conftest import SF_SMALL


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_partitioned_write_prunes(spark, tmp_path):
    orders = load_table(spark, SF_SMALL, "orders")
    path = str(tmp_path / "orders_part")
    write_partitioned(orders, path, ["o_orderpriority"])
    got = spark.read.parquet(path).where("o_orderpriority = '1-URGENT'")
    plan = _plan(got)
    assert "PartitionFilters: [" in plan and "o_orderpriority" in plan
    want = orders.where("o_orderpriority = '1-URGENT'").count()
    assert got.count() == want


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF_SMALL, "orders").selectExpr(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, SF_SMALL, "lineitem").selectExpr(
        "l_orderkey AS o_orderkey", "l_quantity"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", 8)
    write_bucketed(li, "lineitem_b", "o_orderkey", 8)
    # At fixture size the planner would broadcast (and rightly skip the
    # buckets); force the big-table path the layout exists for.
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        plan = _plan(joined)
        # The shuffle was paid at write time: the join plan must carry
        # no Exchange of any kind — sort-merge directly over buckets.
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        n = joined.count()
        assert n == orders.join(li, "o_orderkey").count() and n > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
