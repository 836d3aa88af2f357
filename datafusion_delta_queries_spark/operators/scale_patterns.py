"""Scale patterns as runnable, oracle-checked queries.

These exist to keep the 100 TB idioms (functions/skew.py, bucketed
layout) exercised by the driver's correctness gate, not just unit
tests: the salted aggregation must produce bit-identical results to
the plain GROUP BY it replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.skew import salted_agg, salted_join


def q_agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the 3 hot returnflag keys.

    l_quantity is integral-valued, so partial sums recombine exactly
    and the result matches a single-phase GROUP BY bit-for-bit.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return salted_agg(
        li,
        key_cols=["l_returnflag"],
        partial_aggs=[
            F.sum("l_quantity").alias("p_qty"),
            F.count("*").alias("p_cnt"),
            F.max("l_extendedprice").alias("p_max"),
        ],
        final_aggs=[
            F.round(F.sum("p_qty"), 2).alias("sum_qty"),
            F.sum("p_cnt").cast("bigint").alias("n_items"),
            F.round(F.max("p_max"), 2).alias("max_price"),
        ],
        salt_from="l_orderkey",
        n_salts=16,
    )


ORACLE_AGG_SALTED = """
SELECT l_returnflag,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n_items,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem GROUP BY l_returnflag
"""


def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join (16 salts), aggregated per priority.

    The salt splits each hot order key 16 ways; orders replicate 16×.
    The join output is row-identical to the un-salted join, so the
    post-join aggregate matches the plain-SQL oracle exactly.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(
        li.where(F.col("l_shipdate") >= "1997-01-01"),
        orders,
        fact_key="l_orderkey",
        dim_key="o_orderkey",
        salt_from="l_linenumber",
        n_salts=16,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_lines"),
    )


ORACLE_JOIN_SALTED = """
SELECT o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
GROUP BY o_orderpriority
"""


def queries_and_oracles():
    return (
        {
            "agg_salted_skew": q_agg_salted_skew,
            "join_salted_skew": q_join_salted_skew,
        },
        {
            "agg_salted_skew": ORACLE_AGG_SALTED,
            "join_salted_skew": ORACLE_JOIN_SALTED,
        },
    )
