"""TPC-H-style headline queries, adapted to the driver's star schema.

These exercise the full scan→filter→join→aggregate→sort pipeline the
reference delegates to stock DataFusion (SURVEY §2.2: SQL frontend at
/root/reference/src/optimizer_rules/mod.rs:223-225); we express them
with the DataFrame API so Catalyst gets a fully declarative plan:
filters reach the parquet scan (PushedFilters), only referenced columns
are read (ReadSchema), and fixed-size dimensions are broadcast.

Scale posture (100 TB): lineitem/orders are the fact tables — their
join shuffles on the order key unless co-partitioned/bucketed at write
time. Only ``nation`` (25 rows) and ``region`` (5 rows) carry explicit
``broadcast()`` hints: they are constant-size at any scale factor.
``customer``/``supplier``/``part`` grow linearly with SF, so forcing a
broadcast would OOM executors at 100 TB — AQE decides broadcast vs
shuffle for them from runtime statistics instead. All aggregates are partial-agg
(map-side combine) by construction.

Determinism: every computed column is aliased identically in the Spark
plan and the DuckDB oracle; money aggregates are rounded to 2 decimals
so double summation order can't perturb the comparison hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def q_flagship_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: filtered equi-join lineitem⋈orders + group-agg.

    Revenue per order-priority for orders shipped in 1996, pruned to 4
    lineitem columns + 2 orders columns at the scan.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


ORACLE_FLAGSHIP = """
SELECT o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY o_orderpriority
"""


def q_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report (8 aggregates, 2 group keys).

    Pure partial-aggregable scan: at 100 TB this is one pass over
    lineitem with map-side combine into 6 groups — no join, minimal
    shuffle (32 → 6 rows).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 adapted: top unshipped-revenue orders for one segment.

    customer joins un-hinted (AQE broadcasts it when stats allow;
    it scales with SF so a forced hint would break at 100 TB);
    orders⋈lineitem shuffles on the order key. Top-10 via orderBy().limit() — Spark plans TakeOrderedAndProject
    (per-partition top-k, no global sort materialization).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") > "1997-03-15")
        .join(orders.where(F.col("o_orderdate") < "1997-03-15"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.where(F.col("c_mktsegment") == "BUILDING"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


ORACLE_Q3 = """
SELECT l_orderkey,
       o_orderdate,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15'
  AND l_shipdate > TIMESTAMP '1997-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 adapted: revenue by nation where customer and supplier
    share a nation, one region, one year.

    Five-way join: nation/region broadcast (fixed-size);
    customer/supplier left to AQE (SF-proportional). The
    c_nationkey = s_nationkey equality rides on the supplier join
    condition.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(
            orders.where(
                (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


ORACLE_Q5 = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate; all three predicates push
    to the parquet reader (row-group skipping at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


ORACLE_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 adapted: top customers by lost revenue on returns."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(
            orders.where(
                (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_mktsegment")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.round(F.max("c_acctbal"), 2).alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


ORACLE_Q10 = """
SELECT c_custkey, c_name, n_name, c_mktsegment,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(max(c_acctbal), 2) AS c_acctbal
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 adapted: promo revenue share per brand, one quarter.

    lineitem⋈part shuffles on the part key unless bucketed at write
    time; part is SF-proportional so its join strategy is AQE's call
    (no hint). The ratio is conditional-aggregation over one pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.where(
        (F.col("l_shipdate") >= "1996-10-01") & (F.col("l_shipdate") < "1997-01-01")
    ).join(part, F.col("l_partkey") == F.col("p_partkey"))
    rev = "l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)"
    return (
        joined.groupBy("p_brand")
        .agg(
            F.expr(
                f"sum(CASE WHEN p_type = 'PROMO' THEN {rev} ELSE CAST(0.0 AS DOUBLE) END)"
            ).alias("promo_rev"),
            F.expr(f"sum({rev})").alias("total_rev"),
            F.count("*").alias("n_lines"),
        )
        .selectExpr(
            "p_brand",
            "CAST(floor((promo_rev / total_rev * CAST(100.0 AS DOUBLE)) * 1e4 + 0.5)"
            " AS DOUBLE) / 1e4 AS promo_pct",
            "CAST(floor(total_rev * 1e2 + 0.5) AS DOUBLE) / 1e2 AS total_rev",
            "n_lines",
        )
    )


ORACLE_Q14 = """
WITH agg AS (
  SELECT p_brand,
         sum(CASE WHEN p_type = 'PROMO'
                  THEN l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
                  ELSE CAST(0.0 AS DOUBLE) END) AS promo_rev,
         sum(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)) AS total_rev,
         count(*) AS n_lines
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-10-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY p_brand
)
SELECT p_brand,
       CAST(floor((promo_rev / total_rev * CAST(100.0 AS DOUBLE)) * 1e4 + 0.5)
            AS DOUBLE) / 1e4 AS promo_pct,
       CAST(floor(total_rev * 1e2 + 0.5) AS DOUBLE) / 1e2 AS total_rev,
       n_lines
FROM agg
"""


def queries_and_oracles():
    queries = {
        "flagship_revenue": q_flagship_revenue,
        "tpch_q1_pricing_summary": q_tpch_q1_pricing_summary,
        "tpch_q3_shipping_priority": q_tpch_q3_shipping_priority,
        "tpch_q5_local_supplier_volume": q_tpch_q5_local_supplier_volume,
        "tpch_q6_forecast_revenue": q_tpch_q6_forecast_revenue,
        "tpch_q10_returned_items": q_tpch_q10_returned_items,
        "tpch_q14_promo_revenue": q_tpch_q14_promo_revenue,
    }
    oracles = {
        "flagship_revenue": ORACLE_FLAGSHIP,
        "tpch_q1_pricing_summary": ORACLE_Q1,
        "tpch_q3_shipping_priority": ORACLE_Q3,
        "tpch_q5_local_supplier_volume": ORACLE_Q5,
        "tpch_q6_forecast_revenue": ORACLE_Q6,
        "tpch_q10_returned_items": ORACLE_Q10,
        "tpch_q14_promo_revenue": ORACLE_Q14,
    }
    return queries, oracles
