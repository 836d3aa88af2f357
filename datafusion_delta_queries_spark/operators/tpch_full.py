"""The remaining TPC-H queries (Q2,4,7,8,9,11,12,13,15-22), adapted.

Completes the TPC-H suite started in ``tpch.py`` so a reference user can
run the full decision-support workload (SURVEY §2.2: the reference
reaches these shapes through stock DataFusion SQL at
/root/reference/src/optimizer_rules/mod.rs:223-225; we express them
DataFrame-first so Catalyst plans them).

The driver's star schema is a *reduced* TPC-H (TESTDATA.md): there is
no ``partsupp`` table, no commit/receipt dates, no phone/comment/
container columns. Queries that depend on those are adapted, keeping
the original's *plan shape* (the joins, subquery patterns, and
aggregation structure that make each query interesting):

- Q2's supply cost     → min observed unit price from lineitem
- Q4/Q12/Q21 lateness  → l_shipdate > o_orderdate + 90 days
- Q9's supply cost     → 80% of p_retailprice
- Q11/Q16/Q20 partsupp → the lineitem part↔supplier link
- Q22's phone prefix   → customer nation

Scale posture (100 TB) follows tpch.py: only fixed-size ``nation`` /
``region`` carry broadcast hints; SF-proportional tables are left to
AQE. Correlated subqueries are expressed as joins/aggregations in the
Spark plan (what a decorrelator would produce) while the DuckDB oracle
keeps the classic EXISTS/IN form — passing means the two independent
formulations agree.

Determinism: money aggregates rounded to 2dp; ratio outputs use the
floor(x*1eN+0.5) pattern from tpch.py Q14; integer-valued outputs cast
to BIGINT on both sides; every LIMIT carries a unique tiebreak key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table


def _late(days: int = 90):
    """Lineitem lateness predicate: shipped > `days` after order date."""
    return F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {days} DAY")


def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 adapted: cheapest EUROPE supplier per small STANDARD part.

    No partsupp table, so "supply cost" = the minimum observed unit
    price (l_extendedprice / l_quantity) in lineitem — min() is
    order-insensitive, so both engines compute bit-identical values.
    The classic correlated min-subquery becomes a window row_number
    (per-part rank by price), which is how Spark decorrelates it
    anyway: one shuffle on the part key, no per-row subquery.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cost = (
        li.join(part.where((F.col("p_type") == "STANDARD") & (F.col("p_size") < 10)),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.where(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("min_price"))
    )
    w = Window.partitionBy("p_partkey").orderBy("min_price", "s_suppkey")
    return (
        cost.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("min_price", 4).alias("min_price"),
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


ORACLE_Q2 = """
WITH cost AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         min(l_extendedprice / l_quantity) AS min_price
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD' AND p_size < 10
  GROUP BY p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY p_partkey
                               ORDER BY min_price, s_suppkey) AS rn
  FROM cost
)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_name,
       round(min_price, 4) AS min_price
FROM ranked WHERE rn = 1
ORDER BY s_acctbal DESC, s_name, p_partkey
LIMIT 100
"""


def q_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 adapted: orders per priority with at least one late lineitem.

    EXISTS becomes a left-semi join (equi key + lateness condition) —
    Spark's semi join short-circuits on first match, no dedup needed.
    Lateness = shipped >60 days after order date (no commit/receipt
    dates in this schema).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.where(
            (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
        )
        .join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


ORACLE_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def q_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume between two nations by ship year.

    Nation joins twice under different roles — renamed copies avoid
    column ambiguity; both are 25-row broadcasts. The OR-of-pairs
    predicate lands after both joins (Catalyst pushes each side).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.where((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


ORACLE_Q7 = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
"""


def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_3's share of ECONOMY-part revenue in ASIA, by year.

    Conditional aggregation over one joined pass; the share ratio uses
    the floor-based rounding from Q14 so both engines round the same
    way. Supplier-side nation tags each line's origin; customer-side
    region restricts the market.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    vol = "l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)"
    return (
        li.join(part.where(F.col("p_type") == "ECONOMY"), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.where(
                (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(region.where(F.col("r_name") == "ASIA")),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.expr(
                f"sum(CASE WHEN supp_nation = 'NATION_3' THEN {vol} ELSE CAST(0.0 AS DOUBLE) END)"
            ).alias("nation_vol"),
            F.expr(f"sum({vol})").alias("total_vol"),
        )
        .selectExpr(
            "o_year",
            "CAST(floor((nation_vol / total_vol) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS mkt_share",
            "CAST(floor(total_vol * 1e2 + 0.5) AS DOUBLE) / 1e2 AS total_vol",
        )
    )


ORACLE_Q8 = """
WITH shares AS (
  SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
         sum(CASE WHEN n1.n_name = 'NATION_3'
                  THEN l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
                  ELSE CAST(0.0 AS DOUBLE) END) AS nation_vol,
         sum(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)) AS total_vol
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY o_year
)
SELECT o_year,
       CAST(floor((nation_vol / total_vol) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS mkt_share,
       CAST(floor(total_vol * 1e2 + 0.5) AS DOUBLE) / 1e2 AS total_vol
FROM shares
"""


def q_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 adapted: profit on red parts by supplier nation and year.

    No partsupp.ps_supplycost, so cost is modeled as 80% of
    p_retailprice per unit — the plan shape (LIKE-filtered part join,
    double fact join, nation rollup) is the point, not the constant.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.8 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part.where(F.col("p_name").like("%red%")), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


ORACLE_Q9 = """
SELECT n_name AS nation,
       CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.8 * p_retailprice * l_quantity), 2) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
"""


def q_tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 adapted: parts whose shipped value (via NATION_5 suppliers)
    exceeds 0.2% of that nation's total.

    The HAVING-over-global-total scalar subquery becomes a 1-row
    broadcast cross join against the per-part aggregate — no second
    scan of the fact table (the per-part aggregate is reused for the
    total via a re-aggregation, which Spark plans off the small
    intermediate, not the 100 TB input).
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    per_part = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation.where(F.col("n_name") == "NATION_5")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    total = per_part.agg((F.sum("value") * F.lit(0.002)).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select("partkey", F.round("value", 2).alias("value"))
    )


ORACLE_Q11 = """
WITH per_part AS (
  SELECT l_partkey AS partkey,
         sum(l_extendedprice * (1 - l_discount)) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY l_partkey
)
SELECT partkey, round(value, 2) AS value
FROM per_part
WHERE value > (SELECT sum(value) * 0.002 FROM per_part)
"""


def q_tpch_q12_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 adapted: high/low-priority line counts by lateness bucket.

    No l_shipmode, so the grouping key is the lateness bucket itself
    (late = shipped >90 days after order date). Conditional counts
    stay in one map-side-combinable aggregation.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.where((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.when(_late(90), "LATE").otherwise("ONTIME").alias("late_bucket")
        )
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


ORACLE_Q12 = """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
            THEN 'LATE' ELSE 'ONTIME' END AS late_bucket,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
         AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY late_bucket
"""


def q_tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of per-customer order counts.

    Left join keeps zero-order customers; the join-time predicate
    (priority filter) stays in the join condition, not a WHERE, so
    unmatched customers survive. Two-level aggregation: the second
    groupBy runs over at most |customer| rows.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders.where(F.col("o_orderpriority") != "5-LOW"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


ORACLE_Q13 = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
"""

def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with the maximum quarterly revenue.

    Revenue is rounded to cents *before* the max-equality comparison so
    both engines compare the same value (raw double sums are
    order-dependent). The scalar max rides a 1-row broadcast join; the
    per-supplier aggregate is computed once and reused.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.where((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01"))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        supp.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


ORACLE_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


def q_tpch_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 adapted: distinct suppliers per (brand, type, size) bucket.

    The partsupp part<->supplier link is reconstructed from lineitem.
    count(DISTINCT) shuffles once on the grouping key; the part filter
    prunes before the join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(
            part.where(
                (F.col("p_brand") != "Brand#1")
                & (F.col("p_type") != "PROMO")
                & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_Q16 = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
GROUP BY p_brand, p_type, p_size
"""


def q_tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue from below-one-fifth-of-average-quantity lines.

    The correlated per-part avg subquery is decorrelated into a
    groupBy + equi-join (what Catalyst's RewriteCorrelatedScalarQuery
    produces). Quantities are integral doubles, so avg() is exact in
    both engines and the 0.2x threshold compares bit-identically.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(
            part.where((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(per_part_avg, F.col("l_partkey") == F.col("avg_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


ORACLE_Q17 = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def q_tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: customers behind orders totalling >180 units.

    The IN-subquery over a grouped HAVING becomes a semi join against
    the qualifying-order set; quantity sums are exact (integral).
    Top-100 by price via TakeOrderedAndProject.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("big_qty"))
        .where(F.col("big_qty") > 180)
        .select("l_orderkey")
    )
    return (
        orders.join(big.withColumnRenamed("l_orderkey", "big_orderkey"),
                    F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


ORACLE_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(sum(l_quantity), 2) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 180)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q_tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: revenue from three disjunctive brand/size/quantity bands.

    One join + an OR-of-conjunctions residual predicate; Catalyst
    extracts the common l_partkey = p_partkey equi-key so this stays a
    hash join (no cartesian), with the bands as a post-join filter.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    bands = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#17") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .where(bands)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


ORACLE_Q19 = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q_tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 adapted: EUROPE suppliers who moved >100 units of red parts
    in 1996.

    The nested IN-subqueries (partsupp -> part, availqty threshold)
    become: per-supplier shipped quantity over LIKE-filtered parts,
    HAVING the threshold, then a semi join into the region-filtered
    supplier list.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    movers = (
        li.where((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
        .join(part.where(F.col("p_name").like("%red%")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


ORACLE_Q20 = """
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%red%'
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > 100)
ORDER BY s_name
"""


def q_tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 adapted: suppliers solely responsible for late finalized
    orders.

    Lateness = shipped >90 days after order date. The classic
    EXISTS / NOT EXISTS pair is decorrelated into per-order supplier
    stats: an order qualifies for supplier s when it has >1 distinct
    supplier but exactly 1 distinct *late* supplier (= s). The oracle
    keeps the textbook correlated form, so a pass certifies the
    decorrelation. Counting stays per late line, as in the original.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    nations = ["NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5"]
    f_orders = orders.where(F.col("o_orderstatus") == "F")
    lines = li.join(f_orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey", _late(90).alias("is_late")
    )
    order_stats = lines.groupBy(F.col("l_orderkey").alias("so_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    return (
        lines.where(F.col("is_late"))
        .join(
            order_stats.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
            F.col("l_orderkey") == F.col("so_orderkey"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation.where(F.col("n_name").isin(nations))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


ORACLE_Q21 = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders     ON o_orderkey = l1.l_orderkey
JOIN nation     ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q_tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 adapted: well-funded customers with no recent orders, by
    nation.

    Phone-prefix grouping becomes nation grouping (no phone column);
    "never ordered" becomes "no order since 2000" (every customer has
    orders). The scalar avg threshold is a 1-row broadcast; the NOT
    EXISTS is an anti join against date-filtered orders.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    threshold = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = orders.where(F.col("o_orderdate") >= "2000-01-01")
    return (
        cust.join(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


ORACLE_Q22 = """
SELECT n_name AS cntry,
       count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n_name
"""


def queries_and_oracles():
    queries = {
        "tpch_q2_min_cost_supplier": q_tpch_q2_min_cost_supplier,
        "tpch_q4_order_priority": q_tpch_q4_order_priority,
        "tpch_q7_volume_shipping": q_tpch_q7_volume_shipping,
        "tpch_q8_market_share": q_tpch_q8_market_share,
        "tpch_q9_product_profit": q_tpch_q9_product_profit,
        "tpch_q11_important_parts": q_tpch_q11_important_parts,
        "tpch_q12_priority_lateness": q_tpch_q12_priority_lateness,
        "tpch_q13_customer_distribution": q_tpch_q13_customer_distribution,
        "tpch_q15_top_supplier": q_tpch_q15_top_supplier,
        "tpch_q16_supplier_counts": q_tpch_q16_supplier_counts,
        "tpch_q17_small_qty_revenue": q_tpch_q17_small_qty_revenue,
        "tpch_q18_large_volume_customer": q_tpch_q18_large_volume_customer,
        "tpch_q19_discounted_revenue": q_tpch_q19_discounted_revenue,
        "tpch_q20_promotion_suppliers": q_tpch_q20_promotion_suppliers,
        "tpch_q21_waiting_suppliers": q_tpch_q21_waiting_suppliers,
        "tpch_q22_dormant_customers": q_tpch_q22_dormant_customers,
    }
    oracles = {
        "tpch_q2_min_cost_supplier": ORACLE_Q2,
        "tpch_q4_order_priority": ORACLE_Q4,
        "tpch_q7_volume_shipping": ORACLE_Q7,
        "tpch_q8_market_share": ORACLE_Q8,
        "tpch_q9_product_profit": ORACLE_Q9,
        "tpch_q11_important_parts": ORACLE_Q11,
        "tpch_q12_priority_lateness": ORACLE_Q12,
        "tpch_q13_customer_distribution": ORACLE_Q13,
        "tpch_q15_top_supplier": ORACLE_Q15,
        "tpch_q16_supplier_counts": ORACLE_Q16,
        "tpch_q17_small_qty_revenue": ORACLE_Q17,
        "tpch_q18_large_volume_customer": ORACLE_Q18,
        "tpch_q19_discounted_revenue": ORACLE_Q19,
        "tpch_q20_promotion_suppliers": ORACLE_Q20,
        "tpch_q21_waiting_suppliers": ORACLE_Q21,
        "tpch_q22_dormant_customers": ORACLE_Q22,
    }
    return queries, oracles
