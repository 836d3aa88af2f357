"""Core relational operator surface (SURVEY §2.3 coverage map).

One thin, deterministic, alias-stable query per operator category the
reference supports (directly or via its DataFusion SQL frontend —
/root/reference/src/optimizer_rules/mod.rs:223-225, 187) plus the
categories Spark gives us beyond the reference's ``Ok(None)`` fallback
(aggregates, windows, sort/limit, set ops, scalar functions,
subqueries, pivot).

Conventions (driver correctness gate):
- every computed column aliased identically in Spark and oracle SQL;
- aggregate doubles rounded (summation order must not perturb hashes);
- integer-valued computed columns cast to BIGINT on both sides;
- LIMIT queries carry a unique total order (explicit tiebreaker).

Scale posture: only fixed-size dimensions (nation/region) carry
broadcast hints — SF-proportional tables are left to AQE; aggregations
rely on partial aggregation; window queries partition on their keys
(one shuffle); nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table

# ---------------------------------------------------------------------------
# Projection / filter  (reference match arms: mod.rs:22-37, 38-53)
# ---------------------------------------------------------------------------


def q_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """π with computed expressions; scan reads only 3 columns."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        F.col("c_custkey"),
        F.upper(F.col("c_name")).alias("name_upper"),
        F.col("c_acctbal"),
    )


ORACLE_PROJECTION = """
SELECT c_custkey, upper(c_name) AS name_upper, c_acctbal FROM customer
"""


def q_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """σ with conjunctive predicates — all three push to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") > 45) & (F.col("l_discount") < 0.02) & (F.col("l_returnflag") == "N")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


ORACLE_FILTER_PUSHDOWN = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_quantity > 45 AND l_discount < 0.02 AND l_returnflag = 'N'
"""


def q_filter_complex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE / OR predicate mix."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.where(
        (F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        & (F.col("o_totalprice").between(1000, 5000))
        & (F.col("o_orderstatus").like("%F%") | (F.col("o_orderstatus") == "O"))
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")


ORACLE_FILTER_COMPLEX = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_totalprice BETWEEN 1000 AND 5000
  AND (o_orderstatus LIKE '%F%' OR o_orderstatus = 'O')
"""


# ---------------------------------------------------------------------------
# Joins  (reference match arms: mod.rs:54-98 cross, 99-158 keyed-any-type)
# ---------------------------------------------------------------------------


def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join chain customer⋈nation⋈region; dims broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


ORACLE_JOIN_INNER = """
SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


ORACLE_JOIN_LEFT = """
SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
       round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: orders ⟖ customer (all customers preserved)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"), "right")
        .groupBy("c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.count("*").alias("n_rows"),
        )
    )


ORACLE_JOIN_RIGHT = """
SELECT c_mktsegment, count(o_orderkey) AS n_orders, count(*) AS n_rows
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two daily aggregates (dates may miss on either side)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    od = (
        orders.groupBy(F.date_trunc("day", "o_orderdate").alias("d"))
        .agg(F.count("*").alias("n_orders"))
    )
    ld = (
        li.groupBy(F.date_trunc("day", "l_shipdate").alias("d"))
        .agg(F.count("*").alias("n_ship"))
    )
    return (
        od.join(ld, "d", "full")
        .select(
            F.col("d").alias("day"),
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce("n_ship", F.lit(0)).cast("long").alias("n_ship"),
        )
    )


ORACLE_JOIN_FULL = """
SELECT coalesce(od.d, ld.d) AS day,
       CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(coalesce(n_ship, 0) AS BIGINT) AS n_ship
FROM (SELECT date_trunc('day', o_orderdate) AS d, count(*) AS n_orders FROM orders GROUP BY 1) od
FULL OUTER JOIN (SELECT date_trunc('day', l_shipdate) AS d, count(*) AS n_ship FROM lineitem GROUP BY 1) ld
ON od.d = ld.d
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: customers having at least one urgent order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


ORACLE_JOIN_SEMI = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with no urgent high-value order.

    (Predicate chosen to be non-empty at every fixture scale so the
    oracle check isn't vacuously 0 == 0.)
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big_urgent = orders.where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 250000)
    )
    return cust.join(
        big_urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


ORACLE_JOIN_ANTI = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT'
                    AND o_totalprice > 250000)
"""


def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (reference mod.rs:54-98): region × nation pairs."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


ORACLE_JOIN_CROSS = """
SELECT r_name, n_name FROM region CROSS JOIN nation
"""


def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join — reference carries these via the Join
    node's extra ``filter`` field (mod.rs:124-125). Band join: suppliers
    paired with nations whose key is within ±1 of theirs."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(
            F.broadcast(nation),
            (F.col("s_nationkey") >= F.col("n_nationkey") - 1)
            & (F.col("s_nationkey") <= F.col("n_nationkey") + 1),
        )
        .select("s_suppkey", "s_name", "n_nationkey", "n_name")
    )


ORACLE_JOIN_THETA = """
SELECT s_suppkey, s_name, n_nationkey, n_name
FROM supplier JOIN nation
  ON s_nationkey >= n_nationkey - 1 AND s_nationkey <= n_nationkey + 1
"""


# ---------------------------------------------------------------------------
# Set operations  (reference union-all arm: mod.rs:159-180)
# ---------------------------------------------------------------------------


def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (multiset) — mirrors the reference's tested `union all`
    (mod.rs:471-472). Branches come from two different tables so the
    union is genuine (a same-table year split would collapse to one
    scan with an IN filter)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    a = orders.where(F.col("o_totalprice") > 400000).select(
        F.col("o_orderkey").alias("key"),
        F.round("o_totalprice", 2).alias("amount"),
        F.lit("order").alias("src"),
    )
    b = li.where(F.col("l_extendedprice") > 80000).select(
        F.col("l_orderkey").alias("key"),
        F.round("l_extendedprice", 2).alias("amount"),
        F.lit("lineitem").alias("src"),
    )
    return a.unionByName(b)


ORACLE_UNION_ALL = """
SELECT o_orderkey AS key, round(o_totalprice, 2) AS amount, 'order' AS src
FROM orders WHERE o_totalprice > 400000
UNION ALL
SELECT l_orderkey AS key, round(l_extendedprice, 2) AS amount, 'lineitem' AS src
FROM lineitem WHERE l_extendedprice > 80000
"""


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (dedup) over nation keys from two relations."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    a = cust.select(F.col("c_nationkey").cast("int").alias("nationkey"))
    b = supp.select(F.col("s_nationkey").cast("int").alias("nationkey"))
    return a.unionByName(b).distinct()


ORACLE_UNION_DISTINCT = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations that have both customers and suppliers."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return cust.select(F.col("c_nationkey").alias("nationkey")).intersect(
        supp.select(F.col("s_nationkey").alias("nationkey"))
    )


ORACLE_INTERSECT = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: days with orders placed but nothing shipped.

    (Non-empty at every fixture scale, unlike nation-key differences
    which are vacuously empty — every nation has both customers and
    suppliers.)
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.select(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .distinct()
        .exceptAll(
            li.select(F.date_format("l_shipdate", "yyyy-MM-dd").alias("day")).distinct()
        )
    )


ORACLE_EXCEPT = """
SELECT strftime(o_orderdate, '%Y-%m-%d') AS day FROM orders
EXCEPT
SELECT strftime(l_shipdate, '%Y-%m-%d') AS day FROM lineitem
"""


# ---------------------------------------------------------------------------
# Aggregation (beyond the reference — its rule returns None, mod.rs:187)
# ---------------------------------------------------------------------------


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate function battery: count/distinct/min/max/avg/median/stddev."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.countDistinct("o_custkey").alias("n_custs"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.median("o_totalprice"), 4).alias("median_price"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
    )


ORACLE_AGG_STATS = """
SELECT o_orderpriority,
       count(*) AS n,
       count(DISTINCT o_custkey) AS n_custs,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price,
       round(avg(o_totalprice), 4) AS avg_price,
       round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       round(stddev_samp(o_totalprice), 4) AS sd_price
FROM orders GROUP BY o_orderpriority
"""


def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
        .where(F.col("n_customers") > 40)
    )


ORACLE_AGG_HAVING = """
SELECT c_nationkey, count(*) AS n_customers
FROM customer GROUP BY c_nationkey HAVING count(*) > 40
"""


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals; group keys coalesced so subtotal rows
    are unambiguous strings on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


ORACLE_AGG_ROLLUP = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"), F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "total",
            "n",
        )
    )


ORACLE_AGG_CUBE = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       round(sum(o_totalprice), 2) AS total,
       count(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUPING()`` flags over a CUBE whose dimension contains REAL
    NULLs — the standard-SQL disambiguation ``coalesce(col, 'ALL')``
    cannot provide (a genuine NULL group and a cube total both print
    'ALL'; the flag separates them). ``nullif`` manufactures real
    NULLs deterministically so both states appear. One shuffle: Spark
    expands the cube via a single Expand node feeding a partial+final
    hash aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.selectExpr(
            "nullif(o_orderpriority, '1-URGENT') AS prio",
            "o_orderstatus AS status",
            "o_totalprice",
        )
        .cube("prio", "status")
        .agg(
            F.grouping("prio").cast("bigint").alias("g_prio"),
            F.grouping("status").cast("bigint").alias("g_status"),
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            ).cast("bigint").alias("cents"),
        )
        .select("prio", "status", "g_prio", "g_status", "n", "cents")
    )


ORACLE_AGG_GROUPING_ID = """
WITH t AS (
  SELECT nullif(o_orderpriority, '1-URGENT') AS prio,
         o_orderstatus AS status, o_totalprice
  FROM orders
)
SELECT prio, status,
       CAST(GROUPING(prio) AS BIGINT) AS g_prio,
       CAST(GROUPING(status) AS BIGINT) AS g_status,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS cents
FROM t GROUP BY CUBE (prio, status)
"""


def q_sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with ORDER BY ... LIMIT — per
    nation, the top-2 customers by balance, written the way an
    analyst writes it (a correlated per-row subquery) rather than the
    window form. The Spark-first payoff: Catalyst DECORRELATES the
    lateral limit into ``WindowGroupLimit`` + one hash join (asserted
    in tests/test_plan_audit.py — no nested-loop, no cartesian), so
    the declarative form gets the window-function physical plan for
    free. Balances as integer cents with a c_custkey tiebreak keep
    both engines' top-2 identical."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer"
    )
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.bal_cents
        FROM nation n,
        LATERAL (
          SELECT c_custkey,
                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
          FROM customer c WHERE c.c_nationkey = n.n_nationkey
          ORDER BY bal_cents DESC, c_custkey LIMIT 2
        ) t
        """
    )


ORACLE_SQL_LATERAL_TOPN = """
SELECT n.n_name, t.c_custkey, t.bal_cents
FROM nation n,
LATERAL (
  SELECT c_custkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
  FROM customer c WHERE c.c_nationkey = n.n_nationkey
  ORDER BY bal_cents DESC, c_custkey LIMIT 2
) t
"""


def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (by returnflag, by linestatus, grand total)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               round(sum(l_extendedprice), 2) AS total_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


ORACLE_AGG_GROUPING_SETS = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_extendedprice), 2) AS total_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number per priority partition."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 5)
    )


ORACLE_WINDOW_RANK = """
SELECT * FROM (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         rank()       OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk,
         dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS drnk,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 5
"""


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + moving average (rows frame) per customer over time."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.where(F.col("o_custkey") < 100).select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2).alias(
            "running_total"
        ),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("ma3"),
    )


ORACLE_WINDOW_RUNNING = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3
FROM orders WHERE o_custkey < 100
"""


def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: order-over-order price delta per customer."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.where(F.col("o_custkey") < 100).select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice", 1).over(w), 2).alias("delta_prev"),
        F.round(F.lead("o_totalprice", 1).over(w), 2).alias("next_price"),
    )


ORACLE_WINDOW_LAG_LEAD = """
SELECT o_custkey, o_orderkey, o_totalprice,
       round(o_totalprice - lag(o_totalprice, 1) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta_prev,
       round(lead(o_totalprice, 1) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS next_price
FROM orders WHERE o_custkey < 100
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by retail price per p_type (window top-k idiom)."""
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_type").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.select("p_partkey", "p_type", "p_retailprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )


ORACLE_TOPK_PER_GROUP = """
SELECT * FROM (
  SELECT p_partkey, p_type, p_retailprice,
         row_number() OVER (PARTITION BY p_type ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
  FROM part
) WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# Sort / limit / distinct
# ---------------------------------------------------------------------------


def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 — Spark plans TakeOrderedAndProject (no full sort)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(100)
    )


ORACLE_SORT_LIMIT = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").distinct()


ORACLE_DISTINCT = """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
"""


# ---------------------------------------------------------------------------
# Scalar function families (reference exposes none; expressions pass
# through its Projection arm opaquely — mod.rs:33-36)
# ---------------------------------------------------------------------------


def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.where(F.col("c_custkey") < 200).select(
        "c_custkey",
        F.upper(F.col("c_mktsegment")).alias("seg_upper"),
        F.lower(F.col("c_name")).alias("name_lower"),
        F.substring(F.col("c_name"), 10, 6).alias("name_mid"),
        F.length(F.col("c_name")).cast("long").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit("-"), F.col("c_name")).alias("seg_name"),
        F.regexp_extract(F.col("c_name"), r"(\d+)$", 1).alias("cust_digits"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
    )


ORACLE_SCALAR_STRING = r"""
SELECT c_custkey,
       upper(c_mktsegment) AS seg_upper,
       lower(c_name) AS name_lower,
       substr(c_name, 10, 6) AS name_mid,
       CAST(length(c_name) AS BIGINT) AS name_len,
       c_mktsegment || '-' || c_name AS seg_name,
       regexp_extract(c_name, '(\d+)$', 1) AS cust_digits,
       replace(c_name, 'Customer', 'Cust') AS name_short
FROM customer WHERE c_custkey < 200
"""


def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.where(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_98"),
    )


ORACLE_SCALAR_DATE = """
SELECT o_orderkey,
       CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
       CAST(extract(month FROM o_orderdate) AS BIGINT) AS mo,
       CAST(extract(day FROM o_orderdate) AS BIGINT) AS dom,
       CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS qtr,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98
FROM orders WHERE o_orderkey < 500
"""


def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_orderkey") < 100).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 1000.0), 2).alias("abs_diff"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_discount") + 1.0, 2), 6).alias("disc_sq"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
        F.round(F.greatest("l_tax", "l_discount"), 2).alias("max_rate"),
        F.round(F.least("l_tax", "l_discount"), 2).alias("min_rate"),
    )


ORACLE_SCALAR_MATH = """
SELECT l_orderkey, l_linenumber,
       round(abs(l_extendedprice - 1000.0), 2) AS abs_diff,
       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       round(sqrt(l_extendedprice), 6) AS price_sqrt,
       round(ln(l_extendedprice), 6) AS price_ln,
       round(pow(l_discount + 1.0, 2), 6) AS disc_sq,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
       round(greatest(l_tax, l_discount), 2) AS max_rate,
       round(least(l_tax, l_discount), 2) AS min_rate
FROM lineitem WHERE l_orderkey < 100
"""


def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + conditional aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 1000, "small")
        .when(F.col("o_totalprice") < 10000, "medium")
        .otherwise("large")
    )
    return (
        orders.select(band.alias("price_band"), "o_totalprice", "o_orderstatus")
        .groupBy("price_band")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("long")
            .alias("n_finished"),
        )
    )


ORACLE_CASE_WHEN = """
SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
            WHEN o_totalprice < 10000 THEN 'medium'
            ELSE 'large' END AS price_band,
       count(*) AS n,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished
FROM orders GROUP BY 1
"""


def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / null-safe comparison semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_orderkey") < 200).select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_or_null"),
        F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0)).alias("disc_filled"),
        F.col("l_discount").eqNullSafe(F.col("l_tax")).alias("disc_eq_tax"),
    )


ORACLE_NULL_HANDLING = """
SELECT l_orderkey, l_linenumber,
       nullif(l_discount, 0.0) AS disc_or_null,
       coalesce(nullif(l_discount, 0.0), -1.0) AS disc_filled,
       l_discount IS NOT DISTINCT FROM l_tax AS disc_eq_tax
FROM lineitem WHERE l_orderkey < 200
"""


# ---------------------------------------------------------------------------
# Subqueries (reference gets these via DataFusion's SQL frontend)
# ---------------------------------------------------------------------------


def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(ORACLE_IN_SUBQUERY)


ORACLE_IN_SUBQUERY = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
"""


def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(ORACLE_EXISTS_CORRELATED)


ORACLE_EXISTS_CORRELATED = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 30000)
"""


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(ORACLE_SCALAR_SUBQUERY)


ORACLE_SCALAR_SUBQUERY = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
"""


# ---------------------------------------------------------------------------
# Pivot / unpivot
# ---------------------------------------------------------------------------


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot l_returnflag into columns (conditional aggregation)."""
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return piv.select(
        "l_linestatus",
        F.coalesce("A", F.lit(0.0)).alias("qty_a"),
        F.coalesce("N", F.lit(0.0)).alias("qty_n"),
        F.coalesce("R", F.lit(0.0)).alias("qty_r"),
    )


ORACLE_PIVOT = """
SELECT l_linestatus,
       coalesce(round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2), 0.0) AS qty_a,
       coalesce(round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2), 0.0) AS qty_n,
       coalesce(round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2), 0.0) AS qty_r
FROM lineitem GROUP BY l_linestatus
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (stack) aggregate metrics into (metric, value) rows."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("price"),
    )
    return agg.selectExpr(
        "l_returnflag",
        "stack(2, 'qty', qty, 'price', price) AS (metric, value)",
    )


ORACLE_UNPIVOT = """
WITH agg AS (
  SELECT l_returnflag,
         round(sum(l_quantity), 2) AS qty,
         round(sum(l_extendedprice), 2) AS price
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'qty' AS metric, qty AS value FROM agg
UNION ALL
SELECT l_returnflag, 'price' AS metric, price AS value FROM agg
"""


def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4+): month spine from min to max order
    date, left-joined to per-month order counts — the gap-filling
    time-series idiom. The recursion depth is bounded by the date
    range (months), not data volume, so it is driver-cheap at any SF.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        WITH RECURSIVE months(m, hi) AS (
          SELECT date_trunc('month', min(o_orderdate)),
                 date_trunc('month', max(o_orderdate))
          FROM orders
          UNION ALL
          SELECT m + INTERVAL 1 MONTH, hi FROM months WHERE m < hi
        ),
        per_month AS (
          SELECT date_trunc('month', o_orderdate) AS mo, count(*) AS n
          FROM orders GROUP BY 1
        )
        SELECT date_format(m, 'yyyy-MM') AS month,
               CAST(coalesce(n, 0) AS BIGINT) AS n_orders
        FROM months LEFT JOIN per_month ON m = mo
    """)


ORACLE_RECURSIVE_CTE = """
WITH RECURSIVE months(m, hi) AS (
  SELECT date_trunc('month', min(o_orderdate)),
         date_trunc('month', max(o_orderdate))
  FROM orders
  UNION ALL
  SELECT m + INTERVAL 1 MONTH, hi FROM months WHERE m < hi
),
per_month AS (
  SELECT date_trunc('month', o_orderdate) AS mo, count(*) AS n
  FROM orders GROUP BY 1
)
SELECT strftime(m, '%Y-%m') AS month,
       CAST(coalesce(n, 0) AS BIGINT) AS n_orders
FROM months LEFT JOIN per_month ON m = mo
"""


def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (events.props) + filter + aggregation.

    get_json_object stays JVM-side; at scale, frequently-queried JSON
    fields should be materialized to columns at ingest instead.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .where("k IS NOT NULL AND k >= 10")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )


ORACLE_SCALAR_JSON = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 10
GROUP BY event_type
"""


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg idiom)."""
    supp = load_table(spark, sf_dir, "supplier")
    return supp.groupBy("s_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("suppliers")
    )


ORACLE_STRING_AGG = """
SELECT s_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
FROM supplier GROUP BY s_nationkey
"""


def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM).

    Both sides derive a NULLABLE key (acctbal band, NULL for negative
    balances); plain ``=`` would drop the NULL groups, ``<=>`` matches
    them — the semantics SQL gives ``IS NOT DISTINCT FROM``. Still a
    hash join: null-safe equality is an equi-key to Spark.
    """
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey",
        "CASE WHEN c_acctbal >= 0 THEN CAST(floor(c_acctbal / 5000) AS BIGINT) "
        "END AS band",
    )
    supp = load_table(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey",
        "CASE WHEN s_acctbal >= 0 THEN CAST(floor(s_acctbal / 5000) AS BIGINT) "
        "END AS band",
    )
    return (
        cust.join(supp, cust["band"].eqNullSafe(supp["band"]))
        .groupBy(cust["band"].alias("band"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("c_custkey").alias("n_cust"),
            F.countDistinct("s_suppkey").alias("n_supp"),
        )
    )


ORACLE_JOIN_NULL_SAFE = """
WITH c AS (
  SELECT c_custkey,
         CASE WHEN c_acctbal >= 0
              THEN CAST(floor(c_acctbal / 5000) AS BIGINT) END AS band
  FROM customer
), s AS (
  SELECT s_suppkey,
         CASE WHEN s_acctbal >= 0
              THEN CAST(floor(s_acctbal / 5000) AS BIGINT) END AS band
  FROM supplier
)
SELECT c.band AS band,
       count(*) AS n_pairs,
       count(DISTINCT c_custkey) AS n_cust,
       count(DISTINCT s_suppkey) AS n_supp
FROM c JOIN s ON c.band IS NOT DISTINCT FROM s.band
GROUP BY c.band
"""


def q_agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median / p90) per return flag.

    ``percentile`` is Spark's exact linear-interpolation quantile —
    the same definition as DuckDB's quantile_cont, so values compare
    directly. Exact quantiles sort within each group at scale; for
    100 TB dashboards, swap in approx_percentile (t-digest sketch,
    one pass, mergeable partials) — kept exact here so the oracle is.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        F.count("*").alias("n_rows"),
    )


ORACLE_AGG_QUANTILES = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
       round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/complex-type surface: collect, sort, index, slice, search.

    Distinct order years per priority as a sorted array, then the core
    array functions over it. Arrays are emitted as joined strings (the
    driver's value hash is scalar-only); element_at(-1) exercises
    negative indexing, slice the 1-based window.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderpriority", F.year("o_orderdate").cast("long").alias("yr")
        )
        .groupBy("o_orderpriority")
        .agg(F.sort_array(F.collect_set("yr")).alias("ys"))
        .select(
            "o_orderpriority",
            F.size("ys").cast("long").alias("n_years"),
            F.element_at("ys", 1).alias("first_year"),
            F.element_at("ys", -1).alias("last_year"),
            F.array_contains("ys", F.lit(1996)).alias("has_1996"),
            F.concat_ws(",", F.slice("ys", 1, 3)).alias("first3"),
        )
    )


ORACLE_SCALAR_ARRAY = """
WITH ys AS (
  SELECT o_orderpriority,
         list_sort(list(DISTINCT CAST(extract(year FROM o_orderdate) AS BIGINT))) AS ys
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(len(ys) AS BIGINT) AS n_years,
       ys[1] AS first_year,
       ys[-1] AS last_year,
       list_contains(ys, 1996) AS has_1996,
       array_to_string(ys[1:3], ',') AS first3
FROM ys
"""


def q_sql_qualify_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY — the window-predicate filter OSS Spark lacks — through
    ``plans/sql_extensions.run_qualify_sql``: top-3 orders per market
    segment in ONE statement, no hand-written subquery. The rewrite
    computes the predicate as a generated boolean inside the SELECT
    (Catalyst sees the identical Window → Filter plan), so pushdown
    below the window is unchanged. The oracle runs DuckDB's NATIVE
    QUALIFY on the same text shape — dialect parity certified, not
    just result parity."""
    from ..plans.sql_extensions import run_qualify_sql

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return run_qualify_sql(
        spark,
        """
        SELECT c.c_mktsegment AS segment, o.o_orderkey AS okey,
               round(o.o_totalprice, 2) AS price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        QUALIFY row_number() OVER (PARTITION BY c.c_mktsegment
                 ORDER BY o.o_totalprice DESC, o.o_orderkey) <= 3
        """,
    )


ORACLE_SQL_QUALIFY = """
SELECT c.c_mktsegment AS segment, o.o_orderkey AS okey,
       round(o.o_totalprice, 2) AS price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
QUALIFY row_number() OVER (PARTITION BY c.c_mktsegment
         ORDER BY o.o_totalprice DESC, o.o_orderkey) <= 3
"""


def q_sql_reachability_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE under UNION-DISTINCT semantics — which native
    Spark 4 rejects outright ([UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE];
    only UNION ALL recursion ships) — via
    ``plans/sql_extensions.run_recursive_sql``: min-hop reachability
    over the CYCLIC nation trade graph (supplier nation → customer
    nation edges derived from high-quantity line items). Seminaive
    evaluation: each iteration joins only the NEW frontier against the
    edge list and drops already-seen rows with a null-safe anti join,
    so cycles terminate without a depth bound and per-iteration work
    is ∝ |frontier|, never ∝ |closure|. Frontiers are
    localCheckpoint-ed — flat lineage at any depth. The oracle is
    DuckDB's native recursive UNION on the same graph."""
    from ..plans.sql_extensions import run_recursive_sql

    for t in ("lineitem", "supplier", "orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return run_recursive_sql(
        spark,
        """
        WITH RECURSIVE trade_edges AS (
          SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE l.l_quantity >= 45
        ), reach (n, hops) AS (
          SELECT CAST(min(src) AS BIGINT) AS n, CAST(0 AS BIGINT) AS hops FROM trade_edges
          UNION
          SELECT CAST(e.dst AS BIGINT) AS n, r.hops + 1 AS hops
          FROM reach r JOIN trade_edges e ON e.src = r.n
          WHERE r.hops < 4
        )
        SELECT n, CAST(min(hops) AS BIGINT) AS hops
        FROM reach GROUP BY n
        """,
    )


ORACLE_SQL_REACHABILITY = """
WITH RECURSIVE trade_edges AS (
  SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE l.l_quantity >= 45
), reach (n, hops) AS (
  SELECT CAST(min(src) AS BIGINT) AS n, CAST(0 AS BIGINT) AS hops FROM trade_edges
  UNION
  SELECT CAST(e.dst AS BIGINT) AS n, r.hops + 1 AS hops
  FROM reach r JOIN trade_edges e ON e.src = r.n
  WHERE r.hops < 4
)
SELECT n, CAST(min(hops) AS BIGINT) AS hops
FROM reach GROUP BY n
"""


def q_sql_extended_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extended-dialect statement surface composed end to end
    through ONE entry point (``run_extended_sql``): a CTAS whose body
    is a QUALIFY statement (the dispatcher routes the body, so DDL
    composes with the dialect extensions) materializes the top-3
    orders per market segment as parquet, a ``COPY ... TO`` exports
    the materialized view to CSV with the row count asserted inline
    against the view, and the returned frame reads the MATERIALIZED
    files back. The oracle is DuckDB's native QUALIFY over the raw
    tables — green ⇔ dispatch → rewrite → materialize → export →
    re-read changed nothing."""
    import os

    from ..plans.sql_extensions import run_extended_sql
    from .signed_queries import _cagg_state_dir

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    ws = _cagg_state_dir()
    run_extended_sql(
        spark,
        """
        CREATE TABLE seg_top AS
        SELECT c.c_mktsegment AS segment, o.o_orderkey AS okey,
               round(o.o_totalprice, 2) AS price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        QUALIFY row_number() OVER (PARTITION BY c.c_mktsegment
                 ORDER BY o.o_totalprice DESC, o.o_orderkey) <= 3
        """,
        workspace=ws,
    )
    dest = os.path.join(ws, "export")
    stats = run_extended_sql(
        spark,
        f"COPY ( SELECT * FROM seg_top ) TO '{dest}' (FORMAT csv)",
    ).collect()[0]
    n_view = spark.table("seg_top").count()
    assert stats["n_rows"] == n_view, (stats, n_view)
    return spark.table("seg_top")


ORACLE_SQL_DISPATCH = """
SELECT c.c_mktsegment AS segment, o.o_orderkey AS okey,
       round(o.o_totalprice, 2) AS price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
QUALIFY row_number() OVER (PARTITION BY c.c_mktsegment
         ORDER BY o.o_totalprice DESC, o.o_orderkey) <= 3
"""


def q_sql_pivot_statement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB's simplified ``PIVOT`` STATEMENT (distinct from the
    DataFrame-API ``pivot`` query, which exercises the operator) —
    ``plans/sql_extensions.run_pivot_sql`` compiles it onto Spark's
    native relational pivot. The value list is the sorted distinct ON
    column (a bounded collect: the pivot's width IS its output
    schema). The aggregate is max over integer cents — type-stable in
    both engines (DuckDB widens sum to HUGEINT, which would break
    schema parity; max preserves BIGINT). The oracle is DuckDB's
    NATIVE PIVOT statement on the same text — dialect parity."""
    from ..plans.sql_extensions import run_extended_sql

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return run_extended_sql(
        spark,
        """
        PIVOT orders ON o_orderpriority
        USING max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        GROUP BY o_orderstatus
        """,
    )


ORACLE_SQL_PIVOT_STMT = """
PIVOT orders ON o_orderpriority
USING max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
GROUP BY o_orderstatus
"""


def q_sql_unpivot_statement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB's simplified ``UNPIVOT`` statement, with the dataset a
    PARENTHESIZED NESTED PIVOT — the statement forms compose through
    the dispatcher exactly as they do in DuckDB. Round-trips orders
    through wide (status columns) and back to long (status, n_orders)
    rows; quoted identifiers in the ON list exercise the tokenizer's
    qident path. Oracle: DuckDB's native nested statement."""
    from ..plans.sql_extensions import run_extended_sql

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return run_extended_sql(
        spark,
        """
        UNPIVOT ( PIVOT orders ON o_orderstatus USING count(*)
                  GROUP BY o_orderpriority )
        ON "F", "O", "P"
        INTO NAME status VALUE n_orders
        """,
    )


ORACLE_SQL_UNPIVOT_STMT = """
UNPIVOT ( PIVOT orders ON o_orderstatus USING count(*)
          GROUP BY o_orderpriority )
ON "F", "O", "P"
INTO NAME status VALUE n_orders
"""


def q_sql_select_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB's star modifiers — ``SELECT * EXCLUDE (...) REPLACE
    (expr AS col)`` — rewritten against the catalog schema into an
    explicit projection (``run_star_modifiers_sql``), so Catalyst
    prunes the excluded column at the scan like any other projection.
    The REPLACE renders the timestamp as a string (identical
    'yyyy-MM-dd HH:mm:ss' text in both engines — also sidesteps the
    DATE/datetime64 oracle-transport gap). Oracle: DuckDB's NATIVE
    star modifiers on the same text."""
    from ..plans.sql_extensions import run_extended_sql

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return run_extended_sql(
        spark,
        """
        SELECT * EXCLUDE (o_custkey)
                 REPLACE (CAST(o_orderdate AS STRING) AS o_orderdate)
        FROM orders WHERE o_orderkey % 7 = 0
        """,
    )


ORACLE_SQL_SELECT_EXCLUDE = """
SELECT * EXCLUDE (o_custkey)
         REPLACE (CAST(o_orderdate AS VARCHAR) AS o_orderdate)
FROM orders WHERE o_orderkey % 7 = 0
"""


def q_graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the cyclic nation trade graph, in EXACT integer
    arithmetic so an iterative numeric algorithm gets a bit-exact
    oracle: ranks are scaled to millionths (r₀ = 1,000,000), each
    iteration is contrib(u) = r(u) DIV outdeg(u) (dangling nodes
    contribute nothing — the standard no-redistribution
    simplification), r'(v) = 150,000 + (85 · Σ contrib) DIV 100 — all
    BIGINT, so addition order is irrelevant and Spark and DuckDB agree
    bit-for-bit after any number of iterations (floating-point
    PageRank could never be oracle-exact across engines).

    Three iterations, each ONE join edges⋈ranks + ONE groupBy(dst) —
    at 100 TB the textbook Pregel-as-dataframes shape: ranks and
    edges co-partitioned on the join key, per-iteration cost bounded
    by |edges|, lineage kept flat by localCheckpoint every iteration
    (the same discipline as the seminaive recursive CTE)."""
    for t in ("lineitem", "supplier", "orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    edges = spark.sql(
        """
        SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE l.l_quantity >= 45
        """
    ).localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = nodes.withColumn("r", F.lit(1000000).cast("bigint"))
    for _ in range(3):
        contrib = (
            ranks.join(outdeg, ranks.node == outdeg.src, "inner")
            .join(edges, "src")
            .select("dst", F.expr("r DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(150000)
                    + F.expr("85 * coalesce(s, 0) DIV 100")
                )
                .cast("bigint")
                .alias("r"),
            )
            .localCheckpoint()
        )
    indeg = edges.groupBy("dst").agg(F.count("*").alias("indeg"))
    return (
        ranks.join(indeg, ranks.node == indeg.dst, "left")
        .join(outdeg, ranks.node == outdeg.src, "left")
        .select(
            F.col("node").cast("bigint").alias("node"),
            F.col("r").cast("bigint").alias("rank_ppm"),
            F.coalesce("indeg", F.lit(0)).cast("bigint").alias("in_deg"),
            F.coalesce("outdeg", F.lit(0)).cast("bigint").alias("out_deg"),
        )
    )


ORACLE_GRAPH_PAGERANK = """
WITH edges AS (
  SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE l.l_quantity >= 45
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
c1 AS (SELECT e.dst, sum(r0.r // o.outdeg) AS s FROM r0
       JOIN outdeg o ON r0.node = o.src JOIN edges e ON e.src = o.src
       GROUP BY e.dst),
r1 AS (SELECT n.node, CAST(150000 + 85 * coalesce(c1.s, 0) // 100 AS BIGINT) AS r
       FROM nodes n LEFT JOIN c1 ON n.node = c1.dst),
c2 AS (SELECT e.dst, sum(r1.r // o.outdeg) AS s FROM r1
       JOIN outdeg o ON r1.node = o.src JOIN edges e ON e.src = o.src
       GROUP BY e.dst),
r2 AS (SELECT n.node, CAST(150000 + 85 * coalesce(c2.s, 0) // 100 AS BIGINT) AS r
       FROM nodes n LEFT JOIN c2 ON n.node = c2.dst),
c3 AS (SELECT e.dst, sum(r2.r // o.outdeg) AS s FROM r2
       JOIN outdeg o ON r2.node = o.src JOIN edges e ON e.src = o.src
       GROUP BY e.dst),
r3 AS (SELECT n.node, CAST(150000 + 85 * coalesce(c3.s, 0) // 100 AS BIGINT) AS r
       FROM nodes n LEFT JOIN c3 ON n.node = c3.dst),
indeg AS (SELECT dst, count(*) AS indeg FROM edges GROUP BY dst)
SELECT CAST(r3.node AS BIGINT) AS node,
       CAST(r3.r AS BIGINT) AS rank_ppm,
       CAST(coalesce(i.indeg, 0) AS BIGINT) AS in_deg,
       CAST(coalesce(o.outdeg, 0) AS BIGINT) AS out_deg
FROM r3 LEFT JOIN indeg i ON r3.node = i.dst
        LEFT JOIN outdeg o ON r3.node = o.src
"""


def q_graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the part CO-PURCHASE graph (parts sharing
    an order are adjacent) — the standard graph-analytics cardinality
    the reference has no equivalent for.

    Scale shape: edge generation is a self-join EQUI-KEYED on
    l_orderkey, so pair fan-out is bounded by the per-order line count
    (≤ 7 in TPC-H ⇒ ≤ 21 pairs per order), never corpus-quadratic.
    Counting uses DEGREE ORIENTATION — every undirected edge points
    from its lower-(degree, id) endpoint to the higher — so each
    triangle is counted exactly once from its lowest-degree corner and
    per-node wedge work is bounded by ORIENTED out-degree squared:
    O(m^1.5) total, the textbook bound, instead of the hub-quadratic
    blowup an id-ordered wedge join suffers on skewed graphs. The
    oracle counts the same triangles from plain id-ordered edges
    (orientation changes the enumeration order, not the set)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    # Edge generation stays the broadcast self-join + one (u, v)
    # dedup exchange: the r17 grouped-expansion rewrite that pays off
    # in the signed maintainers (where pairs are generated three
    # times and deduped per (ok, u, v)) was MEASURED SLOWER here
    # (quiet solo mins 6.7 -> 9.8 s) — this query dedupes straight to
    # (u, v) in a single exchange, so the grouped pass only ADDS a
    # per-order shuffle and a non-codegen ObjectHashAggregate.
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
        .localCheckpoint()  # reused by degrees + orientation + closing join
    )
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    withdeg = (
        edges.join(deg.selectExpr("n AS u", "d AS du"), "u")
        .join(deg.selectExpr("n AS v", "d AS dv"), "v")
    )
    directed = withdeg.selectExpr(
        "CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS src",
        "CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS dst",
        "CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END AS ddst",
    ).localCheckpoint()
    # shuffle_hash per join (r17): the wedge join and the closing semi
    # join were sort-merge — two full sorts of the oriented edge list
    # each; hash joins on the same shuffles measured 6.7 -> 5.8 s
    # quiet solo min. Per-join opt-in, not the global knob (which
    # regressed the continuous-aggregate family).
    w1 = directed.alias("w1").hint("shuffle_hash")
    w2 = directed.alias("w2").hint("shuffle_hash")
    # wedges from each source, closing edge oriented y→z by the same
    # (degree, id) order the edges were
    wedges = w1.join(
        w2,
        (F.col("w1.src") == F.col("w2.src"))
        & (
            (F.col("w1.ddst") < F.col("w2.ddst"))
            | (
                (F.col("w1.ddst") == F.col("w2.ddst"))
                & (F.col("w1.dst") < F.col("w2.dst"))
            )
        ),
    ).select(F.col("w1.dst").alias("y"), F.col("w2.dst").alias("z"))
    closing = directed.selectExpr("src AS y", "dst AS z").hint(
        "shuffle_hash"
    )
    tri = wedges.join(closing, ["y", "z"], "left_semi")
    # one-row summary: singleton aggregates cross-joined (each side is
    # exactly one row — the same stats-row shape as the BM25 corpus
    # constants), no data-sized cartesian anywhere
    return (
        deg.agg(F.count("*").cast("bigint").alias("n_nodes"))
        .crossJoin(edges.agg(F.count("*").cast("bigint").alias("n_edges")))
        .crossJoin(
            tri.agg(F.count("*").cast("bigint").alias("n_triangles"))
        )
    )


ORACLE_GRAPH_TRIANGLES = """
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
nodes AS (SELECT u AS n FROM e UNION SELECT v FROM e),
tri AS (SELECT count(*) AS n FROM e e1
        JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
        JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT n FROM tri) AS BIGINT) AS n_triangles
"""


def q_dq_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — the data-quality gate every
    warehouse load runs: orphan detection for three foreign-key edges
    as LEFT ANTI joins, one summary row per check (orphan count, an
    orphan-key checksum that pins WHICH rows are orphaned, and the
    scanned population). Two dims are deliberately 'broken' by a
    mod-class filter (simulating a partial dim load) so the audit has
    real findings; the intact edge contributes the all-clear row.

    100 TB posture: each check is one anti join where the dim side
    broadcasts (dims are small by definition; for fact→fact edges AQE
    injects a runtime bloom filter — the shape pinned in
    tests/test_plan_audit.py for join_semi_reduction). The three
    checks share one scan of each fact via a union of tagged anti
    joins, not three passes."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").where(
        "c_custkey % 3 != 0"
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where("p_partkey % 4 != 1")

    def check(fact, key, dim, dim_key, name):
        orphans = fact.join(
            F.broadcast(dim), F.col(key) == F.col(dim_key), "left_anti"
        )
        return orphans.agg(
            F.lit(name).alias("check_name"),
            F.count("*").cast("bigint").alias("n_orphans"),
            F.coalesce(F.sum(key), F.lit(0)).cast("bigint").alias(
                "orphan_key_checksum"
            ),
        )

    n_orders = orders.count()
    n_lines = lineitem.count()
    rows = (
        check(orders, "o_custkey", customer, "c_custkey", "orders->customer")
        .withColumn("n_scanned", F.lit(n_orders).cast("bigint"))
        .unionByName(
            check(
                lineitem, "l_partkey", part, "p_partkey", "lineitem->part"
            ).withColumn("n_scanned", F.lit(n_lines).cast("bigint"))
        )
        .unionByName(
            check(
                lineitem,
                "l_orderkey",
                load_table(spark, sf_dir, "orders"),
                "o_orderkey",
                "lineitem->orders",
            ).withColumn("n_scanned", F.lit(n_lines).cast("bigint"))
        )
    )
    return rows


ORACLE_DQ_REFERENTIAL = """
SELECT 'orders->customer' AS check_name,
       CAST(count(*) AS BIGINT) AS n_orphans,
       CAST(coalesce(sum(o_custkey), 0) AS BIGINT) AS orphan_key_checksum,
       CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_scanned
FROM orders WHERE o_custkey NOT IN
  (SELECT c_custkey FROM customer WHERE c_custkey % 3 != 0)
UNION ALL
SELECT 'lineitem->part', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(l_partkey), 0) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem) AS BIGINT)
FROM lineitem WHERE l_partkey NOT IN
  (SELECT p_partkey FROM part WHERE p_partkey % 4 != 1)
UNION ALL
SELECT 'lineitem->orders', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(l_orderkey), 0) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem) AS BIGINT)
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
"""


def queries_and_oracles():
    pairs = {
        "projection": (q_projection, ORACLE_PROJECTION),
        "filter_pushdown": (q_filter_pushdown, ORACLE_FILTER_PUSHDOWN),
        "filter_complex": (q_filter_complex, ORACLE_FILTER_COMPLEX),
        "join_inner": (q_join_inner, ORACLE_JOIN_INNER),
        "join_left_outer": (q_join_left_outer, ORACLE_JOIN_LEFT),
        "join_right_outer": (q_join_right_outer, ORACLE_JOIN_RIGHT),
        "join_full_outer": (q_join_full_outer, ORACLE_JOIN_FULL),
        "join_semi": (q_join_semi, ORACLE_JOIN_SEMI),
        "join_anti": (q_join_anti, ORACLE_JOIN_ANTI),
        "join_cross": (q_join_cross, ORACLE_JOIN_CROSS),
        "join_theta": (q_join_theta, ORACLE_JOIN_THETA),
        "union_all": (q_union_all, ORACLE_UNION_ALL),
        "union_distinct": (q_union_distinct, ORACLE_UNION_DISTINCT),
        "intersect": (q_intersect, ORACLE_INTERSECT),
        "except": (q_except, ORACLE_EXCEPT),
        "agg_stats": (q_agg_stats, ORACLE_AGG_STATS),
        "agg_having": (q_agg_having, ORACLE_AGG_HAVING),
        "agg_rollup": (q_agg_rollup, ORACLE_AGG_ROLLUP),
        "agg_cube": (q_agg_cube, ORACLE_AGG_CUBE),
        "agg_grouping_id": (q_agg_grouping_id, ORACLE_AGG_GROUPING_ID),
        "sql_lateral_topn": (q_sql_lateral_topn, ORACLE_SQL_LATERAL_TOPN),
        "agg_grouping_sets": (q_agg_grouping_sets, ORACLE_AGG_GROUPING_SETS),
        "window_rank": (q_window_rank, ORACLE_WINDOW_RANK),
        "window_running": (q_window_running, ORACLE_WINDOW_RUNNING),
        "window_lag_lead": (q_window_lag_lead, ORACLE_WINDOW_LAG_LEAD),
        "topk_per_group": (q_topk_per_group, ORACLE_TOPK_PER_GROUP),
        "sort_limit": (q_sort_limit, ORACLE_SORT_LIMIT),
        "distinct": (q_distinct, ORACLE_DISTINCT),
        "scalar_string": (q_scalar_string, ORACLE_SCALAR_STRING),
        "scalar_date": (q_scalar_date, ORACLE_SCALAR_DATE),
        "scalar_math": (q_scalar_math, ORACLE_SCALAR_MATH),
        "case_when": (q_case_when, ORACLE_CASE_WHEN),
        "null_handling": (q_null_handling, ORACLE_NULL_HANDLING),
        "in_subquery": (q_in_subquery, ORACLE_IN_SUBQUERY),
        "exists_correlated": (q_exists_correlated, ORACLE_EXISTS_CORRELATED),
        "scalar_subquery": (q_scalar_subquery, ORACLE_SCALAR_SUBQUERY),
        "pivot": (q_pivot, ORACLE_PIVOT),
        "unpivot": (q_unpivot, ORACLE_UNPIVOT),
        "recursive_cte": (q_recursive_cte, ORACLE_RECURSIVE_CTE),
        "scalar_json": (q_scalar_json, ORACLE_SCALAR_JSON),
        "string_agg": (q_string_agg, ORACLE_STRING_AGG),
        "agg_quantiles": (q_agg_quantiles, ORACLE_AGG_QUANTILES),
        "scalar_array": (q_scalar_array, ORACLE_SCALAR_ARRAY),
        "join_null_safe": (q_join_null_safe, ORACLE_JOIN_NULL_SAFE),
        "sql_qualify_topn": (q_sql_qualify_topn, ORACLE_SQL_QUALIFY),
        "sql_reachability_closure": (
            q_sql_reachability_closure,
            ORACLE_SQL_REACHABILITY,
        ),
        "sql_extended_dispatch": (
            q_sql_extended_dispatch,
            ORACLE_SQL_DISPATCH,
        ),
        "sql_pivot_statement": (
            q_sql_pivot_statement,
            ORACLE_SQL_PIVOT_STMT,
        ),
        "sql_unpivot_statement": (
            q_sql_unpivot_statement,
            ORACLE_SQL_UNPIVOT_STMT,
        ),
        "sql_select_exclude": (
            q_sql_select_exclude,
            ORACLE_SQL_SELECT_EXCLUDE,
        ),
        "dq_referential_audit": (
            q_dq_referential_audit,
            ORACLE_DQ_REFERENTIAL,
        ),
        "graph_pagerank_trade": (
            q_graph_pagerank_trade,
            ORACLE_GRAPH_PAGERANK,
        ),
        "graph_triangle_count": (
            q_graph_triangle_count,
            ORACLE_GRAPH_TRIANGLES,
        ),
    }
    return {k: v[0] for k, v in pairs.items()}, {k: v[1] for k, v in pairs.items()}
