"""Temporal joins: as-of and range — beyond the reference's node set.

The reference's Join node carries only equi keys + a theta filter
(optimizer_rules/mod.rs:124-125); as-of joins aren't expressible there
at all. SURVEY §2.3 commits us to providing them batch-side.

Scale posture — the two classic pitfalls, avoided:
- The naive as-of formulation (theta self-join ts <= ts, then argmax)
  is quadratic per key. The union + running-window trick below is one
  shuffle on (user) with a linear scan per key — the standard
  distributed as-of pattern.
- The range join uses a broadcast of the (tiny, constant) band table,
  so the non-equi condition rides a BroadcastNestedLoopJoin instead of
  a cartesian shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's latest click at-or-
    before it (click.ts <= purchase.ts).

    Union both sides, tag them, and take a running max of click-time
    over (user, ts) order — clicks sort before purchases at equal ts so
    'at-or-before' includes ties, matching the oracle's ASOF
    ``p.ts >= c.ts``.
    """
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "click").cast("int").alias("is_click"),
    )
    from pyspark.sql.window import Window

    win = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.desc("is_click"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_last = tagged.withColumn(
        "last_click_ts",
        F.max(F.when(F.col("is_click") == 1, F.col("ts"))).over(win),
    )
    return (
        with_last.where("is_click = 0")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.date_format("last_click_ts", "yyyy-MM-dd HH:mm:ss").alias(
                "last_click_ts"
            ),
            # Truncate to seconds first: DuckDB's date_diff counts
            # second BOUNDARIES crossed, Spark's timestampdiff floors
            # elapsed time — they disagree when sub-second parts
            # straddle a boundary. On truncated inputs both coincide.
            F.expr(
                "timestampdiff(SECOND, date_trunc('second', last_click_ts),"
                " date_trunc('second', ts))"
            )
            .cast("bigint")
            .alias("gap_sec"),
        )
    )


ORACLE_JOIN_ASOF = """
WITH clicks AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id AS purchase_id,
       p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts,
       CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_sec
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


_TIERS = [
    ("small", 0.0, 100000.0),
    ("medium", 100000.0, 250000.0),
    ("large", 250000.0, 400000.0),
    ("jumbo", 400000.0, 1e12),
]


def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: orders bucketed into price tiers.

    The tier table is constant-size → explicit broadcast; the non-equi
    predicate ``lo <= x < hi`` rides the broadcast join, never a
    shuffled cartesian.
    """
    orders = load_table(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(_TIERS, "tier string, lo double, hi double")
    return (
        orders.join(
            F.broadcast(tiers),
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


_TIER_VALUES = ", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in _TIERS)
ORACLE_JOIN_RANGE = f"""
WITH tiers(tier, lo, hi) AS (VALUES {_TIER_VALUES})
SELECT tier, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY tier
"""


def q_sql_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB's ``ASOF JOIN`` dialect end to end through
    ``plans/sql_extensions.run_asof_sql`` → the generic
    ``functions/asof.asof_join`` operator (union + running window:
    one shuffle on the key, linear scan per key, no pair blow-up —
    unlike ``q_join_asof`` this carries arbitrary right PAYLOAD
    columns, not just the matched timestamp). Purchases take each
    user's latest click at-or-before them; the click side is
    pre-aggregated to one row per (user, ts) so the tie pick is
    deterministic in BOTH engines. The oracle is DuckDB's NATIVE
    ASOF LEFT JOIN on the same shape — dialect parity certified."""
    ev = load_table(spark, sf_dir, "events")
    ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    ).createOrReplaceTempView("asof_purchases")
    ev.where("event_type = 'click'").groupBy(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    ).agg(F.max("event_id").alias("c_id")).createOrReplaceTempView(
        "asof_clicks"
    )
    from ..plans.sql_extensions import run_asof_sql

    return run_asof_sql(
        spark,
        """
        SELECT p.p_id, p.user_id,
               date_format(p.p_ts, 'yyyy-MM-dd HH:mm:ss') AS p_time,
               date_format(c.c_ts, 'yyyy-MM-dd HH:mm:ss') AS c_time,
               c.c_id
        FROM asof_purchases p ASOF LEFT JOIN asof_clicks c
        ON p.user_id = c.c_user AND p.p_ts >= c.c_ts
        """,
    )


ORACLE_SQL_ASOF = """
WITH p AS (
  SELECT event_id AS p_id, user_id, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id AS c_user, ts AS c_ts, max(event_id) AS c_id
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
)
SELECT p.p_id, p.user_id,
       strftime(p.p_ts, '%Y-%m-%d %H:%M:%S') AS p_time,
       strftime(c.c_ts, '%Y-%m-%d %H:%M:%S') AS c_time,
       c.c_id
FROM p ASOF LEFT JOIN c
ON p.user_id = c.c_user AND p.p_ts >= c.c_ts
"""


def queries_and_oracles():
    queries = {
        "join_asof": q_join_asof,
        "join_range": q_join_range,
        "sql_asof_join": q_sql_asof_join,
    }
    oracles = {
        "join_asof": ORACLE_JOIN_ASOF,
        "join_range": ORACLE_JOIN_RANGE,
        "sql_asof_join": ORACLE_SQL_ASOF,
    }
    return queries, oracles
