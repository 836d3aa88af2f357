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


def queries_and_oracles():
    queries = {
        "join_asof": q_join_asof,
        "join_range": q_join_range,
    }
    oracles = {
        "join_asof": ORACLE_JOIN_ASOF,
        "join_range": ORACLE_JOIN_RANGE,
    }
    return queries, oracles
