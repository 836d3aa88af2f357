"""Event-time windowed analytics over the append-only ``events`` table.

Batch expressions of the streaming surface (SURVEY §2.3 "Streaming"
row): tumbling/sliding windows, sessionization, event dedup. The same
logical shapes run under Structured Streaming in
``datafusion_delta_queries_spark.streaming`` — here they're batch
queries so the DuckDB oracle can check them exactly.

Scale posture: events at 100 TB is time-partitioned; date_trunc
grouping aligns with partition pruning. Sessionization shuffles once on
user_id (the window partition key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (batch form of the
    streaming groupBy(window(ts, '1 hour')))."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


ORACLE_EVENTS_TUMBLING = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 2-hour length, 1-hour slide. Each event lands in
    exactly 2 windows — expressed as an explode over the 2 window starts
    (the same expansion Spark's window() generates internally)."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    return (
        ev.select(
            F.explode(
                F.array(hour, hour - F.expr("INTERVAL 1 HOUR"))
            ).alias("window_start"),
            "event_type",
            "value",
        )
        .groupBy("window_start", "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )


ORACLE_EVENTS_SLIDING = """
SELECT window_start, event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM (
  SELECT date_trunc('hour', ts) - (o.k * INTERVAL 1 HOUR) AS window_start,
         event_type, value
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) o
)
GROUP BY window_start, event_type
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity gap) via the
    lag + cumulative-sum idiom; per-session stats."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wsess = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    gapped = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(
            (F.unix_timestamp(F.col("ts")) - F.unix_timestamp(F.lag("ts", 1).over(w)))
            > 1800,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    ).select(
        "user_id", "ts", "event_id", "value", F.sum("new_session").over(wsess).alias("session_id")
    )
    return (
        gapped.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id",
            F.col("session_id").cast("long").alias("session_id"),
            "n_events",
            "session_value",
            "session_start",
            "session_end",
        )
    )


ORACLE_EVENTS_SESSIONIZE = """
WITH gapped AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch(ts) - epoch(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sess AS (
  SELECT user_id, ts, event_id, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gapped
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       round(sum(value), 2) AS session_value,
       min(ts) AS session_start,
       max(ts) AS session_end
FROM sess GROUP BY user_id, session_id
"""


def q_events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the latest event per (user_id, event_type) — streaming
    dropDuplicates analog, exact batch form via row_number."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.select("user_id", "event_type", "event_id", "ts", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


ORACLE_EVENTS_DEDUP = """
SELECT user_id, event_type, event_id, ts FROM (
  SELECT user_id, event_type, event_id, ts,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel: signup→click→purchase ordering via min-ts per
    stage (conditional aggregation)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return per_user.select(
        "user_id",
        F.col("t_signup").isNotNull().alias("did_signup"),
        ((F.col("t_click") > F.col("t_signup"))).alias("clicked_after_signup"),
        (
            (F.col("t_purchase") > F.col("t_click")) & (F.col("t_click") > F.col("t_signup"))
        ).alias("full_funnel"),
    )


ORACLE_EVENTS_FUNNEL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT user_id,
       t_signup IS NOT NULL AS did_signup,
       t_click > t_signup AS clicked_after_signup,
       (t_purchase > t_click AND t_click > t_signup) AS full_funnel
FROM per_user
"""


def q_events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-active week,
    counted as active per subsequent week.

    Two shuffles (per-user min week; per-(cohort, week) distinct
    count) — the standard cohort shape; at scale the distinct count
    becomes approx_count_distinct or a pre-aggregated user-week table.
    """
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.select(
        "user_id",
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
    ).distinct()
    cohort = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weekly.join(cohort, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


ORACLE_EVENTS_RETENTION = """
WITH weekly AS (
  SELECT DISTINCT user_id,
         strftime(date_trunc('week', ts), '%Y-%m-%d') AS week
  FROM events
),
cohort AS (SELECT user_id, min(week) AS cohort_week FROM weekly GROUP BY 1)
SELECT cohort_week, week, count(DISTINCT w.user_id) AS n_active
FROM weekly w JOIN cohort c ON w.user_id = c.user_id
GROUP BY cohort_week, week
"""


def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist
    over customer balances within each nation."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    return cust.select(
        "c_custkey",
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
        F.round("c_acctbal", 2).alias("c_acctbal"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.expr(
            "CAST(floor(percent_rank() OVER (PARTITION BY c_nationkey "
            "ORDER BY c_acctbal, c_custkey) * 1e6 + 0.5) AS DOUBLE) / 1e6"
        ).alias("pct_rank"),
        F.expr(
            "CAST(floor(cume_dist() OVER (PARTITION BY c_nationkey "
            "ORDER BY c_acctbal, c_custkey) * 1e6 + 0.5) AS DOUBLE) / 1e6"
        ).alias("cume"),
    )


ORACLE_WINDOW_DISTRIBUTION = """
SELECT c_custkey,
       CAST(c_nationkey AS INTEGER) AS c_nationkey,
       round(c_acctbal, 2) AS c_acctbal,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       CAST(floor(percent_rank() OVER w * 1e6 + 0.5) AS DOUBLE) / 1e6 AS pct_rank,
       CAST(floor(cume_dist() OVER w * 1e6 + 0.5) AS DOUBLE) / 1e6 AS cume
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
"""


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: per event, activity of the same user in the
    trailing hour (value-based frame on epoch seconds, vs the
    row-count frames used elsewhere)."""
    ev = load_table(spark, sf_dir, "events")
    epoch = "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    with_epoch = ev.selectExpr(
        "event_id", "user_id", "event_type", f"CAST({epoch} AS BIGINT) AS ep"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("ep"))
        .rangeBetween(-3600, 0)
    )
    return with_epoch.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("bigint").alias("n_trailing_1h"),
    )


ORACLE_WINDOW_RANGE_FRAME = """
SELECT event_id, user_id,
       CAST(count(*) OVER (PARTITION BY user_id
                           ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_trailing_1h
FROM events
"""


def q_events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense time-series gap-filling with last-observation-carried-
    forward (the hypertable `time_bucket_gapfill` + `locf` shape): a
    generated hourly spine per event type spans [first, last] hour,
    empty buckets surface with n_events = 0 and an is_gap flag, and
    the value column is carried forward from the last non-empty
    bucket (NULL before the first observation — never invented).
    Spine generation is sequence+explode per group (work ∝ buckets,
    not events); the fill is one window pass partitioned by type. The
    value surface is integer cents so the carried values are
    engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
        .cast("bigint")
        .alias("cents"),
    )
    spine = (
        ev.groupBy("event_type")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("mn"),
            F.date_trunc("hour", F.max("ts")).alias("mx"),
        )
        .select(
            "event_type",
            F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("h"),
        )
    )
    joined = spine.join(hourly, ["event_type", "h"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket_h"),
        F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
        F.last("cents", ignorenulls=True).over(w).alias("locf_cents"),
        F.col("n_events").isNull().cast("int").alias("is_gap"),
    )


ORACLE_EVENTS_GAPFILL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type,
         date_trunc('hour', min(ts)) AS mn,
         date_trunc('hour', max(ts)) AS mx
  FROM events GROUP BY 1
),
spine AS (
  SELECT event_type,
         unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
  FROM bounds
)
SELECT s.event_type,
       strftime(s.h, '%Y-%m-%d %H:%M:%S') AS bucket_h,
       coalesce(y.n_events, 0) AS n_events,
       last_value(y.cents IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS locf_cents,
       CAST(y.n_events IS NULL AS INT) AS is_gap
FROM spine s
LEFT JOIN hourly y ON y.event_type = s.event_type AND y.h = s.h
"""


def q_events_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling by LINEAR INTERPOLATION (the hypertable
    `interpolate()` sibling of locf): each empty hourly bucket gets
    prev + (next - prev) * elapsed / span, where prev/next are the
    nearest non-empty buckets on either side. Interior gaps only —
    buckets before the first or after the last observation stay NULL
    (extrapolation invents data). Two window passes (last/first with
    ignorenulls, plus the matching bucket indexes) on the same dense
    spine as the locf query; all arithmetic is bigint (values in
    cents, floor division) so both engines land on identical integers.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
        .cast("bigint")
        .alias("cents"),
    )
    spine = (
        ev.groupBy("event_type")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("mn"),
            F.date_trunc("hour", F.max("ts")).alias("mx"),
        )
        .select(
            "event_type",
            F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("h"),
        )
    )
    # bucket index = dense row number over the hourly spine, NOT an
    # epoch division: epoch math on NTZ timestamps is session-timezone
    # dependent (DST makes the shift non-uniform mid-series), while
    # the spine is dense by construction so consecutive rows ARE
    # consecutive hours in both engines.
    joined = spine.join(hourly, ["event_type", "h"], "left").withColumn(
        "idx",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("h"))
        .cast("bigint"),
    )
    filled_idx = F.when(F.col("cents").isNotNull(), F.col("idx"))
    back = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    prev_v = F.last("cents", ignorenulls=True).over(back)
    prev_i = F.last(filled_idx, ignorenulls=True).over(back)
    next_v = F.first("cents", ignorenulls=True).over(fwd)
    next_i = F.first(filled_idx, ignorenulls=True).over(fwd)
    interp = F.when(F.col("cents").isNotNull(), F.col("cents")).otherwise(
        # bigint floor division; NULL propagates outside interior gaps
        prev_v
        + F.floor(
            (next_v - prev_v) * (F.col("idx") - prev_i) / (next_i - prev_i)
        ).cast("bigint")
    )
    return joined.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket_h"),
        F.col("cents").isNull().cast("int").alias("is_gap"),
        interp.cast("bigint").alias("interp_cents"),
    )


ORACLE_EVENTS_GAPFILL_INTERP = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type,
         date_trunc('hour', min(ts)) AS mn,
         date_trunc('hour', max(ts)) AS mx
  FROM events GROUP BY 1
),
spine AS (
  SELECT event_type,
         unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
  FROM bounds
),
j AS (
  SELECT s.event_type, s.h, y.cents,
         CAST(row_number() OVER (PARTITION BY s.event_type ORDER BY s.h)
              AS BIGINT) AS idx
  FROM spine s
  LEFT JOIN hourly y ON y.event_type = s.event_type AND y.h = s.h
),
w AS (
  SELECT event_type, h, cents, idx,
         last_value(cents IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS prev_v,
         last_value(CASE WHEN cents IS NOT NULL THEN idx END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS prev_i,
         first_value(cents IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
         ) AS next_v,
         first_value(CASE WHEN cents IS NOT NULL THEN idx END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY h
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_i
  FROM j
)
SELECT event_type,
       strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket_h,
       CAST(cents IS NULL AS INT) AS is_gap,
       CAST(CASE WHEN cents IS NOT NULL THEN cents
                 ELSE prev_v + CAST(floor(
                        (next_v - prev_v) * (idx - prev_i)
                        / (next_i - prev_i)) AS BIGINT)
            END AS BIGINT) AS interp_cents
FROM w
"""


def q_events_time_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average — the hypertable ``time_weight`` shape
    (TimescaleDB's continuous-telemetry aggregate; a plain AVG
    over-weights bursts and under-weights stable periods): per
    (event_type, day), each observation's value is weighted by the
    WHOLE SECONDS it stayed current (until the next observation in
    the group; the day's last observation carries no weight), under
    both interpolation methods — LOCF (value held flat) and Linear
    (trapezoid between consecutive values, doubled to stay integral).

    Engine-exactness: values are integer cents, durations are exact
    microsecond diffs integer-divided to seconds, so every weighted
    sum is BIGINT arithmetic — order-independent and identical in
    both engines; the ONLY float op is one final division per group,
    a single IEEE op both engines round identically. One window pass
    (lead over (type, day) × ts) + one aggregation: ∝ |events|, two
    shuffles, no state."""
    from pyspark.sql.window import Window

    from ..functions.text import round_portable

    ev = load_table(spark, sf_dir, "events")

    based = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("d"),
        "ts",
        "event_id",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("event_type", "d").orderBy("ts", "event_id")
    stepped = based.select(
        "event_type",
        "d",
        "cents",
        F.lead("ts").over(w).alias("nts"),
        F.lead("cents").over(w).alias("ncents"),
        "ts",
    ).withColumn(
        "dt_sec",
        F.expr("timestampdiff(MICROSECOND, ts, nts) div 1000000"),
    )
    return (
        stepped.groupBy("event_type", F.date_format("d", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").cast("bigint").alias("n_obs"),
            F.sum("dt_sec").cast("bigint").alias("total_sec"),
            F.sum(F.col("cents") * F.col("dt_sec"))
            .cast("bigint")
            .alias("locf_num"),
            F.sum((F.col("cents") + F.col("ncents")) * F.col("dt_sec"))
            .cast("bigint")
            .alias("lin_num2"),
        )
        .where("total_sec > 0")
        .select(
            "event_type",
            "day",
            "n_obs",
            "total_sec",
            F.expr(
                round_portable("locf_num / total_sec / 100.0", 6)
            ).alias("twa_locf"),
            F.expr(
                round_portable("lin_num2 / (total_sec * 2) / 100.0", 6)
            ).alias("twa_linear"),
        )
    )


from ..functions.text import round_portable as _rp

ORACLE_EVENTS_TIME_WEIGHTED = f"""
WITH stepped AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         lead(ts) OVER w AS nts,
         lead(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS ncents,
         ts
  FROM events
  WINDOW w AS (PARTITION BY event_type, date_trunc('day', ts)
               ORDER BY ts, event_id)
), weighted AS (
  SELECT event_type, d, cents, ncents,
         date_diff('microsecond', ts, nts) // 1000000 AS dt_sec
  FROM stepped
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(sum(dt_sec) AS BIGINT) AS total_sec,
       {_rp('CAST(sum(cents * dt_sec) AS BIGINT) / CAST(sum(dt_sec) AS BIGINT) / 100.0', 6)} AS twa_locf,
       {_rp('CAST(sum((cents + ncents) * dt_sec) AS BIGINT) / (CAST(sum(dt_sec) AS BIGINT) * 2) / 100.0', 6)} AS twa_linear
FROM weighted
GROUP BY event_type, d
HAVING sum(dt_sec) > 0
"""


def q_events_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval UNION (coalesce overlapping ranges) — the classic
    sweep: each event opens a [ts, ts+600 s) activity interval; per
    user, intervals whose start exceeds the running max of prior ends
    begin a NEW merged block (a window cummax + running flag-sum, the
    O(n log n)-equivalent single pass — never a self-join, which at
    100 TB would be quadratic in the dense spans). Output: per user,
    the merged-block count and TOTAL COVERED seconds — distinct from
    summed durations exactly where intervals overlap, which is what
    makes naive sum(duration) wrong and this operator necessary.
    Epoch math uses the tz-proof NTZ ``timestampdiff`` idiom; all
    arithmetic is BIGINT seconds, so both engines agree exactly."""
    ev = load_table(spark, sf_dir, "events")
    epoch = "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    d = ev.selectExpr(
        "user_id",
        "event_id",
        f"CAST({epoch} AS BIGINT) AS s",
        f"CAST({epoch} + 600 AS BIGINT) AS e",
    )
    w = W.partitionBy("user_id").orderBy("s", "event_id")
    wprev = w.rowsBetween(W.unboundedPreceding, -1)
    blocks = (
        d.withColumn("prev_max_e", F.max("e").over(wprev))
        .withColumn(
            "new_block",
            (
                F.col("prev_max_e").isNull()
                | (F.col("s") > F.col("prev_max_e"))
            ).cast("int"),
        )
        .withColumn("block", F.sum("new_block").over(w))
    )
    merged = blocks.groupBy("user_id", "block").agg(
        F.min("s").alias("bs"), F.max("e").alias("be")
    )
    return merged.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_blocks"),
        F.sum(F.col("be") - F.col("bs")).cast("bigint").alias("covered_sec"),
    )


ORACLE_EVENTS_INTERVAL_COALESCE = """
WITH d AS (
  SELECT user_id, event_id,
         CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
              AS BIGINT) AS s,
         CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) + 600
              AS BIGINT) AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
              OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_block,
         event_id
  FROM d
),
blocks AS (
  SELECT user_id, s, e,
         sum(new_block) OVER (PARTITION BY user_id ORDER BY s, event_id)
           AS block
  FROM flagged
),
merged AS (
  SELECT user_id, block, min(s) AS bs, max(e) AS be
  FROM blocks GROUP BY user_id, block
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(be - bs) AS BIGINT) AS covered_sec
FROM merged GROUP BY user_id
"""


def q_dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume anomaly detection — the data-quality monitor
    every event pipeline runs: per (event_type, day) row counts
    compared against the TRAILING 7-day mean; a day is flagged when
    its volume drops below half (14·n < sum₇, pure integer — no
    float z-scores, so both engines agree exactly) or spikes past
    double (n·7 > 2·sum₇). One aggregation + one ROWS-frame window
    over O(types × days) rows — the heavy reduction happens in the
    per-day count, which is map-side combinable; the anomaly sweep
    itself is driver-negligible at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    trailing = daily.withColumn("sum7", F.sum("n").over(w)).withColumn(
        "days7", F.count("n").over(w)
    )
    return (
        trailing.where("days7 = 7")
        .withColumn(
            "flag",
            F.when(F.expr("14 * n < sum7"), F.lit("drop"))
            .when(F.expr("7 * n > 2 * sum7"), F.lit("spike"))
            .otherwise(F.lit("ok")),
        )
        .groupBy("event_type", "flag")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum("n").cast("bigint").alias("volume"),
        )
    )


ORACLE_DQ_VOLUME_ANOMALY = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
trail7 AS (
  SELECT event_type, day, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS sum7,
         count(n) OVER (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS days7
  FROM daily
)
SELECT event_type,
       CASE WHEN 14 * n < sum7 THEN 'drop'
            WHEN 7 * n > 2 * sum7 THEN 'spike'
            ELSE 'ok' END AS flag,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(n) AS BIGINT) AS volume
FROM trail7 WHERE days7 = 7
GROUP BY 1, 2
"""


def q_events_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable ``first(value, time)`` / ``last(value, time)``: the
    opening and closing reading per (event_type, day) — the OHLC
    shape — as ONE map-side-combinable aggregation (Spark ``min_by`` /
    ``max_by``, DuckDB ``arg_min`` / ``arg_max``): no window, no sort,
    no self-join; partial states merge associatively, so at 100 TB the
    day's first/last reduce inside each time partition before one
    ≤ |groups|-row shuffle. Ordering key is a lexicographic string
    (µs-rendered ts + zero-padded event_id) because it must be
    IDENTICAL in both engines and total (duplicate timestamps break
    bare-ts argmin determinism)."""
    ev = load_table(spark, sf_dir, "events")
    okey = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lit("|"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    return (
        ev.withColumn("okey", okey)
        .withColumn("cents", cents)
        .groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.min_by("cents", "okey").cast("bigint").alias("first_cents"),
            F.max_by("cents", "okey").cast("bigint").alias("last_cents"),
            F.count("*").cast("bigint").alias("n_events"),
        )
    )


ORACLE_EVENTS_FIRST_LAST = """
WITH keyed AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '|'
           || lpad(CAST(event_id AS VARCHAR), 12, '0') AS okey,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, day,
       CAST(arg_min(cents, okey) AS BIGINT) AS first_cents,
       CAST(arg_max(cents, okey) AS BIGINT) AS last_cents,
       CAST(count(*) AS BIGINT) AS n_events
FROM keyed GROUP BY event_type, day
"""


def q_events_counter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB ``counter_agg`` / Prometheus-rate semantics: a
    monotonic counter that occasionally RESETS (restart from zero)
    must report total increase = Σ positive deltas + the post-reset
    readings, never raw last-first (which under-counts by the reset
    magnitudes). Per (user, type) series ordered by (ts, event_id):
    delta = cents - lag(cents); a negative delta marks a reset and
    contributes the new reading. One window pass (shuffle on the
    series key — at 100 TB, the partition key), one aggregation;
    integer cents end to end, so both engines agree exactly."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    d = (
        ev.withColumn("cents", cents)
        .withColumn("prev", F.lag("cents").over(w))
        .withColumn(
            "inc",
            F.when(F.col("prev").isNull(), F.lit(0))
            .when(F.col("cents") >= F.col("prev"), F.col("cents") - F.col("prev"))
            .otherwise(F.col("cents")),
        )
        .withColumn(
            "is_reset",
            (F.col("prev").isNotNull() & (F.col("cents") < F.col("prev"))).cast(
                "int"
            ),
        )
    )
    return d.groupBy("event_type").agg(
        F.sum("inc").cast("bigint").alias("total_increase"),
        F.sum("is_reset").cast("bigint").alias("n_resets"),
        F.count("*").cast("bigint").alias("n_points"),
    )


ORACLE_EVENTS_COUNTER_AGG = """
WITH series AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         lag(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS prev
  FROM events
)
SELECT event_type,
       CAST(sum(CASE WHEN prev IS NULL THEN 0
                     WHEN cents >= prev THEN cents - prev
                     ELSE cents END) AS BIGINT) AS total_increase,
       CAST(sum(CASE WHEN prev IS NOT NULL AND cents < prev
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
       CAST(count(*) AS BIGINT) AS n_points
FROM series GROUP BY event_type
"""


def q_events_state_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compact state timeline — the TimescaleDB toolkit ``state_agg``
    shape: each user's event stream is a state machine (the
    event_type ENTERED at ts holds until the user's next event; the
    stream's last state holds to the corpus horizon = global max ts).
    Per (state, user cohort) we report entries (RUNS — consecutive
    same-state events collapse, so re-observing a state does not
    count as re-entering it), raw observations, and total WHOLE
    SECONDS spent in the state.

    Engine-exactness: durations are exact microsecond diffs
    integer-divided to seconds (the idiom every temporal op in this
    module uses — timestampdiff floors elapsed time while DuckDB
    date_diff counts boundaries, so neither is used at sub-unit
    precision); run detection is one lag() in the same window pass as
    the lead(), so the whole operator is ONE shuffle on user_id plus
    a map-side-combinable final aggregation. The horizon scalar is a
    broadcast one-row cross join, never a global (unpartitioned)
    window."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    horizon = ev.agg(F.max("ts").alias("gmax"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = (
        ev.withColumn("nts", F.lead("ts").over(w))
        .withColumn("prev_state", F.lag("event_type").over(w))
        .crossJoin(F.broadcast(horizon))
        .withColumn(
            "dt_sec",
            F.expr(
                "timestampdiff(MICROSECOND, ts, coalesce(nts, gmax)) "
                "div 1000000"
            ),
        )
        .withColumn(
            "entry",
            F.expr(
                "CASE WHEN prev_state IS NULL "
                "OR prev_state != event_type THEN 1 ELSE 0 END"
            ),
        )
    )
    return stepped.groupBy(
        F.col("event_type").alias("state"),
        (F.col("user_id") % 4).cast("bigint").alias("cohort"),
    ).agg(
        F.sum("entry").cast("bigint").alias("n_entries"),
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("dt_sec").cast("bigint").alias("total_sec"),
    )


ORACLE_EVENTS_STATE_AGG = """
WITH stepped AS (
  SELECT user_id, event_type, ts,
         lead(ts) OVER w AS nts,
         lag(event_type) OVER w AS prev_state
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), horizon AS (SELECT max(ts) AS gmax FROM events),
d AS (
  SELECT event_type AS state, user_id % 4 AS cohort,
         date_diff('microsecond', ts, coalesce(nts, gmax)) // 1000000
           AS dt_sec,
         CASE WHEN prev_state IS NULL OR prev_state != event_type
              THEN 1 ELSE 0 END AS entry
  FROM stepped CROSS JOIN horizon
)
SELECT state, CAST(cohort AS BIGINT) AS cohort,
       CAST(sum(entry) AS BIGINT) AS n_entries,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(dt_sec) AS BIGINT) AS total_sec
FROM d GROUP BY state, cohort
"""


def queries_and_oracles():
    pairs = {
        "events_state_agg": (q_events_state_agg, ORACLE_EVENTS_STATE_AGG),
        "events_first_last": (q_events_first_last, ORACLE_EVENTS_FIRST_LAST),
        "events_interval_coalesce": (
            q_events_interval_coalesce,
            ORACLE_EVENTS_INTERVAL_COALESCE,
        ),
        "dq_volume_anomaly": (
            q_dq_volume_anomaly,
            ORACLE_DQ_VOLUME_ANOMALY,
        ),
        "events_counter_agg": (
            q_events_counter_agg,
            ORACLE_EVENTS_COUNTER_AGG,
        ),
        "events_retention_cohort": (
            q_events_retention_cohort,
            ORACLE_EVENTS_RETENTION,
        ),
        "window_distribution": (q_window_distribution, ORACLE_WINDOW_DISTRIBUTION),
        "window_range_frame": (q_window_range_frame, ORACLE_WINDOW_RANGE_FRAME),
        "events_tumbling_window": (q_events_tumbling, ORACLE_EVENTS_TUMBLING),
        "events_sliding_window": (q_events_sliding, ORACLE_EVENTS_SLIDING),
        "events_sessionize": (q_events_sessionize, ORACLE_EVENTS_SESSIONIZE),
        "events_dedup_latest": (q_events_dedup_latest, ORACLE_EVENTS_DEDUP),
        "events_funnel": (q_events_funnel, ORACLE_EVENTS_FUNNEL),
        "events_gapfill_locf": (q_events_gapfill_locf, ORACLE_EVENTS_GAPFILL),
        "events_gapfill_interp": (
            q_events_gapfill_interp,
            ORACLE_EVENTS_GAPFILL_INTERP,
        ),
        "events_time_weighted": (
            q_events_time_weighted,
            ORACLE_EVENTS_TIME_WEIGHTED,
        ),
    }
    return {k: v[0] for k, v in pairs.items()}, {k: v[1] for k, v in pairs.items()}
