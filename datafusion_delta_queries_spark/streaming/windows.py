"""Event-time streaming surface: watermarks + windowed aggregation.

The reference has no event-time notion at all (SURVEY §2.3: "Pos" =
append-only, no watermarks anywhere) — this is the idiomatic Spark
extension of its delta machinery to stateful operators: the windowed
count below is an *incrementally maintained aggregate*, a capability
the reference explicitly declines (`_ => Ok(None)`,
optimizer_rules/mod.rs:187).

Append-mode emission contract (asserted by tests): a window is final —
emitted exactly once — when the watermark passes its end; with
Trigger.AvailableNow the final watermark is max(event_time) - delay,
so emitted windows are exactly those with
``window_end <= max(ts) - delay`` over the drained input.

Scale posture: state is bounded by (watermark delay / window size) per
key; late rows beyond the delay are dropped deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watermarked_tumbling_counts(
    events: DataFrame,
    delay: str = "1 hour",
    width: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window event counts with a late-data watermark.

    Works on a streaming OR batch events DataFrame — the aggregation
    plan is identical; the watermark only applies to streams (Spark 4
    rejects withWatermark on batch inputs). Event time must be
    TIMESTAMP (watermarks reject NTZ), so ts is cast in both paths —
    run under a UTC session (session.get_spark does) for wall-clock
    equality with NTZ fixtures.
    """
    src = events.withColumn("ts", events["ts"].cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", delay)
    return (
        src
        .groupBy(F.window("ts", width).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def watermarked_session_stats(
    events: DataFrame,
    delay: str = "1 hour",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based session aggregation with a late-data watermark.

    ``session_window`` merges events per user into [first_ts,
    last_ts + gap) ranges; in append mode a session is emitted exactly
    once, when the watermark passes its end. Same TIMESTAMP-cast and
    UTC-session requirements as the tumbling helper.

    Scale posture: session state is per active (user, session) only —
    the watermark closes and evicts sessions whose end it passed, so
    state is bounded by the number of users active within the delay.
    """
    src = events.withColumn("ts", events["ts"].cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", delay)
    return (
        src
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )
