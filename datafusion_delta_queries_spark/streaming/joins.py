"""Stream-stream joins with event-time state bounds.

The reference's join delta rule (Δ(R⋈S) = ΔR⋈ΔS ∪ R⋈ΔS ∪ ΔR⋈S,
/root/reference/src/optimizer_rules/mod.rs:99-158) is exactly what
Spark's stream-stream join executes internally: each side's state
store holds the "R so far" the other side's new rows join against.
The reference keeps both sides' full history forever; Spark bounds the
state when the join carries watermarks plus an event-time range
condition — the scale-critical improvement, since unbounded join state
is the first thing to OOM on an infinite stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.column import Column


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    condition: Column,
    left_delay: str = "1 day",
    right_delay: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join whose state both watermarks can evict.

    ``condition`` must include the equi-key AND an event-time range
    tying ``right_time`` to ``left_time`` (e.g. right between left and
    left + N days) — without the range, Spark keeps unbounded state.
    Works on batch inputs too (watermarks apply only to streams), so
    the same builder serves the DuckDB oracle path.

    ``how="left_outer"``: unmatched left rows emit NULL-padded — but
    only once the watermark proves no future right row can match them
    (their state expired). That deferred emission is the streaming
    form of the outer-join delta the positive rewrite cannot express
    and the reference silently mis-computes (mod.rs:126): a late match
    must be able to CANCEL the padding, so padding is withheld until
    the watermark closes the window.
    """
    lt = left.withColumn(left_time, left[left_time].cast("timestamp"))
    rt = right.withColumn(right_time, right[right_time].cast("timestamp"))
    if lt.isStreaming:
        lt = lt.withWatermark(left_time, left_delay)
    if rt.isStreaming:
        rt = rt.withWatermark(right_time, right_delay)
    return lt.join(rt, condition, how)
