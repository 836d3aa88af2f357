"""applyInPandasWithState: state carries across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_queries_spark.catalog import load_table
from datafusion_delta_queries_spark.streaming.incremental import run_stream_to_table
from datafusion_delta_queries_spark.streaming.stateful import running_user_stats

from .conftest import SF_SMALL


def test_state_accumulates_across_batches(spark, tmp_path):
    events = load_table(spark, SF_SMALL, "events").select("user_id", "value")
    d = str(tmp_path / "ev")
    # Two files → with maxFilesPerTrigger=1, two micro-batches.
    events.where("user_id % 2 = 0").coalesce(1).write.mode("overwrite").parquet(
        d + "/f1"
    )
    events.where("user_id % 2 = 1").coalesce(1).write.mode("append").parquet(
        d + "/f2"
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = run_stream_to_table(
        running_user_stats(stream), output_mode="update"
    )
    # Update-mode sink: keep each user's LAST emitted totals.
    final = (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.round(F.max("value_sum"), 6).alias("value_sum"),
        )
    )
    want = (
        events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
    )
    got_rows = sorted(tuple(r) for r in final.collect())
    want_rows = sorted(tuple(r) for r in want.collect())
    assert len(got_rows) > 0
    assert [r[:2] for r in got_rows] == [r[:2] for r in want_rows]
    # Sums float-compare loosely (accumulation order differs).
    for g, w in zip(got_rows, want_rows):
        assert abs(g[2] - w[2]) < 1e-6


def test_dedup_watermarked_plan_bounds_state(spark):
    """The watermarked dedup must plan the DeduplicateWithinWatermark
    operator (state evicted by the watermark), not plain Deduplicate."""
    from datafusion_delta_queries_spark.operators.streaming_demo import (
        _EVENT_CONF,
        _dedup_watermarked_plan,
        _pinned_conf,
    )

    with _pinned_conf(spark, _EVENT_CONF):
        plan = _dedup_watermarked_plan(spark, SF_SMALL)
        analyzed = plan._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in analyzed


def test_streaming_builders_leave_session_conf_untouched(spark):
    """Builders pin UTC/nanos only for the scope of their own drain —
    a non-UTC caller session must come back unchanged AND still get
    UTC-correct window bounds (the driver runs a vanilla session)."""
    from datafusion_delta_queries_spark.operators.streaming_demo import (
        q_streaming_dedup_watermarked,
        q_streaming_tumbling_window,
    )
    from datafusion_delta_queries_spark.oracle import compare, run_oracle
    from datafusion_delta_queries_spark.operators.streaming_demo import (
        ORACLE_STREAMING_WINDOW,
    )

    tz_key = "spark.sql.session.timeZone"
    old_tz = spark.conf.get(tz_key)
    spark.conf.set(tz_key, "America/New_York")
    try:
        out = q_streaming_tumbling_window(spark, SF_SMALL)
        assert spark.conf.get(tz_key) == "America/New_York"
        ok, msg = compare(out, run_oracle(ORACLE_STREAMING_WINDOW, SF_SMALL))
        assert ok, msg
        assert q_streaming_dedup_watermarked(spark, SF_SMALL).count() > 0
        assert spark.conf.get(tz_key) == "America/New_York"
    finally:
        spark.conf.set(tz_key, old_tz)
