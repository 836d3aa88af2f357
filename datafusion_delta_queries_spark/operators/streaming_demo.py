"""Driver-runnable Structured Streaming queries.

Each entry builds a real ``readStream`` plan over the fixture parquet,
drains it with Trigger.AvailableNow into a memory sink, and returns
the materialized result — so the driver exercises Spark's incremental
engine end-to-end and still gets a batch DataFrame to oracle-check.

The fixture file is a single parquet, so the drain is one micro-batch:
no in-flight watermark drops, and append-mode emission is exactly
"windows whose end the final watermark passed" — replicated in the
DuckDB oracle with a max(ts)-delay cutoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table_path
from ..plans.nodes import Filter, Projection, Scan
from ..streaming import (
    compile_streaming,
    run_stream_to_table,
    watermarked_tumbling_counts,
)

_IR = Projection(
    ["o_orderkey", "o_custkey", "o_orderpriority", "round(o_totalprice, 2) AS total"],
    Filter("o_totalprice > 300000", Scan("orders")),
)


def q_streaming_filter_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless IR compiled to a stream — Spark's IncrementalExecution
    is the PosDelta rule for π/σ (SURVEY §0)."""
    path = table_path(sf_dir, "orders")
    schema = spark.read.parquet(path).schema
    # Glob form: the file-stream source requires a directory basePath;
    # a glob leaf makes basePath the parent dir while matching the file.
    stream = compile_streaming(
        _IR, spark, source_dirs={"orders": path + "*"}, schemas={"orders": schema}
    )
    return run_stream_to_table(stream)


ORACLE_STREAMING_FILTER = """
SELECT o_orderkey, o_custkey, o_orderpriority, round(o_totalprice, 2) AS total
FROM orders WHERE o_totalprice > 300000
"""


def q_streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts over a streamed events table.

    UTC is pinned at runtime (window bucketing happens in session-local
    time after the NTZ→LTZ cast; a non-UTC driver session would shift
    bucket boundaries). Window bounds are formatted as strings so the
    comparison is timezone-free.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = table_path(sf_dir, "events")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(raw_schema).parquet(path + "*")
    if dict(stream.dtypes)["ts"] == "bigint":  # TIMESTAMP(NANOS) fixture
        stream = stream.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    agg = watermarked_tumbling_counts(stream, delay="1 hour", width="10 minutes")
    out = run_stream_to_table(agg, output_mode="append")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "event_type",
        "n_events",
    )


ORACLE_STREAMING_WINDOW = """
WITH m AS (SELECT max(ts) AS mx FROM events),
w AS (
  SELECT time_bucket(INTERVAL '10 minutes', ts) AS ws, event_type,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(ws + INTERVAL '10 minutes', '%Y-%m-%d %H:%M:%S') AS window_end,
       event_type, n_events
FROM w, m
WHERE ws + INTERVAL '10 minutes' <= mx - INTERVAL '1 hour'
"""


def queries_and_oracles():
    queries = {
        "streaming_filter_projection": q_streaming_filter_projection,
        "streaming_tumbling_window": q_streaming_tumbling_window,
    }
    oracles = {
        "streaming_filter_projection": ORACLE_STREAMING_FILTER,
        "streaming_tumbling_window": ORACLE_STREAMING_WINDOW,
    }
    return queries, oracles
