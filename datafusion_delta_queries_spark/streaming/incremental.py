"""Compile the logical IR to Structured Streaming plans.

The same IR that plans/compiler.py compiles to batch DataFrames
compiles here to a ``readStream`` plan. For the operators Spark's
incremental execution supports natively (projection, filter, union —
the stateless subset of the reference's rule arms), the streaming
engine maintains the delta bookkeeping itself: each micro-batch sees
only newly-appended source rows, which is precisely the reference's
``PosDeltaScan`` contract, with checkpointed progress instead of a
version number.

Joins are intentionally NOT compiled here: stream-stream joins need
watermark/state policy decisions that belong to the caller (Spark
implements the same 3-way delta internally with managed state); use
the batch delta compiler (plans/compiler.py) for joins, or build the
stream-stream join explicitly with watermarks.

Scale posture: file-source streams list only new files per batch
(no rescan); state is bounded because the compiled subset is
stateless; sinks below are test/demo sinks — production writes go to
``writeStream.format("delta")`` / Kafka with the same plan.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..plans.nodes import Filter, Plan, Projection, Scan, Union


class UnsupportedStreamingOperator(Exception):
    """Operator outside the natively-incremental stateless subset."""


def compile_streaming(
    ir: Plan,
    spark: SparkSession,
    source_dirs: dict[str, str],
    schemas: dict[str, T.StructType],
) -> DataFrame:
    """IR → streaming DataFrame. Scan leaves become file-source streams.

    ``source_dirs[table]`` is a directory watched for parquet files;
    ``schemas[table]`` the fixed schema (streams can't infer).
    """
    if isinstance(ir, Scan):
        return (
            spark.readStream.schema(schemas[ir.table])
            .parquet(source_dirs[ir.table])
        )
    if isinstance(ir, Projection):
        child = compile_streaming(ir.input, spark, source_dirs, schemas)
        return child.selectExpr(*ir.select_exprs)
    if isinstance(ir, Filter):
        child = compile_streaming(ir.input, spark, source_dirs, schemas)
        return child.where(ir.predicate)
    if isinstance(ir, Union):
        # Positional UNION ALL — the same semantic the batch compiler
        # gives the Union node (plans/compiler.py), so one IR never
        # means two different unions depending on the compiler chosen.
        dfs = [
            compile_streaming(i, spark, source_dirs, schemas) for i in ir.inputs
        ]
        widths = {len(d.columns) for d in dfs}
        if len(widths) > 1:
            raise ValueError(
                f"Union branches have differing column counts {sorted(widths)}"
            )
        return reduce(lambda a, b: a.union(b), dfs)
    raise UnsupportedStreamingOperator(
        f"{ir.name} is not in the stateless streaming subset "
        "(projection/filter/union/scan); use plans.compile_delta for joins"
    )


def run_stream_to_table(
    stream_df: DataFrame,
    name: str | None = None,
    checkpoint_dir: str | None = None,
    output_mode: str = "append",
) -> DataFrame:
    """Drain all available input (Trigger.AvailableNow) into a memory
    sink; return the materialized batch DataFrame.

    With a reused ``checkpoint_dir`` this processes ONLY files appended
    since the last run — the executable form of PosDeltaScan.
    """
    name = name or f"stream_{uuid.uuid4().hex[:12]}"
    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix="dfdq-ckpt-")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def incremental_new_rows(
    ir: Plan,
    spark: SparkSession,
    source_dirs: dict[str, str],
    schemas: dict[str, T.StructType],
    checkpoint_dir: str,
) -> DataFrame:
    """One incremental maintenance step: rows of Q produced by source
    files appended since the previous call with this checkpoint.

    First call = full history (initial materialization); subsequent
    calls = pure deltas. This is ``delta(Q)`` executed by Spark's own
    incremental engine rather than our rewrite.

    Sink is foreachBatch → parquet (the memory sink cannot recover
    from a checkpoint); production would append to a Delta/warehouse
    table with the identical plan.
    """
    os.makedirs(checkpoint_dir, exist_ok=True)
    stream = compile_streaming(ir, spark, source_dirs, schemas)
    out_dir = tempfile.mkdtemp(prefix="dfdq-inc-out-")

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if any(f.endswith(".parquet") for f in os.listdir(out_dir)):
        return spark.read.schema(stream.schema).parquet(out_dir)
    return spark.createDataFrame([], stream.schema)
