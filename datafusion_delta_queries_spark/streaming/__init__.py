"""Structured Streaming realization of the delta machinery.

Spark's ``IncrementalExecution`` *is* the reference's PosDelta rule,
implemented natively: a streaming plan over select/filter/union
processes only newly-arrived rows per micro-batch — exactly the
Δπ/Δσ/Δ∪ equations of /root/reference/src/optimizer_rules/mod.rs:22-53,
159-180 — and checkpointed file sources give the "scan only appended
rows since the last maintained version" semantics of PosDeltaScan
(delta_node.rs:63-109) with exactly-once bookkeeping.

- ``incremental`` : compile the plans/ IR to streaming DataFrames;
  run-to-memory helpers; checkpointed incremental re-runs.
- ``windows``     : event-time surface (watermark + tumbling/session
  windows).
- ``joins``       : stream-stream joins with watermark-bounded state.
"""

from .incremental import (
    compile_streaming,
    incremental_new_rows,
    run_stream_to_table,
)
from .joins import interval_join
from .windows import watermarked_session_stats, watermarked_tumbling_counts

__all__ = [
    "compile_streaming",
    "run_stream_to_table",
    "incremental_new_rows",
    "interval_join",
    "watermarked_session_stats",
    "watermarked_tumbling_counts",
]
