"""Custom stateful streaming operator via applyInPandasWithState.

The reference declines every stateful operator (``_ => Ok(None)``,
optimizer_rules/mod.rs:187). Spark's arbitrary-stateful API is the
idiomatic way past that: per-key state lives in the state store,
carries across micro-batches (checkpointed, exactly-once), and the
per-batch hook receives only the keys with new data — the PosDelta
philosophy applied to user-defined state machines.

``running_user_stats`` maintains per-user running counts/sums; each
micro-batch emits the refreshed totals for the users it touched.
Tests drive it file-by-file (maxFilesPerTrigger=1) and assert the
final state equals the batch aggregate over everything.

Scale posture: state is partitioned by the grouping key across
executors (RocksDB-backed in production); the Python hook receives
Arrow batches per key group.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, value_sum double"
STATE_SCHEMA = "n bigint, s double"


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "value_sum": [s]}
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) over a stream of events."""
    return events_stream.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
