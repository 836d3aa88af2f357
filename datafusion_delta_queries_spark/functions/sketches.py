"""Mergeable-sketch aggregates: incremental NDV maintenance.

The approximate-aggregate analog of ``delta_agg_maintenance``
(operators/delta_queries.py): sum/count/min/max merge trivially across
an old snapshot and a delta batch, and distinct counts merge the same
way once they're carried as HLL sketches (Spark 3.5+ ships Apache
DataSketches HLL: ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``). Maintaining per-group NDV over an append-only
table then never rescans history: sketch the delta batch, union it
with the stored partial, re-estimate.

At 100 TB: partial sketches are KB-sized per group (lgK=14 ≈ 16 KB
worst case) — the merge input is group-count × KB regardless of row
count, so the maintenance job's cost is proportional to the DELTA, not
the table. Estimates carry ~0.8% relative standard error at lgK=14;
the union of partials is the same DataSketches merge a single-pass
sketch uses, but register state may differ slightly across merge
orders (sparse→dense transitions), so tests gate on error bounds, not
bitwise equality.

No DuckDB oracle by design (DuckDB's approx_count_distinct uses a
different HLL implementation — cross-engine estimates cannot match);
the correctness gates are exact-answer error bounds in
tests/test_sketches.py, the same policy as IVF ANN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ndv_partial(
    df: DataFrame, group_cols: list[str], col: str, lg_k: int = 14
) -> DataFrame:
    """Per-group HLL sketch partial: (group_cols..., ndv_sketch binary).

    Store this per ingest batch (or per stored snapshot); it is the
    only state incremental NDV maintenance needs.
    """
    return df.groupBy(*group_cols).agg(
        F.expr(f"hll_sketch_agg({col}, {lg_k})").alias("ndv_sketch")
    )


def ndv_merge(*partials: DataFrame) -> DataFrame:
    """Union per-group partials → (group_cols..., ndv estimate).

    ``hll_union_agg`` merges sketches of the same lgK; groups present
    in only one partial pass through unchanged.
    """
    if not partials:
        raise ValueError("ndv_merge needs at least one partial")
    unioned = partials[0]
    for p in partials[1:]:
        unioned = unioned.unionByName(p)
    group_cols = [c for c in unioned.columns if c != "ndv_sketch"]
    return unioned.groupBy(*group_cols).agg(
        F.expr("hll_sketch_estimate(hll_union_agg(ndv_sketch))")
        .cast("bigint")
        .alias("ndv")
    )
