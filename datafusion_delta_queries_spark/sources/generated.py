"""Generated-column partition pruning — Delta's ``GENERATED ALWAYS
AS (date_format(ts, 'yyyy-MM'))`` partition-filter derivation.

Delta lets a table partition by a column GENERATED from a base
column; queries that filter only on the BASE column still prune
partitions, because the engine derives the partition predicate from
the generation expression (the documented list of derivable
expressions: date_format, year/month/day truncations, ...). At
100 TB this is the difference between scanning three month
directories and scanning the table whenever the user filters on the
raw timestamp instead of the partition key.

This module realizes the month case on plain parquet directories:
``write_month_partitioned`` records the generation expression in a
JSON manifest next to the data; ``read_pruned_by_range`` derives the
month list from a [lo, hi] bound on the base column, opens ONLY
those directories (the caller can audit via ``inputFiles``), and
re-applies the exact base predicate as the residual filter — the
same read contract the zone-map and Bloom indexes in this package
follow. Other generation expressions are refused loudly.
"""

from __future__ import annotations

import json
import os
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_GENERATED_COLUMNS.json"


def write_month_partitioned(
    df: DataFrame, path: str, base_col: str, gen_col: str = "p_month"
) -> None:
    """Write ``df`` partitioned by ``gen_col`` = date_format(base_col,
    'yyyy-MM'), recording the generation expression so readers can
    derive partition predicates from base-column filters."""
    if gen_col in df.columns:
        raise ValueError(f"generated column {gen_col!r} already exists")
    out = df.withColumn(gen_col, F.date_format(F.col(base_col), "yyyy-MM"))
    # lead the in-partition sort with the partition column (dynamic
    # partition writes re-sort otherwise) — same discipline as sinks
    out.repartition(gen_col).sortWithinPartitions(gen_col).write.partitionBy(
        gen_col
    ).parquet(path)
    with open(os.path.join(path, _MANIFEST), "w", encoding="ascii") as fh:
        json.dump(
            {
                "gen_col": gen_col,
                "base_col": base_col,
                "expr": "date_format(base, 'yyyy-MM')",
            },
            fh,
        )


def _months_between(lo: date, hi: date) -> list[str]:
    months = []
    y, m = lo.year, lo.month
    while (y, m) <= (hi.year, hi.month):
        months.append(f"{y:04d}-{m:02d}")
        m += 1
        if m == 13:
            y, m = y + 1, 1
    return months


def read_pruned_by_range(
    spark: SparkSession, path: str, base_col: str, lo: date, hi: date
) -> DataFrame:
    """Read only the month directories the [lo, hi] base-column bound
    can touch, with the exact predicate re-applied as the residual —
    the generated-column pruning contract. Loud on manifest mismatch:
    deriving a partition filter from the WRONG generation expression
    silently drops rows."""
    with open(os.path.join(path, _MANIFEST), encoding="ascii") as fh:
        mf = json.load(fh)
    if mf["base_col"] != base_col or "yyyy-MM" not in mf["expr"]:
        raise ValueError(
            f"manifest generates {mf['gen_col']!r} from "
            f"{mf['base_col']!r} via {mf['expr']!r}; cannot derive a "
            f"partition filter for {base_col!r}"
        )
    gen = mf["gen_col"]
    dirs = [
        os.path.join(path, f"{gen}={m}")
        for m in _months_between(lo, hi)
        if os.path.isdir(os.path.join(path, f"{gen}={m}"))
    ]
    if not dirs:
        raise ValueError(
            f"no {gen} partitions overlap [{lo}, {hi}] under {path}"
        )
    return (
        spark.read.option("basePath", path)
        .parquet(*dirs)
        .where(
            (F.col(base_col) >= F.lit(str(lo)))
            & (F.col(base_col) <= F.lit(str(hi)))
        )
    )
