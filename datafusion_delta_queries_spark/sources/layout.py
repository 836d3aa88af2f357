"""Multi-dimensional data layout: z-order clustering for scan pruning.

Parquet scans skip row groups whose min/max statistics exclude the
filter — but a table sorted on ONE column has useless statistics for
every other column: each file spans the full range of the second key,
so a predicate on it prunes nothing. Z-ordering (bit-interleaving the
sort keys — the layout behind Delta Lake's ``OPTIMIZE ZORDER BY``)
makes every clustered column's min/max ranges tight simultaneously,
so box predicates on ANY subset of the keys skip most of the files.
This is pure layout: rewriting changes not one result, only which
bytes a filtered scan must touch — the difference between reading
100 TB and reading the 40 GB a two-column filter actually needs.

Everything here is JVM expressions (shift/and/sum — whole-stage
codegen) plus a plain ``repartitionByRange`` + ``sortWithinPartitions``
write; no UDFs, no driver-side iteration. The pruning claim is
MEASURED, not asserted: ``row_group_ranges`` reads the real parquet
footer statistics back and ``overlapping_groups`` counts how many row
groups a box predicate must open (tests/test_layout.py compares the
z-ordered layout against a single-key sort on the same data).

Reference parity: the reference engine has no physical-layout
machinery at all (its tables are in-memory registrations,
delta_node.rs:63-109); this is part of the beyond-the-reference
100 TB surface, like the salted-skew patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 8  # per-dimension resolution: 2^8 cells per axis


def zvalue(cols: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` bits of each (already bounded,
    non-negative integer) column into one z-value: bit ``i`` of
    column ``j`` lands at position ``i * n + j``. With n=2, bits=8
    the curve has 65,536 cells; every term is a JVM bit expression.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("z-ordering needs at least two columns")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows a bigint")
    z = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        v = c.cast("bigint")
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return z


def scale_to_cells(
    df: DataFrame, cols: list[str], bits: int = ZORDER_BITS
) -> tuple[DataFrame, Column]:
    """Map each column linearly from its [min, max] onto the z-curve's
    [0, 2^bits) cell range and return (df, zvalue column).

    The min/max pass is ONE aggregate collected as 2xN scalars —
    driver-safe at any table size. Linear scaling keeps the cell math
    engine-portable and deterministic; a production rewrite job can
    swap in approxQuantile boundaries for heavily skewed keys without
    touching anything downstream (the z-curve only needs SOME bounded
    monotone cell id per key).
    """
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    cells = []
    top = (1 << bits) - 1
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) or 1.0
        cells.append(
            F.least(
                F.floor(
                    (F.col(c).cast("double") - F.lit(mn))
                    / F.lit(span)
                    * F.lit(float(top + 1))
                ),
                F.lit(top),
            ).cast("bigint")
        )
    return df, zvalue(cells, bits)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = ZORDER_BITS,
    n_files: int = 16,
) -> str:
    """Rewrite ``df`` as ``n_files`` parquet files clustered along the
    z-curve of ``cols``: range-partition on the z-value (contiguous
    curve segments per file — tight per-file min/max on EVERY
    clustered column), sort within each file (tight per-ROW-GROUP
    stats too), drop the helper column, write."""
    df, z = scale_to_cells(df, cols, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("errorifexists")
        .parquet(path)
    )
    return path


def linear_write(
    df: DataFrame, path: str, sort_col: str, n_files: int = 16
) -> str:
    """The baseline layout: range-partition + sort on ONE column."""
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("errorifexists")
        .parquet(path)
    )
    return path


def row_group_ranges(path: str, columns: list[str]) -> list[dict]:
    """Read the REAL parquet footer statistics back: one dict per row
    group with each column's (min, max). This is exactly the metadata
    a scan's predicate pushdown consults — the measurement surface for
    the pruning tests, not a query path."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        pf = pq.ParquetFile(os.path.join(path, name))
        schema_names = pf.schema_arrow.names
        idx = {c: schema_names.index(c) for c in columns}
        for rg in range(pf.metadata.num_row_groups):
            meta = pf.metadata.row_group(rg)
            entry: dict = {"file": name, "row_group": rg}
            for c in columns:
                st = meta.column(idx[c]).statistics
                entry[c] = (st.min, st.max)
            out.append(entry)
    return out


def overlapping_groups(
    ranges: list[dict], box: dict[str, tuple]
) -> int:
    """How many row groups a box predicate must OPEN: those whose
    [min, max] intervals overlap the box on every constrained column.
    The complement is what statistics-based skipping saves."""
    n = 0
    for entry in ranges:
        hit = True
        for c, (lo, hi) in box.items():
            mn, mx = entry[c]
            if mx < lo or mn > hi:
                hit = False
                break
        n += hit
    return n
