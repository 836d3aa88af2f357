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


# ---------------------------------------------------------------------------
# Portable register-level HLL (oracle-exact, engine-independent)
# ---------------------------------------------------------------------------
#
# The DataSketches path above is the production choice, but its register
# state is implementation-defined — no external engine can reproduce it,
# so approximate NDV had no DuckDB-checkable driver row. This second
# realization removes that gap: registers are derived from md5 HEX
# STRINGS with pure-SQL string ops (md5 produces identical lowercase hex
# in Spark, DuckDB, Postgres, ...), so the register table — and every
# integer summary of it — is bit-identical across engines and fully
# oracle-checkable. The float estimate is deliberately kept OUT of the
# oracle surface (summation order could flip a final rounding);
# estimator quality is gated by exact-answer error bounds in
# tests/test_sketches.py instead.
#
# Layout (p = 8):
#   md5 hex h (32 chars) → bucket = int(h[0:2], 16)  ∈ [0, 256)
#   suffix = h[2:16] (14 hex chars = 56 bits)
#   rho    = 1 + (# leading zero BITS of suffix), capped at RHO_CAP so
#            2^(RHO_CAP - rho) stays an exact bigint term
#
# State = one (group, bucket, max rho) row per non-empty register —
# ≤ 256 rows per group at ANY scale, max-mergeable, so incremental
# maintenance hashes only the delta batch (delta_hll_maintenance in
# operators/sketch_queries.py).

HLL_M = 256  # 2^8 registers
HLL_RHO_CAP = 41  # 2^(41 - rho) ≤ 2^40; 256 groups × 2^41 < 2^63


def hll_portable_registers(
    df: DataFrame, group_cols: list[str], col: str
) -> DataFrame:
    """Per-group portable-HLL register table:
    (group_cols..., bucket int, rho int).

    One narrow groupBy with map-side combine; every expression is a
    JVM built-in (md5 / conv / regexp / CASE) — no Python UDFs.
    """
    h = F.md5(F.col(col).cast("string"))
    # NULLs carry no distinct value (COUNT(DISTINCT) semantics) and
    # would otherwise leak through as a (bucket NULL, rho 41) register
    # — least() skips NULL operands — corrupting every summary column.
    with_parts = df.where(F.col(col).isNotNull()).select(
        *group_cols,
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("bucket"),
        F.substring(h, 3, 14).alias("suffix"),
    ).select(
        *group_cols,
        "bucket",
        "suffix",
        F.length(F.regexp_extract("suffix", "^(0*)", 1)).alias("zchars"),
    )
    first_nz = F.expr("substr(suffix, zchars + 1, 1)")
    extra = (
        F.when(first_nz.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
        .when(first_nz.isin("4", "5", "6", "7"), 1)
        .when(first_nz.isin("2", "3"), 2)
        .otherwise(3)
    )
    rho = F.when(F.col("zchars") == 14, F.lit(57)).otherwise(
        F.col("zchars") * 4 + extra + 1
    )
    return (
        with_parts.withColumn("rho", F.least(rho, F.lit(HLL_RHO_CAP)))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge_registers(*register_tables: DataFrame) -> DataFrame:
    """Max-merge register tables (same group cols + bucket).

    The HLL union: registers of a UNION of inputs == per-bucket max of
    the inputs' registers — exactly, not approximately — which is the
    identity delta_hll_maintenance leans on.
    """
    if not register_tables:
        raise ValueError("hll_merge_registers needs at least one input")
    unioned = register_tables[0]
    for t in register_tables[1:]:
        unioned = unioned.unionByName(t)
    group_cols = [c for c in unioned.columns if c not in ("bucket", "rho")]
    return unioned.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("rho"))


def hll_summary(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Integer-exact per-group summary of a register table.

    (n_set, sum_rho, max_rho, s_scaled) fully determine the HLL
    estimate, and every term is an exact bigint — 2^(RHO_CAP - rho) is
    a power of two ≤ 2^40, so pow()'s double is exact and the sum is
    order-independent. This is the oracle-comparable surface.
    ``s_scaled`` includes the empty registers' 2^RHO_CAP terms.
    """
    per_set = F.expr(f"CAST(pow(2, {HLL_RHO_CAP} - rho) AS BIGINT)")
    return registers.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n_set"),
        F.sum("rho").cast("bigint").alias("sum_rho"),
        F.max("rho").cast("int").alias("max_rho"),
        (
            F.sum(per_set)
            + (F.lit(HLL_M) - F.count("*")) * F.lit(2**HLL_RHO_CAP)
        )
        .cast("bigint")
        .alias("s_scaled"),
    )


def hll_estimate(summary: DataFrame, group_cols: list[str]) -> DataFrame:
    """HLL estimate from the integer summary (test surface, not oracle).

    Standard estimator with the small-range linear-counting correction:
    raw = alpha_m * m^2 / sum(2^-rho); sum(2^-rho) = s_scaled / 2^RHO_CAP.
    """
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = F.lit(alpha * m * m * float(2**HLL_RHO_CAP)) / F.col("s_scaled")
    zeros = F.lit(HLL_M) - F.col("n_set")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(m) * F.log(F.lit(m) / zeros),
    ).otherwise(raw)
    return summary.select(*group_cols, est.alias("ndv_est"))


# ---------------------------------------------------------------------------
# Portable KMV (bottom-k) distinct sketch: intersections, which HLL
# structurally cannot estimate
# ---------------------------------------------------------------------------
#
# Same portability trick as the register-level HLL, one step simpler:
# fixed-width lowercase md5 hex sorts lexicographically in hash order,
# so "the k smallest distinct hashes per group" — the classic KMV
# synopsis (Beyer et al., SIGMOD'07) — needs no numeric conversion at
# all and is bit-identical in any engine with md5. Signatures are
# exactly mergeable (bottom-k of a union == bottom-k of concatenated
# signatures), support set OPERATIONS (Jaccard/intersection via the
# bottom-k of the combined signature — the estimate HLL cannot give),
# and integer surfaces (membership counts, the k-th hash) are
# oracle-exact; only the float estimates live in tests.

KMV_K = 256


def kmv_signature(df: DataFrame, group_cols: list[str], col: str) -> DataFrame:
    """Per-group KMV synopsis: the KMV_K smallest distinct md5 hashes
    of ``col`` as (group_cols..., h string, rk int).

    One distinct + one window per group; state ≤ KMV_K rows/group at
    any scale, mergeable by re-ranking a union of signatures.
    """
    from pyspark.sql.window import Window

    # NULL values are excluded (COUNT(DISTINCT) semantics); a NULL
    # hash would also sort FIRST under Spark's asc-nulls-first while
    # DuckDB ranks NULLs last — silently breaking the cross-engine
    # bit-identity of the signature.
    hashes = (
        df.where(F.col(col).isNotNull())
        .select(*group_cols, F.md5(F.col(col).cast("string")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashes.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= KMV_K)
    )


def kmv_pair_overlap(
    signatures: DataFrame, group_col: str
) -> DataFrame:
    """For every unordered group pair: the KMV intersection statistics.

    Combine both signatures, keep the KMV_K smallest hashes of the
    union, and count how many of those hashes appear in BOTH groups —
    ``inter_bottomk / k`` is the standard KMV Jaccard estimator, and
    ``kth_hash`` (the k-th smallest of the union, a plain string)
    determines the distinct-union estimate. Every output column is
    deterministic and engine-portable. The pair fan-out joins each
    signature row against a broadcast list of group pairs — work is
    |pairs| × k rows, independent of input size.
    """
    from pyspark.sql.window import Window

    groups = signatures.select(group_col).distinct()
    pairs = (
        groups.alias("ga")
        .join(
            groups.alias("gb"),
            F.col(f"ga.{group_col}") < F.col(f"gb.{group_col}"),
        )
        .select(
            F.col(f"ga.{group_col}").alias("g1"),
            F.col(f"gb.{group_col}").alias("g2"),
        )
    )
    member = signatures.join(
        F.broadcast(pairs),
        (F.col(group_col) == F.col("g1")) | (F.col(group_col) == F.col("g2")),
    )
    per_hash = member.groupBy("g1", "g2", "h").agg(
        F.countDistinct(group_col).alias("n_groups")
    )
    w = Window.partitionBy("g1", "g2").orderBy("h")
    union_bottomk = per_hash.withColumn(
        "rk", F.row_number().over(w)
    ).where(F.col("rk") <= KMV_K)
    return union_bottomk.groupBy("g1", "g2").agg(
        F.count("*").cast("bigint").alias("k_used"),
        F.sum((F.col("n_groups") == 2).cast("bigint"))
        .cast("bigint")
        .alias("inter_bottomk"),
        F.max("h").alias("kth_hash"),
    )


def kmv_estimates(pair_stats: DataFrame) -> DataFrame:
    """Float estimators from the integer pair stats (test surface):
    Jaccard ≈ inter_bottomk / k_used; distinct-union ≈ (k_used - 1) /
    normalized(kth_hash) (Beyer et al.); intersection ≈ J × U."""
    frac = F.conv(F.substring("kth_hash", 1, 15), 16, 10).cast(
        "double"
    ) / F.lit(float(16**15))
    jac = F.col("inter_bottomk") / F.col("k_used")
    union_est = (F.col("k_used") - 1) / frac
    return pair_stats.select(
        "g1",
        "g2",
        jac.alias("jaccard_est"),
        union_est.alias("union_est"),
        (jac * union_est).alias("inter_est"),
    )


# ---------------------------------------------------------------------------
# Portable Count-Min sketch: point-frequency estimates under RETRACTION
# ---------------------------------------------------------------------------
#
# The third portable synopsis, and the one with a property the other
# two structurally lack: counters are LINEAR, so the sketch is
# maintainable under deletes and updates by adding SIGNED counter
# deltas — HLL registers and KMV signatures are max/min state with no
# inverse and stay insert-only. Same portability trick: row-j's bucket
# for a value v is the first byte of md5('j:' || v), identical hex math
# in Spark and DuckDB, so the counter table and every point estimate
# (an integer min over CMS_D counters) is oracle-exact. Estimator
# QUALITY (overcount bounded by eps·N with probability 1-delta;
# never an undercount) is gated in tests/test_sketches.py.
#
# State = CMS_D × CMS_W counters per group — fixed size at ANY scale,
# sum-mergeable, so maintenance touches only the delta batch
# (signed_cms_maintenance in operators/sketch_queries.py).

CMS_D = 4  # depth: independent hash rows
CMS_W = 256  # width: counters per row (bucket = first md5 byte)


def _cms_bucket(value_str, j: int):
    h = F.md5(F.concat(F.lit(f"{j}:"), value_str))
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def cms_counters(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight=None,
) -> DataFrame:
    """Per-group CMS counter table: (group_cols..., row, bucket, cnt).

    ``weight`` defaults to +1 per input row; pass a signed column
    (e.g. the CDF ``_sign``) to build a counter DELTA whose sum-merge
    retracts deletions. One narrow groupBy with map-side combine; the
    shuffle carries ≤ CMS_D × CMS_W rows per group at any input size.
    """
    val = F.col(value_col).cast("string")
    w = F.lit(1) if weight is None else weight
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"), _cms_bucket(val, j).alias("bucket")
            )
            for j in range(CMS_D)
        ]
    )
    return (
        df.where(val.isNotNull())
        .select(*group_cols, F.explode(pairs).alias("rb"), w.alias("_w"))
        .select(*group_cols, "rb.row", "rb.bucket", "_w")
        .groupBy(*group_cols, "row", "bucket")
        .agg(F.sum("_w").cast("bigint").alias("cnt"))
    )


def cms_merge(*counter_tables: DataFrame) -> DataFrame:
    """Sum-merge counter tables (linearity: counters of a union ==
    sum of counters — exactly). A counter driven below zero means a
    retraction of rows the history never inserted: the merge plan
    fails loudly, mirroring the CDF snapshot fold's guard."""
    if not counter_tables:
        raise ValueError("cms_merge needs at least one input")
    unioned = counter_tables[0]
    for t in counter_tables[1:]:
        unioned = unioned.unionByName(t)
    group_cols = [
        c for c in unioned.columns if c not in ("row", "bucket", "cnt")
    ]
    return (
        unioned.groupBy(*group_cols, "row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .where(
            "CASE WHEN cnt < 0 THEN CAST(raise_error("
            "'corrupt CMS history: counter retracted below zero') "
            "AS BOOLEAN) ELSE cnt <> 0 END"
        )
    )


def cms_point_estimate(
    counters: DataFrame,
    keys: DataFrame,
    group_cols: list[str],
    key_col: str,
) -> DataFrame:
    """Point-frequency estimate for every key in ``keys``:
    min over the CMS_D rows of the key's counters (a missing counter
    row is 0 — the key was never seen in that bucket).

    Output: (group_cols..., key_col, est bigint). Work is
    |keys| × CMS_D lookup rows joined against the fixed-size counter
    table — broadcastable at any corpus size.
    """
    val = F.col(key_col).cast("string")
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"), _cms_bucket(val, j).alias("bucket")
            )
            for j in range(CMS_D)
        ]
    )
    probes = (
        keys.where(val.isNotNull())
        .select(*group_cols, key_col, F.explode(pairs).alias("rb"))
        .select(*group_cols, key_col, "rb.row", "rb.bucket")
    )
    on = [*group_cols, "row", "bucket"]
    return (
        probes.join(counters, on, "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0).cast("bigint")))
        .groupBy(*group_cols, key_col)
        .agg(F.min("cnt").cast("bigint").alias("est"))
    )
