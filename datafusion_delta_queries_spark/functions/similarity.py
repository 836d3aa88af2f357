"""Embedding similarity: dot / cosine expressions + hyperplane LSH.

Dot products are sequential left-folds over the array — the same
element order DuckDB's list_dot_product uses, so doubles match bitwise
and rounded outputs compare exactly in the oracle gate.

The hyperplane matrix for LSH bucketing is derived deterministically
from md5 (no RNG state), so the Spark plan and the DuckDB oracle embed
the *same* literal matrix: hyperplane j, dimension d has sign +1 iff
the first hex digit of md5(f"{j}_{d}") is 0-7.

Scale posture: brute-force top-k broadcasts the (small) query set and
computes per-row array math JVM-side — one pass over the corpus, no
shuffle beyond the final per-query top-k. The LSH variant buckets
vectors by sign pattern (one projection pass, then an equi-join on the
bucket key) — the sub-quadratic path for corpus×corpus similarity.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable


def dot(a_col: str, b_col: str) -> str:
    """Σ aᵢ·bᵢ as a sequential fold (order-stable across engines)."""
    return (
        f"aggregate(zip_with({a_col}, {b_col}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm(a_col: str) -> str:
    return f"sqrt({dot(a_col, a_col)})"


def as_double_array(col: str) -> str:
    return f"CAST({col} AS array<double>)"


def hyperplanes(n_planes: int = 8, dim: int = 64) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix (md5-derived, no RNG)."""
    out = []
    for j in range(n_planes):
        row = []
        for d in range(1, dim + 1):
            h = hashlib.md5(f"{j}_{d}".encode()).hexdigest()
            row.append(1.0 if h[0] in "01234567" else -1.0)
        out.append(row)
    return out


def _array_literal_spark(row: list[float]) -> str:
    return "array(" + ", ".join(f"CAST({v} AS DOUBLE)" for v in row) + ")"


def bucket_expr_spark(vec_col: str, planes: list[list[float]]) -> str:
    """'10110...' sign-pattern bucket key for a double-array column."""
    bits = [
        f"CASE WHEN {dot(vec_col, _array_literal_spark(p))} >= 0 "
        f"THEN '1' ELSE '0' END"
        for p in planes
    ]
    return "concat(" + ", ".join(bits) + ")"


def _array_literal_duckdb(row: list[float]) -> str:
    return "[" + ", ".join(str(v) for v in row) + "]::DOUBLE[]"


def bucket_expr_duckdb(vec_col: str, planes: list[list[float]]) -> str:
    bits = [
        f"CASE WHEN list_dot_product({vec_col}, {_array_literal_duckdb(p)}) >= 0 "
        f"THEN '1' ELSE '0' END"
        for p in planes
    ]
    return " || ".join(bits)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the scale path beyond hyperplane LSH
# ---------------------------------------------------------------------------
#
# Classic coarse-quantizer ANN: cluster the corpus into n_cells Voronoi
# cells (one Lloyd refinement over deterministic seeds — no RNG, so
# runs are reproducible), store each vector under its cell, and at
# query time scan only the n_probe nearest cells. Search cost drops
# from |corpus| to ~|corpus|·n_probe/n_cells per query.
#
# At 100 TB: the centroid table is tiny (n_cells × dim) and broadcast;
# assignment is one broadcast pass over the corpus; the cell id becomes
# the partition/bucket key of the stored index so a probe reads only
# its cells' files. Everything below is DataFrame ops — no collect.

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _best_cell(
    vectors: DataFrame, centroids: DataFrame, vec_field: str, norm_field: str
) -> DataFrame:
    """Nearest-centroid id per vector (cosine) with ZERO shuffle.

    The centroid table collapses to ONE broadcast row (array of
    (cell, c, nrm) structs) and the argmax runs as a per-row array
    reduction — instead of a k-way fanout join + re-aggregation, which
    would shuffle k copies of every corpus vector. Struct ordering
    (_sim, cell) is the same lexicographic max as the aggregate it
    replaces (ties → higher cell id); ``array_max`` is
    order-insensitive, so the non-deterministic ``collect_list`` order
    can't leak into the result.

    Norms arrive precomputed (``norm_field`` per vector, ``nrm`` per
    centroid): one fold each instead of 2·k folds per row, same IEEE
    operand order, identical doubles.
    """
    cent_row = centroids.agg(
        F.expr("collect_list(struct(cell, c, nrm))").alias("_cents")
    )
    sim = f"{dot(vec_field, 's.c')} / (({norm_field}) * (s.nrm))"
    return vectors.crossJoin(F.broadcast(cent_row)).selectExpr(
        *vectors.columns,
        f"array_max(transform(_cents, s -> struct({sim} AS _sim, s.cell AS cell)))"
        ".cell AS cell",
    )


def ivf_index(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    persist: Callable[[DataFrame], DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Build (indexed corpus with cell ids + norms, centroid table).

    Seeds are the ``n_cells`` lowest-id vectors (deterministic), then
    one Lloyd step: assign all vectors to seed cells, recompute each
    centroid as the element-wise mean. More steps sharpen cells but
    each is a full corpus pass; one is the standard cheap refinement.

    Centroid means sum 1e6-quantized integers, not doubles: float sums
    depend on aggregation order (varies with partitioning, and differs
    from any SQL oracle), integer sums do not, and the single final
    double division is identical IEEE math everywhere — so the whole
    index build is bitwise-reproducible across runs AND exactly
    expressible in the DuckDB oracle (same trick as the k-means
    operator).

    ``persist`` (optional ``DataFrame -> DataFrame`` hook, e.g. the
    pipeline's ``_shared``) pins the tiny centroid table, which is
    otherwise recomputed — a full corpus pass each time — by both its
    consumers (index assignment + query-time probe). The corpus itself
    is deliberately NOT persisted: at scale it doesn't fit, and each
    pass streams it once.
    """
    keep = persist if persist is not None else (lambda df: df)
    v = vecs.selectExpr(
        f"{id_col} AS vec_id", f"{as_double_array(vec_col)} AS v"
    ).selectExpr("vec_id", "v", f"{norm('v')} AS nv")
    seeds = (
        v.orderBy("vec_id")
        .limit(n_cells)
        .selectExpr("CAST(vec_id AS INT) AS cell", "v AS c", "nv AS nrm")
    )
    assigned = _best_cell(v, seeds, "v", "nv")
    centroids = keep(
        assigned.selectExpr("cell", "posexplode(v) AS (d, x)")
        .groupBy("cell", "d")
        .agg(
            F.expr("sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT))").alias("s"),
            F.count("*").alias("n"),
        )
        .selectExpr("cell", "d", "CAST(s AS DOUBLE) / (1e6 * n) AS m")
        .groupBy("cell")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(d, m))), s -> s.m)").alias(
                "c"
            )
        )
        .selectExpr("cell", "c", f"{norm('c')} AS nrm")
    )
    indexed = _best_cell(v, centroids, "v", "nv")
    return indexed, centroids


def ivf_search(
    indexed: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str = "q_id",
    vec_col: str = "q_vec",
    k: int = 10,
    n_probe: int = 4,
    exclude_id_match: bool = False,
) -> DataFrame:
    """Top-k cosine neighbors per query, scanning only n_probe cells.

    ``exclude_id_match=True`` drops candidates whose corpus id equals
    the query id BEFORE ranking (the serving shape: a query that is
    itself a corpus member never retrieves itself, and still gets k
    full rows of other neighbors).

    ``indexed``/``centroids`` MUST come from ``ivf_index`` — this
    function consumes its precomputed norm columns (``nv`` on the
    corpus, ``nrm`` on centroids) and the query norm computed once here;
    the candidate-pair loop does one dot-product fold per pair, nothing
    else. The requirement is asserted up front so a foreign corpus
    fails with the contract, not an unresolved-column error mid-plan.
    """
    for df, col, side in ((indexed, "nv", "indexed"), (centroids, "nrm", "centroids")):
        if col not in df.columns:
            raise ValueError(
                f"ivf_search expects the {side!r} DataFrame from ivf_index "
                f"(missing precomputed norm column {col!r})"
            )
    q = queries.selectExpr(
        f"{id_col} AS q_id", f"{as_double_array(vec_col)} AS q"
    ).selectExpr("q_id", "q", f"{norm('q')} AS nq")
    cell_sim = f"{dot('q', 'c')} / ((nq) * (nrm))"
    probe_w = Window.partitionBy("q_id").orderBy(F.desc("_csim"), "cell")
    probed = (
        q.join(F.broadcast(centroids))
        .selectExpr("q_id", "q", "nq", "cell", f"{cell_sim} AS _csim")
        .withColumn("_pr", F.row_number().over(probe_w))
        .where(F.col("_pr") <= n_probe)
        .select("q_id", "q", "nq", "cell")
    )
    pair_sim = f"{dot('q', 'v')} / ((nq) * (nv))"
    topk_w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "vec_id")
    cand = probed.join(indexed, "cell")
    if exclude_id_match:
        cand = cand.where(F.col("vec_id") != F.col("q_id"))
    return (
        cand.selectExpr("q_id", "vec_id", f"{pair_sim} AS sim")
        .withColumn("rank", F.row_number().over(topk_w))
        .where(F.col("rank") <= k)
    )
