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
