"""Batch relational query surface.

Each module exposes small, deterministic, alias-stable query builders
``(spark, sf_dir) -> DataFrame`` plus a parallel dict of DuckDB oracle
SQL. ``registry()`` merges them for ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """All (queries, oracles) across operator modules."""
    from . import (
        delta_queries,
        llm_pipeline,
        relational,
        scale_patterns,
        streaming_demo,
        temporal,
        tpch,
        tpch_full,
        udfs,
        windowed_events,
    )

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (
        relational,
        tpch,
        tpch_full,
        windowed_events,
        temporal,
        delta_queries,
        llm_pipeline,
        scale_patterns,
        streaming_demo,
        udfs,
    ):
        q, o = mod.queries_and_oracles()
        dup = set(q) & set(queries)
        if dup:
            raise ValueError(f"duplicate query names: {dup}")
        queries.update(q)
        oracles.update(o)
    return queries, oracles
