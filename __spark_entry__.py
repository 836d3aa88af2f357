"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``datafusion_delta_queries_spark``; this module
is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datafusion_delta_queries_spark.operators import registry
from datafusion_delta_queries_spark.operators.tpch import q_flagship_revenue

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Filtered equi-join lineitem⋈orders + group aggregation — exercises
    scan → pushdown filter → shuffle join → partial agg end-to-end.
    """
    return q_flagship_revenue(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = registry()
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted keys → rows-only check)."""
    _, o = registry()
    return o
