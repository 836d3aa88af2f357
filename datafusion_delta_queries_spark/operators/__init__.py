"""Batch relational query surface.

Each module exposes small, deterministic, alias-stable query builders
``(spark, sf_dir) -> DataFrame`` plus a parallel dict of DuckDB oracle
SQL. ``registry()`` merges them for ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The driver's per-round correctness gate checks exactly the FIRST 50
# entries of ``queries()`` in insertion order. Queries named here are
# promoted to the front of the registry (in this order) so the window
# rotates across rounds until every registered query has earned a
# driver-green CORRECTNESS row at least once — and, once all have
# (true since r5: 132/132 cumulatively green), so that the families
# *longest unchecked by the driver* come back around. Round-6 rotation:
# the r4/r5 windows duplicated each other, leaving the r1/r2 families
# (events basics, relational basics, tpch headliners) driver-unchecked
# for four rounds — they lead this window, after the queries new this
# round.
NEVER_DRIVER_CHECKED: tuple[str, ...] = ()

# New round-6 queries: first driver check this round (null-safe delta
# join, SQL→IR frontend entry points).
NEW_THIS_ROUND: tuple[str, ...] = (
    "delta_join_null_safe",
    "delta_sql_frontend",
    "delta_sql_semi_join",
    "delta_sql_union",
)

# Stale re-checks, oldest driver row first: the r1 events trio, then
# the r2 relational/tpch block (36 of its 50; the 14 deferred scalar/
# pivot/string queries rotate in r7 via NEXT_WINDOW_ROTATION's policy).
RECHECK: tuple[str, ...] = (
    # last driver row: round 1
    "events_dedup_latest",
    "events_funnel",
    "events_sliding_window",
    # last driver row: round 2 — tpch headliners + flagship
    "flagship_revenue",
    "tpch_q1_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q14_promo_revenue",
    # round 2 — relational basics
    "projection",
    "filter_pushdown",
    "filter_complex",
    "distinct",
    "sort_limit",
    "topk_per_group",
    # round 2 — the eight join types + theta + null-safe
    "join_inner",
    "join_left_outer",
    "join_right_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_cross",
    "join_theta",
    "join_null_safe",
    # round 2 — set ops
    "union_all",
    "union_distinct",
    "intersect",
    "except",
    # round 2 — aggregations
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_quantiles",
    # round 2 — windows
    "window_rank",
    "window_running",
    "window_lag_lead",
    # round 2 — subqueries / CTEs (scalar_subquery/in_subquery defer to
    # r7 with the rest of the scalar family)
    "exists_correlated",
    "recursive_cte",
)

# Canary tail: already-green queries sampling every operator family,
# biased to code paths this round's changes touched (CC auto-fallback +
# checkpoint release; positional-union compile in the delta path).
# Truncated automatically if the sections above grow past 50.
CANARIES: tuple[str, ...] = (
    "llm_dedup_clusters",
    "delta_union",
    "delta_semi_join",
    "llm_embedding_ivf",
    "streaming_stateful_running",
    "join_asof",
    "events_sessionize",
)

DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    NEVER_DRIVER_CHECKED + NEW_THIS_ROUND + RECHECK + CANARIES
)[:50]

# Queries added after the 50 window slots filled; they run the local
# oracle gate every CI pass and rotate into the NEXT round's driver
# window.
NEXT_WINDOW_ROTATION: tuple[str, ...] = tuple(
    n for n in (NEVER_DRIVER_CHECKED + NEW_THIS_ROUND + RECHECK + CANARIES)
    if n not in DRIVER_WINDOW_PRIORITY
)

# Round-7 rotation plan (for the next window rewrite): lead with the
# round-6 queries registered after this window froze
# (delta_sql_agg_maintenance, delta_sql_rollup_hourly,
# streaming_static_join — local-green, no driver row yet), then the
# r2 family deferred this round
# (scalar_string/date/math/json/array/subquery, in_subquery, case_when,
# null_handling, string_agg, pivot, unpivot, agg_having, agg_stats),
# then the families whose last driver row is r3 (delta basics, llm
# text/multimodal tranche, streaming_dedup_keys/session_window,
# events_retention_cohort, window_distribution), with the usual
# cross-family canary tail.


def registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """All (queries, oracles) across operator modules."""
    from . import (
        curation,
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
        curation,
    ):
        q, o = mod.queries_and_oracles()
        dup = set(q) & set(queries)
        if dup:
            raise ValueError(f"duplicate query names: {dup}")
        queries.update(q)
        oracles.update(o)

    missing = [n for n in DRIVER_WINDOW_PRIORITY if n not in queries]
    if missing:
        raise ValueError(f"DRIVER_WINDOW_PRIORITY names unknown queries: {missing}")
    order = list(DRIVER_WINDOW_PRIORITY) + [
        n for n in queries if n not in set(DRIVER_WINDOW_PRIORITY)
    ]
    queries = {n: queries[n] for n in order}
    oracles = {n: oracles[n] for n in order if n in oracles}
    return queries, oracles
