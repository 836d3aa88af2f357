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
# rotates across rounds: queries with no driver row yet lead, then the
# families longest unchecked by the driver. After the r6 window,
# 136/139 registered queries have a driver-green row; the three
# registered after the r6 window froze lead here. Round-7 rotation:
# those three, then the r2-deferred scalar/pivot family (last driver
# row round 2), then every query whose last driver row is round 3.
NEVER_DRIVER_CHECKED: tuple[str, ...] = (
    "delta_sql_agg_maintenance",
    "delta_sql_rollup_hourly",
    "streaming_static_join",
)

# New round-7 queries: first driver check this round (HAVING over
# merged aggregate maintenance state; winnowing-fingerprint dedup;
# join+aggregate maintenance from SQL).
NEW_THIS_ROUND: tuple[str, ...] = (
    "delta_sql_having",
    "llm_dedup_winnow",
    "delta_sql_join_agg",
    "delta_winnow_maintenance",
)

# Stale re-checks, oldest driver row first.
RECHECK: tuple[str, ...] = (
    # last driver row: round 2 — scalar-function battery
    "scalar_string",
    "scalar_date",
    "scalar_math",
    "scalar_json",
    "scalar_array",
    # round 2 — CASE / null semantics / subqueries
    "case_when",
    "null_handling",
    "scalar_subquery",
    "in_subquery",
    # round 2 — reshaping + string aggregation
    "pivot",
    "unpivot",
    "string_agg",
    # round 2 — aggregate basics deferred from the r6 window
    "agg_stats",
    "agg_having",
    # last driver row: round 3 — delta-rewrite basics
    "delta_projection_filter",
    "delta_cross_join",
    "delta_join_theta",
    "delta_dedup_maintenance",
    # round 3 — events + windows
    "events_retention_cohort",
    "window_distribution",
    # round 3 — streaming
    "streaming_filter_projection",
    "streaming_dedup_keys",
    "streaming_session_window",
    # round 3 — LLM text-analysis tranche
    "llm_dedup_exact",
    "llm_dedup_ngram_jaccard",
    "llm_dedup_simhash",
    "llm_embedding_topk",
    "llm_text_stats",
    "llm_quality_score",
    "llm_lang_id",
    "llm_token_count",
    "llm_fingerprint",
    "llm_tfidf_top_terms",
    # round 3 — multimodal tranche
    "llm_multimodal_features",
    "llm_multimodal_frames",
    "llm_multimodal_resize",
    # round 3 — curation tranche
    "llm_decontaminate",
    "llm_quality_repetition",
    "llm_sample_stratified",
    "llm_pack_sequences",
    "llm_pii_scrub",
)

# Canary tail: already-green queries sampling every operator family,
# biased to code paths this round's changes touched (positional-union
# compile alignment, SQL-frontend ON-clause lookahead, shared-state
# release in the bench loop). Truncated automatically if the sections
# above grow past 50.
# (events_/streaming_/delta_/llm_ family coverage comes from the
# blocks above; the canary test checks whole-window family coverage.)
CANARIES: tuple[str, ...] = (
    "llm_pipeline_end_to_end",
    "join_asof",
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

# Round-8 rotation plan (for the next window rewrite): lead with any
# queries registered after this window froze, then the r4/r5-stale
# families — tpch_full (q4/q7/q8/q9/q11/q12/q13/q15-q22), the
# maintenance family (delta_agg/dedup/ndv/topk/histogram/lsh/rollup +
# delta_composite + delta_join), the UDx trio, kmeans/diverse/audit/
# profile/corpus_funnel, dedup caps (simhash_pairs, embedding),
# events_tumbling/sessionize, join_range/salted, window_range_frame,
# streaming_dedup_watermarked/interval_join/tumbling — ~48 queries,
# with cross-family canaries from the r6/r7 windows filling to 50.
# That keeps every family's last driver row ≤3 rounds old
# (COVERAGE.md ledger).


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
