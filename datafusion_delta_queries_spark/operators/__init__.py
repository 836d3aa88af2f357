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
# driver-green CORRECTNESS row at least once:
#   r1 green: 43 relational + 5 events_* ;  r2 green: relational 0-42,
#   tpch 7, tpch_q2;  r3 green: 49/50 (delta machinery, LLM pipeline,
#   streaming, UDFs, temporal/skew, remaining windows, curation).
# r4 window below: the 19 queries that have never had a driver row
# (15 tpch_full + 4 round-3 curation ops), new round-4 queries, the
# round-3 red row re-checked after its oracle fix, then a cross-family
# CANARY tail of already-green queries — regressions in evicted
# families stay driver-visible, not just local-gate-visible.
NEVER_DRIVER_CHECKED: tuple[str, ...] = (
    # tpch_full tail (includes the bench headliners q9, q13, q18, q21)
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_parts",
    "tpch_q12_priority_lateness",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_counts",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume_customer",
    "tpch_q19_discounted_revenue",
    "tpch_q20_promotion_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_dormant_customers",
    # round-3 curation additions (local-green, queued from r3)
    "llm_sample_diverse",
    "llm_metadata_audit",
    "llm_corpus_funnel",
    "llm_table_profile",
)

# New round-4 queries: first driver check this round.
NEW_THIS_ROUND: tuple[str, ...] = (
    "llm_embedding_ivf",
    "delta_lsh_maintenance",
    "delta_ndv_maintenance",
    "llm_ngram_lm_score",
    "streaming_stateful_running",
    "llm_dedup_simhash_pairs",
    "delta_topk_maintenance",
    "delta_histogram_maintenance",
)

# Round-3's one red row — oracle type fix landed; re-verify.
RECHECK: tuple[str, ...] = (
    "llm_pipeline_end_to_end",
)

# Canary tail: already-green queries sampling every operator family
# (and every code path this round's refactors touched: graph CC,
# _shared lifecycle, quantized centroids). Truncated automatically if
# the sections above grow past 50.
CANARIES: tuple[str, ...] = (
    # paths touched by round-4 changes
    "llm_dedup_clusters",
    "llm_dedup_minhash_lsh",
    "llm_dedup_embedding",
    "llm_semantic_kmeans",
    "llm_embedding_ann_lsh",
    # delta machinery (reference core)
    "delta_composite",
    "delta_join",
    "delta_agg_maintenance",
    "delta_rollup_hourly",
    # streaming
    "streaming_interval_join",
    "streaming_dedup_watermarked",
    "streaming_tumbling_window",
    # UDF surface
    "udf_pandas_word_count",
    "udaf_median_chars",
    "udtf_tokens",
    # temporal / skew
    "join_asof",
    "join_salted_skew",
    "agg_salted_skew",
    # windows / events (incl. the r3 bench-noise watches)
    "events_sessionize",
    "window_range_frame",
    "events_tumbling_window",
    # lower-priority canaries (overflow to next rotation when the
    # sections above grow)
    "join_range",
    "events_funnel",
    "recursive_cte",
    "exists_correlated",
    "tpch_q1_pricing_summary",
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
