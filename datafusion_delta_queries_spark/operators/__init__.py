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
# families longest unchecked by the driver. After r7, all 143
# previously-registered queries have a driver-green row (cumulative
# union of CORRECTNESS_r01..r07); staleness now splits cleanly into
# last-r5 (44 queries), last-r6 (49), last-r7 (50). Round-8 rotation
# (executing the plan recorded last round): the two new count-distinct
# maintenance queries lead, then the entire r5-stale tranche, then
# canaries on the code paths this round's changes touched.
NEVER_DRIVER_CHECKED: tuple[str, ...] = ()

# New round-8 queries: first driver check this round (exact
# COUNT(DISTINCT) through single-table and join+aggregate maintenance).
NEW_THIS_ROUND: tuple[str, ...] = (
    "delta_sql_count_distinct",
    "delta_sql_join_count_distinct",
)

# Stale re-checks: the complete last-driver-row-r5 tranche (44).
RECHECK: tuple[str, ...] = (
    # tpch_full adaptations (15)
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
    # relational/events stragglers
    "window_range_frame",
    "events_tumbling_window",
    "join_range",
    "agg_salted_skew",
    "join_salted_skew",
    # incremental-maintenance family
    "delta_join",
    "delta_composite",
    "delta_agg_maintenance",
    "delta_rollup_hourly",
    "delta_ndv_maintenance",
    "delta_topk_maintenance",
    "delta_histogram_maintenance",
    "delta_lsh_maintenance",
    # dedup/ANN caps
    "llm_dedup_minhash_lsh",
    "llm_dedup_simhash_pairs",
    "llm_dedup_embedding",
    "llm_embedding_ann_lsh",
    "llm_ngram_lm_score",
    # streaming stragglers
    "streaming_tumbling_window",
    "streaming_dedup_watermarked",
    "streaming_interval_join",
    # UDx trio
    "udf_pandas_word_count",
    "udaf_median_chars",
    "udtf_tokens",
    # curation tranche
    "llm_semantic_kmeans",
    "llm_sample_diverse",
    "llm_metadata_audit",
    "llm_corpus_funnel",
    "llm_table_profile",
)

# Canary tail: already-green queries biased to code paths this round's
# changes touched — parse_agg_sql HAVING key_map + the declared-column-
# order select land on every maintain_*_of_sql query (having/join_agg/
# rollup's expression-key path), and the pipeline is the perennial
# cross-family canary. Truncated automatically if the sections above
# grow past 50.
CANARIES: tuple[str, ...] = (
    "delta_sql_having",
    "delta_sql_join_agg",
    "delta_sql_rollup_hourly",
    "llm_pipeline_end_to_end",
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

# Round-9 rotation plan (for the next window rewrite): lead with any
# queries registered after this window froze, then the r6-stale
# tranche (49 queries after this window runs: the relational/set-op/
# window basics, TPC-H headliners q1-q6/q10/q14 + q2, the events
# sliding/sessionize/dedup/funnel family, delta SQL frontend trio,
# delta_union/semi, llm_dedup_clusters, llm_embedding_ivf,
# streaming_stateful_running) — that's 49+new, so a couple of the
# freshest (r8-green) queries yield their slots; keep one llm_ and one
# streaming_ canary. This keeps every family's last driver row
# ≤3 rounds old (COVERAGE.md ledger).


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
