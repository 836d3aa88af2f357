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
#   tpch 7, tpch_q2 (the first 50 slots at the time).
# r3 window below = the 50 highest-value never-driver-checked queries:
# the reference's delta machinery first, then the LLM-pipeline mandate,
# streaming, UDFs, temporal/skew joins, remaining windows, and a
# tpch_full fill. The tail (rest of tpch_full + already-green queries)
# rotates into later rounds' windows as space frees up.
DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # reference-owned delta machinery (SURVEY §2.1 rows 1-8)
    "delta_projection_filter",
    "delta_join",
    "delta_join_theta",
    "delta_cross_join",
    "delta_union",
    "delta_semi_join",
    "delta_dedup_maintenance",
    "delta_composite",
    "delta_agg_maintenance",
    "delta_rollup_hourly",
    # LLM-pipeline operators (driver mandate)
    "llm_dedup_exact",
    "llm_dedup_ngram_jaccard",
    "llm_dedup_clusters",
    "llm_pipeline_end_to_end",
    "llm_dedup_minhash_lsh",
    "llm_dedup_simhash",
    "llm_dedup_embedding",
    "llm_embedding_topk",
    "llm_embedding_ann_lsh",
    "llm_text_stats",
    "llm_quality_score",
    "llm_lang_id",
    "llm_token_count",
    "llm_fingerprint",
    "llm_multimodal_features",
    "llm_multimodal_frames",
    "llm_multimodal_resize",
    "llm_tfidf_top_terms",
    # structured streaming surface
    "streaming_filter_projection",
    "streaming_tumbling_window",
    "streaming_session_window",
    "streaming_dedup_keys",
    "streaming_dedup_watermarked",
    "streaming_interval_join",
    # UDF / UDAF / UDTF
    "udf_pandas_word_count",
    "udaf_median_chars",
    "udtf_tokens",
    # temporal + skew-handling joins/aggs
    "join_asof",
    "join_range",
    "agg_salted_skew",
    "join_salted_skew",
    # remaining window functions + events
    "window_distribution",
    "window_range_frame",
    "events_retention_cohort",
    # curation tranche (decontamination / repetition / sampling /
    # packing / PII) — llm_* family, must sit inside the window
    "llm_decontaminate",
    "llm_quality_repetition",
    "llm_sample_stratified",
    "llm_pack_sequences",
    "llm_pii_scrub",
    # semantic clustering over embeddings (slot 50; the tpch_full tail
    # rotates into round 4's window)
    "llm_semantic_kmeans",
)

# Queries added after the 50 window slots filled; they run the local
# oracle gate every CI pass and rotate into the NEXT round's driver
# window (together with the never-checked tpch_full tail).
NEXT_WINDOW_ROTATION: tuple[str, ...] = (
    "llm_sample_diverse",
    "llm_metadata_audit",
    "llm_corpus_funnel",
    "llm_table_profile",
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
