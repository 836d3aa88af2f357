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
# families longest unchecked by the driver. After r8, 152 of the 172
# registered queries have a cumulative driver-green row (union of
# CORRECTNESS_r01..r08, recomputed this round); the other 20 were
# registered after the r8 window froze and lead here. Round-9
# rotation (executing the plan the r8 verdict recorded): 20
# never-driver-checked + r9-new + 3 r5-stale deferrals + the head of
# the 49-query r6-stale tranche fill the 50 slots; the spilled
# r6-stale queries are the committed r10 remainder (R10_PLAN below) —
# the ≤3-round family-freshness invariant is restored over r9+r10 as
# the r8 verdict required.
NEVER_DRIVER_CHECKED: tuple[str, ...] = (
    # late-r8 signed/retraction maintenance family (local oracle
    # green since registration; first driver check now)
    "signed_semi_join",
    "signed_topk",
    "signed_join_agg",
    "signed_sql_agg",
    "signed_sql_join_agg",
    "signed_dedup_maintenance",
    "signed_cross_join",
    "signed_union",
    "signed_lsh_maintenance",
    "signed_ann_maintenance",
    "signed_cluster_maintenance",
    "signed_winnow_maintenance",
    "signed_histogram_maintenance",
    "signed_quantile_maintenance",
    "signed_sessionize_maintenance",
    "signed_tfidf_maintenance",
    "signed_ivf_maintenance",
    "signed_funnel_maintenance",
    "signed_continuous_agg",
    "llm_dedup_containment",
)

# New round-9 queries: registered this round, first driver check this
# round. Each insertion here displaces the tail of RECHECK_R6 from
# the 50 slots into R10_PLAN (the assembly below does it
# programmatically — nothing is silently dropped).
NEW_THIS_ROUND: tuple[str, ...] = (
    # slowly-changing dimension: a dim-side CDF batch maintained
    # through the stored join view (refresh_dim_signed)
    "signed_continuous_agg_dim",
    # LEFT JOIN + GROUP BY maintained under retractions from one SQL
    # statement (delta-scoped outer-join fragment compiler)
    "signed_sql_outer_join_agg",
    # sessionization maintenance in the sparse-CDC regime (≤1% of
    # users touched; the fixed-Δ decade measured in SCALE.md)
    "signed_sessionize_sparse",
    # perceptual-hash (aHash) near-dup pairs over the multimodal
    # payload column — complete 4-band pigeonhole + Hamming verify
    "llm_multimodal_phash_dedup",
    # that index maintained under document edits (per-(band, doc)
    # multiplicity; only the change batch re-hashed)
    "signed_phash_maintenance",
    # stored count(DISTINCT): pair-multiplicity state tables through
    # the keyed upsert, signed refresh, derived count(*)
    "signed_continuous_count_distinct",
    # stored top-k per group: k-rows-per-group state, two-tier signed
    # repair (only boundary-threatening retractions read the base)
    "signed_continuous_topk",
    # SCD Type-2 dimension history: initialize + multi-wave CDC apply
    # (upserts, chained re-changes, deletes) + point-in-time join of
    # orders against the version in effect at order time
    "scd2_point_in_time",
    # version-count × currency histogram of that history — pins the
    # interval semantics (tombstones close coverage, never survive)
    "scd2_history_audit",
    # stored PIT-enriched fact table maintained under a dim CDC batch:
    # only the (changed key, post-change-ts) fact slice is re-joined;
    # the oracle's full recompute proves the incremental identity
    "scd2_enrich_maintenance",
    # the history as a stored table refreshed from a checkpointed CDC
    # file stream (replay-guarded foreachBatch apply); must land on
    # the one-shot recompute's answer
    "scd2_streamed_history",
    # portable KMV (bottom-k) signatures: pairwise distinct-set
    # overlap between order years — the set-intersection estimate HLL
    # structurally cannot give, with integer-exact oracle surfaces
    "sketch_kmv_overlap",
    # the register table as stored on-disk state: keyed-upsert refresh
    # writes only the registers the batch raised; summary read back
    # from disk must equal the full rebuild exactly
    "continuous_hll_ndv",
    # portable register-level HLL: md5-hex registers identical in
    # Spark and DuckDB, so approximate NDV gets an EXACT oracle row
    "sketch_hll_ndv",
    # that register table maintained incrementally: batch-only hashing
    # + max-merge == full rebuild, proven exactly by the oracle
    "delta_hll_maintenance",
)

# The 3 r5-stale queries the r8 window displaced — oldest driver rows
# in the registry (last green r5), so they outrank the r6 tranche.
DEFERRED_FROM_R8: tuple[str, ...] = (
    "streaming_tumbling_window",
    "streaming_dedup_watermarked",
    "llm_table_profile",
)

# Stale re-checks: the head of the 49-query last-driver-row-r6
# tranche, ordered to maximize regression-catch value: the TPC-H
# headliners (shared operator plumbing), the delta-SQL-frontend /
# delta-set-op family (the r8/r9 signed work touches the same parser
# and rewrite modules), llm_dedup_clusters (the r8 `weak` perf flag —
# its correctness row should be fresh while the perf question is
# open), the events battery, and the non-trivial relational queries
# (correlated subqueries, recursive CTE, exact quantiles, null-safe
# joins). The spilled queries (R10_PLAN_BASE) are single-operator
# basics — projection / filter / simple joins / set ops / simple
# windows — whose plans are frozen and locally oracle-checked every
# CI pass.
RECHECK_R6: tuple[str, ...] = (
    # Ordered so that ANY truncation point keeps every major family
    # visible in the window (test_window_covers_major_families): the
    # head interleaves TPC-H, the delta family sharing modules with
    # the r8/r9 signed work, the perf-flagged llm queries, and the
    # events battery; the pure-relational tail spills first.
    # TPC-H bench headliners (6)
    "flagship_revenue",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    # events + perf-flagged llm first (family visibility survives any
    # truncation), then the delta family sharing modules with the
    # signed work
    "events_sessionize",
    "llm_dedup_clusters",
    "delta_union",
    "delta_semi_join",
    "delta_join_null_safe",
    "delta_sql_frontend",
    # --- r10 spill boundary (moves up as NEW_THIS_ROUND grows; at
    # 15 r9-new registrations the 12 entries above fit the window) ---
    "delta_sql_semi_join",
    "delta_sql_union",
    "llm_embedding_ivf",
    "events_dedup_latest",
    "tpch_q14_promo_revenue",
    "tpch_q2_min_cost_supplier",
    "streaming_stateful_running",
    "events_sliding_window",
    "events_funnel",
    # non-trivial relational (6)
    "recursive_cte",
    "agg_quantiles",
    "join_null_safe",
    "agg_rollup",
    "topk_per_group",
    "exists_correlated",
)

# The 22 r6-stale queries this window cannot fit. Together with any
# RECHECK_R6 tail displaced by r9-new registrations (appended
# programmatically into R10_PLAN below) these MUST lead the r10
# window — alongside the then-r7-stale tranche — to restore the
# ≤3-round family-freshness invariant. Do not silently drop.
R10_PLAN_BASE: tuple[str, ...] = (
    "projection",
    "filter_pushdown",
    "filter_complex",
    "join_inner",
    "join_left_outer",
    "join_right_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_cross",
    "join_theta",
    "union_all",
    "union_distinct",
    "intersect",
    "except",
    "agg_cube",
    "agg_grouping_sets",
    "window_rank",
    "window_running",
    "window_lag_lead",
    "sort_limit",
    "distinct",
)

# The r9 window as it actually ran (50/50 green in
# CORRECTNESS_r09.json) — kept for the R10_PLAN spill computation.
R9_WINDOW: tuple[str, ...] = (
    NEVER_DRIVER_CHECKED + NEW_THIS_ROUND + DEFERRED_FROM_R8 + RECHECK_R6
)[:50]

# Queries registered AFTER the r9 window froze (the cascading
# hour→day rollup and the stored CUBE) — no driver row yet, local
# sf0.001+sf0.01 oracle green since registration. They LEAD the r10
# window, ahead of the recheck spill, exactly as the never-checked
# tranche led r9.
NEVER_DRIVER_CHECKED_R10: tuple[str, ...] = (
    "continuous_rollup_cascade",
    "signed_continuous_cube",
    # checkpoint + vacuum lifecycle over the stored CDF log
    "cdf_checkpoint_snapshot",
    # the portable Count-Min sketch: heavy-hitter point estimates +
    # the one synopsis maintainable under retraction (linear counters)
    "sketch_cms_heavy_hitters",
    "signed_cms_maintenance",
    # z-order curve math (its physical pruning is measured from real
    # parquet footers in tests/test_layout.py)
    "layout_zorder_locality",
    # broadcast-semi shuffle reduction ahead of a non-broadcastable
    # wide join (plan shape pinned; AQE runtime-bloom sibling audited)
    "join_semi_reduction",
    # z-order layout + stored file-skipping index lifecycle: the scan
    # opens only overlapping files, residual filter proves no-change
    "zonemap_pruned_scan",
    # dense hourly spine + locf fill (hypertable time_bucket_gapfill)
    "events_gapfill_locf",
    # stored CMS lifecycle: signed refresh upserts only touched
    # counters; zero-netting counters leave the state table
    "signed_continuous_cms",
    # interior-gap linear interpolation over the same dense spine
    "events_gapfill_interp",
    # FROM t VERSION AS OF n through the SQL frontend over stored
    # version history (Delta time-travel syntax parity)
    "sql_time_travel",
    # drop_chunks retention: partition-directory deletes + recorded
    # policy filtering stragglers at merge time
    "continuous_agg_retention",
    # MERGE INTO (conditional DELETE/UPDATE/INSERT *) through the DML
    # parser and staged-swap executor
    "sql_merge_into",
    # DELETE WHERE + UPDATE SET + INSERT INTO SELECT in one lifecycle
    "sql_dml_lifecycle",
    # the same DML merge-on-read: tombstone/image commits to the CDF
    # log, zero data files rewritten (deletion-vector economics)
    "dml_merge_on_read",
)

# The full committed r10 plan (executed THIS round): late-r9
# registrations first, then the RECHECK_R6 names displaced from the
# r9 window by r9-new queries, then the 22 r6-stale basics that never
# fit an earlier window. 16 + 15 + 22 = 53 names; the window takes
# the first 50, the spill leads R11_PLAN.
R10_PLAN: tuple[str, ...] = (
    NEVER_DRIVER_CHECKED_R10
    + tuple(
        n
        for n in (
            NEVER_DRIVER_CHECKED + NEW_THIS_ROUND + DEFERRED_FROM_R8 + RECHECK_R6
        )
        if n not in R9_WINDOW
    )
    + R10_PLAN_BASE
)

# The r10 window as it ran (50/50 green in CORRECTNESS_r10.json) —
# kept for the spill computation.
R10_WINDOW: tuple[str, ...] = R10_PLAN[:50]

# Queries registered during round 10 (no driver row yet; local
# sf0.001+sf0.01 oracle green since registration). They lead the r11
# window per the standing never-checked-first rotation rule. Names
# are appended here AT registration time, never before.
NEW_THIS_ROUND_R10: tuple[str, ...] = (
    # partition-pruned MERGE INTO: untouched partition directories
    # byte-identical (hash-audited in-query); write amplification
    # O(touched partitions), not O(table)
    "sql_merge_into_pruned",
    # 3-level hour→day→month rollup cascade: the month tier refreshes
    # from day partials — ≤31 rows per touched month (r9 verdict #6)
    "continuous_rollup_cascade3",
    # per-file Bloom-filter skipping index: point lookups on a
    # high-cardinality key the layout is NOT sorted by open ~1 file
    # (the zone map's blind spot); incremental refresh/sync like the
    # zone map, candidate-only driver traffic
    "bloom_pruned_lookup",
    # QUALIFY (window-predicate filter, absent from OSS Spark) via
    # textual rewrite to the identical Window → Filter plan; oracle is
    # DuckDB's NATIVE QUALIFY — dialect parity, not just result parity
    "sql_qualify_topn",
    # WITH RECURSIVE under UNION-DISTINCT semantics (native Spark 4
    # raises UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE): seminaive fixpoint
    # — frontier-only joins, null-safe seen-check, checkpointed
    # iterations — over the cyclic nation trade graph
    "sql_reachability_closure",
    # OPTIMIZE [ZORDER BY] — Delta's table-maintenance statement:
    # byte-sized compaction / z-curve layout rewrite, staged-swap;
    # content preservation oracle-checked, compaction asserted inline
    "sql_optimize_zorder",
    # generic as-of join operator (arbitrary right payload as one
    # struct, backward/forward, tolerance, left/inner) + DuckDB's
    # ASOF JOIN dialect parsed onto it; oracle is DuckDB's NATIVE
    # ASOF LEFT JOIN — dialect parity
    "sql_asof_join",
    # write-path contract: CHECK (FALSE and NULL violate) + NOT NULL
    # + ADD-CONSTRAINT-scans-history via ALTER TABLE DDL; one
    # aggregation pass per write, sidecar-persisted metadata
    "sql_check_constraints",
    # time-weighted average (hypertable time_weight, LOCF + Linear):
    # integer-cents × whole-second weights = BIGINT sums, one final
    # portable-rounded division per group — engine-exact
    "events_time_weighted",
    # TimescaleDB REAL-TIME aggregate: stored partials merged with
    # query-time tail partials — correct ahead of the refresh
    # watermark, state byte-identical (read-only audit inline)
    "continuous_agg_realtime",
    # DESCRIBE HISTORY over the CDF substrate: per-commit change-type
    # counts + checkpoint coverage + vacuum horizon, the whole audit
    # table reproduced relationally by the oracle
    "cdf_describe_history",
    # one dispatcher for the extended dialect: CTAS (body composes
    # through QUALIFY/ASOF/recursive) + COPY TO export + re-read,
    # end to end in a single statement chain
    "sql_extended_dispatch",
    # right-to-be-forgotten: a whole user cohort erased from a stored
    # aggregate via one signed CDF delete batch; the oracle proves
    # the erasure COMPLETE in the derived state (GDPR property)
    "pipeline_forget_user",
    # salted-hash 80/10/10 train/valid/test split: per-row map-side
    # assignment, stable under corpus growth (no holdout migration),
    # membership pinned by per-group doc_id checksums
    "llm_split_train_holdout",
    # deterministic hash-sharded training export: one co-location
    # shuffle, partitionBy write, audited by RE-READING the shards
    "llm_export_training_shards",
    # bucketed big-big join: both sides written bucketed on the key,
    # sort-merge join planned with ZERO Exchange (plan-audited inline)
    "join_bucketed_colocated",
    # DuckDB's simplified PIVOT statement compiled onto Spark's native
    # relational pivot; oracle is DuckDB's NATIVE statement
    "sql_pivot_statement",
    # nested UNPIVOT ( PIVOT ... ) — the statement forms compose
    # through the dispatcher; quoted-ident ON list
    "sql_unpivot_statement",
    # SELECT * EXCLUDE / REPLACE star modifiers, schema-resolved
    # projection rewrite; oracle is DuckDB's native modifiers
    "sql_select_exclude",
    # anti-entropy snapshot diff between two stored versions:
    # added/removed/changed/unchanged per key via map-side md5
    # fingerprints + ONE full-outer join; unchanged row = fingerprint
    # no-false-positive proof
    "version_table_diff",
    # RESTORE TABLE ... TO VERSION AS OF n: roll-forward repair commit
    # (multiset diff), history preserved, zero files rewritten
    "sql_restore_table",
    # MERGE WITH SCHEMA EVOLUTION: source-only columns widen the
    # target schema; survivors read NULL; pruned rewrite refused
    "sql_merge_schema_evolution",
    # resumable export: the corpus delta appends new files into
    # existing shard dirs, base files proven byte-identical, final
    # state equals a from-scratch export (the oracle)
    "llm_export_shards_incremental",
    # referential-integrity DQ audit: orphan counts + key checksums
    # for three FK edges via broadcast anti joins
    "dq_referential_audit",
    # the Arrow-blocked GEMM realization of exact cosine top-k:
    # broadcast query matrix, per-batch vectorized scoring, local
    # top-k so the shuffle carries ≤ 5·|queries| rows per batch;
    # same oracle as the expression path — identical rows
    "llm_embedding_topk_gemm",
    # deterministic global training order: portable hash sort key,
    # fixed range-cut shards, one internally-sorted file per shard —
    # a reproducible shuffled epoch (ordering pinned via raw parquet)
    "llm_export_ordered_shards",
    # hypertable first()/last() (OHLC shape) as one map-side-
    # combinable min_by/max_by agg — no window, no sort
    "events_first_last",
    # counter_agg / Prometheus-rate: reset-aware total increase via
    # one window pass, integer-cents exact
    "events_counter_agg",
    # INSERT OVERWRITE [PARTITION (...)]: static spec replaces exactly
    # one directory (untouched dirs byte-audited); dynamic mode
    # replaces only SELECT-present partitions
    "sql_insert_overwrite",
    # stored inverted index (bucket-partitioned posting lists) +
    # conjunctive search opening ONLY the terms' bucket dirs
    "text_inverted_index_search",
    # integer-exact PageRank (ranks in ppm, DIV-floored contribs):
    # an iterative numeric algorithm with a bit-exact oracle
    "graph_pagerank_trade",
    # edit-distance near-dup pairs: prefix blocking + clamped
    # levenshtein, integer-exact in both engines
    "llm_dedup_edit_distance",
    # interval union via window cummax sweep — never a self-join;
    # covered-seconds vs summed-durations distinction
    "events_interval_coalesce",
    # the train/valid/test ledger as a STORED aggregate maintained
    # under document CDC: updates cancel in counts (split is a pure
    # id hash), net only the text mass; repair is O(|Δ|)
    "signed_split_maintenance",
    # ingest-volume anomaly monitor: trailing-7-day integer
    # half/double thresholds, one agg + one ROWS-frame window
    "dq_volume_anomaly",
    # trailing-7-day NDV from MERGED daily HLL register partials:
    # register-wise max over a bounded range join — synopsis-sized
    # at any corpus size, never rescans the base
    "sketch_hll_sliding_window",
)

# The committed r11 remainder: r10-new registrations first (never
# driver-checked), then the R10_PLAN spill. Do not silently drop.
R11_PLAN: tuple[str, ...] = NEW_THIS_ROUND_R10 + R10_PLAN[50:]

# Queries registered during round 11 (no driver row yet; local
# sf0.001+sf0.01 oracle green since registration). Appended AT
# registration time, never before; they lead the r12 window per the
# standing never-checked-first rotation rule.
NEW_THIS_ROUND_R11: tuple[str, ...] = (
    # stored inverted-index posting lists maintained under document
    # CDC — per-(token, doc) net multiplicity, O(|Δ| postings) merge
    # (closes the r10 verdict's "no signed twin" gap)
    "signed_inverted_index_maintenance",
    # TimescaleDB state_agg parity: run-collapsed time-in-state per
    # (state, cohort), integer-seconds exact, one shuffle on user_id
    "events_state_agg",
    # training-mixture waterfill: integer token budget capped across
    # (lang, source) domains — all math on the |domains|-row synopsis
    "llm_mixture_budget",
    # CREATE TABLE ... SHALLOW CLONE ... VERSION AS OF n: zero-copy
    # fork (manifest-only clone root), independent divergence both
    # sides, inherited reads resolve to source commit dirs
    "sql_shallow_clone",
    # positional posting lists + exact phrase search: adjacency
    # checked from posting lists alone (pos₂ = pos₁ + 1 self-join),
    # search opens only the two terms' bucket dirs
    "text_phrase_search",
    # the positional index's signed twin: per-(token, doc, pos) net
    # multiplicity — an edit's unchanged prefix cancels exactly, only
    # the shifted tail survives; merge O(|Δ| tokens)
    "signed_phrase_index_maintenance",
    # big-big interval-overlap join via bucket expansion: equi join on
    # the time bucket (W = max interval length), exact overlap rides
    # along, pairs dedup'd by the max(start) bucket — no distinct, no
    # cartesian (plan-audited)
    "join_interval_bucketed",
    # GROUPING() flags over a CUBE with REAL NULLs in a dimension —
    # the disambiguation coalesce-to-'ALL' cannot provide
    "agg_grouping_id",
    # COPY INTO: Delta's idempotent exactly-once file ingest — a JSON
    # file-name ledger makes crash-and-rerun safe; three-run lifecycle
    # asserted (4 loaded, then 2 late files, then a 0-file no-op)
    "sql_copy_into",
    # temperature-scaled mixture quotas (τ=0.5 via integer sqrt):
    # largest-remainder integer allotment, Σquota == budget exactly;
    # up-samples small domains (flagged) — the smooth counterpart of
    # llm_mixture_budget's hard waterfill cap
    "llm_sample_temperature",
    # Delta's GENERATED-column partition pruning: a raw-date filter
    # derives the month-partition predicate from the recorded
    # generation expression and opens only overlapping directories
    "generated_column_pruning",
    # column mapping: RENAME/DROP COLUMN as O(1) metadata edits —
    # data files byte-identical across the ALTERs (asserted)
    "sql_rename_column",
    # LATERAL correlated LIMIT subquery — Catalyst decorrelates it to
    # WindowGroupLimit + one hash join (plan-audited)
    "sql_lateral_topn",
)

# Family-coverage anchors: every major family keeps at least one
# in-window representative each round (pinned by
# tests/test_registry_window.py). These three are also genuinely
# r7-stale, and llm_embedding_topk's query-batch derivation changed
# this round (the r10 `weak` fix), so its driver row must refresh
# with the change.
FAMILY_ANCHORS_R11: tuple[str, ...] = (
    "llm_embedding_topk",
    "delta_projection_filter",
    "streaming_session_window",
)

# Stalest driver-green queries (verified last-checked r7: present in
# CORRECTNESS_r07 and absent from the r8/r9/r10 windows), refreshed
# opportunistically when window slots remain after the committed plan
# + anchors + new registrations.
RECHECK_R7: tuple[str, ...] = (
    "llm_dedup_exact",
    "llm_lang_id",
    "agg_having",
    "scalar_string",
    "case_when",
    "null_handling",
    "window_distribution",
    "llm_token_count",
    "llm_quality_score",
    "pivot",
)

# ROUND 11: the committed R11_PLAN leads (39 names: the 36 r10
# registrations + 3 r6-stale spill), then the family anchors, then
# r11-new registrations, then the stalest r7 rechecks fill any
# remaining window slots. r11-new queries the 50 slots cannot hold
# lead R12_PLAN (never-checked-first).
R11_WINDOW: tuple[str, ...] = (
    R11_PLAN
    + FAMILY_ANCHORS_R11
    + NEW_THIS_ROUND_R11
    + tuple(n for n in RECHECK_R7 if n not in R11_PLAN)
)[:50]

# The committed r12 remainder: r11-new registrations not in the r11
# window lead (never driver-checked), then whatever R11_WINDOW
# displaced.
R12_PLAN: tuple[str, ...] = tuple(
    n for n in NEW_THIS_ROUND_R11 if n not in R11_WINDOW
) + tuple(
    n
    for n in FAMILY_ANCHORS_R11 + RECHECK_R7
    if n not in R11_WINDOW and n not in R11_PLAN
)

# Queries registered during round 12 (no driver row yet; local
# sf0.001+sf0.01 oracle green since registration). Appended AT
# registration time.
NEW_THIS_ROUND_R12: tuple[str, ...] = (
    # SemDeDup (arXiv:2303.09540): k-means cluster, then drop vectors
    # with a lower-id intra-cluster neighbor at cosine >= 0.4 —
    # intra-cluster pairs only (production k grows with the corpus so
    # pair volume stays O(N * cluster_size), never all-pairs)
    "llm_dedup_semantic",
    # the production dedup CHAIN composed end to end: banded
    # MinHash-LSH candidates -> edit-distance verify (DP cost bounded
    # by LSH's sub-quadratic candidate stream) -> connected-component
    # clusters — the architecture SCALE.md documented, now executable
    "llm_dedup_lsh_verified",
    # LINE-level dedup (C4 / RefinedWeb boilerplate removal): corpus-
    # global distinct-doc line frequency, strip lines past the
    # threshold — one freq shuffle + one hash equi join, BIGINT ledger
    "llm_dedup_lines",
    # DSIR data selection (arXiv:2302.03169): hashed-bigram target/raw
    # log-likelihood ratios, 1e-6-quantized to BIGINT on the 64-row
    # synopsis, then integer per-doc sums — corpus-linear, pair-free
    "llm_dsir_weights",
    # the line-frequency (boilerplate) decision state maintained under
    # document CDC: O(|Δ|) net-presence merge + threshold-crossing
    # repair — the stored boilerplate COUNT updates by pure integer
    # arithmetic (old - left + entered), never a corpus rescan
    "signed_line_dedup_maintenance",
)

# Family-coverage anchors for r12 (tests/test_registry_window.py pins
# one in-window query per major family). R12_PLAN itself covers llm_;
# the three r7-stale members below double as stale drains; the signed
# family has no r7-stale member, so its stalest (r8) row anchors it.
FAMILY_ANCHORS_R12: tuple[str, ...] = (
    "delta_cross_join",         # delta_: r7-stale
    "streaming_dedup_keys",     # streaming_: r7-stale
    "events_retention_cohort",  # events_: r7-stale
    "signed_projection_filter", # signed_: stalest (r8) in family
)

# The r7-stale backlog beyond RECHECK_R7 (computed from the
# CORRECTNESS series: present in r07, absent from every later
# window), alphabetical. 47 total r7-stale at r11 end; RECHECK_R7
# holds 10, the three r7 family anchors above hold 3, these are the
# other 34. The window tail drains as many as fit; the spill is
# committed as R13_PLAN — never silent.
RECHECK_R7_REMAINING: tuple[str, ...] = (
    "agg_stats",
    "delta_dedup_maintenance",
    "delta_join_theta",
    "delta_sql_agg_maintenance",
    "delta_sql_having",
    "delta_sql_join_agg",
    "delta_sql_rollup_hourly",
    "delta_winnow_maintenance",
    "in_subquery",
    "join_asof",
    "llm_decontaminate",
    "llm_dedup_ngram_jaccard",
    "llm_dedup_simhash",
    "llm_dedup_winnow",
    "llm_fingerprint",
    "llm_multimodal_features",
    "llm_multimodal_frames",
    "llm_multimodal_resize",
    "llm_pack_sequences",
    "llm_pii_scrub",
    "llm_pipeline_end_to_end",
    "llm_quality_repetition",
    "llm_sample_stratified",
    "llm_text_stats",
    "llm_tfidf_top_terms",
    "scalar_array",
    "scalar_date",
    "scalar_json",
    "scalar_math",
    "scalar_subquery",
    "streaming_filter_projection",
    "streaming_static_join",
    "string_agg",
    "unpivot",
)

# Registered AFTER the r12 window froze (local sf0.001+sf0.01 oracle
# green since registration); they LEAD R13_PLAN per the standing
# never-checked-first rule — like the late-r9/r10 tranches before.
LATE_R12: tuple[str, ...] = (
    # split-leakage DQ audit: LSH-candidate -> Jaccard-verified
    # near-dup pairs classified by their endpoints' salted-hash
    # splits; cross-split rows flagged (held-out docs whose near-copy
    # trains silently inflate eval) — pair volume LSH-bounded
    "llm_split_leakage_audit",
    # sliding-window long-document chunking (context C=32, stride
    # S=24): pure per-row array expressions, one summary shuffle;
    # the complementary op to llm_pack_sequences
    "llm_chunk_overlap",
    # Auto-Loader-style continuous file ingest: a checkpointed file
    # stream drains the landing dir into the versioned CDF table
    # exactly once across restarts + late files (the streaming sibling
    # of sql_copy_into's batch contract), replay-guarded foreachBatch
    "streaming_auto_loader",
)

# ROUND 12: the committed R12_PLAN leads (the 5 never-driver-checked
# r11 registrations + the 10 committed r7-stale rechecks — executing
# it makes every pre-r12 registration ever-driver-checked), then the
# r12-new registrations (never-checked), then the family anchors,
# then the r7-stale backlog fills the remaining slots alphabetically.
R12_WINDOW: tuple[str, ...] = (
    R12_PLAN
    + NEW_THIS_ROUND_R12
    + FAMILY_ANCHORS_R12
    + RECHECK_R7_REMAINING
)[:50]

# The committed r13 remainder: whatever the r12 window displaced
# (r12 registrations would lead if any spilled; none do — 15 + 5 + 4
# leaves 26 tail slots for the 34-name backlog, spilling 8).
R13_PLAN: tuple[str, ...] = LATE_R12 + tuple(
    n for n in NEW_THIS_ROUND_R12 if n not in R12_WINDOW
) + tuple(
    n
    for n in FAMILY_ANCHORS_R12 + RECHECK_R7_REMAINING
    if n not in R12_WINDOW
)

# Queries registered during round 13 (no driver row yet; local
# sf0.001+sf0.01 oracle green since registration). Appended AT
# registration time; they join the r13 window head immediately and
# any spill leads R14_PLAN.
NEW_THIS_ROUND_R13: tuple[str, ...] = (
    # star-shaped multi-join outer chain (fact LEFT JOIN dim₁ LEFT
    # JOIN dim₂ GROUP BY) maintained under retractions via
    # compile_signed_delta_scoped_chain — recompute confined to the
    # union of touched fact key-classes; closes the r12 verdict's
    # last visible signed-layer capability edge
    "signed_sql_outer_chain_agg",
    # SemDeDup ledger under embedding CDC: frozen old-state centroids,
    # per-(cell, vec_id) membership multiplicity, lowest-id-keeper
    # ledger repaired for TOUCHED cells only — the signed lifecycle
    # the other stored dedup indexes have (r12 verdict item 5)
    "signed_semdedup_maintenance",
    # BM25 ranked retrieval over stored tf posting lists: partition-
    # pruned bucket reads, df from the opened lists, 1-row corpus
    # stats broadcast, integer-micros scoring (order-independent →
    # engine-identical ranks), distributed TakeOrdered top-20
    "llm_bm25_search",
    # product quantization + ADC: 4×16-dim subspace codebooks (seeded
    # quantized Lloyd), vectors stored as 4 small codes (128×
    # compression), queries scored by broadcast (code → partial-d2)
    # lookup tables — the FAISS IVF-PQ compression half, exact oracle
    "llm_embedding_pq_adc",
    # BM25 index under document CDC: tf postings and doc lengths are
    # sign-weighted integer multiplicities (unchanged tokens cancel,
    # merge touches only changed postings); df/N/avgdl re-derive from
    # the maintained relations and the top-20 replays the quantized
    # scoring — the ranked sibling of the inverted-index maintainer
    "signed_bm25_maintenance",
    # stream-stream LEFT OUTER interval join: NULL padding withheld
    # until the joint watermark proves no late match can arrive (the
    # outer case the positive rewrite refuses, in its streaming
    # form); sentinel batches advance the watermark so the drained
    # table equals the batch LEFT JOIN oracle
    "streaming_outer_interval_join",
    # dynamic partition pruning: the dim side's broadcast result
    # becomes the fact scan's partition filter at runtime
    # (dynamicpruningexpression asserted inline) — the third pruning
    # leg next to static partition pruning and the skipping indexes
    "join_dynamic_partition_pruning",
    # BPE tokenizer training (Sennrich 2016): vocabulary-sized word-
    # frequency synopsis, per-round pair-count shuffle + portable
    # left-to-right replace() merge, fully relational argmax rounds
    "llm_bpe_train",
    # BPE application: tokenize the corpus by joining its words to the
    # trained vocabulary-sized synopsis (never re-running merges per
    # doc); per-language token/char compression stats
    "llm_bpe_tokenize",
    # materialized-view query rewrite: a stored GROUP BY aggregate
    # ANSWERS derivable queries (count/sum/min/max/avg re-aggregated
    # from partials; expression-over-key grouping; key-only filters)
    # with the base table never scanned; non-exact cases refuse
    "sql_mv_rewrite",
    # duplicate-SPAN detection (exact-substring dedup, word-granular):
    # maximal runs of >= 8 words whose every 8-gram occurs twice in
    # the corpus — the precise ranges a cleaner cuts; one combinable
    # gram-count shuffle + per-doc gaps-and-islands window
    "llm_dedup_substring",
    # that span table maintained under document CDC: gram positions
    # and per-gram counts merge as signed multiplicities (unchanged
    # prefixes cancel); spans re-islanded ONLY for affected docs
    # (batch docs + live holders of threshold-flipped grams)
    "signed_dupspan_maintenance",
    # JOIN-backed materialized-view rewrite: a candidate over the
    # SAME join fragment (normalized token-exact match) is served by
    # re-aggregating stored partials with neither base table scanned;
    # reversed join order and non-key filters refuse
    "sql_mv_rewrite_join",
    # the CUT half of exact-substring dedup: duplicated spans removed
    # from every doc, cleaned corpus certified by per-doc md5; the cut
    # is a doc-id-equi-keyed anti join of word positions vs span
    # ranges — document-bounded, never a corpus-wide interval join
    "llm_substring_clean",
    # Gopher-style discrete quality-rule battery (word count, mean
    # word length, alpha fraction, stopword presence + AND verdict);
    # integer-only comparisons, expression-only over one scan
    "llm_gopher_rules",
    # triangle count over the part co-purchase graph: order-keyed
    # edge generation (≤21 pairs/order), DEGREE-ORIENTED wedge join
    # (O(m^1.5), hub-safe), id-ordered oracle counts the same set
    "graph_triangle_count",
    # FILTERED materialized-view rewrite: candidate WHERE must imply
    # the view's (every view conjunct token-identical; residual
    # key-only, applied to stored rows); weaker candidates refuse
    "sql_mv_rewrite_filtered",
    # triangle count maintained under lineitem CDC: per-edge support
    # multiplicity (signed merge; price-only updates cancel), delta
    # via tri(new)−tri(old) = T_new(added) − T_old(removed) with
    # wedges anchored on the flipped edges — batch-proportional
    "signed_triangle_maintenance",
    # SNOWFLAKE multi-join chain maintained under retractions on all
    # three tables: Δcustomer folds through orders' old ∪ new images
    # to fact key-classes (chain compiler parent-row fold); null-safe
    # snowflake joins refuse loudly
    "signed_sql_snowflake_chain_agg",
    # prefix-filtered COMPLETE Jaccard ≥ 0.7 join (PPJoin family):
    # rarity-ordered prefixes guarantee every qualifying pair shares
    # a prefix shingle, no hot-shingle cap; the oracle generates
    # candidates brute-force, so green proves completeness
    "llm_dedup_prefix_filter",
    # triangle maintenance in the SPARSE-CDC regime (~2% of lines):
    # the registered dense spec stresses correctness; this pins the
    # scoped economics of a bounded batch (sessionize-sparse pattern)
    "signed_triangle_sparse",
    # maintenance ∘ rewrite composed: a ContinuousAggregate state
    # refreshed under the signed CDC batch exports its finals as the
    # MV store, and the matcher answers a coarser filtered query from
    # the MAINTAINED store — base table never scanned
    "sql_mv_rewrite_maintained",
)

# Family-coverage anchors for r13 (tests/test_registry_window.py pins
# one in-window query per major family). R13_PLAN itself covers llm_
# (llm_split_leakage_audit, llm_chunk_overlap) and streaming_
# (streaming_auto_loader + two rechecks); the three members below
# cover delta_/signed_/events_ and double as r8-stale drains —
# delta_join is §2.1 row 6's only direct executor (verdict item 2).
FAMILY_ANCHORS_R13: tuple[str, ...] = (
    "delta_join",              # delta_: r8-stale, §2.1 row 6 executor
    "signed_agg_maintenance",  # signed_: stalest (r8) in family
    "events_tumbling_window",  # events_: r8-stale
)

# The r12 verdict named five r8-stale rows as the drain priority;
# delta_join / signed_agg_maintenance serve as anchors above, these
# are the other three — they drain ahead of the alphabetical backlog.
RECHECK_R8_PRIORITY: tuple[str, ...] = (
    "signed_count_distinct",
    "delta_agg_maintenance",
    "delta_composite",
)

# The r8-stale backlog beyond the anchors/priority names (computed
# from the CORRECTNESS series: last green row r08), alphabetical.
# 49 total r8-stale at r12 end; anchors hold 3, priority holds 3,
# these are the other 43. The window tail drains as many as fit; the
# spill is committed as R14_PLAN — never silent.
RECHECK_R8_REMAINING: tuple[str, ...] = (
    "agg_salted_skew",
    "delta_histogram_maintenance",
    "delta_lsh_maintenance",
    "delta_ndv_maintenance",
    "delta_rollup_hourly",
    "delta_sql_count_distinct",
    "delta_sql_join_count_distinct",
    "delta_topk_maintenance",
    "join_range",
    "join_salted_skew",
    "llm_corpus_funnel",
    "llm_dedup_embedding",
    "llm_dedup_minhash_lsh",
    "llm_dedup_simhash_pairs",
    "llm_embedding_ann_lsh",
    "llm_metadata_audit",
    "llm_ngram_lm_score",
    "llm_sample_diverse",
    "llm_semantic_kmeans",
    "signed_join",
    "signed_minmax",
    "signed_outer_join",
    "signed_sql_frontend",
    "streaming_interval_join",
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
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "udaf_median_chars",
    "udf_pandas_word_count",
    "udtf_tokens",
    "window_range_frame",
)

# ROUND 13: the committed R13_PLAN leads (3 never-driver-checked
# late-r12 registrations + the 8 r7-stale rechecks — executing it
# ends r7 staleness and makes every pre-r13 registration
# ever-driver-checked), then r13-new registrations (never-checked),
# then the family anchors, the verdict-priority r8 rechecks, and the
# alphabetical r8-stale backlog fills the remaining slots.
R13_WINDOW: tuple[str, ...] = (
    R13_PLAN
    + NEW_THIS_ROUND_R13
    + FAMILY_ANCHORS_R13
    + RECHECK_R8_PRIORITY
    + RECHECK_R8_REMAINING
)[:50]

# The committed r14 remainder: whatever the r13 window displaced
# (r13 registrations lead if any spill; with 11 + len(new) + 3 + 3 at
# the head, 33 - len(new) tail slots hold the 43-name backlog).
R14_PLAN: tuple[str, ...] = tuple(
    n for n in NEW_THIS_ROUND_R13 if n not in R13_WINDOW
) + tuple(
    n
    for n in FAMILY_ANCHORS_R13 + RECHECK_R8_PRIORITY + RECHECK_R8_REMAINING
    if n not in R13_WINDOW
)

# Queries registered during round 14 (no driver row yet; local
# sf0.001+sf0.01 oracle green since registration). Appended AT
# registration time; they fill the window tail behind R14_PLAN and
# the anchors, and any spill leads R15_PLAN. With 8 registrations
# the composition is 32 plan + 2 anchors + 8 new + 10 recheck = 52,
# truncated to 50 by [:50]: the LAST TWO RECHECK_R9_HEAD names
# (signed_continuous_agg, streaming_dedup_watermarked) were dropped
# by the truncation and stayed r9-stale — both lead RECHECK_R9_ALL
# in the r15 window below. (r14 ADVICE item: the old comment claimed
# 32 + 2 + 16 = 50; the real arithmetic is recorded here.)
NEW_THIS_ROUND_R14: tuple[str, ...] = (
    # MV rewrite with deterministic join canonicalization: the SAME
    # 3-table inner equi-join written in a different order / under
    # aliases still serves from the store; a genuinely different join
    # refuses (r13 verdict item 6)
    "sql_mv_rewrite_reordered",
    # triangle maintainer reading its per-edge support state from a
    # PERSISTED parquet ledger (built once per fixture) — the bench
    # now measures the true O(Δ) repair cost, not the stand-in rebuild
    "signed_triangle_stored",
    # SemDeDup maintenance against persisted centroids + assignment +
    # keeper-ledger tables: no corpus k-means/assignment/ledger
    # recompute per run — the stored sibling of the r13 maintainer
    "signed_semdedup_stored",
    # BM25 maintenance reading persisted postings + doc-length tables:
    # the per-run cost is the O(Δ) posting merge + re-rank, never a
    # corpus re-tokenize
    "signed_bm25_stored",
    # dup-span maintenance reading persisted gram positions, gram
    # counts, and the stored span table: per-run cost is the batch
    # merge + flipped-gram scoped re-islanding
    "signed_dupspan_stored",
    # IVF-PQ composed (the FAISS ANN shape): Voronoi cells prune the
    # scan to n_probe/n_cells, PQ codes compress it (ADC scoring,
    # raw vectors never touched) — exact oracle, raw-vector codes
    # (not residuals) keep the composition associative
    "llm_embedding_ivf_pq",
    # PQ code tables maintained under embedding CDC: frozen per-
    # subspace codebooks, Δ-only broadcast-argmin re-encode, signed
    # (subspace, code, vec_id) membership merge — the maintenance leg
    # of the IVF-PQ lifecycle
    "signed_pq_maintenance",
    # MV rewrite whose candidate WHERE carries BETWEEN on the view key:
    # the conjunct splitter is BETWEEN-aware and the residual applies
    # to stored rows; CASE-bearing WHEREs refuse by returning None —
    # regression surface for the r13 advice bug
    "sql_mv_rewrite_between",
)

# Family-coverage anchors for r14 (tests/test_registry_window.py pins
# one in-window query per major family). R14_PLAN itself covers llm_
# (8 names), signed_ (4) and streaming_ (streaming_interval_join);
# the two members below cover delta_/events_ and double as the
# stalest (r9) rows in their families.
FAMILY_ANCHORS_R14: tuple[str, ...] = (
    "delta_union",        # delta_: stalest in family (r9), §2.1 row 7 executor
    "events_sessionize",  # events_: stalest in family (r9)
)

# Opportunistic tail fill: r14 registrations stopped at 6, so the
# window's remaining slots drain the STALEST r9 rows instead of
# falling through to registry order — 6 TPC-H headliners + the
# entry-point flagship + one high-value name per family. These are
# rechecks (all r9-green), so any future-registration spill hits
# them, never a never-checked name.
RECHECK_R9_HEAD: tuple[str, ...] = (
    "flagship_revenue",          # the __spark_entry__ flagship
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "scd2_streamed_history",     # named in the r13 verdict item 3
    "delta_sql_frontend",        # §2.1 SQL round-trip surface
    "signed_continuous_agg",     # continuous-aggregate family head
    "streaming_dedup_watermarked",
)

# ROUND 14: the committed R14_PLAN leads (the 32 r8-stale rechecks
# the r13 window displaced — executing it ends ALL rotation
# staleness; from r15 on rotation is pure steady-state), then the
# family anchors, then r14-new registrations, then the r9-stale
# recheck head fills the tail.
R14_WINDOW: tuple[str, ...] = (
    R14_PLAN + FAMILY_ANCHORS_R14 + NEW_THIS_ROUND_R14 + RECHECK_R9_HEAD
)[:50]

# The committed r15 remainder: never-checked r14 registrations and
# anchors that spilled (none at the 6-registration close; the r9
# recheck tail is opportunistic fill, not debt — the rotation report
# tracks the remaining r9 rows either way).
R15_PLAN: tuple[str, ...] = tuple(
    n for n in FAMILY_ANCHORS_R14 + NEW_THIS_ROUND_R14 if n not in R14_WINDOW
)

# ---------------------------------------------------------------------------
# ROUND 15 rotation.
#
# R15_PLAN above is empty (no r14 spill), so the committed r15 lead is
# the ENTIRE remaining r9-stale tranche: the 40 rows whose latest
# driver row is CORRECTNESS_r09 (recomputed from the committed series
# by tools/rotation_report.py at the r15 open; verified set-equal to
# the r14 verdict's list). Executing all 40 raises the registry-wide
# staleness floor from r9 to r10. The two names the r14 [:50]
# truncation dropped (signed_continuous_agg, streaming_dedup_watermarked)
# lead the tranche.
RECHECK_R9_ALL: tuple[str, ...] = (
    "signed_continuous_agg",
    "streaming_dedup_watermarked",
    "continuous_hll_ndv",
    "delta_hll_maintenance",
    "delta_join_null_safe",
    "delta_semi_join",
    "llm_dedup_clusters",
    "llm_dedup_containment",
    "llm_multimodal_phash_dedup",
    "llm_table_profile",
    "scd2_enrich_maintenance",
    "scd2_history_audit",
    "scd2_point_in_time",
    "signed_ann_maintenance",
    "signed_cluster_maintenance",
    "signed_continuous_agg_dim",
    "signed_continuous_count_distinct",
    "signed_continuous_topk",
    "signed_cross_join",
    "signed_dedup_maintenance",
    "signed_funnel_maintenance",
    "signed_histogram_maintenance",
    "signed_ivf_maintenance",
    "signed_join_agg",
    "signed_lsh_maintenance",
    "signed_phash_maintenance",
    "signed_quantile_maintenance",
    "signed_semi_join",
    "signed_sessionize_maintenance",
    "signed_sessionize_sparse",
    "signed_sql_agg",
    "signed_sql_join_agg",
    "signed_sql_outer_join_agg",
    "signed_tfidf_maintenance",
    "signed_topk",
    "signed_union",
    "signed_winnow_maintenance",
    "sketch_hll_ndv",
    "sketch_kmv_overlap",
    "streaming_tumbling_window",
)

# Family anchor for r15: RECHECK_R9_ALL already covers llm_/delta_/
# streaming_/signed_ (plus scd2_/sketch_/continuous_); events_ is the
# one mandatory family with no member in the tranche, and
# events_dedup_latest is its stalest row (r10).
FAMILY_ANCHORS_R15: tuple[str, ...] = ("events_dedup_latest",)

# Queries registered during round 15 (no driver row yet; local
# sf0.001+sf0.01 oracle green since registration). Appended AT
# registration time; capped at 9 so the full r9 drain (40) + anchor
# (1) always fit: 40 + 1 + 9 = 50 with zero recheck-tail slots left.
NEW_THIS_ROUND_R15: tuple[str, ...] = (
    # PQ maintenance against PERSISTED codebooks + code table (the
    # stored twin of signed_pq_maintenance — r14 verdict item 3): the
    # per-run cost is the Δ-only broadcast-argmin re-encode + signed
    # membership merge; the corpus k-means the stand-in re-paid every
    # run is now a one-time _stored_state build
    "signed_pq_stored",
    # the remaining stand-in maintainers' stored twins (r14 verdict
    # item 6): each reads its index relation from a _stored_state
    # parquet table, so the per-run cost is the Δ-only merge — the
    # corpus re-tokenize/re-shingle the stand-ins re-paid every run
    # is now a one-time build
    "signed_tfidf_stored",
    "signed_inverted_stored",
    "signed_phrase_stored",
    "signed_line_dedup_stored",
    # hybrid retrieval (the RAG-serving shape): dense cosine top-20 +
    # lexical shingle-Jaccard top-20 fused by Reciprocal Rank Fusion
    # in integer micros — both legs bounded-query-batch, the lexical
    # candidates indexed on the shingle key, fusion O(queries · 40)
    "llm_hybrid_retrieval_rrf",
    # the maintained session TABLE against persisted state under the
    # sparse CDC spec: touched users re-sessionize, everyone else's
    # stored sessions anti-join through — the repair cost is the
    # touched slice, and the emitted state lets the oracle be plain
    # post-CDC sessionization
    "signed_sessionize_stored",
    # SemDeDup confinement made measurable (the r14 verdict's honest
    # caveat): ~0.3% of vectors change against K=64 frozen cells, so
    # the touched-cell semi join confines the pair repair and the
    # stored ledger's anti join carries the rest — the regime the
    # dense K=8 spec structurally could not show
    "signed_semdedup_sparse",
    # metadata-FILTERED vector search (the vector-store feature the
    # unfiltered top-k family lacked): pre-filter semantics — the
    # predicate prunes the corpus BEFORE scoring via broadcast semi
    # join, so the scan is O(passing · queries), never rank-then-drop
    "llm_embedding_filtered_topk",
)

# Opportunistic tail fill: for every r15 registration SHORT of the
# 9-cap, one slot falls to the stalest r10 rows (family heads first).
# These are rechecks (all r10-green), so the [:50] truncation below
# drops from THIS list only — never a never-checked name.
# R15 CLOSE NOTE: registrations reached the 9-cap, so 40 + 1 + 9 = 50
# exactly and ALL NINE names below were dropped by the truncation —
# they stay r10-stale and lead the r16 recheck pool (the rotation
# report recomputes the full r10 tranche either way).
RECHECK_R10_HEAD: tuple[str, ...] = (
    "events_funnel",              # events_ #2-stalest
    "tpch_q14_promo_revenue",     # tpch_ stalest
    "tpch_q2_min_cost_supplier",  # tpch_ #2-stalest
    "sql_dml_lifecycle",          # sql_ stalest
    "sql_merge_into",             # sql_ #2-stalest
    "join_anti",                  # join_ stalest
    "agg_cube",                   # agg_ stalest
    "window_rank",                # window_ stalest
    "union_all",                  # set-op stalest
)

# ROUND 15: the committed r9 drain leads (all 40 — executing it ends
# r9 staleness and lifts the floor to r10), then the events_ anchor,
# then r15-new registrations, then the r10 recheck head fills what
# remains of the 50 slots.
R15_WINDOW: tuple[str, ...] = (
    RECHECK_R9_ALL + FAMILY_ANCHORS_R15 + NEW_THIS_ROUND_R15 + RECHECK_R10_HEAD
)[:50]

# The committed r16 remainder: never-checked r15 registrations and
# anchors that spilled (none unless registrations exceed the 9-cap).
R16_PLAN: tuple[str, ...] = tuple(
    n for n in FAMILY_ANCHORS_R15 + NEW_THIS_ROUND_R15 if n not in R15_WINDOW
)

# ---------------------------------------------------------------------------
# ROUND 16 rotation.
#
# R16_PLAN above is empty (no r15 spill), so the committed r16 lead is
# the ENTIRE remaining r10-stale tranche: the 49 rows whose latest
# driver row is CORRECTNESS_r10 (recomputed from the committed series
# by tools/rotation_report.py at the r16 open; the r15 verdict's list
# verified set-equal). Executing all 49 raises the registry-wide
# staleness floor from r10 to r11. The nine names the r15 [:50]
# truncation dropped (RECHECK_R10_HEAD, recorded at the r15 close)
# lead the tranche; the remaining 40 follow alphabetically.
RECHECK_R10_ALL: tuple[str, ...] = RECHECK_R10_HEAD + (
    "agg_grouping_sets",
    "agg_quantiles",
    "agg_rollup",
    "cdf_checkpoint_snapshot",
    "continuous_agg_retention",
    "continuous_rollup_cascade",
    "delta_sql_semi_join",
    "delta_sql_union",
    "dml_merge_on_read",
    "events_gapfill_interp",
    "events_gapfill_locf",
    "events_sliding_window",
    "except",
    "exists_correlated",
    "filter_complex",
    "filter_pushdown",
    "intersect",
    "join_cross",
    "join_full_outer",
    "join_inner",
    "join_left_outer",
    "join_null_safe",
    "join_right_outer",
    "join_semi",
    "join_semi_reduction",
    "join_theta",
    "layout_zorder_locality",
    "llm_embedding_ivf",
    "projection",
    "recursive_cte",
    "signed_cms_maintenance",
    "signed_continuous_cms",
    "signed_continuous_cube",
    "sketch_cms_heavy_hitters",
    "sql_time_travel",
    "streaming_stateful_running",
    "topk_per_group",
    "union_distinct",
    "window_running",
    "zonemap_pruned_scan",
)

# No family anchor needed this round: the r10 tranche itself covers
# every mandatory family (llm_embedding_ivf, delta_sql_semi_join,
# streaming_stateful_running, signed_cms_maintenance, events_funnel).
FAMILY_ANCHORS_R16: tuple[str, ...] = ()

# Queries registered during round 16 (no driver row yet; local
# sf0.001+sf0.01 oracle green since registration). Capped at ONE —
# the r15 verdict's cadence call: 49 stale rows + 1 registration fill
# the 50 slots exactly, so anything more would either spill a
# never-checked name or push staleness past the 6-round cycle.
NEW_THIS_ROUND_R16: tuple[str, ...] = (
    # the filtered-ANN composition (r15 verdict's one named slot):
    # metadata pre-filter semantics INSIDE the IVF probe — the
    # predicate prunes candidates via left-semi before pair scoring,
    # the probe prunes cells, both audited in one plan
    "llm_embedding_filtered_ivf",
)

# ROUND 16: the full r10 drain leads (executing it lifts the floor to
# r11), the single r16 registration closes the window at exactly 50.
# Nothing truncates: 49 + 0 + 1 = 50.
R16_WINDOW: tuple[str, ...] = (
    RECHECK_R10_ALL + FAMILY_ANCHORS_R16 + NEW_THIS_ROUND_R16
)[:50]

# The committed r17 remainder: never-checked r16 registrations and
# anchors that spilled (none at the 1-registration cap).
R17_PLAN: tuple[str, ...] = tuple(
    n for n in FAMILY_ANCHORS_R16 + NEW_THIS_ROUND_R16 if n not in R16_WINDOW
)

# Built + oracled + tested in r16; REGISTERED at the r17 open (the
# r16 window had no room beyond the 1-cap): the stored twins closing
# the r15 verdict's stand-in list, merged from the since-deleted
# pending surface into signed_queries.queries_and_oracles. Each
# leads the r17 window below. The fifth built twin
# (signed_winnow_stored) measured SLOWER than its recompute sibling
# at sf0.1 (1.70 vs 1.28 s quiet A/B — SCALE.md round-16 notes) and
# stays unregistered per the r15 triangle-indexed precedent; its
# code + tests remain as the documented negative
# (tests/test_pending_parity.py).
R17_REGISTRATION_CANDIDATES: tuple[str, ...] = (
    "signed_cluster_stored",   # 5.46 vs 6.78 s (1.24×)
    "signed_ivf_stored",       # 0.86 vs 1.76 s (2.0×)
    "signed_ann_stored",       # 0.71 vs 0.82 s (marginal; plan-shape)
    "signed_lsh_stored",       # 1.39 vs 1.39 s (plan-shape only)
)

# ---------------------------------------------------------------------------
# ROUND 17 rotation.
#
# Executed exactly as frozen at the r16 close: after CORRECTNESS_r16
# the staleness distribution is {r11: 50, r12: 50, ...} (re-verified
# at the r17 open with tools/rotation_report.py — set-equal to the
# list below). The four r16-built stored twins were registered at the
# open (never-checked leads); the _spec_fingerprint migration for the
# r14/r15 twins also landed at the open so states rebuilt once before
# any timed run.
#
# The r11-stale tranche (50 rows; the r16 window touches none of it).
RECHECK_R11_ALL: tuple[str, ...] = (
    "agg_grouping_id",
    "bloom_pruned_lookup",
    "cdf_describe_history",
    "continuous_agg_realtime",
    "continuous_rollup_cascade3",
    "delta_projection_filter",
    "distinct",
    "dq_referential_audit",
    "dq_volume_anomaly",
    "events_counter_agg",
    "events_first_last",
    "events_interval_coalesce",
    "events_state_agg",
    "events_time_weighted",
    "graph_pagerank_trade",
    "join_bucketed_colocated",
    "join_interval_bucketed",
    "llm_dedup_edit_distance",
    "llm_embedding_topk",
    "llm_embedding_topk_gemm",
    "llm_export_ordered_shards",
    "llm_export_shards_incremental",
    "llm_export_training_shards",
    "llm_mixture_budget",
    "llm_split_train_holdout",
    "pipeline_forget_user",
    "signed_inverted_index_maintenance",
    "signed_phrase_index_maintenance",
    "signed_split_maintenance",
    "sketch_hll_sliding_window",
    "sort_limit",
    "sql_asof_join",
    "sql_check_constraints",
    "sql_extended_dispatch",
    "sql_insert_overwrite",
    "sql_merge_into_pruned",
    "sql_merge_schema_evolution",
    "sql_optimize_zorder",
    "sql_pivot_statement",
    "sql_qualify_topn",
    "sql_reachability_closure",
    "sql_restore_table",
    "sql_select_exclude",
    "sql_shallow_clone",
    "sql_unpivot_statement",
    "streaming_session_window",
    "text_inverted_index_search",
    "text_phrase_search",
    "version_table_diff",
    "window_lag_lead",
)

# The (4 merges + 1 registration) + 45 = 50 arithmetic forces 5
# recheck drops. Per the frozen plan: single-op basics with many
# same-family rows staying in-window (the fifth, sql_pivot_statement,
# pairs with its unpivot sibling already in the head). These stay
# r11-stale and LEAD the r18 recheck pool (the RECHECK_R10_HEAD
# pattern) — the r18 window is these five + the 50 r12-stale rows,
# minus whatever room r18 registrations need.
RECHECK_R11_DROPS: tuple[str, ...] = (
    "distinct",
    "sort_limit",
    "sql_select_exclude",
    "sql_unpivot_statement",
    "sql_pivot_statement",
)

# Queries registered DURING round 17 beyond the four open-of-round
# merges (cadence cap: ≤1). The r16 verdict's named best candidate:
# the stored IVF-PQ twin composing signed_ivf_stored's cell state
# with signed_pq_stored's codebook/code state — the one index family
# whose maintained composition wasn't yet a registered row. It reads
# the SAME persisted tables the two parents maintain (shared state
# names + fingerprint), so it adds no new corpus-sized build.
NEW_THIS_ROUND_R17: tuple[str, ...] = (
    "signed_ivfpq_stored",
)

# ROUND 17: the five never-checked rows first (a registered query
# must get its driver row the same round — never-checked stays 0),
# then the r11 drain minus the five recorded drops:
# 4 + 1 + 45 = 50 exactly.
R17_WINDOW: tuple[str, ...] = (
    R17_REGISTRATION_CANDIDATES
    + NEW_THIS_ROUND_R17
    + tuple(n for n in RECHECK_R11_ALL if n not in RECHECK_R11_DROPS)
)[:50]

# The committed r18 remainder: never-checked r17 registrations that
# spilled (none — the five never-checked rows head the window by
# construction and 4 + 1 + 45 = 50 leaves no truncation).
R18_PLAN: tuple[str, ...] = tuple(
    n
    for n in R17_REGISTRATION_CANDIDATES + NEW_THIS_ROUND_R17
    if n not in R17_WINDOW
)

# ---------------------------------------------------------------------------
# ROUND 18 rotation (optimization round — NO new registrations; the
# window is pure stale drain).
#
# After CORRECTNESS_r17 the staleness distribution is {r11: 5 (the
# recorded drops), r12: 50, r13..r17: 50 each} — re-verified at the
# r18 open with tools/rotation_report.py. Per the plan the r17 close
# froze: the five r11 drops LEAD the window (the RECHECK_R10_HEAD
# pattern), the r12-stale tranche fills the remainder minus five
# recorded drops.
#
# The r12-stale tranche (50 rows; set-equal to the committed
# CORRECTNESS series' r12 latest-check set, pinned by
# tests/test_registry_window.py).
RECHECK_R12_ALL: tuple[str, ...] = (
    "agg_having",
    "agg_stats",
    "case_when",
    "delta_cross_join",
    "delta_dedup_maintenance",
    "delta_join_theta",
    "delta_sql_agg_maintenance",
    "delta_sql_having",
    "delta_sql_join_agg",
    "delta_sql_rollup_hourly",
    "delta_winnow_maintenance",
    "events_retention_cohort",
    "generated_column_pruning",
    "in_subquery",
    "join_asof",
    "llm_decontaminate",
    "llm_dedup_exact",
    "llm_dedup_lines",
    "llm_dedup_lsh_verified",
    "llm_dedup_ngram_jaccard",
    "llm_dedup_semantic",
    "llm_dedup_simhash",
    "llm_dedup_winnow",
    "llm_dsir_weights",
    "llm_fingerprint",
    "llm_lang_id",
    "llm_multimodal_features",
    "llm_multimodal_frames",
    "llm_multimodal_resize",
    "llm_pack_sequences",
    "llm_pii_scrub",
    "llm_pipeline_end_to_end",
    "llm_quality_repetition",
    "llm_quality_score",
    "llm_sample_stratified",
    "llm_sample_temperature",
    "llm_text_stats",
    "llm_tfidf_top_terms",
    "llm_token_count",
    "null_handling",
    "pivot",
    "scalar_array",
    "scalar_string",
    "signed_line_dedup_maintenance",
    "signed_projection_filter",
    "sql_copy_into",
    "sql_lateral_topn",
    "sql_rename_column",
    "streaming_dedup_keys",
    "window_distribution",
)

# The (5 r11 leads) + 50 = 55 arithmetic forces five recheck drops.
# Per the house pattern: single-op relational basics with same-family
# rows staying in-window — agg_stats stays for agg_having,
# scalar_string for scalar_array, in_subquery for case_when (predicate
# basics), delta_sql_having keeps HAVING covered, and pivot pairs with
# sql_pivot_statement which LEADS this window from the r11 drops.
# These five stay r12-stale and lead the r19 recheck pool.
RECHECK_R12_DROPS: tuple[str, ...] = (
    "agg_having",
    "case_when",
    "null_handling",
    "pivot",
    "scalar_array",
)

# ROUND 18: the five r11-stale drops lead (stalest rows first), then
# the r12 drain minus the recorded drops: 5 + 45 = 50 exactly.
R18_WINDOW: tuple[str, ...] = (
    RECHECK_R11_DROPS
    + tuple(n for n in RECHECK_R12_ALL if n not in RECHECK_R12_DROPS)
)[:50]

# The committed r19 remainder: the five r12-stale drops lead the r19
# recheck pool (no r18 registrations — optimization round, no new
# features).
R19_PLAN: tuple[str, ...] = RECHECK_R12_DROPS

# ROUND 18: the committed plan is the window. The standing invariant
# (tests/test_registry_window.py::test_window_is_not_an_already_
# executed_one) makes an unflipped window fail the suite at the next
# round's open: DRIVER_WINDOW_PRIORITY may never equal a window an
# already-COMMITTED CORRECTNESS file records as executed.
DRIVER_WINDOW_PRIORITY: tuple[str, ...] = R18_WINDOW


def registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """All (queries, oracles) across operator modules."""
    from . import (
        curation,
        delta_queries,
        llm_pipeline,
        relational,
        scale_patterns,
        scd,
        signed_queries,
        sketch_queries,
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
        scd,
        delta_queries,
        sketch_queries,
        signed_queries,
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
