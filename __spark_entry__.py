"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over skinnerdb_spark.registry — every implemented operator from
SURVEY.md §2 (plus the beyond-reference pipeline tier) registers a Spark
implementation and, where SQL-expressible, a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from skinnerdb_spark.registry import all_specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H q03 shape —
    3-way join + group + order/limit, the full NONE->GROUPS pipeline of the
    reference's query lifecycle (SURVEY §3.1)."""
    specs = all_specs()
    return specs["tpch_q03"].spark(spark, "/root/testdata/sf0.001")


#: everything the driver's correctness gate sampled in rounds 1-8 (the union
#: of CORRECTNESS_r01..r08 keys — 198/198 registry entries green cumulatively
#: as of r8, rcte_order_chains re-green after the r9 DOUBLE-cast fix). The
#: gate takes the FIRST 50 queries() entries, so already-green entries rotate
#: to the back and any newly added entries get hard driver rows. The staples
#: keep full local coverage in tests/test_oracle.py.
_R12345678_SAMPLED = frozenset(
    ["adaptive_star_join", "setop_union", "setop_intersect_except",
     "window_rank_topn", "window_running_sum", "rollup_agg", "stats_agg",
     "median_manual", "distinct_agg", "edge_empty_and_null_aggs", "cube_agg",
     "window_rank_lag", "approx_distinct_sketch", "cte_query", "job_star_min",
     "job_snowflake_or", "job_double_like", "job_theta_join", "job_wide_star",
     "job_chain_dates", "scalar_surface", "scalar_interval_arith",
     "scalar_null_ordering", "scalar_math", "scalar_string", "scalar_datetime",
     "grouping_sets_agg", "null_join_semantics", "subq_in_semijoin",
     "subq_not_in_antijoin", "subq_not_in_null_trap", "subq_scalar_compare",
     "subq_from_derived",
     # r4 sample
     "sim_bruteforce_topk", "sim_lsh_buckets", "sim_lsh_ann",
     "sim_lsh_multiprobe", "dedup_embed_cosine", "events_json_extract",
     "sample_class_balanced", "docs_source_mix", "knn_label_vote",
     "ev_gap_fill", "pivot_status_by_priority", "unpivot_part_attrs",
     "dedup_exact", "dedup_norm_prefix", "dedup_minhash_lsh",
     "dedup_pipeline_decisions", "dedup_simhash", "dedup_ngram_jaccard",
     "dedup_clusters", "multimodal_features", "text_chunking",
     "sample_stratified", "contamination_check", "pack_sequences",
     "embed_quantize", "asof_latest_order", "range_join_ship_window",
     "text_stats", "text_quality", "text_langid", "text_regex_tokens",
     "text_fingerprint", "text_repetition", "docs_length_quantiles",
     "ev_tumbling_hour", "ev_sliding_2h", "ev_sessionization",
     "ev_rollup_merge", "ev_user_activity", "window_frames",
     "outer_join_full", "outer_join_on_filter", "lateral_top1_order"]
    + [f"job_v{i:02d}" for i in range(1, 10)]
    + [f"tpch_q{i:02d}" for i in (1, 2, 3, 4, 5, 6, 7, 8, 9, 13, 15, 16, 21, 22)]
    # r5 sample (CORRECTNESS_r05: 50/50 hash-green)
    + ["binary_ingest_manifest", "dedup_containment", "dedup_prefix_filter",
       "dedup_segments", "dedup_simhash_pairs", "docs_bm25_topk",
       "docs_curation_gate", "docs_embedding_profile", "docs_merge_upsert",
       "docs_snapshot_diff", "docs_vocab_stats", "ev_anomaly_hours",
       "ev_attribution_join", "ev_event_transitions", "ev_funnel_conversion",
       "ev_retention_cohorts", "ev_session_paths", "ev_skew_salted_agg",
       "ev_state_history", "ev_stream_dedup", "ev_value_histogram",
       "graph_pagerank", "graph_triangles", "job_deep15", "job_deep17",
       "multimodal_frame_sample", "multimodal_resize_plan",
       "name_edit_distance_pairs", "orders_equidepth_hist", "profile_table",
       "sample_leakage_free_split", "sample_source_target_mix",
       "scalar_higher_order", "sim_ivf_ann", "sim_ivfpq_ann", "sim_pq_ann",
       "stats_join_size", "stats_linear_fit", "text_pii_redact",
       "text_quality_lr", "text_tfidf_topk",
       "tpch_q10", "tpch_q11", "tpch_q12", "tpch_q14", "tpch_q17",
       "tpch_q18", "tpch_q19", "tpch_q20"]
    # r6 sample (CORRECTNESS_r06: 50/50 hash-green)
    + ["multimodal_decode_stats", "text_token_ids", "setop_bag_semantics",
       "embed_norm_qa", "embed_kmeans", "text_bpe_merges",
       "docs_bigram_lm_score", "embed_power_iteration", "docs_pmi_topk",
       "graph_jaccard_links", "orders_skyline", "ev_heavy_hitters"]
    # r7 sample (CORRECTNESS_r07: 50/50 hash-green)
    + ["multimodal_jpeg_roundtrip", "multimodal_audio_features",
       "multimodal_video_frames", "wcoj_triangle_listing", "wcoj_clique4",
       "multimodal_webp_roundtrip", "dedup_verbatim_spans",
       "sample_temperature_mix", "multimodal_gif_roundtrip", "dedup_semantic",
       "docs_gopher_quality", "docs_lexical_diversity", "docs_dsir_weights",
       "ev_winsorize", "docs_ccnet_buckets", "ev_rate_limit",
       "dedup_incremental", "ev_countmin_sketch"]
    # r8 sample (CORRECTNESS_r08: 49/50 hash-green; the one red,
    # rcte_order_chains, is fixed in r9 and rotates forward via _REVERIFY)
    + ["asof_first_shipment", "docs_html_extract", "docs_hybrid_rrf",
       "docs_inverted_index", "docs_quality_prune_budget", "docs_url_dedup",
       "embed_jl_distortion", "ev_mad_outliers", "ev_session_window_native",
       "events_variant_props", "rcte_order_chains", "sample_shard_manifest",
       "scalar_map_surface", "scalar_try_surface", "stats_ab_ztest",
       "stats_chi2_independence", "stats_skew_report", "text_bpe_encode",
       "text_word_offsets_udtf", "dedup_keep_best"]
)

#: sampled before, but rotate forward again for re-verification in r7:
#: every entry whose implementation (or a shared helper in its plan) changed
#: this round — enforced by tools/gate_check.py (plan+oracle fingerprint
#: diff vs GATE_FINGERPRINTS.json), which closed the r6 hygiene miss where
#: two changed entries never rotated forward.
_REVERIFY: list[str] = [
    # r9: the hash-red r8 row — final chain_spend now DOUBLE in both
    # engines, recursion conf scoped to a child session; MUST get a green
    # driver row this round (VERDICT r8 item 1)
    "rcte_order_chains",
    # r9: seq_id switched to exact bigint DIV (ADVICE r8)
    "text_bpe_encode",
    # r9: SUM() OVER () replaced by the broadcast-total idiom
    "sample_shard_manifest",
    # r9: LSH-chain memo keys now carry the bucket cap (ADVICE r8) —
    # producer + all consumers rotate forward
    "dedup_ngram_jaccard", "dedup_clusters", "dedup_keep_best",
    "sample_leakage_free_split", "dedup_pipeline_decisions",
    # r9: adaptive exploit gate + episode sampling switched to footer/CBO
    # row estimates (ADVICE r8) — winning order must stay identical
    "adaptive_star_join",
    # r9: multiprobe rebuilt as query-directed margin probing (8x10x600),
    # MAX_PLANES 32 -> 80 reshapes every shared_bits consumer's plan
    "sim_lsh_multiprobe", "sim_lsh_ann", "sim_lsh_buckets",
    # r9 (cont.): the int64-fold/rescore refactor also moved the IVF and
    # IVF-PQ plan fingerprints (gate_check violation caught in-session) —
    # rotate them forward for re-verification too
    "sim_ivf_ann", "sim_ivfpq_ann",
    # r9 (cont.): prefix pairs became a memoized family frame (the recall
    # report's truth side) — the entry now reads the cached build
    "dedup_prefix_filter",
    # r9: clique grid switched to unequal shares (3,2,2,2) after the sf10
    # grid sweep — plan fingerprint diff rotates it forward
    "wcoj_clique4",
]

#: pinned to the very FRONT of the gate window: new registry entries for
#: this round, listed explicitly so their first driver rows are immune to
#: registration order.
_PRIORITY: list[str] = [
    # r9 new entries (front of the gate window): the remaining Spark-4 SQL
    # authoring surfaces + the interval-overlap bin-join idiom
    "scalar_sql_udf", "scalar_sql_table_udf", "sql_script_chain_report",
    "scalar_collation_surface", "orders_group_by_all", "li_interval_overlap",
    # r9: systematic PPS sampling (two-level distributed prefix sum)
    "sample_systematic_pps",
    # r9: graph k-core peeling + sort-free Mann-Whitney U
    "graph_kcore_peel", "stats_mann_whitney",
    # r9: Kneser-Ney smoothed bigram fluency (the CCNet-grade LM filter)
    "docs_kn_bigram_score",
    # r9: baseline TIFF 6.0 codec (multi-strip PackBits, both endians)
    "multimodal_tiff_roundtrip",
    # r9: CUSUM drift monitor (nonlinear recurrence as a bounded in-row fold)
    "ev_cusum_drift",
    # r9 (cont.): trainless SQ8 ANN — the only family member whose oracle
    # re-derives even the index build from raw parquet (operators/sq.py)
    "sim_sq_ann",
    # r9 (cont.): two-sample Kolmogorov-Smirnov on the MW value-domain
    # machinery — the snapshot/source drift detector
    "stats_ks_test",
    # r9 (cont.): per-source tokenizer fertility/compression QA over the
    # now-memoized shared_word_pieces tokenizer chain
    "text_fertility",
    # r9 (cont.): measured banded-minhash recall vs the prefix join's exact
    # ground truth — blocking quality as a first-class oracle-verified query
    "dedup_lsh_recall_report",
    # r9 (cont.): KMV bottom-k distinct sketch — deterministic md5 keying
    # makes the ESTIMATE itself cross-engine hash-exact (vs HLL's bound
    # contract), and bottom-k sets merge by union
    "approx_distinct_kmv",
    # r9 (cont.): inclusion-dependency (FK-candidate) profiling — the
    # cross-table sibling of profile_table, distinct-set semi-joins only
    "profile_fk_candidates",
    # r9 (cont.): bounded BFS hop distances — node-sized frontier rounds
    # over the family edge frame, recursive-CTE oracle
    "graph_bfs_hops",
    # r9 (cont.): the remaining distribution-rank window functions
    # (NTILE/PERCENT_RANK/CUME_DIST/FIRST/NTH_VALUE)
    "window_ntile_dist",
    # r9 (cont.): the KMV merge receipt — per-partition sketches fold to
    # exactly the direct sketch (merge_exact pinned true per group)
    "approx_kmv_merge",
    # r9 (cont.): PERCENTILE_DISC selection quantiles + deterministic mode
    "orders_percentile_disc",
    # r9 (cont.): derandomized Poisson bootstrap — distributed CIs whose
    # resampling itself is oracle-replayed
    "stats_bootstrap_ci",
    # r9 (cont. 2): deterministic Bloom-filter semi-join pruning — the
    # runtime row filter as verifiable relational algebra, FP rate measured
    "approx_bloom_semijoin",
    # r9 (cont. 2): bitmap audience rollup (BIGINT day bitmaps, popcount
    # tiers, weekday-mask algebra, partial-merge receipt)
    "ev_bitmap_rollup",
    # r9 (cont. 2): functional-dependency verification report — the
    # within-table sibling of profile_fk_candidates
    "profile_functional_deps",
    # r9 (cont. 2): gaps-and-islands interval coverage merge (two-window
    # sweep, no self-join)
    "li_shipping_islands",
    # r9 (cont. 2): time-weighted average over event hold intervals
    # (exact microsecond weighting, integer-quantized products)
    "ev_time_weighted_avg",
    # r9 (cont. 2): sorted-neighborhood blocking — the third blocking
    # family (bin-ranked neighbor equi-join, O(w*n) candidates)
    "dedup_sorted_neighborhood",
    # r9 (cont. 2): Theil-Sen robust slope beside OLS on calendar-bounded
    # pairwise slopes (rank-selected median, zero float accumulation)
    "stats_theil_sen",
    # r9 (cont. 2): bitwise expression surface (§2.8 integer ops closure)
    "scalar_bitwise_surface",
    # r9 (cont. 2): Benford first-digit screen (fixed-literal expectations,
    # nano-quantized chi-square)
    "stats_benford_check",
    # r9 (cont. 2): polite crawl-wave scheduling over the canonical frontier
    # (per-host rank DIV rate; politeness receipt as data)
    "docs_crawl_schedule",
    # r9 (cont. 2): Markov stationary distribution by nano-quantized power
    # iteration over the transition matrix
    "ev_markov_stationary",
]


def _driver_ordered() -> list[str]:
    specs = all_specs()
    front = [n for n in _PRIORITY + _REVERIFY if n in specs]
    fresh = [n for n in specs if n not in _R12345678_SAMPLED and n not in front]
    rest = [n for n in specs if n in _R12345678_SAMPLED and n not in front]
    return front + fresh + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md §2,
    never-driver-sampled entries first (see _R12345678_SAMPLED)."""
    specs = all_specs()
    return {name: specs[name].spark for name in _driver_ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each queries() entry.

    Entries without an oracle (genuinely non-SQL-expressible ops) are omitted
    -> the driver records a weaker rows-only check for those.
    """
    specs = all_specs()
    return {
        name: specs[name].oracle
        for name in _driver_ordered()
        if specs[name].oracle is not None
    }
