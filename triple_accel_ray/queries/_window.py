"""Driver correctness-window lists (see ROTATION.md): the
driver checks the FIRST 50 queries() keys in dict order, so
each round's window is an explicit reorder prefix."""


# Round-4 driver window (first 50 queries() keys, see build_queries).
# 8 ER-core rows every round + one representative per SURVEY §2 /
# VERDICT component line, preferring round-1..3-uncovered queries.
DRIVER_WINDOW_R4 = [
    # ER flagship core (always in-window)
    "er_docs_build", "er_exact_dup_clusters", "er_block_stats",
    "er_candidate_pairs", "er_match_edges", "er_clusters",
    "er_clusters_after_delete", "er_clusters_full",
    # ER evaluation (uncovered r1-3)
    "er_cluster_metrics", "er_blocking_metrics",
    # kernels (cheap canaries, keep covered)
    "lev_adjacent", "ham_prefix64_adjacent",
    # fuzzy search / fuzzy join
    "lev_search_best", "fuzzy_probe_join",
    # dedup family (uncovered r1-3)
    "dedup_minhash_survivors", "dedup_simhash_survivors",
    "dup_substring_spans", "dedup_normalized",
    # ANN quality (noise fixture + round-4 clustered fixture)
    "knn_pq_recall", "knn_pq_recall_clustered",
    # text analysis (uncovered r1-3; bpe_train_merges is the round-4
    # tokenizer-training flagship)
    "repetition_scores", "pii_scrub", "bpe_train_merges",
    # windows / streaming (uncovered r1-3)
    "funnel_click_purchase", "weekly_retention",
    "running_user_totals", "event_value_ranks",
    # relational / joins (uncovered r1-3)
    "revenue_by_nation", "docs_snapshot_diff", "daily_type_pivot",
    # multimodal codecs (uncovered r1-3)
    "media_feature_rows_jpeg", "media_feature_rows_jpeg_rgb",
    "audio_feature_rows", "video_frame_samples",
    # curation (uncovered r1-3)
    "docs_skyline", "decontam_hits", "sample_stratified",
    # sketches + bloom semi-join (uncovered r1-3)
    "bloom_pruned_orders", "hll_user_registers",
    "quantiles_by_event_type",
    # export (uncovered r1-3)
    "packed_sequences", "curated_packed", "doc_chunks",
    # source formats (uncovered r1-3)
    "docs_from_jsonl", "docs_from_csv",
    # profiling (uncovered r1-3)
    "docs_profile", "sft_pairs_extract",
    # graph (uncovered r1-3)
    "er_pagerank", "er_kcore2", "er_edge_triangles",
]
assert len(DRIVER_WINDOW_R4) == 50, len(DRIVER_WINDOW_R4)


# Round-5 driver window (first 50 queries() keys, see build_queries).
# Keeps the 8 ER-core rows + the flagship late additions every round
# (knn_pq_recall_clustered, bpe_train_merges, dup_substring_spans,
# er_pagerank) + the NEW oracle-checkable IVF recall; the other 37
# slots rotate in keys with no prior hard driver signal (ROTATION.md
# ledger: cumulative driver-checked reaches 126 of 132 after this
# window; the remainder is covered by the committed full local gate
# artifact scripts/check_queries.py writes each round).
DRIVER_WINDOW_R5 = [
    # ER flagship core (always in-window)
    "er_docs_build", "er_exact_dup_clusters", "er_block_stats",
    "er_candidate_pairs", "er_match_edges", "er_clusters",
    "er_clusters_after_delete", "er_clusters_full",
    # flagship late additions (keep hard signal every round)
    "knn_pq_recall_clustered", "bpe_train_merges",
    "dup_substring_spans", "er_pagerank",
    # NEW round-5: oracle-checked IVF recall (VERDICT r4 Missing #4)
    "knn_ivf_recall_clustered",
    # multimodal codecs (never driver-checked)
    "media_feature_rows_png", "media_resize_4x_jpeg",
    # curation / relational (never driver-checked)
    "top3_longest_per_source", "docs_not_in_ref", "orders_fk_orphans",
    "events_upserted", "join_size_orders_events",
    # sketches (never driver-checked)
    "hll_users_by_type_registers", "distinct_users_exact",
    "quantiles_value_cents", "cms_user_registers",
    "value_log_quantiles", "bloom_user_bits", "bloom_membership",
    # export (never driver-checked)
    "shuffle_export_shards", "mixture_sample", "event_zorder_keys",
    # transcripts / profiling (never driver-checked)
    "conv_turn_stats", "conv_lint_counts", "conv_id_dictionary",
    "source_len_drift", "er_score_calibration",
    # windows / streaming (never driver-checked; the two HUGEINT-fixed
    # oracles rotate in here)
    "moving_user_frame_sums", "trailing_1h_user_sums",
    "event_type_transitions", "user_value_trends",
    "hourly_top_event_types", "hourly_unique_users",
    "daily_event_deltas",
    # text analysis (never driver-checked)
    "doc_source_lang_rollup", "sample3_hash_per_source",
    "grams_only_in_src0", "grams_in_both_srcs", "docs_inverted_index",
    "doc_len_outliers", "term_cooc_top20", "distinctive_terms",
]
assert len(DRIVER_WINDOW_R5) == 50, len(DRIVER_WINDOW_R5)
