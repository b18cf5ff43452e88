from . import registry
from .registry import QUERIES, ORACLES, query, all_queries  # noqa: F401

# Importing the plan modules populates the registry.
from . import sync_queries  # noqa: F401, E402
from . import relational_queries  # noqa: F401, E402
from . import tpch_shapes  # noqa: F401, E402
from . import llm_queries  # noqa: F401, E402
from . import streaming_queries  # noqa: F401, E402
from . import analytics_queries  # noqa: F401, E402
from . import tokenizer_queries  # noqa: F401, E402
from . import curation_queries  # noqa: F401, E402
from . import media_queries  # noqa: F401, E402

# Round-5 driver-window rotation (r4 verdict "Next round" #3). The
# driver's correctness gate hashes only the first 50 ``queries()``
# entries per round. This window covers: the 8 core sync queries (kept
# verified every round), the 3 r4 reds re-fixed this round
# (in-bounds SCD2 sentinel, stringified quantized vector, BIGINT-cents
# grouping-sets total — all driver-canonicalization fixes, now also
# guarded by tests/test_registry.py::test_no_unhashable_output_columns
# and test_timestamp_outputs_within_pandas_bounds), the 11 queries
# added during r4 that have never had a driver row (semantic-dedup
# family, DQ gates, drift/reconcile, CDC compaction, cascade impact,
# join-size profiler, stream_dq_gate), any query added or changed in
# r5, and re-verification fillers drawn from the queries whose last
# driver row is oldest (r2). Manifest policy (r4 ADVICE): stamps are
# only written for queries sitting in the current window —
# test_manifest_entries_were_driver_windowed rejects pre-stamped
# never-checked queries.
registry.PRIORITY = [
    # core reference surface (keep verified every round)
    "sync_missing_faculty_users",
    "sync_missing_student_users",
    "sync_missing_courses",
    "sync_missing_sections",
    "sync_daily_enrollment",
    "sync_ctl_library_courses",
    "sync_ctl_library_sections",
    "sync_clean_users",
    # added in r6 (plans/tokenizer_queries.py — the r5 tests-only
    # operators promoted to oracle-paired queries, r5 verdict #1)
    "llm_bpe_train_vocab",
    "llm_bpe_encode",
    "llm_lm_perplexity",
    "llm_chat_render_stats",
    "llm_winnow_pairs",
    "llm_chat_loss_mask",
    # added in r6: the composed curation pipeline (r5 verdict #7) and
    # the pixel-exact codec/video gates (r5 verdict #5/#6)
    "llm_corpus_curate",
    "llm_decode_pixel_checksums",
    "llm_video_frame_stats",
    "llm_warc_ingest_stats",
    "llm_audio_decode_stats",
    "llm_webdataset_shard_stats",
    # changed in r6: corpus-scaled k-means k (scale-probe fix) — the
    # whole family's plan+oracle hashes changed, so they re-enter the
    # window per the rotation policy
    "llm_sim_kmeans_assign",
    "llm_dedup_semantic_kmeans",
    "llm_dedup_cluster_histogram",
    "llm_dedup_semantic_verified",
    "llm_sim_kmeans_purity",
    # re-verification fillers: the oldest driver rows (last checked in
    # r2, per CORRECTNESS_r02 vs later rounds), alphabetical — the
    # cumulative-coverage policy keeps every green query re-checked on
    # a rolling basis now that all 160 have had at least one row
    "rel_bitmap_distinct",
    "rel_cube_order_stats",
    "rel_customer_order_setops",
    "rel_date_surface",
    "rel_distinct_aggregates",
    "rel_event_deltas",
    "rel_events_hourly",
    "rel_events_variant",
    "rel_full_outer_year_diff",
    "rel_latest_event_per_user",
    "rel_left_outer_customer_orders",
    "rel_parameterized_sql",
    "rel_pivot_order_status",
    "rel_q10_returned_items",
    "rel_q18_large_orders",
    "rel_q19_disjunctive_filter",
    "rel_q22_inactive_balance",
    "rel_q3_shipping_priority",
    "rel_q4_order_priority",
    "rel_q5_region_revenue",
    "rel_q6_revenue_filter",
    "rel_range_join_balance_bands",
    "rel_resample_ffill",
    "rel_rollup_revenue",
    "rel_running_total_per_user",
]

# r7 rotation plan (computed at r6 close): keep the 8 sync queries
# pinned and any r7-new/changed queries ahead of fillers, then fill
# from the re-verification backlog, oldest driver row first (r2
# leftovers, then r3): rel_salted_join_revenue, rel_semi_anti_counts,
# rel_session_window_native, rel_string_surface, rel_term_successor,
# rel_top_orders_per_customer, rel_unpivot_part_measures,
# llm_dedup_apply, llm_dedup_clusters, llm_dedup_incremental,
# llm_sim_ivf_multiprobe, llm_sim_ivf_topk, llm_sim_lsh_hyperplane,
# llm_sim_near_dup_embeddings, llm_sim_pq_adc_topk, llm_sim_pq_codes,
# llm_sim_topk_bruteforce, rel_array_hof_surface, rel_cohort_retention,
# rel_events_props_json, rel_funnel_conversion, rel_fuzzy_part_match,
# rel_moving_window_range, rel_outlier_iqr, then the remaining r3/r4
# rows alphabetically. The stamped-hash policy stays as is; stamp with
# scripts/update_checked_hashes.py (window-only, NOT --bootstrap — a
# bootstrap restamp would exempt changed non-window queries from
# re-verification).
