from . import registry
from .registry import QUERIES, ORACLES, query, all_queries  # noqa: F401

# Importing the plan modules populates the registry.
from . import sync_queries  # noqa: F401, E402
from . import relational_queries  # noqa: F401, E402
from . import tpch_shapes  # noqa: F401, E402
from . import llm_queries  # noqa: F401, E402
from . import streaming_queries  # noqa: F401, E402
from . import analytics_queries  # noqa: F401, E402

# Round-3 driver-window rotation (r2 verdict "Next round" #2). The
# driver's correctness gate hashes only the first 50 ``queries()``
# entries; registration order had starved 73 queries of verification.
# Order: the 8 core sync queries, the 4 rel queries whose oracles were
# just fixed (HUGEINT casts), then the never-driver-checked set —
# similarity (optimized after its r1 check), new dedup paths, all
# streaming, the TPC-H family, and analytics. Rotate in later rounds
# until every query has a green driver row at current code.
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
    # oracles fixed this round — need a green driver row
    "rel_sessionize_events",
    "rel_events_props_json",
    "rel_q12_priority_class",
    "rel_moving_window_range",
    # similarity family — optimized in r2 AFTER its r1 green check
    "llm_sim_topk_bruteforce",
    "llm_sim_ivf_topk",
    "llm_sim_near_dup_embeddings",
    "llm_sim_lsh_hyperplane",
    "llm_sim_ivf_multiprobe",
    "llm_sim_kmeans_assign",
    "llm_sim_pq_codes",
    "llm_sim_pq_adc_topk",
    # dedup paths new or changed in r2
    "llm_dedup_incremental",
    "llm_lsh_bucket_histogram",
    "llm_dedup_apply",
    "llm_dedup_clusters",
    # streaming — never driver-checked
    "stream_events_hourly",
    "stream_stateful_user_totals",
    "stream_session_windows",
    "stream_attribution_join",
    "stream_sliding_counts",
    "stream_dedup_events",
    "stream_static_enrich",
    # TPC-H family — never driver-checked
    "rel_q2_min_cost_supplier",
    "rel_q7_volume_shipping",
    "rel_q8_market_share",
    "rel_q9_product_profit",
    "rel_q11_important_parts",
    "rel_q13_order_distribution",
    "rel_q15_top_supplier",
    "rel_q16_supplier_counts",
    "rel_q17_small_quantity",
    "rel_q20_promo_suppliers",
    "rel_q21_waiting_supplier",
    # analytics — never driver-checked
    "rel_funnel_conversion",
    "rel_cohort_retention",
    "rel_outlier_iqr",
    "rel_profile_columns",
    "rel_fuzzy_part_match",
    "rel_window_rank_surface",
    "rel_stats_moments",
    "rel_array_hof_surface",
]
