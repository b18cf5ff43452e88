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

# Round-7 driver-window rotation (r6 verdict #4; plan committed at r6
# close). The driver's correctness gate hashes only the first 50
# ``queries()`` entries per round. This window covers: the 8 sync
# queries (changed this round — AQE join selection replaced the forced
# broadcast), the 3 queries added in r7, the 2 changed by the r6
# ADVICE fixes / fixture factoring, the 13 whose decorator source was
# touched by the oracle-prelude factoring, and re-verification fillers
# drawn from the oldest driver rows (r2, then r3 alphabetical).
# Manifest policy (r4 ADVICE): stamps are only written for queries
# sitting in the current window —
# test_manifest_entries_were_driver_windowed rejects pre-stamped
# never-checked queries.
registry.PRIORITY = [
    # core reference surface — CHANGED this round (broadcast hints
    # removed from the diff family, r6 verdict #1) so re-verification
    # is mandatory, not just pinned-by-policy
    "sync_missing_faculty_users",
    "sync_missing_student_users",
    "sync_missing_courses",
    "sync_missing_sections",
    "sync_daily_enrollment",
    "sync_ctl_library_courses",
    "sync_ctl_library_sections",
    "sync_clean_users",
    # added in r7: Derby JDBC mirror round-trip (r6 verdict #5),
    # streaming WARC ingest (r6 verdict #8), rawvideo+MJPEG codec
    # dispatch under the pixel-CRC gate (r6 verdict #6)
    "sync_jdbc_mirror_roundtrip",
    "stream_warc_ingest",
    "llm_video_codec_stats",
    # changed in r7: planted-copy offset 1e12 (r6 ADVICE), WARC
    # fixture records factored for the streaming twin
    "llm_winnow_pairs",
    "llm_warc_ingest_stats",
    # hash-flipped by the r7 oracle-prelude factoring (byte-identical
    # strings proven by the parity sweep, but the decorator source
    # changed so the rotation policy pulls them in) — most were due
    # from the r3 re-verification backlog anyway
    "llm_dedup_ngram_jaccard",
    "llm_dedup_containment",
    "llm_sim_topk_bruteforce",
    "llm_sim_ivf_topk",
    "llm_sim_near_dup_embeddings",
    "llm_sim_ivf_multiprobe",
    "llm_dedup_clusters",
    "llm_dedup_apply",
    "llm_sim_kmeans_assign",
    "llm_dedup_semantic_verified",
    "llm_sim_pq_codes",
    "llm_sim_pq_adc_topk",
    "llm_sim_pq_recall",
    # re-verification fillers: oldest driver rows first (r2 leftovers,
    # then r3 alphabetical)
    "rel_salted_join_revenue",
    "rel_semi_anti_counts",
    "rel_session_window_native",
    "rel_string_surface",
    "rel_term_successor",
    "rel_top_orders_per_customer",
    "rel_unpivot_part_measures",
    "llm_dedup_incremental",
    "llm_sim_lsh_hyperplane",
    "rel_array_hof_surface",
    "rel_cohort_retention",
    "rel_events_props_json",
    "rel_funnel_conversion",
    "rel_fuzzy_part_match",
    "rel_moving_window_range",
    "rel_outlier_iqr",
    "rel_q11_important_parts",
    "rel_q12_priority_class",
    "rel_q13_order_distribution",
    "rel_q15_top_supplier",
    # added/changed in r7 (tiled-TIFF / FLAC / ADPCM fixtures appended
    # to the codec gates; curate persists the gate+dedup output; the
    # distributed logistic-regression quality classifier is new)
    "llm_quality_classifier",
    "llm_decode_pixel_checksums",
    "llm_audio_decode_stats",
    "llm_corpus_curate",
]

# r8 rotation plan (computed at r7 close): keep the 8 sync queries
# pinned and any r8-new/changed queries ahead of fillers, then fill
# from the re-verification backlog, oldest driver row first — the
# four r3 fillers displaced late in r7 (rel_q16_supplier_counts,
# rel_q17_small_quantity, rel_q20_promo_suppliers,
# rel_q21_waiting_supplier), then the
# remaining r3 rows alphabetically: rel_q2_min_cost_supplier,
# rel_q7_volume_shipping, rel_q8_market_share, rel_q9_product_profit,
# rel_sessionize_events, rel_stats_moments, rel_window_rank_surface,
# stream_attribution_join, stream_dedup_events, stream_events_hourly,
# stream_session_windows, stream_sliding_counts,
# stream_stateful_user_totals, then the r4 rows alphabetically. The
# stamped-hash policy stays as is; stamp with
# scripts/update_checked_hashes.py (window-only, NOT --bootstrap — a
# bootstrap restamp would exempt changed non-window queries from
# re-verification).
