from . import registry
from .registry import QUERIES, ORACLES, query, all_queries  # noqa: F401

# Importing the plan modules populates the registry.
from . import sync_queries  # noqa: F401, E402
from . import relational_queries  # noqa: F401, E402
from . import tpch_shapes  # noqa: F401, E402
from . import llm_queries  # noqa: F401, E402
from . import streaming_queries  # noqa: F401, E402
from . import analytics_queries  # noqa: F401, E402

# Round-4 driver-window rotation (r3 verdict "Next round" #2). The
# driver's correctness gate hashes only the first 50 ``queries()``
# entries per round. This window covers: the 8 core sync queries (kept
# verified every round), the re-fixed ``rel_profile_columns`` (r3's one
# red row — min/max now BIGINT cents), all 28 queries that had never
# had a driver row as of r3, the 7 whose only driver row predates the
# r2 dedup/text optimizations, and 6 float-heavy queries re-entered
# because the local parity normalizer was tightened to driver-hash
# strictness this round. After this window every query registered at
# rotation time has had a driver row. The 11 queries ADDED during r4
# (dq/incremental/cascade/drift/reconcile/cdc/join-size, semantic
# dedup family, stream_dq_gate) are stamped in checked_hashes.json and enter
# the r5 window (policy pinned by
# tests/test_registry.py::test_changed_queries_enter_driver_window);
# all pass local parity at driver-hash strictness.
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
    # r3's one red row, re-fixed this round (BIGINT-cents min/max)
    "rel_profile_columns",
    # never driver-checked: relational surface
    "rel_recursive_month_spine",
    "rel_try_arithmetic",
    "rel_pagerank_parts",
    "rel_event_transitions",
    "rel_scd2_user_history",
    "rel_key_skew_profile",
    "rel_window_value_surface",
    "rel_grouping_sets",
    "rel_approx_percentile_contract",
    # never driver-checked: text analysis family
    "llm_text_fingerprint",
    "llm_text_top_terms",
    "llm_text_sentiment",
    "llm_text_tfidf_top_terms",
    "llm_text_repetition",
    "llm_text_unigram_lm",
    "llm_contamination_ngram",
    "llm_quality_gate",
    # never driver-checked: corpus-prep family
    "llm_sample_stratified",
    "llm_emb_quantize",
    "llm_corpus_stats",
    "llm_corpus_mix",
    "llm_chunk_documents",
    "llm_shard_assignment",
    "llm_pack_sequences",
    "llm_pii_redaction",
    "llm_heavy_hitters_cms",
    # never driver-checked: multimodal plumbing
    "llm_multimodal_payload_meta",
    "llm_multimodal_frame_sample",
    # last driver row r1, code optimized in r2 — re-verify at current code
    "llm_dedup_exact",
    "llm_dedup_minhash_lsh",
    "llm_dedup_ngram_jaccard",
    "llm_dedup_simhash",
    "llm_text_language_id",
    "llm_text_quality",
    "llm_text_token_counts",
    # float-heavy queries re-entered under the tightened parity norm
    "rel_percentiles_acctbal",
    "rel_approx_distinct",
    "rel_q1_pricing_summary",
    "rel_q14_promo_revenue",
    "rel_udaf_median_value",
    "rel_asof_last_purchase",
]
