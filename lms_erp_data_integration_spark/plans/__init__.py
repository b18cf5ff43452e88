from . import registry
from .registry import QUERIES, ORACLES, query, all_queries  # noqa: F401

# Importing the plan modules populates the registry.
from . import sync_queries  # noqa: F401, E402
from . import relational_queries  # noqa: F401, E402
from . import tpch_shapes  # noqa: F401, E402
from . import llm_queries  # noqa: F401, E402
from . import similarity_queries  # noqa: F401, E402  (split out of llm_queries at r8; registers the llm_sim_* / llm_emb_* family)
from . import streaming_queries  # noqa: F401, E402
from . import analytics_queries  # noqa: F401, E402
from . import tokenizer_queries  # noqa: F401, E402
from . import curation_queries  # noqa: F401, E402
from . import media_queries  # noqa: F401, E402
from . import sketch_queries  # noqa: F401, E402  (r8: HLL / Count-Min / Bloom)

# Round-8 driver-window rotation (per the plan committed at r7 close,
# r7 verdict #1). The driver's correctness gate hashes only the first
# 50 ``queries()`` entries per round. This window covers: the 8 sync
# queries (pinned every round), everything new or source-changed in
# r8, then the full r3-era re-verification backlog (the four fillers
# displaced late in r7 first, then the remaining r3 rows — including
# stream_static_enrich, whose last driver row is also r3 — in
# alphabetical order), then r4-era rows alphabetically to fill.
# Manifest policy (r4 ADVICE): stamps are only written for queries
# sitting in the current window —
# test_manifest_entries_were_driver_windowed rejects pre-stamped
# never-checked queries.
registry.PRIORITY = [
    # core reference surface — pinned every round
    "sync_missing_faculty_users",
    "sync_missing_student_users",
    "sync_missing_courses",
    "sync_missing_sections",
    "sync_daily_enrollment",
    "sync_ctl_library_courses",
    "sync_ctl_library_sections",
    "sync_clean_users",
    # changed in r8: decorator source touched by the remaining
    # oracle-prelude factoring (r7 verdict #6 — assembled SQL proven
    # byte-identical by the parity sweep, but the rotation policy
    # pulls any source change back under the driver gate), plus the
    # pixel-CRC codec gate grown by the r8 codec fixtures (r7 verdict
    # #4: six SOF9 arithmetic-JPEG, six SOF3 lossless, six SOF10
    # progressive-arithmetic)
    "llm_dedup_ngram_jaccard",
    "llm_dedup_clusters",
    "llm_dedup_apply",
    "llm_sim_ivf_topk",
    "llm_sim_ivf_multiprobe",
    "llm_decode_pixel_checksums",
    # NEW in r8: the composed FK-ordered pipeline runner + observed
    # run report under the driver gate (r7 verdict #7)
    "sync_pipeline_run_report",
    # NEW in r8: the sketch family (HLL registers + merge, Count-Min
    # + one-sided-error audit, Bloom-pruned semi join + FP accounting,
    # streaming HLL over the event stream)
    "llm_sketch_hll_distinct",
    "llm_sketch_cms_heavy_hitters",
    "rel_bloom_semi_join",
    "stream_sketch_distinct",
    "llm_sketch_hll_rollup",
    "stream_sketch_cms",
    # CHANGED late in r8: the k-means family's assignment scan went
    # two-level (IVF-style coarse cells, k now ∝ n^(2/3) — the r8
    # decade-2 probe's rising-exponent fix), so every query embedding
    # the unrolled k-means oracle re-enters the window
    "llm_sim_kmeans_assign",
    "llm_dedup_semantic_kmeans",
    "llm_dedup_cluster_histogram",
    "llm_dedup_semantic_verified",
    "llm_sim_kmeans_purity",
    # CHANGED late in r8: the video codec gate grew the H.264 path
    # (ids 12-15: avc1-in-MP4 from the from-scratch CAVLC intra
    # encoder, decoded by operators/h264.py through the real
    # demux -> annexb -> decode chain)
    "llm_video_codec_stats",
    # NEW late in r8: content-level video near-dup via per-frame
    # pHash over REAL H.264 decode (mux -> demux -> intra decode ->
    # DCT hash), pinned-VALUES oracle
    "llm_video_visual_dedup",
    # NEW late in r8: KMV/Theta sketch set operations (union /
    # intersection estimates from coordinated bottom-k samples),
    # full cross-engine oracle, exact-audit columns
    "rel_theta_setops",
    # NEW late in r8: mergeable quantile sketch (coordinated bottom-k
    # row sample, merged '*' grain, exact order-statistic audit) —
    # completes the five canonical mergeable summaries
    "rel_quantile_sketch",
    # NEW late in r8: temporal H.264 — IPP GOPs (P_Skip / 16x16 /
    # 16x8 / 8x16 / intra-in-P, quarter-pel MC, inter deblock tiers)
    # decoded through the reference chain under the pixel-CRC gate
    "llm_video_ipp_stats",
    # r3-era re-verification backlog: the four fillers displaced late
    # in r7 first, then the remaining r3 rows alphabetically
    "rel_q16_supplier_counts",
    "rel_q17_small_quantity",
    "rel_q20_promo_suppliers",
    "rel_q21_waiting_supplier",
    "rel_q2_min_cost_supplier",
    "rel_q7_volume_shipping",
    "rel_q8_market_share",
    "rel_q9_product_profit",
    "rel_sessionize_events",
    "rel_stats_moments",
    "rel_window_rank_surface",
    "stream_attribution_join",
    "stream_dedup_events",
    "stream_events_hourly",
    "stream_session_windows",
    "stream_sliding_counts",
    "stream_stateful_user_totals",
    "stream_static_enrich",
    # r4-era rows, alphabetical fill to 50
    "llm_chunk_documents",
]

# r9 rotation plan (for the next round): keep the 8 sync queries
# pinned and any r9-new/changed queries ahead of fillers, then fill
# from the re-verification backlog oldest-first — FIRST the twelve r4
# fillers the late-r8 sketch + two-level-k-means + H.264-gate work
# displaced from this window (llm_dedup_minhash_lsh,
# llm_dedup_simhash, llm_heavy_hitters_cms,
# llm_multimodal_frame_sample, llm_multimodal_payload_meta,
# llm_pack_sequences, llm_pii_redaction, llm_quality_gate,
# llm_sample_stratified, llm_shard_assignment, llm_text_fingerprint,
# llm_text_language_id, llm_dedup_exact, llm_corpus_stats,
# llm_corpus_mix, and llm_contamination_ngram — displaced last by the
# late-r8 llm_video_visual_dedup, rel_theta_setops,
# rel_quantile_sketch, and llm_video_ipp_stats rows),
# then the r4 rows displaced earlier (llm_text_sentiment onward,
# alphabetically from the r4 cohort), then the remaining r4 rows,
# then r5 rows alphabetically. The stamped-hash policy stays as is;
# stamp with scripts/update_checked_hashes.py (window-only, NOT
# --bootstrap — a bootstrap restamp would exempt changed non-window
# queries from re-verification).
