"""Query plans: the oracle-checked operator inventory.

Each query exists twice: as an idiomatic Spark DataFrame/SQL program and as
an ANSI-SQL oracle string for DuckDB. The registry in ``registry.py`` binds
them; ``__spark_entry__.py`` exposes them to the driver.
"""

from nyc_yellow_taxi_trip_data_pipeline_spark.plans.registry import (
    QUERIES,
    QuerySpec,
    register,
)

# Importing the modules populates the registry.
from nyc_yellow_taxi_trip_data_pipeline_spark.plans import analytics  # noqa: E402,F401
from nyc_yellow_taxi_trip_data_pipeline_spark.plans import datapipe  # noqa: E402,F401

# The external driver verifies the FIRST 50 registered queries against the
# DuckDB oracle (CORRECTNESS_r{N}.json has a 50-row budget). Registration
# order therefore decides which queries earn a hard external row. The r11
# window executes the r10 verdict's item #1 (rotate the entire r7-vintage
# pool through the window — after this round no green driver row predates
# r8) plus the staleness-ratchet mandatories:
# (a) MANDATORY (edited this round): q190/q193 (stateful timer replays
#     rebuilt on hash-BUCKET state keys — lesson 9 applied to the
#     stateful surface — and 1 state partition; ~20-30% faster, oracles
#     unchanged), q192 (data-fingerprinted layout-cache token +
#     order-insensitive pushed-filter assertion, both ADVICE items).
# (b) MANDATORY (new): q194 Z-order multi-dimensional clustering — the
#     liquid-clustering-style extension of q192 budgeted by the r10
#     verdict item #5 (one slot, in-plan assertion discipline).
# (c) the full 46-row r7 pool (tools/window_planner.py fill, oldest
#     driver row first): q101-q129 block, q132-q142 block, q67, q78,
#     q88, q90, q97, q98, q99.
# Slot math: 3 (a) + 1 (b) + 46 (c) = 50.
# Sit-outs (first owed rows NOT in the window): the early-r8 pool
# (q01/q02/q05/q06, then q07...) — rationale: r8-green with
# byte-identical source since (ratchet-checked), parity-gated at three
# SFs every commit; the 46 strictly-older r7 rows and the 4 mandatory
# rows outrank r8-green re-verification. They lead the r12 window fill.
# NOTE: the helper-level dedup changes this round (jaccard_on_pairs /
# sig_agreement_filter candidate pinning + self-measured pairs_count)
# do not change any plan-function hash, but their heaviest consumers
# q98 (indexed-dedup call site) and q101/q112 (minhash family) are all
# inside this window anyway — the helper edit gets fresh external rows
# through them.
_PRIORITY = [
    # (a)+(b) mandatory: edited + new this round
    "q190_processing_time_timer_eviction",
    "q192_zonemap_layout_skipping",
    "q193_event_time_timer_eviction",
    "q194_zorder_multidim_skipping",
    # (c) the r7 pool, oldest driver rows in the inventory
    "q101_minhash_neardup_sharp",
    "q102_corpus_snapshot_diff",
    "q103_repetition_filters",
    "q104_embedding_drift_audit",
    "q105_ngram_decontamination",
    "q106_shard_manifest",
    "q107_length_bucket_padding",
    "q108_semantic_dedup",
    "q109_bpe_merge_step",
    "q110_streaming_sliding_rate",
    "q111_importance_weights",
    "q112_dup_cluster_histogram",
    "q113_media_neardup_phash",
    "q114_curated_shard_build",
    "q115_streaming_upsert_totals",
    "q116_bpe_apply_merge",
    "q117_referential_integrity",
    "q118_session_documents",
    "q119_embedding_truncation_audit",
    "q120_join_skew_audit",
    "q121_salted_skew_join",
    "q122_scd2_intervals",
    "q123_lsh_verify_editdist",
    "q124_hash_threshold_sample",
    "q125_word_freq_spectrum",
    "q126_training_mix_schedule",
    "q127_quality_classifier",
    "q128_bloom_prefilter_join",
    "q129_chunk_dup_mass",
    "q132_vocab_oov_coverage",
    "q133_stream_outer_join",
    "q134_chained_stateful",
    "q136_k_anonymity_audit",
    "q137_label_shift_tvd",
    "q138_star_join_q5",
    "q139_ab_exposure_audit",
    "q140_winsorized_mean",
    "q141_trailing_range_window",
    "q142_forward_fill",
    "q67_streaming_sessionize",
    "q78_chunk_windows_udtf",
    "q88_pii_redaction_audit",
    "q90_domain_mix_budget",
    "q97_grouped_mad_outliers",
    "q98_incremental_dedup_indexed",
    "q99_quantiles_iqr_sketch",
]
# --- r12 rotation preview (slot arithmetic for the next window rewrite,
# lesson 19) --- owed rows after r11, oldest first: the r8 pool
# (q01/q02/q05/q06 displaced this round, then q07-q11, q143-q153, and
# the rest of the r8-green rows — ~45 owed) fills most of the 50
# slots; any r11-edited or new query is mandatory on top. Budget new
# queries BEFORE writing them (tests/test_round9_invariants.py
# staleness ratchet).
QUERIES_ORDERED = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
QUERIES_ORDERED.update(QUERIES)
QUERIES.clear()
QUERIES.update(QUERIES_ORDERED)

__all__ = ["QUERIES", "QuerySpec", "register"]
