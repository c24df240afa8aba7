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
# order therefore decides which queries earn a hard external row. The r13
# window executes the r12 verdict's items #1/#2/#4:
# (a) MANDATORY (edited this round): q98/q167 — the budgeted
#     signature-index edit (catalog-table name keyed on the documents
#     DATA FINGERPRINT instead of md5(sf_dir); atomic .build-<uuid> +
#     rename publish, the q190-q195 discipline) — plus q94, the cold-
#     shape consumer of the shared dedup helpers, routed through per
#     lesson 24 (helper edits don't move plan hashes).
# (b) MANDATORY (new): q196 small-file compaction/OPTIMIZE — the r12
#     verdict item #4 budgeted surface (metadata-planned, partition-
#     selective bin-pack rewrite; the 100 TB operational lever the
#     layout family q170/q175/q192/q194/q195 didn't cover).
# (c) fill: the r9-vintage pool (tools/window_planner.py, oldest driver
#     row first) — 46 of its 49 non-mandatory rows (q167 is already
#     mandatory above).
# Slot math: 3 (a) + 1 (b) + 46 (c) = 50.
# Sit-outs (owed r9 rows NOT in the window, double-coverage rationales):
# - q31_dedup_keep_first: the keep-first window-dedup surface is
#   double-covered by q30_dedup_exact (in this window) and the
#   survivor-policy superset q144_keep_best_dedup (r12-green).
# - q77_trimmed_mean_udaf: same GROUPED_AGG trimmed-mean surface as
#   q86_trimmed_mean_udaf_bounded, which stays in the window (the
#   bounded form is the historically fragile one — r8 tie bug).
# - q159_streaming_union_watermark_max: same multi-watermark union
#   algebra (lesson 13) and pipeline code path as
#   q154_streaming_union_watermarks (min policy), which stays in.
_PRIORITY = [
    # (a)+(b) mandatory: edited + new this round
    "q98_incremental_dedup_indexed",
    "q167_keep_best_indexed",
    "q94_incremental_dedup",
    "q196_compact_optimize",
    # (c) the r9 pool, oldest driver rows in the inventory
    "q03_filter_group_count",
    "q04_null_counts",
    "q10_histogram",
    "q130_streaming_late_drop",
    "q135_streaming_dedup_within_watermark",
    "q154_streaming_union_watermarks",
    "q160_python_datasource_scan",
    "q161_session_window_batch",
    "q163_cuped_adjusted_ab",
    "q168_bpe_train_loop",
    "q169_retrieval_ndcg",
    "q170_bucketed_ctas_join",
    "q171_batch_ann_topk",
    "q172_streaming_session_window",
    "q173_chi2_independence",
    "q174_temperature_mix",
    "q175_dynamic_partition_pruning",
    "q176_hard_negative_mining",
    "q177_shuffle_interleave_audit",
    "q178_arrow_python_udf",
    "q179_observed_metrics",
    "q180_cohens_kappa",
    "q181_ece_calibration",
    "q182_editdist_neardup",
    "q183_bm25_rational_rank",
    "q184_markov_transitions",
    "q185_pareto_frontier",
    "q186_scd2_history",
    "q187_runtime_bloom_join",
    "q188_spearman_trend",
    "q189_partial_agg_rollup",
    "q30_dedup_exact",
    "q33_simhash",
    "q38_lang_id",
    "q39_fingerprint",
    "q40_multimodal_meta",
    "q41_multimodal_decode",
    "q42_approx_sketches",
    "q44_streaming_hourly",
    "q45_ngram_jaccard",
    "q56_regex_extract",
    "q57_grouping_sets",
    "q61_conditional_aggs",
    "q63_date_math",
    "q76_stream_stream_join",
    "q86_trimmed_mean_udaf_bounded",
]
# --- r14 rotation preview (slot arithmetic for the next window rewrite,
# lesson 19) --- owed rows after r13, oldest first: the three r9
# sit-outs above (q31/q77/q159), then the r10-vintage pool
# (q100/q12/q131/q13/q14/q15/q16/q17/q18/q191/q19/q20/q21/q22/q23 lead
# per window_planner). Any r13-edited or new query is mandatory on top.
# Budget new queries BEFORE writing them
# (tests/test_round9_invariants.py staleness ratchet).
# Budgeted r14 edit candidates (each needs its window slots):
# - q170/q175/q189: the last md5(sf_dir)-keyed in-place CTAS rebuilds —
#   give them the fingerprint token + atomic publish (retires their
#   REQUIRED serial-sweep entries; ARCHITECTURE env-robustness notes).
# - q195: migrate its snapshot()/rewritten-dirs assertions onto a
#   shared helper with q196 (duplicated today because q195 was outside
#   the r13 window; driver-side code, so a module helper is legal).
QUERIES_ORDERED = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
QUERIES_ORDERED.update(QUERIES)
QUERIES.clear()
QUERIES.update(QUERIES_ORDERED)

__all__ = ["QUERIES", "QuerySpec", "register"]
