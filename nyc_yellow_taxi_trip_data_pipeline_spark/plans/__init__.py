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
# order therefore decides which queries earn a hard external row. The r14
# window executes the r13 verdict's items #1/#2/#3/#4:
# (a) MANDATORY (edited this round): q170/q175/q189 — the last
#     md5(sf_dir)-keyed in-place CTAS rebuilds, migrated onto the data-
#     fingerprint token + atomic .build-<uuid>/_SUCCESS/rename publish
#     (the machinery q98/q167 got in r13), retiring their REQUIRED
#     serial-sweep entries — plus q195/q196, whose duplicated
#     snapshot()/rewritten-dirs closures move onto one shared module
#     helper (driver-side code, legal per invariant 3) and q196 gains
#     the ADVICE data-shape guarantee (largest day always fragmented).
# (b) MANDATORY (new): q197 byte-targeted compaction planner — the r13
#     verdict item #4 budgeted surface (bin-pack on parquet footer BYTE
#     stats, the production OPTIMIZE contract; q196's row-count planner
#     with bytes-per-row-derived sizing).
# (c) fill: oldest driver rows first (tools/window_planner.py) — the
#     three r9 sit-outs now owed (q31/q77/q159) and 41 of the 46
#     r10-vintage rows.
# Slot math: 5 (a) + 1 (b) + 44 (c) = 50.
# Sit-outs (owed r10/r11 rows NOT in the window, double-coverage
# rationales):
# - q91_grouped_hll_distinct: the approx-distinct sketch surface is
#   double-covered by q42_approx_sketches (r13-green) and
#   q100_summary_stats_sketch (in this window).
# - q92_simhash_neardup: same SimHash band machinery as q33_simhash
#   (r13-green, byte-identical since) and the blocked-neardup shape as
#   q83_blocked_neardup_srp (in this window).
# - q93_conversion_funnel: the stacked single-exchange window-minima
#   machinery is double-covered by q20_sessionization (in this window)
#   and the funnel-counting twin q79_curation_funnel (r12-green).
# - q95_streaming_incremental_dedup: streaming dedup double-covered by
#   q81_streaming_dedup (in this window) and
#   q135_streaming_dedup_within_watermark (r13-green).
# - q96_recency_weighted_score: the quantized-rational per-key agg
#   contract is double-covered by q23_hourly_rollup (in this window)
#   and the broadcast scalar-subquery shape by q163_cuped_adjusted_ab
#   (r13-green).
# - q101_minhash_neardup_sharp: the sharpened dial over the SAME banded
#   MinHash pair machinery as q68_dedup_clusters (in this window) and
#   q32_minhash_lsh_neardup (r12-green).
_PRIORITY = [
    # (a)+(b) mandatory: edited + new this round
    "q170_bucketed_ctas_join",
    "q175_dynamic_partition_pruning",
    "q189_partial_agg_rollup",
    "q195_merge_rounds_materialized",
    "q196_compact_optimize",
    "q197_compact_bytes_optimize",
    # (c) fill: the owed r9 sit-outs, then the r10 pool oldest-first
    "q159_streaming_union_watermark_max",
    "q31_dedup_keep_first",
    "q77_trimmed_mean_udaf",
    "q100_summary_stats_sketch",
    "q12_error_metrics",
    "q131_cogroup_reconcile",
    "q13_distinct_months",
    "q14_ordered_limit",
    "q15_label_map",
    "q16_top_customers",
    "q17_priority_rollup",
    "q18_topk_per_segment",
    "q191_aqe_skew_join",
    "q19_set_ops",
    "q20_sessionization",
    "q21_asof_join",
    "q22_pivot_counts",
    "q23_hourly_rollup",
    "q24_revenue_by_nation",
    "q25_salted_agg",
    "q26_status_cube",
    "q27_grouped_zscore",
    "q28_pandas_udf_bucketing",
    "q29_json_roundtrip",
    "q35_embedding_neardup",
    "q36_ann_srp_bucket",
    "q43_sql_api",
    "q46_tfidf_topterms",
    "q47_moving_avg",
    "q48_grouped_quantiles",
    "q49_unpivot",
    "q51_upsert_merge",
    "q52_char_ngram_langid",
    "q53_winnowing",
    "q54_semi_anti_join",
    "q55_constraint_audit",
    "q62_fuzzy_editdistance",
    "q68_dedup_clusters",
    "q81_streaming_dedup",
    "q83_blocked_neardup_srp",
    "q85_multimodal_phash",
    "q87_sequence_packing",
    "q89_cross_source_contamination",
    "q50_correlation",
]
# --- r15 rotation preview (slot arithmetic for the next window rewrite,
# lesson 19) --- owed rows after r14, oldest first: the six r14
# sit-outs above (q91/q92/q93/q95/q96 at r10, q101 at r11), then the
# r11-vintage pool (q102/q103/q104/q105/q106/... per window_planner).
# Any r14-edited or new query is mandatory on top. Budget new queries
# BEFORE writing them (tests/test_round9_invariants.py staleness
# ratchet).
QUERIES_ORDERED = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
QUERIES_ORDERED.update(QUERIES)
QUERIES.clear()
QUERIES.update(QUERIES_ORDERED)

__all__ = ["QUERIES", "QuerySpec", "register"]
