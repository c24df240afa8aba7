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
# order therefore decides which queries earn a hard external row. Round 8
# pays the rotation debt the round-7 verdict flagged: every round-7
# addition went green in CORRECTNESS_r07 (50/50), so those 45 rows are the
# FRESHEST on the board and fund the slots. The r8 window is therefore:
# (a) q64/q65/q66 — last external-green in r2, five rounds stale (the
#     Arrow map-iter multimodal pair and the IVF cluster-pruned ANN);
# (b) q143-q149 — registered late in r7, never driver-verified
#     (q146 additionally carries this round's signed-div fix and NEEDS a
#     hard row to prove the quantized form under the driver env);
# (b2) round-8 NEW queries q150-q153 (never verified by definition);
# (c) the r5-green pool (36 of its 40 — four sit out for (b2), see the
#     inline rationale; sitting out keeps them AT r5, the boundary).
# Result: after r8, no query's latest external row is older than r5,
# and only the four documented sit-outs are older than r7. All queries
# remain parity-gated regardless (tools/parity.py runs ALL of them).
_PRIORITY = [
    # (a) r2-stale multimodal/ANN trio:
    "q64_multimodal_resize",
    "q65_frame_sample",
    "q66_ivf_ann",
    # (b) never driver-verified round-8 additions (a never-verified query
    # outranks a re-verification): q150 capped media near-dup (the
    # scale-safe q113 twin the r7 verdict asked to oracle-check), q151
    # split-leakage audit, q152 source overlap matrix, q153 domain rank.
    # Four r5-green rows sit out for them — the most trivially-oracled of
    # that pool, constructs all double-covered by staying rows: q30 exact
    # dedup (md5 fingerprint groups recur in q94/q98/q149/q151), q31
    # keep-first window (q144's keep-best window is in-window, q122's
    # row_number machinery stays), q13 distinct+sort (Catalyst built-ins;
    # q19/q58 set/rank coverage stays), q10 floor-bucket histogram
    # (q107/q111 bucket rollups went green in r7).
    "q150_media_neardup_capped",
    # q154 multi-watermark union (min policy, empirically pinned) also
    # takes a slot: q03 sits out for it — filter+group-count constructs
    # are held by staying rows (q02 filter/cast battery, q07 date
    # grouping, q121/q128 filtered joins) and its §2 parity row.
    "q154_streaming_union_watermarks",
    "q151_split_leakage_audit",
    "q152_source_overlap_matrix",
    "q153_domain_rank",
    # Round-8 second batch q155-q157 (vocab growth / l-diversity / FD
    # audit). Three more r5-green rows sit out: q04 (null counts —
    # construct held by staying q02 cast/filter battery + unit tests),
    # q12 (error-metric battery — q146's exact regression row stays in-
    # window and the ML metrics are bounds-tested), q63 (date battery —
    # q07 date grouping stays; §2.12 goldens pin the conventions).
    "q155_vocab_growth",
    "q156_l_diversity_audit",
    "q157_fd_violation_audit",
    # Round-8 third batch: q158 Misra-Gries exact heavy hitters, q159
    # max-policy watermark twin. Two more r5-green rows sit out: q61
    # (conditional aggs — CASE-sum machinery held by staying q136/q156
    # and r7-green q91/q104), q39 (md5 projection — fingerprint
    # constructs held by staying q151/q153 and r7-green q94/q98/q106).
    "q158_heavy_hitters",
    "q159_streaming_union_watermark_max",
    # q160 Python DataSource scan (Spark 4 extension surface). q40 sits
    # out: octet-length metadata is held by staying q41/q64/q65 (the
    # full multimodal Arrow path) and its unit tests.
    "q160_python_datasource_scan",
    # q161 built-in session_window + q162 VARIANT round-trip (Spark 4
    # surfaces). Two more r5 sit-outs: q42 (sketch bounds battery —
    # held by r7-green q99/q100 twins and staying q84), q56 (regex
    # extract — held by staying q37 and r7-green q88/q103 regex rows).
    "q161_session_window_batch",
    "q162_variant_roundtrip",
    # q163 CUPED adjusted A/B readout. q33 sits out: its 16-bit SimHash
    # fingerprint construct is held in-window by q113/q150 (Hamming-LSH
    # banding on 56-bit fingerprints) and r6-green q92.
    "q163_cuped_adjusted_ab",
    # q164 rank-weighted retrieval eval (exact AP@10/RR). q38 sits out:
    # the lang-ID CASE battery is held by staying q37 text features and
    # r5-green q52's char-ngram twin plus unit goldens.
    "q164_retrieval_rank_eval",
    # q165 corpus datasheet (release integrity battery). q41 sits out —
    # the LAST r5 cut this round: its Arrow map-iter decode shape is
    # held in-window by q64/q65/q113/q150 (four Arrow media rows).
    "q165_corpus_datasheet",
    # q166 Neyman allocation (exact stratified design). q57 sits out:
    # GROUPING SETS is a Catalyst built-in with local parity + plan
    # audit, its rollup shape held by staying q17/q26 cousins' history
    # and in-window q07 multi-agg.
    "q166_neyman_allocation",
    # (b) never driver-verified round-7 tail:
    "q143_completeness_gaps",
    "q144_keep_best_dedup",
    "q145_ann_recall_eval",
    "q146_integer_ols_trend",
    "q147_cohort_retention",
    "q148_component_variance",
    "q149_cross_language_dups",
    # (c) the full r5-green pool, oldest remaining external rows:
    "q01_pricing_summary",
    "q02_clean_features",
    "q05_route_topk",
    "q06_left_join_dim",
    "q07_daily_multi_agg",
    "q08_argmax_day",
    "q09_quantiles_iqr",
    "q11_summary_stats",
    "q32_minhash_lsh_neardup",
    "q34_embedding_topk",
    "q37_text_quality",
    "q58_rank_family",
    "q69_lookback_range_join",
    "q70_stratified_sample",
    "q71_token_counts",
    "q72_incremental_rollup",
    "q73_kmeans_step",
    "q74_reservoir_topn",
    "q75_embedding_quantize",
    "q79_curation_funnel",
    "q80_stream_static_join",
    "q82_triangle_count",
    "q84_grouped_sketch_quantiles",
]
QUERIES_ORDERED = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
QUERIES_ORDERED.update(QUERIES)
QUERIES.clear()
QUERIES.update(QUERIES_ORDERED)

__all__ = ["QUERIES", "QuerySpec", "register"]
