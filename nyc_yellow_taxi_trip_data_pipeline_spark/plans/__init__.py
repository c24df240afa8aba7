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
# order therefore decides which queries earn a hard external row. Round 7
# promotes (a) the three round-6 reds, now environment-proofed (HUGEINT
# SUM downcast per registry rule 3 — the one construct all three shared —
# plus quantized-BIGINT med/mad, length-arithmetic token counts, and a
# regexp_replace-only PII count), (b) queries NEW this round (q98-q100),
# then (c) queries whose latest green row is OLDEST: q64-q66 last
# verified in r2 (they were rows 51-53 of the r6 window and fell off the
# driver's 50-row budget), then the r5-green pool. Five r5 queries must
# sit out (50-slot budget): q30/q31/q13/q10/q12 — the most trivially-
# oracled of that pool (plain GROUP BY / keep-first window /
# distinct+sort / floor-bucket count / qavg battery), each unit-tested,
# with their constructs re-exercised by staying rows (q89/q94/q98 for
# content hashing, q18/q74 for windows, q03/q07 for date grouping,
# q01/q07/q96/q104 for quantized aggregation). Late-round additions
# q105-q119 take fifteen more slots; q03/q04/q61/q63, q38/q40/q56/q75,
# q42/q58, q39, q33/q34 and q70/q72 sit out for them (q33's Hamming
# banding is double-covered by staying q92/q113; q34's exact-cosine
# machinery by q66/q108; q70's md5-hash draw by staying q74; q72's
# partial-merge additivity by its unit test plus q102/q106's additive
# checksums) — the most trivially-oracled of the r5 pool
# (filter+group count / null counts / conditional aggs / date battery /
# lang-ID CASE / octet-length metadata / regex extract / long-format
# quantize / sketch battery / rank battery / md5 projection), their
# constructs still
# exercised by staying rows (q02 filters+casts, q07 date grouping+
# multi-agg, q91/q104 conditional aggregation, q37 text regex features,
# q41 multimodal metadata+decode, q75's quantization scheme inside
# q34/q66/q108, q84 sketches, q74's rank windows) and by unit goldens
# (tests/test_transforms.py covers the §2.12 date battery).
# Every query remains parity-gated regardless (tools/parity.py runs
# ALL of them).
_PRIORITY = [
    # (a) round-6 reds, fixed this round:
    "q88_pii_redaction_audit",
    "q90_domain_mix_budget",
    "q97_grouped_mad_outliers",
    # (b) new in round 7:
    "q98_incremental_dedup_indexed",
    "q99_quantiles_iqr_sketch",
    "q100_summary_stats_sketch",
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
    # (b) round-7 second batch (q120-q126). Seven more r5-green rows sit
    # out for them: q01/q05/q08/q09/q37/q71/q79 — each construct double-
    # covered by staying rows (q01's quantized multi-agg by q07+q121;
    # q05's broadcast-join topk by q06+q120; q08's argmax window by
    # q74+q122; q09's exact percentile by its q99 sketch twin + staying
    # q11; q37's regex features by q103/q88; q71's token budget by
    # q125+q107; q79's staged gates by q114's full funnel) and unit-
    # tested locally.
    "q120_join_skew_audit",
    "q121_salted_skew_join",
    "q122_scd2_intervals",
    "q123_lsh_verify_editdist",
    "q124_hash_threshold_sample",
    "q125_word_freq_spectrum",
    "q126_training_mix_schedule",
    # (b) round-7 third batch (q127-q129). Three more r5-green rows sit
    # out: q74 (md5-ordered rank draw — double-covered by q126's md5
    # schedule keys and q70's unit-tested md5 twins), q84 (sketch
    # battery — q99/q100 sketch twins hold window slots), q41 (Arrow
    # mapInPandas decode — q64/q65 exercise the same iterator-Arrow
    # path and are older-green, so they keep their slots).
    "q127_quality_classifier",
    "q128_bloom_prefilter_join",
    "q129_chunk_dup_mass",
    # (b) round-7 fourth batch (q130-q132). Three more r5-green rows sit
    # out: q80 (stream-static join — q95's stream-static anti-join holds
    # a slot and q130 now hard-verifies multi-batch streaming), q06
    # (broadcast dim join — q117/q121/q128 all exercise broadcast-side
    # joins), q11 (summary battery — q99/q100 rank-verified sketch twins
    # hold slots; the exact path stays parity-gated locally).
    "q130_streaming_late_drop",
    "q131_cogroup_reconcile",
    "q132_vocab_oov_coverage",
    # (b) q133 stream-stream LEFT OUTER join (watermark-expiry null
    # emission). q32 sits out for it: its MinHash band-join machinery is
    # double-covered by staying rows q98 (asymmetric band join against
    # the materialized index) and q101 (the SAME pipeline under the
    # sharpened 24-hash dial, parameterized oracle).
    "q133_stream_outer_join",
    # (b) q134 chained stateful operators (join -> windowed agg, the
    # Spark 4 multi-stateful pipeline). q07 sits out: date-grouped
    # multi-agg is double-covered by staying rows q02 (the cast/filter
    # battery), q44/q110 (hourly windows), and q122 (per-type rollup).
    "q134_chained_stateful",
    # (b) q135 dropDuplicatesWithinWatermark (bounded-state streaming
    # dedup with oracle-checked state expiry). q69 sits out: interval
    # temporal-join semantics are hard-verified by staying q133/q134,
    # and the binned range-join operator keeps its plan-asserted unit
    # tests.
    "q135_streaming_dedup_within_watermark",
    # (b) q136 k-anonymity audit + q137 label-shift TVD (governance
    # gates). q73/q82 sit out: q73's iterative localCheckpoint loop
    # shape is held in-window by q112 (the q68 CC pipeline), and q82's
    # degree-capped self-join is cousin to staying q92/q113 band joins;
    # both keep their local parity + plan-audit coverage.
    "q136_k_anonymity_audit",
    "q137_label_shift_tvd",
    # (b) q138-q140 (TPC-H Q5-shape star join, A/B exposure audit,
    # winsorized mean). q02/q65/q57 sit out — the hardest cuts yet, but
    # a never-verified query outranks a 5th re-verification: q02's
    # cast/filter battery recurs across staying rows (q121/q128 filters,
    # q122/q138 casts+date pushdown) and keeps its §2.12 unit goldens;
    # q65's Arrow map-iter shape is held by staying q64 and q113; q57's
    # GROUPING SETS is a Catalyst built-in with local parity + plan
    # audit.
    "q138_star_join_q5",
    "q139_ab_exposure_audit",
    "q140_winsorized_mean",
    # (b) q141 (time-RANGE frame) and q142 (IGNORE NULLS forward fill)
    # — window mechanics no other row exercises. q64/q66 sit out:
    # q113's Arrow map-iter media stage and q108's cluster-pruned
    # similarity hold those construct families in-window. q143 (gap
    # audit) stays out — its lag-window shape is held by q122 — and
    # q67/q78 keep the LAST stateful-UDF and UDTF external rows.
    "q141_trailing_range_window",
    "q142_forward_fill",
    # q143-q145 stay OUT of the 50-slot window (parity-gated locally at
    # two SFs + bare session): they compose machinery other rows hold —
    # q143's lag window (q122), q144 = q68's CC + an argmax window
    # (q112 carries the CC pipeline), q145 composes the q34/q36/q66
    # oracles verbatim. The remaining (c) rows are the LAST external
    # representatives of their constructs and keep their slots.
    # (c) oldest green first — r2:
    # (c) last green row is r5:
    "q67_streaming_sessionize",
    "q78_chunk_windows_udtf",
]
QUERIES_ORDERED = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
QUERIES_ORDERED.update(QUERIES)
QUERIES.clear()
QUERIES.update(QUERIES_ORDERED)

__all__ = ["QUERIES", "QuerySpec", "register"]
