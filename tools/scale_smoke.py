"""10x scale smoke: replicate the sf0.1 tables to ~sf1 in /tmp and measure
how the core query families scale.

A query whose cost model is right for 100 TB should scale ~linearly in
rows here (scan/agg/window/join families) or stay bounded by its caps
(LSH bucket cap, block caps). A super-linear ratio flags a plan that
would not survive a real scale-up.

Scaled tables are written as MULTI-FILE directories (one file per
replica copy): a 10x corpus in production arrives as ~10x files (one
per ingest batch), and Spark's scan parallelism comes from the
file/split count — a single parquet file capping a documents scan at
1-2 splits is a smoke artifact, not a plan property (measured: q105
38.4s -> 5.5s from parallelism alone).

Replication keeps semantics honest:
- events/lineitem: pure row replication with key offsets (aggregates
  scale linearly; join fan-outs preserved because foreign keys keep
  their original domain).
- documents: doc_id offset + a per-copy marker token interleaved every
  2 words, so replicas are NOT near-duplicates of each other (Jaccard
  vs original ~0.2 < thresholds) and dedup queries see a 10x corpus,
  not a 10x duplicate blob.

Usage: python tools/scale_smoke.py [factor] [out_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
QUERIES_TO_RUN = [
    "q01_pricing_summary",   # wide hash aggregate
    "q05_route_topk",        # broadcast dim join + topk
    "q30_dedup_exact",       # content-hash group-by
    "q39_fingerprint",       # md5 projection scan
    "q47_moving_avg",        # per-key window
    "q69_lookback_range_join",  # binned range join
    "q71_token_counts",      # regexp columnar
    "q32_minhash_lsh_neardup",  # LSH (bucket-capped, sig-gated)
    "q34_embedding_topk",    # brute cosine (map-only)
    "q36_ann_srp_bucket",    # SRP-bucket ANN
    "q35_embedding_neardup",    # compound-block near-dup (legacy output)
    "q83_blocked_neardup_srp",  # compound-block near-dup (bounded blocks)
    "q87_sequence_packing",     # corpus-derived chunked packing
    "q88_pii_redaction_audit",  # columnar regexp scrub
    "q89_cross_source_contamination",  # fingerprint equi-join
    "q90_domain_mix_budget",    # per-source budget window
    "q92_simhash_neardup",      # 60-bit Hamming-LSH (capped buckets)
    # min-of-2 reps => rep 1 builds the per-corpus signature index, rep 2
    # measures the true warm per-batch cost (the production shape).
    "q98_incremental_dedup_indexed",
    "q99_quantiles_iqr_sketch",  # fixed-size sketch + rank-verify counting
    "q103_repetition_filters",   # explode+agg top-word, HOF bigram stats
    "q104_embedding_drift_audit",  # quantized snapshot centroid deltas
    "q105_ngram_decontamination",  # broadcast bench n-grams, map-side probe
    "q106_shard_manifest",         # md5-fold shard assign + tiny rollup
    "q107_length_bucket_padding",  # integer CASE bucket + 6-row agg
    "q108_semantic_dedup",         # SRP-clustered within-cluster pairs
    "q109_bpe_merge_step",         # vocab-bounded pair counts
    "q111_importance_weights",     # 256-bucket hashed-bigram contrast
    "q112_dup_cluster_histogram",  # CC labels + size rollup
    "q113_media_neardup_phash",    # pHash 4-band Hamming-LSH (uncapped)
    "q114_curated_shard_build",    # gates -> dedup -> DSIR -> shards
    "q150_media_neardup_capped",   # pHash LSH with hot-bucket cap ON
    "q151_split_leakage_audit",    # LSH pairs x md5 split rollup
    "q152_source_overlap_matrix",  # source-level shingle Jaccard
    "q153_domain_rank",            # 3-round integer power iteration
    "q155_vocab_growth",           # first-occurrence vocab deciles
    "q157_fd_violation_audit",     # per-FD distinct-count shuffles
    "q158_heavy_hitters",          # MG candidate pruning + recount
    # min-of-2: rep 1 builds q167's per-corpus index, rep 2 is the true
    # warm fixed-batch cost (same note as q98 above).
    "q167_keep_best_indexed",
    "q168_bpe_train_loop",         # vocab-bounded 8-merge loop
    "q169_retrieval_ndcg",         # top-k lists only, integer NDCG
    "q170_bucketed_ctas_join",     # pay-once bucketed write, SMJ read
    "q171_batch_ann_topk",         # batch scan + salted two-phase topk
    "q172_streaming_session_window",  # stateful session replay
    "q173_chi2_independence",      # contingency cells + quantized terms
    "q174_temperature_mix",        # sqrt-temperature ppm apportionment
    "q175_dynamic_partition_pruning",  # partitioned CTAS + DPP read
    "q176_hard_negative_mining",   # derived-plane bucket pair mining
    "q177_shuffle_interleave_audit",   # md5-order run lengths
    "q178_arrow_python_udf",       # Arrow-batched scalar Python UDF
    "q179_observed_metrics",       # CollectMetrics in-flight counters
    "q180_cohens_kappa",           # token-scan + source rollup
    "q181_ece_calibration",        # token-scan + 10-bin rollup
    "q131_cogroup_reconcile",      # 128-bucket Arrow cogroup (r10 dial)
    "q190_processing_time_timer_eviction",  # staged-arrival timer evict
    "q191_aqe_skew_join",          # runtime skew split (advisory ~ input)
    "q192_zonemap_layout_skipping",  # row-group min/max pruning (warm probe)
    "q193_event_time_timer_eviction",  # watermark-fired timer evictions
    # min-of-2: rep 1 pays the one-time Z/linear layout writes, rep 2 is
    # the warm probe cost (same note as q98/q167 above).
    "q194_zorder_multidim_skipping",   # trailing-dim Z-order skipping
    "q195_merge_rounds_materialized",  # partition-COW merge rounds
    "q196_compact_optimize",           # selective small-file bin-pack
    "q197_compact_bytes_optimize",     # byte-planned bin-pack (lineitem)
]


def build(out: Path, factor: int) -> None:
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO 16")
    for t, idcol, keyspan in (
        ("events", "event_id", 10_000_000),
        ("lineitem", "l_orderkey", 100_000_000),
    ):
        (out / f"{t}.parquet").mkdir(exist_ok=True)
        for c in range(factor):
            con.execute(
                f"""
                COPY (
                  SELECT * REPLACE ({idcol} + {c * keyspan} AS {idcol})
                  FROM read_parquet('{SRC}/{t}.parquet')
                ) TO '{out}/{t}.parquet/part-{c}.parquet' (FORMAT PARQUET)
                """
            )
    # documents: interleave a copy marker every 2 words so replicas are
    # not near-duplicates (they share <25% of shingles with the source).
    # NOTE the markers inflate replica token mass ~1.5x, so the "10x"
    # documents corpus carries ~14.5x tokens/n-grams — read doc-table
    # ratios against that, not 10x. One file per copy (ingest-batch
    # shape) so scan parallelism is realistic.
    (out / "documents.parquet").mkdir(exist_ok=True)
    for c in range(factor):
        con.execute(
            f"""
            COPY (
              SELECT doc_id + {c * 10_000_000} AS doc_id,
                     CASE WHEN {c} = 0 THEN text
                          ELSE array_to_string(
                            list_transform(string_split(text, ' '),
                              (w, i) -> CASE WHEN i % 2 = 0
                                        THEN w || ' x{c}'
                                        ELSE w END),
                            ' ')
                     END AS text,
                     lang, source, n_chars
              FROM read_parquet('{SRC}/documents.parquet')
            ) TO '{out}/documents.parquet/part-{c}.parquet' (FORMAT PARQUET)
            """
        )
    # embeddings: replicate with a small deterministic per-copy, per-
    # component perturbation so replicas are distinct vectors (not exact
    # copies whose cosine-1.0 pairs would swamp near-dup top-ks).
    (out / "embeddings.parquet").mkdir(exist_ok=True)
    for c in range(factor):
        con.execute(
            f"""
            COPY (
              SELECT vec_id + {c * 10_000_000} AS vec_id, label,
                     list_transform(embedding,
                       (x, i) -> CAST(x + {c} * 0.003 * (((i * 7919) % 13) - 6)
                                 AS FLOAT)) AS embedding
              FROM read_parquet('{SRC}/embeddings.parquet')
            ) TO '{out}/embeddings.parquet/part-{c}.parquet' (FORMAT PARQUET)
            """
        )
    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )


def main() -> None:
    # Usage: scale_smoke.py [factor] [out_dir] [query ...]
    # Trailing query names restrict the run (default: QUERIES_TO_RUN).
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_scaled")
    subset = sys.argv[3:]
    if subset:
        QUERIES_TO_RUN[:] = subset
    if not (out / "events.parquet").exists():
        t0 = time.perf_counter()
        build(out, factor)
        print(f"built {out} (factor {factor}) in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

    from nyc_yellow_taxi_trip_data_pipeline_spark.plans import QUERIES
    from nyc_yellow_taxi_trip_data_pipeline_spark.session import get_spark

    spark = get_spark("scale-smoke")

    # The MinHash family shares one session-memoized verified-pair
    # build (r16, plans/datapipe._minhash_verified_pairs): left warm,
    # min-of-2 would time memo HITS and the table's pair-generation
    # scale frontier — the property this tool exists to watch — would
    # silently vanish. Clear the memo before every rep so each rep
    # pays the full build (the pre-r16 measurement semantics);
    # consumer-side memo economics are bench.py's story, not this
    # tool's.
    from nyc_yellow_taxi_trip_data_pipeline_spark.plans import (
        datapipe as _dp,
    )

    # EVERY consumer of a shared-build memo (lesson 35's clear-list
    # trap, re-closed r17 after VERDICT r16 found q151 + the ANN family
    # missing): a consumer absent from this set would time memo HITS in
    # its 10x row and the scale frontier would silently vanish.
    MINHASH_MEMO_QUERIES = {
        # MinHash pair/CC ladder
        "q32_minhash_lsh_neardup",
        "q68_dedup_clusters",
        "q82_triangle_count",
        "q101_minhash_neardup_sharp",
        "q112_dup_cluster_histogram",
        "q144_keep_best_dedup",
        "q151_split_leakage_audit",
        # shingle/signature base tables (asymmetric delta-vs-index form)
        "q94_incremental_dedup",
        # SimHash pair ladder
        "q92_simhash_neardup",
        "q123_lsh_verify_editdist",
        # ANN rankings (q34/q36/q66 results scored by the evals)
        "q145_ann_recall_eval",
        "q164_retrieval_rank_eval",
        "q169_retrieval_ndcg",
        # DSIR shared-build consumers (r16): clear the bucket-count memo
        # so the 10x row times the real explode+md5 build, not a hit.
        "q111_importance_weights",
        "q114_curated_shard_build",
    }

    print(f"{'query':32s} {'sf0.1':>8s} {'x' + str(factor):>8s} {'ratio':>7s}")
    for name in QUERIES_TO_RUN:
        times = {}
        for label, sf_dir in (("base", SRC), ("big", str(out))):
            best = None
            for _ in range(2):
                if name in MINHASH_MEMO_QUERIES:
                    _dp._MINHASH_PAIRS_CACHE.clear()
                    _dp._MINHASH_CC_CACHE.clear()
                    _dp._MINHASH_SH_CACHE.clear()
                    _dp._MINHASH_SIGS_CACHE.clear()
                    _dp._SIMHASH_PAIRS_CACHE.clear()
                    _dp._ANN_RANKING_CACHE.clear()
                    _dp._DSIR_BUCKET_CACHE.clear()
                t0 = time.perf_counter()
                QUERIES[name].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            times[label] = best
        r = times["big"] / times["base"]
        print(
            f"{name:32s} {times['base']:8.2f} {times['big']:8.2f} {r:7.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
