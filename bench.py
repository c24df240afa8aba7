"""Benchmark harness: runs the full query inventory at a scale-factor dir
and prints ONE JSON line with total + per-query wall seconds.

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism + shuffle partitions (default 32)
  BENCH_QUERIES       comma-separated subset (default: all registered)
  BENCH_ML=1          also run the reference-shaped ML benchmark
                      (RF numTrees=100 maxDepth=10 on 300k rows x 17-dim
                      vector - the reference's headline 115.2s/8.8s
                      fit/eval workload, BASELINE.md). Off by default to
                      keep the per-round bench query-focused; measured
                      2026-08-14 on this machine: fit 23.7s, eval 2.7s
                      (16-partition fit — see the repartition note below).
  BENCH_SKIP_QUERIES=1  skip the query inventory (ML-only iteration).

Each query is materialized through the `noop` sink — full execution of the
physical plan (scan, shuffles, Python stages) without collect-to-driver or
disk-write noise.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from nyc_yellow_taxi_trip_data_pipeline_spark.plans import QUERIES  # noqa: E402
from nyc_yellow_taxi_trip_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    names = (
        os.environ["BENCH_QUERIES"].split(",")
        if os.environ.get("BENCH_QUERIES")
        else list(QUERIES)
    )
    # Stateful streaming replays leave background state-store maintenance
    # running briefly after they stop (local mode shares one JVM); run them
    # LAST so that churn never inflates another query's measurement.
    names.sort(key=lambda n: "streaming" in QUERIES[n].tags)

    # Warm the engine so query #1 doesn't pay session startup: one scan +
    # shuffle + join (q05), one higher-order-function/explode pass over a
    # small documents sample (codegen for the text/dedup family), and one
    # Arrow round-trip (Python worker pool for the pandas-UDF family).
    # Steady-state per-query latency is what the bench measures; cold-JVM
    # cost would otherwise land entirely on whichever query runs first.
    from pyspark.sql import functions as F  # noqa: E402

    from nyc_yellow_taxi_trip_data_pipeline_spark.sources.io import (  # noqa: E402
        read_table,
    )

    try:
        QUERIES["q05_route_topk"].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        (
            read_table(spark, sf_dir, "documents")
            .limit(1000)
            .select(F.explode(F.split("text", " ")).alias("w"))
            .groupBy("w")
            .count()
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        spark.range(1000).toPandas()
    except Exception:  # noqa: BLE001 — warmup is best-effort, never fatal
        pass

    # Per-query MIN over up to BENCH_REPS passes. The host's CPU
    # availability swings >2x between runs (shared virtualization), and
    # the FIRST pass additionally pays one-time codegen/JIT/state-store
    # setup per plan, so min-of-N is the standard way to measure the
    # engine rather than the neighbors or the JVM warmup. The second pass
    # is therefore GUARANTEED (a cold single pass once misread as a
    # uniform 1.5-4x regression when the inventory outgrew the old 240s
    # budget); passes beyond the second run only while inside the time
    # budget, keeping worst-case wall bounded at roughly
    # cold_pass + warm_pass, plus budget-gated extra passes (the second
    # pass runs UNCONDITIONALLY even when the cold pass alone blew the
    # budget — min-of-N must never degrade to min-of-1).
    reps = int(os.environ.get("BENCH_REPS", "3"))
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))  # tracks inventory growth (195 queries x 3 reps ~ 600-700s, raised preemptively r15 for the measured ~1.12x env inflation, lesson 10)
    # One failing query must never cost the run its other timings (round 5
    # lost the whole benchmark to a single AnalysisException): record the
    # error, keep going.
    per_query: dict[str, float] = {}
    errors: dict[str, str] = {}
    passes_done = 0
    t_bench = time.perf_counter()
    if os.environ.get("BENCH_SKIP_QUERIES") == "1":
        # ML-only iteration mode: skip the (multi-minute) query inventory
        # when re-measuring just the BENCH_ML numbers.
        names = []
    for rep in range(reps):
        if rep > 1 and time.perf_counter() - t_bench > budget_s:
            break
        for name in names:
            if name in errors:
                continue
            t0 = time.perf_counter()
            try:
                QUERIES[name].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # noqa: BLE001 — record and continue
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                per_query.pop(name, None)
                continue
            dt = round(time.perf_counter() - t0, 3)
            if name not in per_query or dt < per_query[name]:
                per_query[name] = dt
        passes_done += 1

    total = sum(per_query.values())
    result = {
        "metric": "full_query_inventory_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(names),
        "reps": passes_done,
        "agg": "min",
    }
    # Shared-build accounting (r17, VERDICT r16 item #1 — additions
    # only): the session-memoized family builds (MinHash pairs/CC,
    # SimHash pairs, ANN rankings, DSIR buckets) land on rep 1 of their
    # first consumer and are excluded from every per-query MIN, so
    # `value` alone understates a cold session by this one-time cost.
    # The memo fills record their exclusive wall seconds per family
    # (plans/datapipe.shared_build_seconds); report the sum + breakdown
    # alongside the unchanged totals.
    from nyc_yellow_taxi_trip_data_pipeline_spark.plans import (  # noqa: E402
        datapipe as _datapipe,
    )

    builds = _datapipe.shared_build_seconds(spark.sparkContext.applicationId)
    result["shared_build_sec"] = round(sum(builds.values()), 3)
    result["shared_builds"] = builds
    if errors:
        result["errors"] = errors

    if os.environ.get("BENCH_ML") == "1":
        from pyspark.sql import functions as F  # noqa: PLC0415

        from nyc_yellow_taxi_trip_data_pipeline_spark.ml import (  # noqa: PLC0415
            FeatureSpec,
            evaluate,
            train,
        )
        from nyc_yellow_taxi_trip_data_pipeline_spark.sources.io import (  # noqa: PLC0415
            read_table,
        )

        li = read_table(spark, sf_dir, "lineitem")
        df = li.limit(300000).select(
            "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            (F.col("l_quantity") * F.col("l_extendedprice")).alias("f1"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("f2"),
            (F.col("l_extendedprice") * (1 + F.col("l_tax"))).alias("f3"),
            F.hour("l_shipdate").cast("double").alias("f4"),
            F.dayofweek("l_shipdate").cast("double").alias("f5"),
            F.month("l_shipdate").cast("double").alias("f6"),
            (F.col("l_quantity") + F.col("l_tax")).alias("f7"),
            (F.col("l_quantity") - F.col("l_discount")).alias("f8"),
            (F.col("l_quantity") * 2).alias("f9"),
            (F.col("l_discount") * 100).alias("f10"),
        ).repartition(16).cache()
        # limit() collapses to ONE partition — without the repartition the
        # whole RandomForest fit (tree-statistics aggregation every level)
        # ran single-threaded on a 32-core box (measured round 8: 101.5s
        # at 1 partition, 23.4s at 16, 139.9s at 32 where per-level task
        # overhead swamps the 300k-row compute). Determinism is safe:
        # Dataset.randomSplit sorts within partitions before sampling.
        df.count()
        spec = FeatureSpec(
            label="l_extendedprice",
            numeric=(
                "l_quantity", "l_discount", "l_tax", "f1", "f2", "f3", "f4",
                "f5", "f6", "f7", "f8", "f9", "f10",
            ),
            categorical=("l_returnflag",),
            num_trees=100,
            max_depth=10,
        )
        t0 = time.perf_counter()
        model, _, test_df = train(df, spec)
        result["ml_fit_sec"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        metrics = evaluate(model, test_df, "l_extendedprice")
        result["ml_eval_sec"] = round(time.perf_counter() - t0, 1)
        result["ml_r2"] = round(metrics["r2"], 4)
        df.unpersist()

    # The driver captures stdout with a bounded tail, which clipped ~28
    # per-query numbers out of BENCH_r06. Persist the full JSON to a file
    # so round-over-round comparison never depends on tail luck.
    full_path = os.environ.get(
        "BENCH_FULL_PATH", str(Path(__file__).resolve().parent / "BENCH_FULL.json")
    )
    try:
        Path(full_path).write_text(json.dumps(result, indent=2) + "\n")
    except OSError as exc:
        print(f"warning: could not write {full_path}: {exc}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
