"""Reproducible ML-baseline benchmark (ARCHITECTURE.md "Measured vs the
reference baseline").

Reference workload shape (BASELINE.md): RandomForestRegressor
numTrees=100 maxDepth=10 on 300k rows with a 17-dim scaled feature
vector and a seeded 80/20 split. This harness rebuilds that shape
deterministically from sf0.1 lineitem (4 numeric features + a 12-level
ship-month categorical -> 17 assembled dims after one-hot with
handleInvalid='keep') and times pipeline fit and test predict+eval.

Round-8 lesson 12 is load-bearing here: `limit(n)` collapses to ONE
partition, so the frame is `repartition(16)` before caching — 16, not
the core count, because per-tree-level task overhead swamps a 300k-row
fit at 32 partitions (measured 23.4s vs 139.9s).

Usage: python tools/ml_bench.py [sf_dir]   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from nyc_yellow_taxi_trip_data_pipeline_spark.ml import (  # noqa: E402
    FeatureSpec,
    evaluate,
    train,
)
from nyc_yellow_taxi_trip_data_pipeline_spark.session import get_spark  # noqa: E402
from nyc_yellow_taxi_trip_data_pipeline_spark.sources.io import read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("ml-bench")
    li = read_table(spark, sf_dir, "lineitem")
    frame = (
        li.orderBy("l_orderkey", "l_linenumber")  # deterministic 300k slice
        .limit(300_000)
        .repartition(16)  # lesson 12: limit() collapsed to ONE partition
        .select(
            F.col("l_quantity").alias("qty"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_discount").alias("discount"),
            F.col("l_tax").alias("tax"),
            F.date_format("l_shipdate", "MMM").alias("ship_month"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                + F.col("l_tax") * F.col("l_quantity")
            ).alias("net_total"),
        )
        .cache()
    )
    n = frame.count()  # materialize before timing the fit
    spec = FeatureSpec(
        label="net_total",
        numeric=("qty", "price", "discount", "tax"),
        categorical=("ship_month",),
        num_trees=100,
        max_depth=10,
    )
    t0 = time.perf_counter()
    model, train_df, test_df = train(frame, spec)
    fit_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    metrics = evaluate(model, test_df, spec.label)
    eval_s = time.perf_counter() - t0
    dims = model.transform(test_df.limit(1)).select("features").first()[
        "features"
    ].size
    print(
        json.dumps(
            {
                "metric": "ml_rf_fit_seconds",
                "value": round(fit_s, 1),
                "unit": "sec",
                "rows": n,
                "feature_dims": dims,
                "fit_s": round(fit_s, 1),
                "predict_eval_s": round(eval_s, 1),
                "r2": round(metrics["r2"], 4),
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
