"""Benchmark harness: runs the full query inventory at a scale-factor dir
and prints ONE JSON line with total + per-query wall seconds.

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism + shuffle partitions (default 32)
  BENCH_QUERIES       comma-separated subset (default: all registered)

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

    # Warm the JVM/codegen path so query #1 doesn't pay session startup.
    QUERIES["q05_route_topk"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in names:
        t0 = time.perf_counter()
        QUERIES[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        per_query[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "full_query_inventory_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_queries": len(names),
            }
        )
    )


if __name__ == "__main__":
    main()
