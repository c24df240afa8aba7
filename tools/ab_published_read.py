"""Isolated A/B of the published-read memo (`plans/datapipe.
_read_published_parquet`) on q192/q194 — VERDICT r16 item #5.

r16 claimed the memo saves ~0.1 s/rep of driver-side file listing +
schema discovery on the zonemap/Z-order probes, but the driver-level
deltas (0.09/0.08 s) sat inside the host-noise band. This tool pins the
claim in ONE session with the memo toggled per rep and the reps
INTERLEAVED (memo-on, memo-off, memo-on, ...), so environment drift is
shared by both arms and the paired per-rep deltas are the statistic —
not two totals taken minutes apart.

The off arm monkeypatches the memo function to a direct
``spark.read.parquet`` (exactly the pre-r16 code path); the on arm
restores the real function. The layout itself is built once, warm, in
both arms (rep 0 of each query is discarded as the build rep).

Usage: python tools/ab_published_read.py [reps]   (default 10)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES_AB = ["q192_zonemap_layout_skipping", "q194_zorder_multidim_skipping"]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from nyc_yellow_taxi_trip_data_pipeline_spark.plans import QUERIES
    from nyc_yellow_taxi_trip_data_pipeline_spark.plans import datapipe as dp
    from nyc_yellow_taxi_trip_data_pipeline_spark.session import get_spark

    spark = get_spark("ab-published-read")

    real = dp._read_published_parquet

    def bypass(s, path):  # the pre-r16 path: fresh listing every read
        return s.read.parquet(path)

    results: dict[str, dict[str, list[float]]] = {}
    for name in QUERIES_AB:
        q = QUERIES[name]
        # build + warm the published layout (and the JVM) once
        q.spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times: dict[str, list[float]] = {"on": [], "off": []}
        for r in range(reps):
            for arm in ("on", "off"):
                # NOTE: never clear _PARQUET_DF_CACHE here — the bypass
                # ignores it, and clearing would force the NEXT on-rep
                # to refill (both arms would then pay the listing cost
                # and the A/B would read as a null result by design).
                dp._read_published_parquet = real if arm == "on" else bypass
                t0 = time.perf_counter()
                q.spark(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[arm].append(time.perf_counter() - t0)
        dp._read_published_parquet = real
        results[name] = times

    print(f"\n{'query':36s} {'arm':>4s} {'min':>7s} {'median':>7s} {'mean':>7s}")
    for name, times in results.items():
        for arm in ("on", "off"):
            ts = sorted(times[arm])
            med = ts[len(ts) // 2]
            print(
                f"{name:36s} {arm:>4s} {ts[0]:7.3f} {med:7.3f} "
                f"{sum(ts) / len(ts):7.3f}"
            )
        deltas = sorted(
            off - on
            for on, off in zip(times["on"], times["off"])
        )
        med_d = deltas[len(deltas) // 2]
        pos = sum(1 for d in deltas if d > 0)
        print(
            f"{'':36s} paired delta (off-on): median {med_d:+.3f}s, "
            f"{pos}/{len(deltas)} reps positive"
        )


if __name__ == "__main__":
    main()
