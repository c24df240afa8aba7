"""Ad-hoc per-query timer: `python tools/timequeries.py q32 q68 ... [--sf DIR] [--reps N]`.

Times the named queries (prefix match on registry keys) against the
given sf dir on one warm session, min over reps — matching bench.py's
protocol (lesson 10: a cold pass inflates uniformly) without paying for
the whole inventory.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    sf_dir = "/root/testdata/sf0.1"
    reps = 2
    names = []
    it = iter(argv)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--reps":
            reps = int(next(it))
        else:
            names.append(a)

    from nyc_yellow_taxi_trip_data_pipeline_spark.plans import QUERIES
    from nyc_yellow_taxi_trip_data_pipeline_spark.session import get_spark

    spark = get_spark()
    picked = []
    for n in names:
        picked.extend(
            k for k in QUERIES if k == n or k.startswith(n + "_")
        )
    # JVM/codegen warm-up so the first timed query isn't inflated.
    from pyspark.sql import functions as F  # noqa: PLC0415

    spark.range(1_000_000).agg(F.sum("id")).collect()
    for k in picked:
        # warm-up pass is counted in the min like bench.py's min-of-N
        best = None
        for _ in range(reps):
            t0 = time.time()
            QUERIES[k].spark(spark, sf_dir).collect()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        print(f"{k:44s} {best:7.2f}s  (min of {reps})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
