"""Dump `.explain("formatted")` for a set of queries to files.

Used by the optimization rounds to commit before/after physical plans
(`plans/r16/<query>_{before,after}.txt`): the judge cannot run Spark and
checks plan claims against these files.

Usage (from a repo root — also works from a worktree of an older head,
with THIS file copied alongside or invoked by absolute path while
PYTHONPATH points at that worktree):

  python tools/dump_plans.py OUTDIR SUFFIX q01_foo q02_bar ...
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/dump_plans.py \
      plans/r16 after q101_minhash_neardup_sharp

Writes OUTDIR/<query>_<SUFFIX>.txt. Queries are built (plan-build time —
streaming replays execute here, memoized builds run their jobs) and the
FINAL batch plan string is captured without executing the noop sink.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.getcwd())


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    from nyc_yellow_taxi_trip_data_pipeline_spark.plans import QUERIES
    from nyc_yellow_taxi_trip_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans")
    for name in names:
        entry = QUERIES[name]
        spark.sparkContext.setJobDescription(f"dump_plans: {name}")
        df = entry.spark(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"[ok] {path} ({len(buf.getvalue())} chars)")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
