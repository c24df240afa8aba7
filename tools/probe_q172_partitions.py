"""q172 state-partition economics probe (VERDICT r16 item #4).

Lesson 23: stateful-replay cost is per-GROUP protocol + per-BATCH
machinery, and state PARTITIONS multiply the per-batch floor — the
timer-eviction replays (q190/q193) measured 1 partition beating 8.
q172 (built-in session_window, 4-batch file replay, memory sink) is
the one streaming row whose partition count (8, set r13) was never
re-measured after that lesson landed. This probe replicates q172's
exact pipeline with the partition count as a dial and times N reps
per setting, interleaved (environment drift shows up as cross-setting
correlation, not bias).

Usage: python tools/probe_q172_partitions.py [reps] [partition ...]
Defaults: 5 reps, partitions 1 2 8.

The output rows feed OPTIMIZATION_r17.md; the query body is only
edited if a setting beats the current 8 outside noise.
"""

from __future__ import annotations

import os
import shutil
import sys
import time
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_once(spark, n_parts: int) -> tuple[float, int]:
    from pyspark.sql import functions as F

    from nyc_yellow_taxi_trip_data_pipeline_spark.sources.io import read_table
    from nyc_yellow_taxi_trip_data_pipeline_spark.streaming.pipeline import (
        scoped_shuffle_partitions,
        unload_state_stores,
    )

    ev = read_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts"
    )
    replay_dir = f"/tmp/q172_probe_{uuid.uuid4().hex[:8]}"
    try:
        written: set = set()
        for i in range(4):
            ev.filter(F.pmod("event_id", F.lit(4)) == i).coalesce(
                1
            ).write.mode("append" if i else "overwrite").parquet(replay_dir)
            new = [
                f
                for f in os.listdir(replay_dir)
                if f.endswith(".parquet")
                and not f.startswith("_")
                and f not in written
            ]
            assert len(new) == 1, new
            os.rename(
                os.path.join(replay_dir, new[0]),
                os.path.join(replay_dir, f"{i:02d}.parquet"),
            )
            written.add(f"{i:02d}.parquet")

        schema = spark.read.parquet(replay_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(replay_dir)
        )
        agg = (
            stream.withWatermark("ts", "90 minutes")
            .groupBy(
                F.session_window("ts", "30 minutes").alias("w"), "user_id"
            )
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.expr("unix_millis(w.start)").alias("session_start_ms"),
                F.expr("unix_millis(w.end)").alias("session_end_ms"),
                "n_events",
            )
        )
        sink = f"q172_probe_out_{uuid.uuid4().hex[:8]}"
        t0 = time.perf_counter()
        with scoped_shuffle_partitions(spark, n_parts):
            q = (
                agg.writeStream.format("memory")
                .queryName(sink)
                .outputMode("append")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
                unload_state_stores(spark)
        dt = time.perf_counter() - t0
        n_rows = spark.table(sink).count()
        spark.catalog.dropTempView(sink)
        return dt, n_rows
    finally:
        shutil.rmtree(replay_dir, ignore_errors=True)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    settings = [int(a) for a in sys.argv[2:]] or [1, 2, 8]

    from nyc_yellow_taxi_trip_data_pipeline_spark.session import get_spark

    spark = get_spark("q172-partition-probe")
    # warm: one throwaway replay at the current default
    run_once(spark, 8)

    times: dict[int, list[float]] = {n: [] for n in settings}
    rows_seen: dict[int, set[int]] = {n: set() for n in settings}
    for r in range(reps):
        for n in settings:  # interleaved A/B/C
            dt, n_rows = run_once(spark, n)
            times[n].append(dt)
            rows_seen[n].add(n_rows)
            print(f"rep {r} parts {n}: {dt:6.3f}s rows={n_rows}", flush=True)

    print(f"\n{'parts':>6s} {'min':>7s} {'median':>7s} {'max':>7s} rows")
    for n in settings:
        ts = sorted(times[n])
        med = ts[len(ts) // 2]
        print(
            f"{n:6d} {ts[0]:7.3f} {med:7.3f} {ts[-1]:7.3f} "
            f"{sorted(rows_seen[n])}"
        )
    # Output-row counts must be identical across settings: the session
    # algebra does not depend on the state layout.
    assert len({frozenset(v) for v in rows_seen.values()}) == 1, rows_seen


if __name__ == "__main__":
    main()
