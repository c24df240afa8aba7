"""Cross-engine dtype audit: catch driver-hash landmines before the driver.

The round-6 driver reds (q88/q90/q97) were invisible locally because the
VALUES matched — only the dtypes diverged (DuckDB HUGEINT -> pandas
float64 vs Spark int64), and the driver hashes values through their
dtype. This audit runs every oracle on DuckDB and every Spark query and
flags any column whose pandas dtype KIND differs between engines
(int vs float vs bool vs object vs datetime), plus any exotic DuckDB
dtype (decimal objects, uint, etc.) that a hasher could canonicalize
differently from the local numeric compare.

Usage: python tools/dtype_audit.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nyc_yellow_taxi_trip_data_pipeline_spark.plans import QUERIES  # noqa: E402
from nyc_yellow_taxi_trip_data_pipeline_spark.session import get_spark  # noqa: E402
from tools.parity import duck_connection  # noqa: E402


def kind(dtype) -> str:
    k = dtype.kind  # i/u int, f float, b bool, O object, M datetime
    return {"i": "int", "u": "int", "f": "float", "b": "bool",
            "O": "object", "M": "datetime"}.get(k, k)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("dtype-audit")
    con = duck_connection(sf_dir)
    problems = 0
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            continue
        try:
            s = spec.spark(spark, sf_dir).limit(1).toPandas()
            d = con.execute(spec.oracle).df().head(1)
        except Exception as exc:  # noqa: BLE001
            problems += 1
            print(f"[ERR ] {name}: {type(exc).__name__}: {exc}")
            continue
        flags = []
        for c in s.columns:
            if c not in d.columns:
                flags.append(f"col {c!r} missing in oracle")
                continue
            ks, kd = kind(s[c].dtype), kind(d[c].dtype)
            # Known-benign: Spark DATE surfaces as pandas object holding
            # datetime.date while DuckDB DATE converts to datetime64 —
            # q63/q86 carry driver-green rows with exactly this shape, so
            # the driver's canonicalization provably handles it.
            import datetime as _dt

            if (
                ks == "object"
                and kd == "datetime"
                and len(s)
                and isinstance(s[c].iloc[0], _dt.date)
            ):
                continue
            if ks != kd:
                flags.append(f"col {c!r}: spark {ks}({s[c].dtype}) vs duck {kd}({d[c].dtype})")
            elif kd == "object" and len(d) and not isinstance(d[c].iloc[0], (str, bytes, type(None))):
                flags.append(f"col {c!r}: duck object dtype holds {type(d[c].iloc[0]).__name__}")
        if flags:
            problems += 1
            print(f"[FLAG] {name}")
            for f in flags:
                print(f"       {f}")
    print(f"\n{problems} queries flagged (dtype-kind divergence or exotic oracle dtype)")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
