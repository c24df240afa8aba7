"""Regenerate QUERIES.md (the query index) from the live registry."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nyc_yellow_taxi_trip_data_pipeline_spark.plans import QUERIES  # noqa: E402


def main() -> None:
    lines = [
        "# Query index — auto-generated from plans/registry.py",
        "",
        "Regenerate: `python tools/gen_query_index.py` (writes this file).",
        "Every query is a (Spark DataFrame program, DuckDB oracle SQL) pair;",
        '"oracle" = hash-checked value-exact vs DuckDB at sf0.01 (and spot-',
        "checked at sf0.1); all are run by `tools/parity.py` and `bench.py`.",
        "",
        "| query | tags | oracle | description |",
        "|---|---|---|---|",
    ]
    for name in sorted(QUERIES):
        s = QUERIES[name]
        desc = " ".join(s.description.split())
        lines.append(
            f"| {name} | {', '.join(s.tags)} | "
            f"{'yes' if s.oracle else 'rows-only'} | {desc} |"
        )
    out = Path(__file__).resolve().parent.parent / "QUERIES.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(QUERIES)} queries)")


if __name__ == "__main__":
    main()
