"""Diff two bench JSON outputs (or BENCH_r{N}.json driver records).

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold]

Prints per-query deltas sorted by regression size, flagging queries
slower than ``threshold`` x their old time (default 1.5). Driver records
wrap the bench line under a truncated "tail"; both shapes are handled.
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc["queries"]
    if isinstance(doc.get("parsed"), dict):
        return doc["parsed"]["queries"]
    # driver record with truncated tail: regex out the per-query pairs
    tail = doc.get("tail", "")
    return {
        k: float(v)
        for k, v in re.findall(r'"(q\d+[a-z0-9_]*)":\s*([\d.]+)', tail)
    }


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    common = sorted(set(old) & set(new))
    print(
        f"{len(common)} common queries | old total "
        f"{sum(old[q] for q in common):.1f}s -> new "
        f"{sum(new[q] for q in common):.1f}s"
    )
    # Lesson 31: judge cross-round A/Bs by the ratio DISTRIBUTION over
    # common queries, never by totals — a uniform shift is environment
    # inflation, only outliers beyond the band are real deltas.
    ratios = sorted(new[q] / old[q] for q in common if old[q])
    if ratios:
        mid = ratios[len(ratios) // 2]
        p10 = ratios[len(ratios) // 10]
        p90 = ratios[9 * len(ratios) // 10]
        print(
            f"ratio distribution: median {mid:.3f} | p10 {p10:.3f} | "
            f"p90 {p90:.3f} (uniform shift = env inflation, lesson 31)"
        )
    rows = sorted(common, key=lambda q: new[q] - old[q], reverse=True)
    flagged = 0
    for q in rows:
        ratio = new[q] / old[q] if old[q] else float("inf")
        mark = " <-- REGRESSION" if ratio > threshold and new[q] - old[q] > 0.3 else ""
        if mark:
            flagged += 1
        if mark or abs(new[q] - old[q]) > 0.2:
            print(f"{q:34s} {old[q]:7.2f} -> {new[q]:7.2f} ({ratio:5.2f}x){mark}")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print("new-only:", ", ".join(only_new))
    print(f"{flagged} queries over {threshold}x")


if __name__ == "__main__":
    main()
