"""Registry binding each Spark query to its DuckDB oracle SQL.

Determinism rules every registered query follows (so order-insensitive
value-hashes match across engines AND across Spark re-runs):

1. **Quantized aggregation**: floating-point sums/averages are computed by
   per-row quantization to integer units (``floor(x*scale + 0.5)``, exact
   and identical IEEE ops in both engines), exact integer aggregation, then
   scale-back in double. Summation order no longer matters.
2. **Deterministic top-k**: every LIMIT is preceded by a total order
   (metric + unique key tiebreak).
3. **Matched types**: DuckDB's wider defaults are cast down to Spark's
   (hour -> INTEGER, sum(BIGINT) HUGEINT -> BIGINT, etc.).
4. **Matched names**: every computed column is aliased identically in both
   dialects.
5. Quantile/stddev outputs (inherently float-merged) are rounded to a
   tolerance far above both engines' error bound.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    # Set on VERIFIER-ONLY queries: plans whose cost is deliberately
    # unbounded (all-pairs scans, uncapped LSH buckets) because their
    # job is to PROVE a bounded plan's recall at small scale, never to
    # run on a full corpus. Points at the registered query that is the
    # production-scale form of the same operation. Enforced by
    # tests/test_queries_parity.py: every scale_twin must name an
    # existing registry entry, and carrying one implies the "verifier"
    # tag (and vice versa) so the distinction is machine-checkable
    # instead of living only in ARCHITECTURE.md prose.
    scale_twin: str | None = None


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    description: str = "",
    tags: tuple[str, ...] = (),
    scale_twin: str | None = None,
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in QUERIES:
            # A silent overwrite would drop a query from the inventory
            # without any gate noticing (the replaced query simply stops
            # being verified) — fail at import time instead.
            raise ValueError(f"duplicate query registration: {name}")
        if (scale_twin is not None) != ("verifier" in tags):
            raise ValueError(
                f"{name}: scale_twin and the 'verifier' tag must appear "
                "together (a verifier names its production form; a "
                "production form never claims to be a verifier)"
            )
        QUERIES[name] = QuerySpec(
            name=name, spark=fn, oracle=oracle, description=description,
            tags=tags, scale_twin=scale_twin,
        )
        return fn

    return deco
