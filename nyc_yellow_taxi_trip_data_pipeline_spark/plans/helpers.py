"""Shared helpers keeping Spark and oracle-SQL expressions bit-identical.

The core trick: floating aggregation is made order-independent by per-row
quantization to integer units — ``floor(x*scale + 0.5)`` is an exact,
engine-identical IEEE operation for |x*scale| < 2^53, integer sums are
exact in any order, and the final scale-back division is a single exact
double op. This removes BOTH cross-engine and run-to-run (partition merge
order) nondeterminism from sums and averages.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# ---------- Spark side ----------

def qsum(c: Column, scale: int = 100) -> Column:
    """Order-independent sum of a float column via integer quantization."""
    return F.sum(F.floor(c * scale + F.lit(0.5)).cast("long")) / float(scale)


def qavg(c: Column, scale: int = 100) -> Column:
    """Order-independent mean: quantized sum divided by non-null count."""
    return qsum(c, scale) / F.count(c)


# ---------- DuckDB side (SQL text generators) ----------

def sql_qsum(expr: str, scale: int = 100) -> str:
    return (
        f"(CAST(SUM(CAST(FLOOR(({expr}) * {scale} + 0.5) AS BIGINT)) AS BIGINT)"
        f" / {scale}.0)"
    )


def sql_qavg(expr: str, scale: int = 100) -> str:
    return f"({sql_qsum(expr, scale)} / COUNT({expr}))"


# Time-of-day CASE chains (SQL text; Spark twins live in functions/scalar.py).
SQL_TIMEOFDAY_ETL = (
    "CASE WHEN {h} BETWEEN 6 AND 11 THEN 'morning' "
    "WHEN {h} BETWEEN 12 AND 15 THEN 'afternoon' "
    "WHEN {h} BETWEEN 16 AND 21 THEN 'evening' "
    "ELSE 'late night' END"
)
SQL_TIMEOFDAY_DASH = (
    "CASE WHEN {h} BETWEEN 5 AND 11 THEN 'Morning' "
    "WHEN {h} BETWEEN 12 AND 16 THEN 'Afternoon' "
    "WHEN {h} BETWEEN 17 AND 20 THEN 'Evening' "
    "ELSE 'Night' END"
)

# DuckDB dayofweek() is 0=Sunday..6=Saturday; Spark's is 1=Sunday..7=Saturday.
SQL_SPARK_DOW = "CAST(dayofweek({ts}) + 1 AS INTEGER)"
# DuckDB epoch() keeps fractional seconds; Spark unix_timestamp truncates.
SQL_UNIX_TS = "CAST(FLOOR(EPOCH({ts})) AS BIGINT)"
