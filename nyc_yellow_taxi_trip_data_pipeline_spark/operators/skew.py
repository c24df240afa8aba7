"""Skew-safe aggregation via salting.

When a group-by key is pathologically hot (one key owning a large share of
100 TB), a single reducer partition becomes the straggler. Salting splits
each key into ``n_salts`` sub-keys for a first partial aggregation, then
re-aggregates the (tiny) salted partials — two shuffles, but each bounded.

Works on any algebraic aggregate; implemented here for the engine's
quantized sum/count so the final numbers are bit-identical to a plain
group-by (integer partials re-aggregate exactly)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_quantized_agg(
    df: DataFrame,
    key: str,
    value: Column,
    salt_expr: Column,
    n_salts: int = 16,
    scale: int = 100,
) -> DataFrame:
    """Two-stage sum/mean/count per ``key``, salted on ``salt_expr``.

    Returns columns: key, sum_value, avg_value, n — exactly what a direct
    ``groupBy(key)`` with the quantized aggs would return.
    """
    salted = df.withColumn("__salt", F.pmod(salt_expr, F.lit(n_salts)))
    partials = salted.groupBy(key, "__salt").agg(
        F.sum(F.floor(value * scale + F.lit(0.5)).cast("long")).alias("__psum"),
        F.count(value).alias("__pcnt"),
    )
    return partials.groupBy(key).agg(
        (F.sum("__psum") / float(scale)).alias("sum_value"),
        ((F.sum("__psum") / float(scale)) / F.sum("__pcnt")).alias("avg_value"),
        F.sum("__pcnt").alias("n"),
    )
