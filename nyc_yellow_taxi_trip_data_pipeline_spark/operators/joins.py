"""Non-equi join strategies re-expressed as shuffle-friendly equi-joins.

Spark executes a raw time-range predicate between two large tables as a
broadcast-nested-loop (or a cartesian partition-pair) join — O(n·m) work
that no amount of cluster buys back at 100 TB. The scale-safe shape is
BINNING: quantize the time axis into fixed bins, equi-join on
(key, candidate_bin), then apply the exact range predicate to the small
candidate set. The join stays a hash shuffle join on well-distributed
keys; each left row fans out to ceil(lookback/bin)+1 candidate bins only.

The as-of join twin (last right row at-or-before each left row) lives in
plans/analytics.py q21 as a union+window composition; this module covers
the interval/lookback family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_lookback_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    lookback_s: int,
    bin_s: int | None = None,
) -> DataFrame:
    """All (left, right) pairs sharing ``key_cols`` with
    ``right_ts`` in the half-open window [left_ts - lookback_s, left_ts).

    Timestamps compare as whole epoch seconds (``unix_timestamp``
    truncation — the cross-engine portable form). Right rows get their
    actual bin; left rows explode to every bin the lookback window can
    touch, so the range predicate only runs on hash-join survivors.

    Returns the joined frame with both timestamp-second columns
    (``__l_sec``/``__r_sec``) still attached for downstream use.
    """
    bin_s = bin_s or lookback_s
    n_back = -(-lookback_s // bin_s)  # ceil: bins a window can span
    l_sec = F.unix_timestamp(F.col(left_ts))
    r_sec = F.unix_timestamp(F.col(right_ts))
    lb = left.withColumn("__l_sec", l_sec).withColumn(
        "__bin",
        F.explode(
            F.array(
                *[
                    (F.floor(F.col("__l_sec") / bin_s) - i).cast("long")
                    for i in range(n_back + 1)
                ]
            )
        ),
    )
    rb = right.withColumn("__r_sec", r_sec).withColumn(
        "__bin", F.floor(F.col("__r_sec") / bin_s).cast("long")
    )
    return lb.join(rb, [*key_cols, "__bin"]).filter(
        (F.col("__r_sec") >= F.col("__l_sec") - lookback_s)
        & (F.col("__r_sec") < F.col("__l_sec"))
    )
