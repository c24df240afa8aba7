"""Query plans: the oracle-checked operator inventory.

Each query exists twice: as an idiomatic Spark DataFrame/SQL program and as
an ANSI-SQL oracle string for DuckDB. The registry in ``registry.py`` binds
them; ``__spark_entry__.py`` exposes them to the driver.
"""

from nyc_yellow_taxi_trip_data_pipeline_spark.plans.registry import (
    QUERIES,
    QuerySpec,
    register,
)

# Importing the modules populates the registry.
from nyc_yellow_taxi_trip_data_pipeline_spark.plans import analytics  # noqa: E402,F401
from nyc_yellow_taxi_trip_data_pipeline_spark.plans import datapipe  # noqa: E402,F401

# The external driver verifies the FIRST 50 registered queries against the
# DuckDB oracle (CORRECTNESS_r{N}.json has a 50-row budget). Registration
# order therefore decides which queries earn a hard external row. Round 1
# checked file-order q01-q43 + q51/q56-q63 + q30-q41; the 11 below never got
# a row, and any query whose plan changed this round needs a fresh one — so
# they are promoted to the front of the registry. Queries outside the window
# remain parity-gated (tools/parity.py runs ALL of them).
_PRIORITY = [
    # never driver-checked in round 1:
    "q44_streaming_hourly",
    "q45_ngram_jaccard",
    "q46_tfidf_topterms",
    "q47_moving_avg",
    "q48_grouped_quantiles",
    "q49_unpivot",
    "q50_correlation",
    "q52_char_ngram_langid",
    "q53_winnowing",
    "q54_semi_anti_join",
    "q55_constraint_audit",
    # new this round, never driver-checked:
    "q64_multimodal_resize",
    "q65_frame_sample",
    "q66_ivf_ann",
    "q67_streaming_sessionize",
    # red in round 1 (array column broke the driver canonicalizer), fixed:
    "q42_approx_sketches",
    # plans rewritten this round (re-blocked / re-projected), need re-check:
    "q62_fuzzy_editdistance",
    "q32_minhash_lsh_neardup",
    "q36_ann_srp_bucket",
]
QUERIES_ORDERED = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
QUERIES_ORDERED.update(QUERIES)
QUERIES.clear()
QUERIES.update(QUERIES_ORDERED)

__all__ = ["QUERIES", "QuerySpec", "register"]
