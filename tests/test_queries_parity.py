"""Fast oracle-parity spot checks inside pytest (full gate: tools/parity).

Runs a representative subset of the registry at sf0.001 against DuckDB with
the same compare the standalone gate uses.
"""

from __future__ import annotations

import pytest

from nyc_yellow_taxi_trip_data_pipeline_spark.plans import QUERIES
from tools.parity import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "q01_pricing_summary",
    "q02_clean_features",
    "q05_route_topk",
    "q09_quantiles_iqr",
    "q20_sessionization",
    "q32_minhash_lsh_neardup",
    "q34_embedding_topk",
    "q37_text_quality",
    "q41_multimodal_decode",
    "q87_sequence_packing",
    "q92_simhash_neardup",
    "q93_conversion_funnel",
]


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF_DIR)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    assert spec.oracle is not None
    spark_pdf = spec.spark(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(spec.oracle).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, problems


def test_every_query_has_description_and_entry():
    assert len(QUERIES) >= 35
    for name, spec in QUERIES.items():
        assert spec.description, name
        assert callable(spec.spark), name


def test_q87_packing_invariants(spark):
    """Structural invariants the hash-match can't express: no bin exceeds
    the budget unless it is a single oversized doc, and bin indices are
    contiguous non-decreasing in doc order within each chunk."""
    from nyc_yellow_taxi_trip_data_pipeline_spark.plans.datapipe import (
        _PACK_BUDGET,
    )

    rows = (
        QUERIES["q87_sequence_packing"]
        .spark(spark, SF_DIR)
        .orderBy("chunk", "doc_id")
        .collect()
    )
    from collections import defaultdict

    fills = defaultdict(int)
    counts = defaultdict(int)
    last_bin = {}
    for r in rows:
        key = (r.chunk, r.bin_idx)
        fills[key] += r.n_tokens
        counts[key] += 1
        prev = last_bin.get(r.chunk, 0)
        assert r.bin_idx in (prev, prev + 1), "bins must be contiguous"
        last_bin[r.chunk] = r.bin_idx
    for key, fill in fills.items():
        assert fill <= _PACK_BUDGET or counts[key] == 1, (
            f"bin {key} over budget with {counts[key]} docs"
        )


def test_q90_budget_invariant(spark):
    from nyc_yellow_taxi_trip_data_pipeline_spark.plans.datapipe import (
        _MIX_BUDGET_TOKENS,
    )

    for r in QUERIES["q90_domain_mix_budget"].spark(spark, SF_DIR).collect():
        assert r.tokens_kept <= _MIX_BUDGET_TOKENS
        assert r.n_docs_kept >= 1


def test_driver_window_invariant():
    """The external driver verifies exactly the FIRST 50 registered
    queries; a typo in _PRIORITY (or a length drift) silently burns an
    external verification slot. Assert the window is exactly 50 resolved,
    duplicate-free names and that registration order actually honors it."""
    from nyc_yellow_taxi_trip_data_pipeline_spark.plans import _PRIORITY

    assert len(_PRIORITY) == 50, len(_PRIORITY)
    assert len(set(_PRIORITY)) == 50, "duplicate names in _PRIORITY"
    unknown = [n for n in _PRIORITY if n not in QUERIES]
    assert not unknown, f"_PRIORITY names not in registry: {unknown}"
    assert list(QUERIES)[:50] == _PRIORITY, (
        "registration order does not start with the priority window"
    )
