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
