"""Edge-input robustness: empty frames, missing keys, degenerate groups —
the shapes empty partitions produce constantly at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_yellow_taxi_trip_data_pipeline_spark.operators import dedup as dd
from nyc_yellow_taxi_trip_data_pipeline_spark.operators import similarity as sim
from nyc_yellow_taxi_trip_data_pipeline_spark.operators.transforms import (
    clean_trips,
    filter_iqr_outliers,
)
from nyc_yellow_taxi_trip_data_pipeline_spark.sources.io import compact_parquet


@pytest.fixture(scope="module")
def empty_trips(spark):
    return spark.createDataFrame(
        [],
        "VendorID string, tpep_pickup_datetime string, "
        "tpep_dropoff_datetime string, passenger_count double, "
        "trip_distance double, fare_amount double",
    )


def test_clean_trips_on_empty(empty_trips):
    out = clean_trips(empty_trips)
    assert out.count() == 0
    assert "trip_duration" in out.columns  # schema still derived


def test_minhash_on_empty_docs(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert dd.minhash_near_duplicates(docs).count() == 0


def test_minhash_single_doc_no_pairs(spark):
    docs = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    assert dd.minhash_near_duplicates(docs).count() == 0


def test_simhash_single_word_docs(spark):
    docs = spark.createDataFrame([(0, "word")], "doc_id long, text string")
    rows = dd.simhash16(dd.tokenize_distinct(docs)).collect()
    assert len(rows) == 1 and 0 <= rows[0].simhash < (1 << 16)


def test_brute_force_topk_missing_query_vector(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0)], "vec_id long, embedding array<float>, label int"
    )
    # query id 999 doesn't exist -> empty result, not an error
    assert sim.brute_force_topk(emb, query_vec_id=999, k=5).count() == 0


def test_iqr_filter_constant_column(spark):
    df = spark.createDataFrame([(5.0,)] * 10, "x double")
    # IQR = 0 -> fences collapse to the constant; all rows survive
    assert filter_iqr_outliers(df, "x").count() == 10


def test_compact_parquet_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(0, 1000).repartition(16).write.parquet(path)
    import glob

    before = len(glob.glob(f"{path}/part-*"))
    n = compact_parquet(spark, path, target_files=2, sort_within_by=["id"])
    after = len(glob.glob(f"{path}/part-*"))
    assert n == 1000
    assert before >= 16 and after <= 2
    assert spark.read.parquet(path).count() == 1000
