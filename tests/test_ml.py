"""ML pipeline smoke tests (SURVEY.md §5.4): fit on small synthetic trips,
bound metrics (never exact-match tree training), persistence round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_yellow_taxi_trip_data_pipeline_spark.ml import (
    FeatureSpec,
    evaluate,
    feature_importances,
    train,
)
from nyc_yellow_taxi_trip_data_pipeline_spark.operators import serving

SPEC = FeatureSpec(
    label="total_amount",
    numeric=("trip_distance", "fare_amount", "tip_amount"),
    categorical=("pickup_timeofday",),
    num_trees=10,
    max_depth=4,
)


@pytest.fixture(scope="module")
def trips_features(spark):
    """Synthetic learnable data: total = fare + tip + distance-dependent noise."""
    rows = []
    for i in range(400):
        distance = (i % 20) + 1.0
        fare = 3.0 + 2.5 * distance
        tip = (i % 5) * 1.0
        tod = ["morning", "afternoon", "evening", "late night"][i % 4]
        rows.append((distance, fare, tip, tod, fare + tip + 0.5))
    return spark.createDataFrame(
        rows,
        "trip_distance double, fare_amount double, tip_amount double, "
        "pickup_timeofday string, total_amount double",
    )


@pytest.fixture(scope="module")
def fitted(trips_features):
    return train(trips_features, SPEC)


def test_fit_predicts_nonnull(fitted, trips_features):
    model, _, test_df = fitted
    preds = model.transform(test_df)
    assert preds.filter(F.col("prediction").isNull()).count() == 0
    assert preds.count() == test_df.count()


def test_metrics_bounded(fitted):
    model, train_df, test_df = fitted
    metrics = evaluate(model, test_df, SPEC.label)
    assert set(metrics) == {"rmse", "mae", "r2"}
    assert metrics["r2"] > 0.9  # near-deterministic target must be learnable
    assert metrics["mae"] < 5.0


def test_feature_importances_normalized(fitted):
    model, _, _ = fitted
    imp = feature_importances(model)
    names = [n for n, _ in imp]
    assert set(names) == {
        "trip_distance",
        "fare_amount",
        "tip_amount",
        "pickup_timeofday_encoded",
    }
    assert abs(sum(v for _, v in imp) - 1.0) < 1e-6
    assert imp[0][0] in ("fare_amount", "trip_distance")  # dominant signals


def test_model_save_load_roundtrip(fitted, trips_features, tmp_path):
    model, _, test_df = fitted
    path = str(tmp_path / "model")
    model.write().overwrite().save(path)
    loaded = serving.load_model(path)
    a = model.transform(test_df).select("prediction").collect()
    b = loaded.transform(test_df).select("prediction").collect()
    assert [r.prediction for r in a] == [r.prediction for r in b]


def test_serving_preprocess_matches_training_features(spark):
    raw = spark.createDataFrame(
        [
            (
                "1",
                "2024-05-06T06:00:00",
                "2024-05-06T06:30:00",
                1.0,
                2.0,
                10.0,
                2.0,
                None,
            )
        ],
        "VendorID string, tpep_pickup_datetime string, "
        "tpep_dropoff_datetime string, passenger_count double, "
        "trip_distance double, fare_amount double, tip_amount double, "
        "total_amount double",
    )
    prepped = serving.preprocess(raw)
    row = prepped.collect()[0]
    assert row["trip_duration"] == 30.0
    assert row["pickup_timeofday"] == "morning"
    assert row["fare_per_mile"] == 5.0
    assert row["total_amount"] == 0.0  # imputed
