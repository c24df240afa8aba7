"""Spark ML layer: the reference's 5-stage regression pipeline."""

from nyc_yellow_taxi_trip_data_pipeline_spark.ml.pipeline import (
    FeatureSpec,
    build_pipeline,
    evaluate,
    feature_importances,
    train,
)

__all__ = [
    "FeatureSpec",
    "build_pipeline",
    "evaluate",
    "feature_importances",
    "train",
]
