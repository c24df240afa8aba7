"""Serving: batch-predict with a persisted model (reference deployment/main.py).

The reference wraps this in FastAPI; the engine capability is the function
underneath — load a PipelineModel once, apply the SAME clean/feature
transforms as training (the reference re-implements them a third time in
preprocessData, deployment/main.py:37-57; here they're imported), then
transform and project. HTTP framing is the caller's concern.
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_yellow_taxi_trip_data_pipeline_spark.operators.transforms import (
    add_trip_features,
    impute_numeric_nulls,
    normalize_column_names,
    parse_timestamps,
)

#: Numeric columns imputed before prediction (reference main.py:37-41).
IMPUTE_COLUMNS = [
    "vendorid",
    "ratecodeid",
    "pulocationid",
    "dolocationid",
    "passenger_count",
    "trip_distance",
    "fare_amount",
    "tip_amount",
    "improvement_surcharge",
    "total_amount",
    "payment_type",
]


def load_model(path: str) -> PipelineModel:
    """Loaded once per process (reference main.py:19)."""
    return PipelineModel.load(path)


def preprocess(df: DataFrame) -> DataFrame:
    """Serving-side preprocessing == training-side transforms, one code
    path (normalize -> parse timestamps -> impute -> derive features)."""
    out = normalize_column_names(df)
    out = parse_timestamps(out)
    out = impute_numeric_nulls(out, IMPUTE_COLUMNS)
    return add_trip_features(out)


def predict(
    model: PipelineModel, df: DataFrame, label: str = "fare_amount"
) -> DataFrame:
    """Transform and project (reference main.py:71-75)."""
    return model.transform(preprocess(df)).select(label, "prediction")


def predict_csv(
    spark: SparkSession, model: PipelineModel, csv_path: str, label: str = "fare_amount"
) -> DataFrame:
    """CSV upload path (reference main.py:61-67) without the pandas hop:
    Spark reads the CSV directly — the createDataFrame(pd.read_csv(...))
    round trip only existed because the reference served from pandas."""
    df = spark.read.option("header", "true").option("inferSchema", "true").csv(csv_path)
    return predict(model, df, label=label)
