"""Golden tests for the clean/feature transform layer (SURVEY.md §2.12
hazards: dual time-of-day boundaries, weekend conventions, zero-distance
guard, negative durations, filter-vs-imputation null ordering)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_yellow_taxi_trip_data_pipeline_spark.operators.transforms import (
    clean_trips,
    filter_iqr_outliers,
    impute_numeric_nulls,
    iqr_fences,
)


def _by_pickup(df):
    return {r["tpep_pickup_datetime"].isoformat(): r for r in df.collect()}


def test_timeofday_boundaries(trips_raw):
    rows = _by_pickup(clean_trips(trips_raw))
    expected = {
        "2024-05-05T05:30:00": "late night",  # hour 5 is NOT morning (ETL spec)
        "2024-05-06T06:00:00": "morning",
        "2024-05-07T11:59:00": "morning",
        "2024-05-08T12:00:00": "afternoon",
        "2024-05-09T15:59:00": "afternoon",
        "2024-05-10T16:00:00": "evening",
        "2024-05-11T21:59:00": "evening",
        "2024-05-12T22:00:00": "late night",
    }
    for ts, want in expected.items():
        assert rows[ts]["pickup_timeofday"] == want, ts


def test_weekend_flag_is_reference_faithful(trips_raw):
    """The reference flags dayofweek∈{6,7} = Friday+Saturday (its bug,
    preserved deliberately — SURVEY.md §2.12.1)."""
    rows = _by_pickup(clean_trips(trips_raw))
    assert rows["2024-05-10T16:00:00"]["pickup_is_weekend"] is True   # Friday
    assert rows["2024-05-11T21:59:00"]["pickup_is_weekend"] is True   # Saturday
    assert rows["2024-05-05T05:30:00"]["pickup_is_weekend"] is False  # Sunday
    assert rows["2024-05-06T06:00:00"]["pickup_is_weekend"] is False  # Monday


def test_day_of_week_spark_convention(trips_raw):
    rows = _by_pickup(clean_trips(trips_raw))
    assert rows["2024-05-05T05:30:00"]["pickup_day"] == 1  # Sunday
    assert rows["2024-05-11T21:59:00"]["pickup_day"] == 7  # Saturday


def test_trip_duration_minutes_and_negative(trips_raw):
    rows = _by_pickup(clean_trips(trips_raw))
    assert rows["2024-05-05T05:30:00"]["trip_duration"] == 15.0
    # dropoff before pickup stays negative — NOT clamped (§2.12.5)
    assert rows["2024-05-13T10:00:00"]["trip_duration"] == -30.0


def test_fare_per_mile_zero_guard(trips_raw):
    rows = _by_pickup(clean_trips(trips_raw))
    assert rows["2024-05-14T08:00:00"]["fare_per_mile"] == 0.0  # 0 distance
    assert rows["2024-05-05T05:30:00"]["fare_per_mile"] == 5.0  # 10/2


def test_passenger_filter_drops_zero_and_null(trips_raw):
    cleaned = clean_trips(trips_raw)
    assert cleaned.count() == 10  # 12 rows minus zero-passenger minus null
    got = {r.passenger_count for r in cleaned.select("passenger_count").collect()}
    assert 0.0 not in got and None not in got


def test_column_names_lowercased(trips_raw):
    cleaned = clean_trips(trips_raw)
    assert "vendorid" in cleaned.columns
    assert all(c == c.lower() for c in cleaned.columns)


def test_imputation_after_clean_not_during(spark):
    df = spark.createDataFrame(
        [("1", None), (None, 2.5)], "ratecodeid string, congestion double"
    )
    imputed = impute_numeric_nulls(df, ["ratecodeid", "congestion"])
    rows = imputed.collect()
    assert rows[0]["ratecodeid"] == 1.0 and rows[0]["congestion"] == 0.0
    assert rows[1]["ratecodeid"] == 0.0 and rows[1]["congestion"] == 2.5


def test_iqr_fences_and_filter(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 101)], "x double")
    lo, hi = iqr_fences(df, "x")
    # exact interpolated quartiles of 1..100: q1=25.75, q3=75.25, iqr=49.5
    assert lo == 25.75 - 1.5 * 49.5
    assert hi == 75.25 + 1.5 * 49.5
    kept = filter_iqr_outliers(df.union(spark.createDataFrame([(1000.0,)], "x double")), "x")
    assert kept.count() == 100  # outlier removed, original range kept
