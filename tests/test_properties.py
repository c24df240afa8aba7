"""Property-based checks (SURVEY.md §5.5) — hypothesis drives the scalar
semantics that everything else builds on."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from nyc_yellow_taxi_trip_data_pipeline_spark.plans.helpers import sql_qsum

import duckdb
import pytest


@given(
    start=st.datetimes(
        min_value=datetime(2000, 1, 1), max_value=datetime(2030, 1, 1)
    ),
    minutes=st.integers(min_value=-10000, max_value=10000),
)
@settings(max_examples=30, deadline=None)
def test_duration_is_minute_difference(spark_global, start, minutes):
    end = start + timedelta(minutes=minutes)
    df = spark_global.createDataFrame(
        [(start, end)], "pickup timestamp, dropoff timestamp"
    )
    from nyc_yellow_taxi_trip_data_pipeline_spark.functions.scalar import duration_minutes
    from pyspark.sql import functions as F

    got = df.select(
        duration_minutes(F.col("pickup"), F.col("dropoff")).alias("d")
    ).collect()[0]["d"]
    assert got == float(minutes)


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark


@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=30, deadline=None)
def test_quantized_sum_is_order_independent(values):
    """The qsum quantization contract: any permutation sums identically."""
    con = duckdb.connect()
    fwd = con.execute(
        f"SELECT {sql_qsum('x')} FROM (SELECT unnest(?::DOUBLE[]) AS x)", [values]
    ).fetchone()[0]
    rev = con.execute(
        f"SELECT {sql_qsum('x')} FROM (SELECT unnest(?::DOUBLE[]) AS x)",
        [list(reversed(values))],
    ).fetchone()[0]
    assert fwd == rev


def test_imputation_idempotent(spark):
    from nyc_yellow_taxi_trip_data_pipeline_spark.operators.transforms import (
        impute_numeric_nulls,
    )

    df = spark.createDataFrame(
        [(None,), (1.5,), (0.0,)], "x double"
    )
    once = impute_numeric_nulls(df, ["x"])
    twice = impute_numeric_nulls(once, ["x"])
    assert once.collect() == twice.collect()
