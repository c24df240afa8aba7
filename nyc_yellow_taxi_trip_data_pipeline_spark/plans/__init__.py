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

__all__ = ["QUERIES", "QuerySpec", "register"]
