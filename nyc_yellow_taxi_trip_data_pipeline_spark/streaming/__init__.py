"""Structured Streaming layer (SURVEY.md §2.9, reference sparkConsumer.py)."""

from nyc_yellow_taxi_trip_data_pipeline_spark.streaming.pipeline import (
    foreach_batch_jdbc_writer,
    hourly_windowed_agg,
    parse_json_envelope,
    read_stream,
    session_windowed_agg,
    start_memory_sink,
    start_parquet_sink,
)

__all__ = [
    "foreach_batch_jdbc_writer",
    "hourly_windowed_agg",
    "parse_json_envelope",
    "read_stream",
    "session_windowed_agg",
    "start_memory_sink",
    "start_parquet_sink",
]
