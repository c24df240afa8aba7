"""nyc_yellow_taxi_trip_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark engine with the query and data-processing
capability surface of the reference pipeline
(rahult18/NYC-Yellow-Taxi-Trip-Data-Pipeline): streaming/batch ETL with
timestamp math, bucketing, guarded ratios and imputation; a dashboard-grade
analytics query library (dimension joins, top-k, quantiles/IQR, histograms,
summary stats); a 5-stage Spark ML regression pipeline; pluggable
sources/sinks (Parquet, CSV, JSON streams, JDBC, Kafka) — plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal columns) designed for 100 TB operation.

Everything is expressed DataFrame/SQL-first so Catalyst + Tungsten pick the
physical strategy; Python only enters via Arrow-vectorized pandas UDFs where
built-ins genuinely cannot express the semantics.
"""

from nyc_yellow_taxi_trip_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
