"""Broker-free Kafka CONTRACT tests (r9 verdict item 5).

The sandbox has no Kafka broker, so the live round trip stays env-gated
(tests/test_integration_external.py). What CAN be pinned without a
broker is the option assembly both code paths hand to Spark's Kafka
connector — the exact surface that must match the reference's
subscription (sparkConsumer.py:59-63: format("kafka") +
kafka.bootstrap.servers + subscribe) and producer topic wiring
(kafkaProducer.py:21,36-42) for a live broker to be plug-in. These
tests intercept the reader/writer builder chain before .load()/.save()
— no connector jar, no network — and assert the recorded matrix.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from nyc_yellow_taxi_trip_data_pipeline_spark.sources import io as sio
from nyc_yellow_taxi_trip_data_pipeline_spark.streaming.pipeline import read_stream

SENTINEL = object()


class _RecordingBuilder:
    """Stands in for DataStreamReader/DataFrameWriter: records the
    format/option/mode/save/load calls the code under test issues."""

    def __init__(self, record: dict):
        self._record = record
        record.setdefault("options", {})

    def format(self, fmt):
        self._record["format"] = fmt
        return self

    def option(self, k, v):
        self._record["options"][k] = v
        return self

    def mode(self, m):
        self._record["mode"] = m
        return self

    def load(self, *a):
        self._record["loaded"] = True
        return SENTINEL

    def save(self, *a):
        self._record["saved"] = True


@pytest.fixture
def reader_record(monkeypatch):
    rec: dict = {}
    monkeypatch.setattr(
        SparkSession,
        "readStream",
        property(lambda self: _RecordingBuilder(rec)),
    )
    return rec


def test_kafka_read_matches_reference_subscription(spark, reader_record):
    """The assembled reader must carry the reference's exact option set
    (sparkConsumer.py:59-63) plus the repo's explicit earliest default."""
    out = read_stream(
        spark, "kafka", kafka_bootstrap="broker-1:9092", topic="trip_events"
    )
    assert out is SENTINEL and reader_record["loaded"]
    assert reader_record["format"] == "kafka"
    assert reader_record["options"] == {
        "kafka.bootstrap.servers": "broker-1:9092",
        "subscribe": "trip_events",
        "startingOffsets": "earliest",
    }


def test_kafka_read_explicit_options_win(spark, reader_record):
    """startingOffsets is a default, never an override, and arbitrary
    connector options (maxOffsetsPerTrigger, failOnDataLoss, security
    settings) pass through untouched."""
    read_stream(
        spark,
        "kafka",
        kafka_bootstrap="b:9092",
        topic="t",
        options={
            "startingOffsets": "latest",
            "maxOffsetsPerTrigger": "1000",
            "failOnDataLoss": "false",
            "kafka.security.protocol": "SASL_SSL",
        },
    )
    opts = reader_record["options"]
    assert opts["startingOffsets"] == "latest"
    assert opts["maxOffsetsPerTrigger"] == "1000"
    assert opts["failOnDataLoss"] == "false"
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.bootstrap.servers"] == "b:9092"
    assert opts["subscribe"] == "t"


def test_kafka_read_requires_bootstrap_and_topic(spark, reader_record):
    with pytest.raises(ValueError, match="kafka source needs"):
        read_stream(spark, "kafka", topic="t")
    with pytest.raises(ValueError, match="kafka source needs"):
        read_stream(spark, "kafka", kafka_bootstrap="b:9092")


def test_kafka_write_option_assembly(spark, monkeypatch):
    """write_kafka must target format('kafka') with bootstrap + topic
    (reference kafkaProducer.py:21,36-42 wiring) and ship the JSON
    envelope as a single `value` column."""
    rec: dict = {}
    df = spark.createDataFrame([(1, "a"), (2, None)], "id long, name string")
    # Patch the CONCRETE class (pyspark 4 resolves `write` on the
    # classic subclass, not the pyspark.sql.dataframe.DataFrame facade).
    monkeypatch.setattr(
        type(df), "write", property(lambda self: _RecordingBuilder(rec))
    )
    sio.write_kafka(df, "broker-2:9092", "scored_trips")
    assert rec["saved"]
    assert rec["format"] == "kafka"
    assert rec["options"] == {
        "kafka.bootstrap.servers": "broker-2:9092",
        "topic": "scored_trips",
    }


def test_kafka_envelope_value_column(spark):
    """The envelope itself (independent of the sink): one string `value`
    column, explicit nulls preserved — the shape q29's oracle pins."""
    df = spark.createDataFrame([(2, None)], "id long, name string")
    env = sio.to_kafka_json(df)
    assert env.columns == ["value"]
    [row] = env.collect()
    assert row["value"] == '{"id":2,"name":null}'
