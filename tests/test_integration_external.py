"""Opt-in integration smoke tests for the external-system sources/sinks
(S2 Kafka source, S3 JDBC scan, S7 Kafka sink, S8 JDBC append).

Skipped by default: this container has no broker and no database. Point
the env vars at real services to turn them on:

- ``KAFKA_BOOTSTRAP=host:9092``  — needs the spark-sql-kafka connector on
  the session classpath (``spark.jars.packages=org.apache.spark:
  spark-sql-kafka-0-10_2.13:<spark version>``).
- ``JDBC_URL=jdbc:postgresql://host:5432/db?user=u&password=p`` — needs
  the JDBC driver jar on the classpath.

The broker-free parts of these code paths stay covered unconditionally:
the JSON envelope by q29's oracle, the foreachBatch JDBC-shaped sink
callback by tests/test_streaming.py.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from nyc_yellow_taxi_trip_data_pipeline_spark.sources import io as eio
from nyc_yellow_taxi_trip_data_pipeline_spark.streaming.pipeline import (
    parse_json_envelope,
    read_stream,
)

KAFKA_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")
JDBC_URL = os.environ.get("JDBC_URL")


@pytest.mark.skipif(
    not KAFKA_BOOTSTRAP, reason="set KAFKA_BOOTSTRAP=host:9092 to run"
)
def test_kafka_sink_then_source_roundtrip(spark):
    """S7 -> S2: write rows through the JSON envelope to a fresh topic,
    stream them back, parse the envelope, compare payloads."""
    topic = f"engine_smoke_{uuid.uuid4().hex[:8]}"
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None)], "id long, name string, value double"
    )
    eio.write_kafka(df, KAFKA_BOOTSTRAP, topic)

    stream = read_stream(
        spark, "kafka", kafka_bootstrap=KAFKA_BOOTSTRAP, topic=topic
    )
    parsed = parse_json_envelope(
        stream, df.schema
    )
    sink = f"kafka_smoke_{uuid.uuid4().hex[:8]}"
    q = (
        parsed.writeStream.format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        (r.id, r.name, r.value) for r in spark.table(sink).collect()
    }
    assert got == {(1, "a", 1.5), (2, "b", None)}


@pytest.mark.skipif(not JDBC_URL, reason="set JDBC_URL=jdbc:... to run")
def test_jdbc_append_then_partitioned_scan_roundtrip(spark):
    """S8 -> S3: append rows to a fresh table, read them back through the
    partitioned parallel scan, compare."""
    table = f"engine_smoke_{uuid.uuid4().hex[:8]}"
    df = spark.range(0, 100).withColumn("v", F.col("id") * 2.0)
    eio.write_jdbc_append(df, JDBC_URL, table)
    try:
        back = eio.read_jdbc(
            spark,
            JDBC_URL,
            table,
            partition_column="id",
            lower_bound=0,
            upper_bound=100,
            num_partitions=4,
        )
        assert back.rdd.getNumPartitions() == 4
        got = {(r.id, r.v) for r in back.collect()}
        assert got == {(i, i * 2.0) for i in range(100)}
    finally:
        # Cleanup must go through a real statement: Spark's jdbc reader
        # wraps `query` in a SELECT subquery, so DROP via spark.read fails
        # on essentially every database. Use the JVM's DriverManager.
        try:
            conn = spark._jvm.java.sql.DriverManager.getConnection(JDBC_URL)
            try:
                conn.createStatement().executeUpdate(f"DROP TABLE {table}")
            finally:
                conn.close()
        except Exception:
            pass  # smoke table left behind; harmless in a scratch DB


# ---------------------------------------------------------------------------
# Live JDBC round-trips against EMBEDDED Derby (bundled with Spark for the
# Hive metastore — no external service needed). These run unconditionally:
# they execute the exact S3/S8 code paths (write_jdbc_append, partitioned
# read_jdbc, foreachBatch JDBC writer) against a real JDBC database, which
# the env-gated Postgres smokes above can't do in this container. In-memory
# Derby is per-JVM; local mode shares the JVM, so executor-side JDBC tasks
# hit the same database.
# ---------------------------------------------------------------------------
DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _derby_url() -> str:
    return f"jdbc:derby:memory:smoke{uuid.uuid4().hex[:8]};create=true"


def test_jdbc_append_then_partitioned_scan_embedded_derby(spark):
    """S8 -> S3 live: append (auto-creating the table), read back through
    the partitioned parallel scan, compare values including nulls."""
    url = _derby_url()
    df = spark.createDataFrame(
        [(i, float(i) * 2.0 if i % 10 else None, f"n{i}") for i in range(100)],
        "id long, v double, name string",
    )
    eio.write_jdbc_append(df, url, "SMOKE_T", DERBY_PROPS)
    back = eio.read_jdbc(
        spark,
        url,
        "SMOKE_T",
        DERBY_PROPS,
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    got = {(r.id, r.v, r.name) for r in back.collect()}
    want = {
        (i, float(i) * 2.0 if i % 10 else None, f"n{i}") for i in range(100)
    }
    assert got == want
    # Appending again must append, not replace.
    eio.write_jdbc_append(df.limit(5), url, "SMOKE_T", DERBY_PROPS)
    assert eio.read_jdbc(spark, url, "SMOKE_T", DERBY_PROPS).count() == 105


def test_streaming_foreach_batch_jdbc_embedded_derby(spark, tmp_path):
    """S13 -> S8 live: a file stream lands in a real JDBC table through
    foreach_batch_jdbc_writer, batch counts reported via on_batch."""
    import json as jsonlib

    from nyc_yellow_taxi_trip_data_pipeline_spark.streaming.pipeline import (
        foreach_batch_jdbc_writer,
    )

    src = tmp_path / "stream_src"
    src.mkdir()
    rows = [{"id": i, "v": i * 1.5} for i in range(20)]
    (src / "a.json").write_text("\n".join(jsonlib.dumps(r) for r in rows))

    url = _derby_url()
    seen = []
    stream = (
        spark.readStream.schema("id long, v double")
        .json(str(src))
    )
    q = stream.writeStream.foreachBatch(
        foreach_batch_jdbc_writer(
            url,
            "STREAM_T",
            DERBY_PROPS,
            on_batch=lambda bid, n: seen.append((bid, n)),
        )
    ).option("checkpointLocation", str(tmp_path / "ckpt")).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sum(n for _, n in seen) == 20
    got = {(r.id, r.v) for r in eio.read_jdbc(spark, url, "STREAM_T", DERBY_PROPS).collect()}
    assert got == {(i, i * 1.5) for i in range(20)}


def test_jdbc_upsert_idempotent_last_write_wins_embedded_derby(spark):
    """The upsert sink: overlapping keys across batches converge to the
    newest value; REPLAYING a batch (retry semantics) leaves the table
    unchanged — idempotence, which the plain append sink cannot give."""
    from nyc_yellow_taxi_trip_data_pipeline_spark.streaming.pipeline import (
        foreach_batch_jdbc_upsert,
    )

    url = _derby_url()
    counts = []
    write = foreach_batch_jdbc_upsert(
        url,
        "UPS_T",
        key_cols=["id"],
        order_col="ver",
        properties=DERBY_PROPS,
        on_batch=lambda bid, n: counts.append((bid, n)),
    )
    b0 = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (2, 2, "b2"), (3, 1, "c")],
        "id long, ver long, val string",
    )
    write(b0, 0)
    # Batch 1 overwrites id=2 and inserts id=4.
    b1 = spark.createDataFrame(
        [(2, 3, "b3"), (4, 1, "d")], "id long, ver long, val string"
    )
    write(b1, 1)

    def table_state():
        back = eio.read_jdbc(spark, url, "UPS_T", DERBY_PROPS)
        return {(r.id, r.ver, r.val) for r in back.collect()}

    want = {(1, 1, "a"), (2, 3, "b3"), (3, 1, "c"), (4, 1, "d")}
    assert table_state() == want
    # Within-batch dedup kept the HIGHEST ver for id=2 in batch 0 (ver=2
    # row, then overwritten by batch 1's ver=3), and on_batch reports the
    # deduped row count.
    assert counts == [(0, 3), (1, 2)]
    # Replay batch 1 (a streaming retry): state must not change.
    write(b1, 1)
    assert table_state() == want
