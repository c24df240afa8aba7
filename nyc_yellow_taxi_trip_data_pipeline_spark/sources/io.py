"""Batch sources and sinks.

Covers the reference's I/O surface (SURVEY.md §2.1) re-expressed natively:

- S1  Parquet scan        -> spark.read.parquet (vectorized reader, pushdown)
- S3  JDBC scan           -> spark.read.format("jdbc") with *partitioned*
                             reads (the reference reads single-partition,
                             sparkML.py:40-46 — a scan bottleneck at scale)
- S5  CSV scan            -> spark.read.csv with explicit schema preferred
- S7  Kafka sink          -> to_kafka_json (columnar JSON envelope; oracle-
                             checked via q29) + write_kafka (broker + jars)
- S8  JDBC append sink    -> df.write.format("jdbc").mode("append")
- S9  DDL-from-schema     -> schema_to_ddl (StructType -> CREATE TABLE),
                             matching the reference's type mapping
                             (sparkConsumer.py:123-141) including its
                             lowercase identifier folding (SURVEY.md §1.3)
- S11 CSV sink            -> write via df.write.csv

The Kafka *source* and streaming file sources live in ``streaming/``.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan; Catalyst pushes filters/pruning into the reader."""
    return spark.read.parquet(path)


def _nanos_ts_to_micros(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize the event-time column to plain ``timestamp`` regardless of
    how the parquet writer encoded it. Two historical encodings of the
    testdata are handled:

    - TIMESTAMP(NANOS) (which Spark cannot represent) arrives as nanosecond
      longs under ``spark.sql.legacy.parquet.nanosAsLong``; convert to
      microsecond timestamps — the same truncation DuckDB applies.
    - timestamp[us] with no timezone is inferred as ``TIMESTAMP_NTZ`` under
      Spark 4's inferTimestampNTZType; ``withWatermark`` rejects NTZ event
      time, so cast to ``timestamp``. The callers pin
      ``spark.sql.session.timeZone=UTC`` so the NTZ→LTZ cast is
      value-preserving and deterministic under any caller's session.

    Single definition shared by the batch and streaming readers so the
    conversion cannot drift between paths."""
    dtype = dict(df.dtypes).get(ts_col)
    if dtype == "bigint":
        df = df.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    elif dtype == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to plain TIMESTAMP. The testdata's
    timestamp[us]-no-tz columns (events.ts, lineitem.l_shipdate,
    orders.o_orderdate) infer as NTZ under Spark 4; the engine's contract
    is uniform TIMESTAMP with session timeZone pinned to UTC, so the cast
    is value-preserving and watermarks/date-math behave identically on
    every column."""
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the test tables from a scale-factor directory,
    timestamp-encoding-safe (see ``_nanos_ts_to_micros`` and
    ``_normalize_ntz``)."""
    # Runtime-settable; applied here so the engine works under any caller's
    # SparkSession (the driver builds its own), not just sessions from
    # session.get_spark(). The UTC pin keeps the NTZ→timestamp casts
    # value-preserving.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _nanos_ts_to_micros(df)
    return _normalize_ntz(df)


def read_table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Streaming twin of ``read_table``: the same table replayed as a
    bounded file stream, with the identical nanos→micros conversion.

    File streams take a directory. When ``{name}.parquet`` is itself a
    DIRECTORY (any real multi-file table — the only shape that exists at
    scale), stream it directly; a ``pathGlobFilter`` of the table name
    would match no leaf file and SILENTLY stream zero rows (found when
    every streaming query read 0 events from a multi-file corpus). The
    glob path remains only for the single-FILE tables the driver's
    testdata uses, where the table file sits in a shared directory."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    raw_schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        stream = spark.readStream.schema(raw_schema).parquet(path)
    else:
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", f"{name}.parquet")
            .parquet(sf_dir)
        )
    if name == "events":
        stream = _nanos_ts_to_micros(stream)
    return _normalize_ntz(stream)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql queries."""
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV scan (reference 1_EDA_Dashboard.py:25-26, main.py:65 use pandas).
    Explicit schema avoids the inference pass; inferSchema only as fallback."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """JDBC scan with optional partitioned parallel read.

    The reference reads its whole table through one JDBC cursor
    (sparkML.py:40-46); at scale that serializes the scan, so we expose
    Spark's partitionColumn/numPartitions parallel read.
    """
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc_append(
    df: DataFrame, url: str, table: str, properties: dict[str, str] | None = None
) -> None:
    """JDBC append sink (reference sparkConsumer.py:147-154)."""
    writer = (
        df.write.format("jdbc").option("url", url).option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode("append").save()


def to_kafka_json(df: DataFrame) -> DataFrame:
    """Serialize rows to the Kafka value envelope: one JSON object per row
    with ISO-ish timestamp rendering (reference kafkaProducer.py:12-16,36-42
    does this row-at-a-time in Python; to_json(struct(*)) is the columnar
    form). Pair with ``write_kafka``."""
    # Backtick-quote each name: bare (and even df[c]-indexed) names
    # containing dots are parsed as struct-field paths, not columns.
    # ignoreNullFields=false: the reference producer json.dumps(row.to_dict())
    # emits explicit nulls; Spark's default would drop null fields and hand
    # strict consumers a different envelope per row.
    return df.select(
        F.to_json(
            F.struct(*[F.col(f"`{c}`") for c in df.columns]),
            {"ignoreNullFields": "false"},
        ).alias("value")
    )


def write_kafka(
    df: DataFrame, bootstrap_servers: str, topic: str
) -> None:
    """Kafka sink (S7). Requires a reachable broker + the kafka connector
    jars on the classpath; the JSON envelope itself is covered broker-free
    by q29's roundtrip oracle."""
    (
        to_kafka_json(df)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with header (reference featureEngineering.ipynb cell 5
    writes sampled test rows via pandas to_csv)."""
    df.write.mode(mode).option("header", "true").csv(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_files: int,
    sort_within_by: list[str] | None = None,
) -> int:
    """Table-maintenance compaction: rewrite a parquet directory into
    ``target_files`` files (coalesce — no shuffle), optionally sorting
    within partitions so rowgroup min/max stats enable data skipping on
    the sort keys. Streaming sinks and parallel writers produce small
    files; periodic compaction keeps scan task counts sane at 100 TB.

    Returns the row count written. Writes to a sibling temp dir then
    swaps via Hadoop FileSystem renames, so it runs on any
    HDFS-compatible store (local, HDFS; on S3A "rename" is a copy, so
    prefer a table format there) and a failed compaction never corrupts
    the table. Concurrent readers must tolerate the brief swap window in
    which the live path is the freshly-renamed new table (directory
    renames are atomic on HDFS/local, but a reader that listed files
    before the swap can still see deleted-file errors) — compaction of a
    live table without any swap window requires a snapshot table format
    (Delta/Iceberg), out of scope here.
    """
    import uuid

    df = spark.read.parquet(path)
    n = df.count()
    out = df.coalesce(target_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    token = uuid.uuid4().hex[:8]
    tmp = f"{path.rstrip('/')}__compact_{token}"
    out.write.mode("overwrite").parquet(tmp)
    # Swap via rename-old-aside -> move-new-in -> delete-old: the live
    # path is never absent-with-no-backup, so a crash mid-swap leaves
    # either the old or the new table recoverable on disk.
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path
    fs = jpath(path).getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    old = f"{path.rstrip('/')}__old_{token}"
    if not fs.rename(jpath(path), jpath(old)):
        raise IOError(f"compaction swap: rename {path} -> {old} failed")
    if not fs.rename(jpath(tmp), jpath(path)):
        fs.rename(jpath(old), jpath(path))  # restore the original table
        raise IOError(f"compaction swap: rename {tmp} -> {path} failed")
    fs.delete(jpath(old), True)
    return n


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Parquet sink; partition_by enables partition pruning for readers
    (e.g. year/month of the pickup timestamp — SURVEY.md §4)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


_SQL_TYPES: dict[type, str] = {
    T.TimestampType: "TIMESTAMP",
    T.IntegerType: "INTEGER",
    T.LongType: "BIGINT",
    T.DoubleType: "DOUBLE PRECISION",
    T.FloatType: "REAL",
    T.BooleanType: "BOOLEAN",
    T.DateType: "DATE",
}


def schema_to_ddl(schema: T.StructType, table: str, lowercase: bool = True) -> str:
    """CREATE TABLE DDL from a StructType (reference sparkConsumer.py:123-141).

    The reference emits unquoted identifiers which Postgres case-folds to
    lowercase (SURVEY.md §1.3); ``lowercase=True`` makes that folding
    explicit so the DDL matches what downstream consumers actually see.
    Unknown types map to VARCHAR(255), as in the reference.
    """
    cols = []
    for field in schema.fields:
        name = field.name.lower() if lowercase else field.name
        sql_type = _SQL_TYPES.get(type(field.dataType), "VARCHAR(255)")
        cols.append(f"{name} {sql_type}")
    return f"CREATE TABLE IF NOT EXISTS {table} ({', '.join(cols)})"


def expire_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    keep_from: str,
) -> list[str]:
    """Retention/TTL enforcement for a ``partitionBy`` parquet table:
    drop every ``{partition_col}=value`` directory with value strictly
    below ``keep_from`` (lexicographic, which matches numeric/ISO-date
    partition values as Spark writes them). Returns the dropped values.

    This is the partition-pruned DELETE: at 100 TB, retention must be a
    metadata operation (drop whole directories) — a filtered rewrite of
    the surviving 99% would cost a full-table pass. Uses the Hadoop
    FileSystem API, so it runs on any HDFS-compatible store; each
    directory delete is atomic per-partition, and readers planning from
    the file index simply stop listing the removed partitions.
    """
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path
    fs = jpath(path).getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    dropped: list[str] = []
    prefix = f"{partition_col}="
    for status in fs.listStatus(jpath(path)):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith(prefix):
            value = name[len(prefix):]
            if value < keep_from:
                fs.delete(status.getPath(), True)
                dropped.append(value)
    return sorted(dropped)


def shard_column(id_col: str = "doc_id", n_shards: int = 16) -> Column:
    """Deterministic training-shard assignment: an md5-derived integer in
    [0, n_shards) computed from the row key — reproducible across engines,
    partitionings, and corpus growth (unlike RNG or engine-specific hash
    partitioner ids). The md5 prefix is folded to an integer with
    ``instr`` positional arithmetic, which parses identically in Spark SQL
    and DuckDB, so oracle twins can reproduce the assignment verbatim."""
    h = f"md5(concat('shard:', CAST({id_col} AS STRING)))"
    hexpos = "instr('0123456789abcdef', substr({h}, {i}, 1)) - 1"
    v = " + ".join(
        f"({hexpos.format(h=h, i=i + 1)}) * {16 ** (3 - i)}" for i in range(4)
    )
    return F.expr(f"CAST(({v}) % {n_shards} AS BIGINT)")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> None:
    """The pre-training 'global shuffle': write the corpus as n_shards
    deterministic shards, each internally ordered by md5(id) — a
    reproducible uniform permutation of the corpus (hash order == uniform
    order), so any prefix of any shard is an unbiased sample and training
    can stream shards independently.

    Scale shape: shard assignment is map-only; ``repartition`` on the
    shard key is the ONE shuffle (at 100 TB: bump n_shards so each shard
    fits an executor, e.g. 100k shards of ~1 GB); the per-shard md5 sort
    is sortWithinPartitions (no global sort — a total order across
    shards is never needed, the shard id IS the outer sort key)."""
    (
        df.withColumn("shard", shard_column(id_col, n_shards))
        .withColumn("__ord", F.md5(F.concat(F.lit("ord:"), F.col(id_col).cast("string"))))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "__ord")
        .drop("__ord")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
