"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  One broadcast of the query vector, one scan, one ordered limit; at scale
  this is a map-only pass + a tiny top-k reduction (no shuffle of vectors).
- ``srp_buckets`` / ``ann_candidates``: signed-random-projection LSH — the
  scale path. Each vector gets a small integer bucket from the signs of
  quantized dot products with md5-seeded ±1 hyperplanes; ANN search only
  scans the query's bucket. Quantized integer accumulation keeps bucket
  assignment bit-exact across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_yellow_taxi_trip_data_pipeline_spark.functions.vector import cosine_similarity


def as_double(col: str = "embedding"):
    return F.transform(F.col(col), lambda x: x.cast("double"))


def brute_force_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact cosine top-k against one stored vector. Cosine is rounded to
    6 dp before ranking so the ordering itself is reproducible."""
    q = emb.filter(F.col(id_col) == query_vec_id).select(
        as_double().alias("qv")
    )
    e = emb.filter(F.col(id_col) != query_vec_id).select(
        id_col, "label", as_double().alias("ev")
    )
    return (
        e.crossJoin(F.broadcast(q))
        .select(
            id_col,
            "label",
            F.round(cosine_similarity(F.col("ev"), F.col("qv")), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def blocked_neardup_topk(
    emb: DataFrame, k: int = 20, block_col: str = "label", id_col: str = "vec_id"
) -> DataFrame:
    """Most-similar within-block pairs (embedding near-dup detection).

    Blocking on ``block_col`` bounds the pairwise join to within-block
    cardinality (the same role LSH buckets play when no natural block key
    exists)."""
    a = emb.select(
        F.col(id_col).alias("vec_a"), F.col(block_col).alias("block"),
        as_double().alias("va"),
    )
    b = emb.select(
        F.col(id_col).alias("vec_b"), F.col(block_col).alias("block"),
        as_double().alias("vb"),
    )
    return (
        a.join(b, "block")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "block",
            "vec_a",
            "vec_b",
            F.round(cosine_similarity(F.col("va"), F.col("vb")), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(k)
    )


def srp_buckets(
    emb: DataFrame, n_planes: int = 8, id_col: str = "vec_id", scale: int = 1000000
) -> DataFrame:
    """Signed-random-projection bucket per vector.

    Hyperplane component (p, j) is +1 when the first hex digit of
    md5('p:j') is >= '8', else −1 — reproducible anywhere md5 exists.
    Vector components are quantized to integers before the signed sum, so
    the bucket sign is exact integer math (no float-merge nondeterminism).
    """
    exploded = emb.select(
        id_col, F.posexplode(as_double()).alias("pos0", "v")
    ).select(id_col, (F.col("pos0") + 1).alias("j"), F.col("v"))
    quant = exploded.withColumn(
        "vq", F.floor(F.col("v") * scale + F.lit(0.5)).cast("long")
    )
    planes = None
    spark = emb.sparkSession
    dim = len(emb.select("embedding").first()[0])
    rows = []
    import hashlib

    for p in range(n_planes):
        for j in range(1, dim + 1):
            digit = hashlib.md5(f"{p}:{j}".encode()).hexdigest()[0]
            rows.append((p, j, 1 if digit >= "8" else -1))
    planes = spark.createDataFrame(rows, "p int, j int, sign int")
    signed = (
        quant.join(F.broadcast(planes), "j")
        .groupBy(id_col, "p")
        .agg(F.sum(F.col("vq") * F.col("sign")).alias("acc"))
        .select(
            id_col,
            "p",
            F.when(F.col("acc") >= 0, F.lit(1)).otherwise(F.lit(0)).alias("bit"),
        )
    )
    return signed.groupBy(id_col).agg(
        F.sum(F.col("bit") * F.pow(F.lit(2.0), F.col("p")).cast("long"))
        .cast("int")
        .alias("bucket")
    )


def ann_candidates(
    emb: DataFrame, query_vec_id: int = 0, n_planes: int = 8, id_col: str = "vec_id"
) -> DataFrame:
    """ANN search: restrict exact cosine scoring to the query's SRP bucket.
    At scale the bucketed table is written bucketBy(bucket) so a query
    touches 1/2^n_planes of the data."""
    buckets = srp_buckets(emb, n_planes=n_planes, id_col=id_col)
    with_bucket = emb.join(buckets, id_col)
    qb = with_bucket.filter(F.col(id_col) == query_vec_id).select(
        F.col("bucket").alias("qbucket"), as_double().alias("qv")
    )
    cands = with_bucket.filter(F.col(id_col) != query_vec_id)
    return (
        cands.join(F.broadcast(qb), cands.bucket == F.col("qbucket"))
        .select(
            id_col,
            "label",
            "bucket",
            F.round(
                cosine_similarity(as_double(), F.col("qv")), 6
            ).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
    )
