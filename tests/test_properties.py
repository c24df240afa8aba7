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


def test_connected_components_matches_union_find(spark):
    """Distributed hash-min propagation == classic driver-side union-find
    on seeded random graphs (including multi-component, chains, cliques)."""
    import random

    rng = random.Random(1234)
    for trial in range(5):
        n = rng.randint(2, 40)
        m = rng.randint(1, 60)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = {x for e in edges for x in e}
        # canonical label = min node id in the component
        comp: dict[int, list[int]] = {}
        for x in nodes:
            comp.setdefault(find(x), []).append(x)
        expected = {
            x: min(members) for members in comp.values() for x in members
        }

        from nyc_yellow_taxi_trip_data_pipeline_spark.operators import dedup as dd

        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r.node: r.cluster for r in dd.connected_components(pairs).collect()
        }
        assert got == expected, f"trial {trial}: {got} != {expected}"


def test_binned_lookback_join_matches_naive(spark):
    """Binned equi-join + exact filter == naive cross-join range filter on
    seeded random events, across bin sizes that do and don't divide the
    lookback."""
    import random

    from pyspark.sql import functions as F

    from nyc_yellow_taxi_trip_data_pipeline_spark.operators.joins import (
        binned_lookback_join,
    )

    rng = random.Random(77)
    rows = [
        (i, rng.randrange(3), rng.randrange(0, 5000))
        for i in range(120)
    ]
    base = spark.createDataFrame(rows, "id long, k long, sec long").withColumn(
        "ts", F.timestamp_seconds(F.col("sec"))
    )
    left = base.select("id", "k", "ts")
    right = base.select(
        F.col("id").alias("rid"), F.col("k").alias("rk"), F.col("ts").alias("rts")
    )
    for lookback, bin_s in ((600, None), (600, 250), (997, 400)):
        got = sorted(
            (r.id, r.rid)
            for r in binned_lookback_join(
                left,
                right.withColumnRenamed("rk", "k"),
                ["k"],
                "ts",
                "rts",
                lookback_s=lookback,
                bin_s=bin_s,
            ).collect()
        )
        naive = sorted(
            (l[0], r[0])
            for l in rows
            for r in rows
            if l[1] == r[1] and l[2] - lookback <= r[2] < l[2]
        )
        assert got == naive, f"lookback={lookback} bin={bin_s}"


def test_sequence_packing_matches_reference_packer(spark):
    """q87's distributed chunked packer == a pure-Python greedy reference
    on seeded random corpora (doc counts straddling the chunk-count
    floor, token counts straddling the budget)."""
    import math
    import random

    from nyc_yellow_taxi_trip_data_pipeline_spark.plans.datapipe import (
        _PACK_BUDGET,
        _PACK_CHUNK_DOCS,
        q87_sequence_packing,
    )

    rng = random.Random(4321)
    for trial in range(3):
        n_docs = rng.choice([5, 200, 700])
        docs = [
            (i, " ".join("w" for _ in range(rng.randint(1, 700))))
            for i in range(n_docs)
        ]

        # pure-python reference: same chunking, same greedy recurrence
        n_chunks = max(8, math.ceil(n_docs / _PACK_CHUNK_DOCS))
        expected = {}
        chunks: dict[int, list[tuple[int, int]]] = {}
        for doc_id, text in docs:
            chunks.setdefault(doc_id % n_chunks, []).append(
                (doc_id, len(text.split(" ")))
            )
        for chunk, members in chunks.items():
            bin_idx, fill, first = 0, 0, True
            for doc_id, n in sorted(members):
                if not first and fill > 0 and fill + n > _PACK_BUDGET:
                    bin_idx += 1
                    fill = n
                else:
                    fill += n
                first = False
                expected[doc_id] = (chunk, bin_idx, n)

        import os
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
                os.path.join(td, "documents.parquet")
            )
            got = {
                r.doc_id: (r.chunk, r.bin_idx, r.n_tokens)
                for r in q87_sequence_packing(spark, td).collect()
            }
        assert got == expected, f"trial {trial} ({n_docs} docs)"


def test_simhash_banding_matches_bruteforce_hamming(spark):
    """Hamming-LSH banding (uncapped) == brute-force all-pairs within
    radius on seeded random 60-bit fingerprints — full-recall pigeonhole
    property on arbitrary inputs, not just constructed cases."""
    import random

    from nyc_yellow_taxi_trip_data_pipeline_spark.operators import dedup as dd

    rng = random.Random(99)
    fps = []
    for i in range(60):
        if i % 3 == 0 or not fps:
            fps.append((i, rng.getrandbits(60)))
        else:
            # perturb an earlier fingerprint by 0-5 random bits so pairs
            # exist at and around the radius boundary
            base = fps[rng.randrange(len(fps))][1]
            for _ in range(rng.randint(0, 5)):
                base ^= 1 << rng.randrange(60)
            fps.append((i, base))

    expected = {
        (a, b): bin(fa ^ fb).count("1")
        for ai, (a, fa) in enumerate(fps)
        for b, fb in fps[ai + 1:]
        if bin(fa ^ fb).count("1") <= 3
    }
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dd.simhash_near_duplicates(
            spark.createDataFrame(fps, "doc_id long, simhash long"),
            n_bits=60,
            n_bands=4,
            max_hamming=3,
        ).collect()
    }
    assert got == expected


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10**12),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    n_shards=st.sampled_from([2, 4, 16, 64]),
)
@settings(max_examples=10, deadline=None)
def test_shard_column_matches_pure_python_md5_fold(spark_global, ids, n_shards):
    """shard_column's instr-arithmetic hex fold must equal a pure-Python
    md5 reimplementation for any id and shard count — the property the
    DuckDB oracle twins rely on."""
    import hashlib

    from nyc_yellow_taxi_trip_data_pipeline_spark.sources.io import shard_column

    df = spark_global.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: r.shard
        for r in df.select(
            "doc_id", shard_column("doc_id", n_shards).alias("shard")
        ).collect()
    }
    for i in ids:
        h = hashlib.md5(f"shard:{i}".encode()).hexdigest()
        assert got[i] == int(h[:4], 16) % n_shards, (i, n_shards)


@given(
    words=st.lists(
        st.text(alphabet="abcXYZ", min_size=1, max_size=5),
        min_size=0,
        max_size=12,
    ),
    n=st.sampled_from([2, 3, 4]),
)
@settings(max_examples=15, deadline=None)
def test_ngram_fingerprints_match_pure_python(spark_global, words, n):
    """The sliding n-gram md5 stream equals a pure-Python reference:
    lowercase, space-joined, stride 1, one row per POSITION (duplicates
    preserved), no rows for docs shorter than n words."""
    import hashlib

    from nyc_yellow_taxi_trip_data_pipeline_spark.operators.dedup import (
        ngram_fingerprints,
    )

    text = " ".join(words)
    df = spark_global.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(
        r.ng for r in ngram_fingerprints(df, n=n).collect()
    )
    toks = text.lower().split(" ")
    expected = sorted(
        hashlib.md5(" ".join(toks[i : i + n]).encode()).hexdigest()
        for i in range(len(toks) - n + 1)
    ) if len(toks) >= n else []
    assert got == expected


@given(
    qs=st.lists(st.integers(min_value=-4000, max_value=4000),
                min_size=1, max_size=40),
    shift=st.integers(min_value=-10**9, max_value=10**9),
)
@settings(max_examples=200, deadline=None)
def test_q148_divide_early_variance_identity(qs, shift):
    """q148's centered divide-early algebra must equal the naive exact
    integer variance (n*Sxx - Sx^2) // n^2 for ANY integer inputs —
    including large shifted means (the overflow case the naive form
    can't survive: Python bigints play the arbitrary-precision referee
    here) and negative sums. Also pins |s1| <= n/2 (the bound that
    keeps s1^2 inside int64 to n ~ 3e9) and that the floor term is
    always in {-1, 0}."""
    import math

    qs = [q + shift for q in qs]
    n = len(qs)
    sx, sxx = sum(qs), sum(q * q for q in qs)
    naive = (n * sxx - sx * sx) // (n * n)

    m = math.floor(sx / n + 0.5)  # the exact-double round-half-up
    s1 = sum(q - m for q in qs)
    s2 = sum((q - m) ** 2 for q in qs)
    assert abs(s1) <= n  # n/2 + double-rounding slack; never near n^2
    floor_term = -1 if n * (s2 % n) < s1 * s1 else 0
    assert floor_term in (-1, 0)
    assert (s2 // n) + floor_term == naive
