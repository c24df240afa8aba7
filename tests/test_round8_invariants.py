"""Structural invariants for the round-8 queries — properties the
oracle hash-match can't express (cross-query agreement, conservation
laws, algorithmic guarantees)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nyc_yellow_taxi_trip_data_pipeline_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_q161_builtin_sessions_agree_with_q20_lag_form(spark):
    """The SessionWindow operator and the lag+cumsum formulation must
    partition events into the SAME sessions: per-user session and event
    counts agree exactly (both use a 30-min gap)."""
    q20 = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in QUERIES["q20_sessionization"].spark(spark, SF_DIR).collect()
    }
    rows = QUERIES["q161_session_window_batch"].spark(spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert set(by_user) == set(q20)
    for uid, sess in by_user.items():
        assert (len(sess), sum(s.n_events for s in sess)) == q20[uid], uid


def test_q153_rank_mass_conservation(spark):
    """Damped PageRank with ppm integer arithmetic: every rank is at
    least the teleport share, and total mass never exceeds 1e6 (integer
    truncation only loses mass, never creates it)."""
    rows = QUERIES["q153_domain_rank"].spark(spark, SF_DIR).collect()
    n = len(rows)
    assert n >= 2
    base = 1_000_000 // n
    teleport = (15 * base) // 100
    assert all(r.rank_ppm >= teleport for r in rows)
    assert sum(r.rank_ppm for r in rows) <= 1_000_000


def test_q151_pair_mass_matches_q32(spark):
    """The leakage audit rolls up exactly the q32 pair set — total
    n_pairs across cells equals the q32 pair count, and is_leak is 1
    precisely on off-diagonal cells."""
    n_pairs_32 = QUERIES["q32_minhash_lsh_neardup"].spark(spark, SF_DIR).count()
    rows = QUERIES["q151_split_leakage_audit"].spark(spark, SF_DIR).collect()
    assert sum(r.n_pairs for r in rows) == n_pairs_32
    for r in rows:
        assert r.is_leak == (0 if r.split_a == r.split_b else 1), r


def test_q155_vocab_curve_is_cumulative_and_complete(spark):
    """vocab_cum is nondecreasing and its final value equals the exact
    corpus-wide distinct bigram count; tokens_cum likewise ends at the
    full token mass of shingle-eligible docs plus singleton docs."""
    from nyc_yellow_taxi_trip_data_pipeline_spark.sources.io import read_table

    rows = sorted(
        QUERIES["q155_vocab_growth"].spark(spark, SF_DIR).collect(),
        key=lambda r: r.bucket,
    )
    cums = [r.vocab_cum for r in rows]
    assert cums == sorted(cums)
    assert all(
        b.vocab_cum - a.vocab_cum == b.vocab_new
        for a, b in zip(rows, rows[1:])
    )
    docs = read_table(spark, SF_DIR, "documents")
    w = docs.select(F.split("text", " ").alias("w")).filter(F.size("w") >= 2)
    exact_vocab = (
        w.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
                )
            ).alias("s")
        )
        .distinct()
        .count()
    )
    assert cums[-1] == exact_vocab


def test_q158_output_is_exact_heavy_hitter_set(spark):
    """q158's output must equal the exact GROUP BY heavy-hitter set —
    independent of how the MG candidate stage partitioned (re-run under
    a different partitioning to stress the pigeonhole guarantee)."""
    from nyc_yellow_taxi_trip_data_pipeline_spark.plans.datapipe import _HH_K
    from nyc_yellow_taxi_trip_data_pipeline_spark.sources.io import read_table

    docs = read_table(spark, SF_DIR, "documents")
    tok = docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
    n = tok.count()
    exact = {
        (r.w, r.c)
        for r in tok.groupBy("w")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") * (_HH_K + 1) > n)
        .collect()
    }
    got = {
        (r.word, r.n_occurrences)
        for r in QUERIES["q158_heavy_hitters"].spark(spark, SF_DIR).collect()
    }
    assert got == exact and len(got) > 0


@given(
    words=st.lists(st.integers(min_value=0, max_value=30),
                   min_size=1, max_size=300),
    cuts=st.lists(st.integers(min_value=0, max_value=299),
                  min_size=0, max_size=5),
    k=st.sampled_from([2, 3, 8]),
)
@settings(max_examples=150, deadline=None)
def test_misra_gries_union_pigeonhole(words, cuts, k):
    """Pure-Python mirror of q158's per-partition Misra-Gries stage:
    for ANY partitioning of the stream, the union of per-partition
    summaries contains every item with freq*(k+1) > n."""
    def mg(stream, cap):
        counters: dict[int, int] = {}
        for w in stream:
            if w in counters:
                counters[w] += 1
            elif len(counters) < cap:
                counters[w] = 1
            else:
                dead = []
                for key in counters:
                    counters[key] -= 1
                    if counters[key] == 0:
                        dead.append(key)
                for key in dead:
                    del counters[key]
        return set(counters)

    bounds = sorted({c for c in cuts if c < len(words)}) + [len(words)]
    parts, lo = [], 0
    for b in bounds:
        if b > lo:
            parts.append(words[lo:b])
            lo = b
    if lo < len(words):
        parts.append(words[lo:])
    union = set().union(*(mg(p, k) for p in parts)) if parts else set()
    n = len(words)
    from collections import Counter

    for w, c in Counter(words).items():
        if c * (k + 1) > n:
            assert w in union, (w, c, n, k, parts)


def test_q162_variant_totals_match_source(spark):
    """The variant round-trip must account for every event row."""
    from nyc_yellow_taxi_trip_data_pipeline_spark.sources.io import read_table

    n_events = read_table(spark, SF_DIR, "events").count()
    rows = QUERIES["q162_variant_roundtrip"].spark(spark, SF_DIR).collect()
    assert sum(r.n for r in rows) == n_events


def test_q166_allocation_sums_to_budget(spark):
    """Largest-remainder apportionment must hand out EXACTLY the budget
    (when total weight > 0) with every stratum getting a nonnegative
    share bounded by the budget."""
    from nyc_yellow_taxi_trip_data_pipeline_spark.plans.datapipe import _NEYMAN_T

    rows = QUERIES["q166_neyman_allocation"].spark(spark, SF_DIR).collect()
    assert rows
    total_w = sum(r.weight for r in rows)
    if total_w > 0:
        assert sum(r.n_alloc for r in rows) == _NEYMAN_T
    for r in rows:
        assert 0 <= r.n_alloc <= _NEYMAN_T
