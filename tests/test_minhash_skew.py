"""Planted hot-key skew test for the shared MinHash build (VERDICT r16
item #6): the memoized pair build is now the single hot path for ten
queries, so its skew guarantee — one massively-duplicated boilerplate
text must NOT turn the band self-join quadratic — needs its own pin.

The cap mechanism under test (`operators/dedup.lsh_candidate_pairs`):
a band bucket larger than ``max_bucket`` is dropped entirely before
the self-join, so f identical docs contribute 0 join rows instead of
O(f^2). The guide's skew section (§2.5) notes AQE's skew-join split
cannot split a single enormous KEY — the cap is the engine's answer
for that case, and this test plants exactly that key.
"""

from __future__ import annotations

import os

import pandas as pd

_RECIPE = dict(
    threshold=0.5,
    n_hashes=12,
    band_size=3,
    shingle_n=2,
    max_bucket=64,
    sig_agree_min=5,
)

_HOT_N = 300  # >> max_bucket: uncapped this is 44_850 pairs


def _planted_corpus() -> dict[int, str]:
    docs: dict[int, str] = {}
    # The hot key: _HOT_N byte-identical docs -> identical signatures ->
    # one band bucket of size _HOT_N in EVERY band.
    boiler = " ".join(f"boiler{i} plate{i}" for i in range(30))
    for d in range(_HOT_N):
        docs[1000 + d] = boiler
    # One engineered near-dup pair that must still be found: doc 1 and
    # doc 2 share almost all shingles (small unique tail each).
    base = " ".join(f"tok{i}" for i in range(40))
    docs[1] = base + " enda"
    docs[2] = base + " endb"
    # Distinct filler docs (no pairs among themselves).
    for d in range(3, 40):
        docs[d] = " ".join(f"f{d}w{i}" for i in range(30))
    return docs


def _write_docs(sf: str, docs: dict[int, str]) -> None:
    pdf = pd.DataFrame(
        {
            "doc_id": pd.array(list(docs.keys()), dtype="int64"),
            "text": list(docs.values()),
            "lang": "en",
            "source": "engineered",
            "n_chars": pd.array(
                [len(t) for t in docs.values()], dtype="int64"
            ),
        }
    )
    pdf.to_parquet(os.path.join(sf, "documents.parquet"), index=False)


def test_hot_bucket_stays_bounded_through_shared_build(spark, tmp_path):
    """The planted 300-identical-doc cluster must contribute ZERO pairs
    (its over-cap buckets are dropped before the self-join — exact/
    boilerplate dedup's job, not pairwise LSH's), while the engineered
    near-dup pair outside the cluster is still found. An uncapped build
    would emit 44_850 hot pairs; the bound proves the band join the ten
    consumer queries share cannot go quadratic on one hot key."""
    from nyc_yellow_taxi_trip_data_pipeline_spark.plans import datapipe as dp

    sf = str(tmp_path)
    _write_docs(sf, _planted_corpus())
    pairs = dp._minhash_verified_pairs(spark, sf, **_RECIPE)
    got = {(int(r.doc_a), int(r.doc_b)) for r in pairs.collect()}

    hot = {p for p in got if p[0] >= 1000 and p[1] >= 1000}
    assert not hot, (
        f"{len(hot)} pairs inside the over-cap boilerplate cluster — "
        "the max_bucket cap did not suppress the hot band bucket"
    )
    assert (1, 2) in got, "the engineered near-dup pair must survive"
    assert len(got) < 50, f"pair set not bounded: {len(got)} pairs"


def test_hot_bucket_candidate_rows_bounded(spark, tmp_path):
    """Same plant, one level down: the candidate join itself (before
    verification) must stay bounded — the cap drops the bucket BEFORE
    the self-join, so candidate cardinality is what proves the shuffle
    stays linear, not just the verified output."""
    from nyc_yellow_taxi_trip_data_pipeline_spark.operators import dedup as dd
    from nyc_yellow_taxi_trip_data_pipeline_spark.sources.io import read_table

    sf = str(tmp_path)
    _write_docs(sf, _planted_corpus())
    docs = read_table(spark, sf, "documents")
    sh = dd.shingle_distinct(docs, n=2)
    sigs = dd.minhash_signatures(sh, n_hashes=12)
    bands = dd.lsh_bands(sigs, band_size=3)
    capped = dd.lsh_candidate_pairs(
        bands, max_bucket=_RECIPE["max_bucket"]
    ).count()
    assert capped < 100, f"candidate pairs not bounded: {capped}"
    # Control: the SAME corpus uncapped really is quadratic in the hot
    # cluster — proves the plant works and the cap is load-bearing.
    uncapped = dd.lsh_candidate_pairs(bands, max_bucket=None).count()
    assert uncapped >= _HOT_N * (_HOT_N - 1) // 2, (
        f"plant ineffective: uncapped={uncapped}"
    )
