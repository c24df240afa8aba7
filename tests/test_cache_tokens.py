"""Round-12 invariants for the warehouse cache-path helper: the token
must move on BOTH invalidation axes (input data, producing logic) and
stale same-prefix siblings must be garbage-collected, without touching
other prefixes (ADVICE r11 items 1 and 4)."""

from __future__ import annotations

import os

from nyc_yellow_taxi_trip_data_pipeline_spark.plans.datapipe import (
    _fingerprint_cache_path,
)

SF_DIR = "/root/testdata/sf0.001"


def test_same_inputs_same_path_and_salt_moves_it(spark):
    p1 = _fingerprint_cache_path(spark, SF_DIR, "events", "tcache_a", "v1")
    p2 = _fingerprint_cache_path(spark, SF_DIR, "events", "tcache_a", "v1")
    assert p1 == p2
    p3 = _fingerprint_cache_path(spark, SF_DIR, "events", "tcache_a", "v2")
    assert p3 != p1
    # different table data => different token under the same salt
    p4 = _fingerprint_cache_path(spark, SF_DIR, "customer", "tcache_a", "v1")
    assert p4 != p1


def test_stale_siblings_pruned_other_prefixes_kept(spark):
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    stale = os.path.join(warehouse, "tcache_b_deadbeef")
    other = os.path.join(warehouse, "tcache_bb_deadbeef")
    os.makedirs(stale, exist_ok=True)
    os.makedirs(other, exist_ok=True)
    try:
        live = _fingerprint_cache_path(
            spark, SF_DIR, "events", "tcache_b", "v1"
        )
        # the stale same-prefix sibling is gone, the live path is the
        # returned one (not created yet — the caller writes it), and a
        # LONGER prefix sharing the same leading text is untouched
        # (prune matches "tcache_b_", never "tcache_bb_").
        assert not os.path.exists(stale)
        assert os.path.exists(other)
        assert os.path.dirname(live) == warehouse
        # a second resolve with a bumped salt prunes the previous token
        os.makedirs(live, exist_ok=True)
        live2 = _fingerprint_cache_path(
            spark, SF_DIR, "events", "tcache_b", "v2"
        )
        assert live2 != live and not os.path.exists(live)
    finally:
        for d in (stale, other):
            if os.path.isdir(d):
                os.rmdir(d)
