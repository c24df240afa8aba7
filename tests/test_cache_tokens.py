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


def test_stale_siblings_pruned_other_prefixes_and_sfs_kept(spark):
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    stale = os.path.join(warehouse, "tcache_b_sf0.001_deadbeef")
    other = os.path.join(warehouse, "tcache_bb_sf0.001_deadbeef")
    other_sf = os.path.join(warehouse, "tcache_b_sf0.01_deadbeef")
    for d in (stale, other, other_sf):
        os.makedirs(d, exist_ok=True)
    try:
        live = _fingerprint_cache_path(
            spark, SF_DIR, "events", "tcache_b", "v1"
        )
        # the stale same-prefix same-SF sibling is gone; a LONGER
        # prefix sharing the leading text is untouched (prune matches
        # "tcache_b_sf0.001_", never "tcache_bb_..."); and ANOTHER
        # scale factor's cache under the same prefix survives (an SF
        # switch must not evict the other SF's still-valid artifacts).
        assert not os.path.exists(stale)
        assert os.path.exists(other)
        assert os.path.exists(other_sf)
        assert os.path.dirname(live) == warehouse
        # a second resolve with a bumped salt prunes the previous token
        os.makedirs(live, exist_ok=True)
        live2 = _fingerprint_cache_path(
            spark, SF_DIR, "events", "tcache_b", "v2"
        )
        assert live2 != live and not os.path.exists(live)
    finally:
        for d in (stale, other, other_sf):
            if os.path.isdir(d):
                os.rmdir(d)


def test_inflight_builds_exempt_and_partial_targets_pruned(spark):
    """Atomic-publish contract (r12): same-token ``.build-*`` temp dirs
    survive the prune (a concurrent same-data session must not delete a
    build about to be renamed into place), a COMPLETE target (_SUCCESS
    present) survives re-resolution, and a PARTIAL target (no _SUCCESS —
    a crashed in-place build) is wiped so call sites rebuild cleanly."""
    live = _fingerprint_cache_path(spark, SF_DIR, "events", "tcache_c", "v1")
    build = f"{live}.build-cafe0123"
    os.makedirs(build, exist_ok=True)
    try:
        again = _fingerprint_cache_path(
            spark, SF_DIR, "events", "tcache_c", "v1"
        )
        assert again == live
        assert os.path.isdir(build), "in-flight same-token build was pruned"
        # complete target: survives
        os.makedirs(live, exist_ok=True)
        open(os.path.join(live, "_SUCCESS"), "w").close()
        assert (
            _fingerprint_cache_path(spark, SF_DIR, "events", "tcache_c", "v1")
            == live
        )
        assert os.path.exists(os.path.join(live, "_SUCCESS"))
        # partial target: pruned on resolve
        os.remove(os.path.join(live, "_SUCCESS"))
        _fingerprint_cache_path(spark, SF_DIR, "events", "tcache_c", "v1")
        assert not os.path.exists(live), "partial target survived resolve"
    finally:
        for d in (build, live):
            if os.path.isdir(d):
                import shutil

                shutil.rmtree(d, ignore_errors=True)


def test_publish_cache_build_atomic_rename_and_loser_discard(spark, tmp_path):
    from nyc_yellow_taxi_trip_data_pipeline_spark.plans.datapipe import (
        _publish_cache_build,
    )

    tmp = tmp_path / "t.build-1"
    tgt = tmp_path / "t"
    tmp.mkdir()
    (tmp / "_SUCCESS").touch()
    _publish_cache_build(str(tmp), str(tgt))
    assert tgt.is_dir() and (tgt / "_SUCCESS").exists()
    assert not tmp.exists()
    # a losing concurrent build is discarded, the winner untouched
    loser = tmp_path / "t.build-2"
    loser.mkdir()
    (loser / "part-0.parquet").touch()
    _publish_cache_build(str(loser), str(tgt))
    assert not loser.exists()
    assert (tgt / "_SUCCESS").exists()


def test_publish_cache_build_concurrent_builders(tmp_path):
    """Two builders racing the same token: exactly one publishes, the
    loser's temp dir is discarded, and the published target is COMPLETE
    (all of one builder's files — never a mix)."""
    import threading

    tgt = tmp_path / "c"
    from nyc_yellow_taxi_trip_data_pipeline_spark.plans.datapipe import (
        _publish_cache_build,
    )

    def build(i: int) -> None:
        tmp = tmp_path / f"c.build-{i}"
        tmp.mkdir()
        for j in range(5):
            (tmp / f"part-{j}.builder{i}").touch()
        (tmp / "_SUCCESS").touch()
        _publish_cache_build(str(tmp), str(tgt))

    threads = [threading.Thread(target=build, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert tgt.is_dir() and (tgt / "_SUCCESS").exists()
    owners = {
        f.suffix for f in tgt.iterdir() if f.name.startswith("part-")
    }
    assert len(owners) == 1, f"mixed-builder target: {sorted(owners)}"
    assert len(list(tgt.glob("part-*"))) == 5
    assert not list(tmp_path.glob("c.build-*")), "loser temp dirs left behind"
