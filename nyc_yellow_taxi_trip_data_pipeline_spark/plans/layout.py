"""Driver-side partition-directory assertion helpers shared by the
layout/maintenance queries (q195 COW merge, q196 row-planned compaction,
q197 byte-planned compaction).

These run on the DRIVER against a local staging table, so a shared
module is legal (CLAUDE.md invariant 3 restricts only worker-shipped
closures). They encode the two contracts every selective-rewrite
operator here asserts:

- byte-stability of untouched partition directories (filename + mtime
  snapshots compared before/after a dynamic-partition-overwrite write);
- metadata-only planning inputs (directory listing + parquet footer row
  counts + compressed file bytes — never data pages). At 100 TB the
  same listing distributes as a Spark job over file statuses; the
  staging tables here are <= ~100 dirs x ~12 files, a bounded
  driver-side walk.
"""

from __future__ import annotations

import os


def partition_snapshot(tbl: str, prefix: str) -> dict[str, list]:
    """(filename, mtime_ns) per partition dir (``{prefix}...``) — the
    byte-stability witness: any rewrite replaces files or bumps mtimes,
    so equal snapshots mean the directory was not touched."""
    out: dict[str, list] = {}
    for d in os.listdir(tbl):
        if d.startswith(prefix):
            p = os.path.join(tbl, d)
            out[d] = sorted(
                (f, os.stat(os.path.join(p, f)).st_mtime_ns)
                for f in os.listdir(p)
                if not f.startswith(".") and not f.startswith("_")
            )
    return out


def rewritten_partitions(
    before: dict[str, list], after: dict[str, list]
) -> set[str]:
    """Partition dirs whose snapshot changed (or appeared) across a
    write — compare against the planner's selected set to prove the
    rewrite was exactly partition-selective."""
    return {d for d in before if before[d] != after.get(d)} | (
        after.keys() - before.keys()
    )


def partition_file_stats(
    tbl: str, prefix: str
) -> dict[str, tuple[int, int, int]]:
    """(file_count, footer_row_count, compressed_bytes) per partition
    dir — the compaction planner's metadata-only input: row counts come
    from parquet FOOTERS, byte sizes from file stats; data pages are
    never read."""
    import pyarrow.parquet as pq

    out: dict[str, tuple[int, int, int]] = {}
    for d in os.listdir(tbl):
        if not d.startswith(prefix):
            continue
        p = os.path.join(tbl, d)
        files = [f for f in os.listdir(p) if f.endswith(".parquet")]
        rows = 0
        nbytes = 0
        for f in files:
            fp = os.path.join(p, f)
            rows += pq.ParquetFile(fp).metadata.num_rows
            nbytes += os.stat(fp).st_size
        out[d] = (len(files), rows, nbytes)
    return out
