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


def plan_compaction(
    stats: dict[str, tuple[int, int, int]],
    target_files: int,
    by_bytes: bool = False,
) -> tuple[list[str], int, dict[str, int]]:
    """Bin-pack compaction plan from per-partition metadata stats
    ``{dir: (file_count, rows, bytes)}`` — the shared arithmetic behind
    q196 (row-planned) and q197 (byte-planned). Returns
    ``(todo, max_rec, needed)``:

    - the per-file target derives from the table total spread over
      ``len(stats) * target_files`` files, CLAMPED to the size-richest
      partition so that partition's bin-packed target stays
      <= target_files (the ADVICE-r13 data-shape guarantee: the planner
      always has a selectable partition as long as one is fragmented
      past target_files files);
    - ``needed[d] = max(1, ceil(size_d / unit))`` — at least one file
      per partition, so a single-file partition can never be selected;
    - ``max_rec`` is the maxRecordsPerFile the writer enforces: the
      unit itself in row mode, or the byte unit divided by the
      measured global bytes-per-row in byte mode — additionally
      clamped in byte mode so the SIZE-RICHEST partition stays writer-
      feasible (``ceil(rows_richest / max_rec) <= target_files``):
      without the clamp a byte-richest partition with much narrower
      rows than the global average could need more than target_files
      row-sized files and be skipped, leaving ``todo`` empty even
      though a partition is fragmented past target_files (ADVICE r14 —
      unreachable on uniform-width lineitem, real on mixed-width
      corpora);
    - selection requires BOTH the planned improvement
      (``nf > needed``) and writer feasibility
      (``nf > ceil(rows / max_rec)``) — in row mode the two coincide;
      in byte mode the second guards partitions whose bytes-per-row
      diverges from the global average far enough that the row-sized
      rewrite would not reduce their file count (never rewrite without
      improving).

    Empty ``stats`` returns an empty plan (``([], 1, {})``) so callers
    hit their own descriptive 'planner selected no partitions'
    assertion instead of an opaque max()-of-empty ValueError (ADVICE
    r14).

    Invariants property-tested in tests/test_round9c_properties.py:
    single-file partitions never selected, selected partitions strictly
    reduce their file count to exactly ceil(rows/max_rec), the richest
    partition's needed <= target_files AND (byte mode) its row-sized
    file budget ceil(rows/max_rec) <= target_files, max_rec >= 1."""
    if not stats:
        return [], 1, {}
    sizes = {
        d: (b if by_bytes else r) for d, (_, r, b) in stats.items()
    }
    total = sum(sizes.values())
    total_rows = sum(r for _, r, _ in stats.values())
    big = max(sizes.values())
    unit = max(
        1,
        -(-total // (len(stats) * target_files)),
        -(-big // target_files),
    )
    needed = {d: max(1, -(-sizes[d] // unit)) for d in stats}
    if by_bytes:
        max_rec = max(1, (unit * total_rows) // total) if total else 1
        rows_richest = max(
            (r for d, (_, r, _) in stats.items() if sizes[d] == big),
            default=0,
        )
        max_rec = max(max_rec, -(-rows_richest // target_files))
    else:
        max_rec = unit
    todo = sorted(
        d
        for d, (nf, rows, _) in stats.items()
        if nf > needed[d] and nf > max(1, -(-rows // max_rec))
    )
    return todo, max_rec, needed


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
