"""Python DataSource (Spark 4 ``pyspark.sql.datasource`` API): a
manifest-sharded document reader with real filter pushdown.

Why this exists: the reference reads everything through built-in
readers; a training-data lake at 100 TB routinely carries formats and
manifest conventions Spark has no native reader for. Spark 4's Python
DataSource API is the sanctioned extension point — this module
demonstrates the full surface on a parquet-backed "ingest manifest"
layout (directory of one file per ingest batch — exactly the shape
``tools/scale_smoke.py`` writes):

- ``partitions()``: one InputPartition per manifest file — split count
  (and therefore scan parallelism) tracks the ingest batch count, the
  same property the native multi-file scan has.
- ``pushFilters()``: accepts ``EqualTo('source', v)`` and prunes WHOLE
  partitions via parquet row-group min/max statistics before any row is
  read (the custom-source equivalent of partition pruning); all other
  filters are returned to Spark for post-scan evaluation.
- ``read()``: Arrow-native per-file read (pyarrow), residual source
  filter applied columnar-side, rows yielded per Arrow batch.

The factory returns the class from INSIDE a function body so that
cloudpickle serializes it BY VALUE: executor workers cannot import this
package (CLAUDE.md invariant 3), and a module-level class would pickle
by reference and die with ModuleNotFoundError on the first task.

Requires ``spark.sql.python.filterPushdown.enabled=true`` (runtime
conf) when the reader implements ``pushFilters`` — q160 sets and
restores it around the read so the driver's bare session works.
"""

from __future__ import annotations


def manifest_datasource():
    """Return the DataSource class (closure-local, pickled by value)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        EqualTo,
        InputPartition,
    )

    class _FilePartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class _ManifestReader(DataSourceReader):
        def __init__(self, options):
            self.dir = options["path"]
            self.src_filter = None

        def pushFilters(self, filters):
            kept = []
            for f in filters:
                if isinstance(f, EqualTo) and f.attribute == ("source",):
                    self.src_filter = f.value
                else:
                    kept.append(f)  # Spark re-applies these post-scan
            return iter(kept)

        def partitions(self):
            import os

            import pyarrow.parquet as pq

            if os.path.isdir(self.dir):
                files = sorted(
                    os.path.join(self.dir, f)
                    for f in os.listdir(self.dir)
                    if f.endswith(".parquet") and not f.startswith("_")
                )
            else:
                files = [self.dir]
            parts = []
            for p in files:
                if self.src_filter is not None:
                    # Row-group min/max stats: skip whole files whose
                    # source range cannot contain the filter value.
                    md = pq.read_metadata(p)
                    names = md.schema.names
                    if "source" in names:
                        i = names.index("source")
                        skip = True
                        for rg in range(md.num_row_groups):
                            st = md.row_group(rg).column(i).statistics
                            if st is None or not st.has_min_max:
                                skip = False
                                break
                            if st.min <= self.src_filter <= st.max:
                                skip = False
                                break
                        if skip:
                            continue
                parts.append(_FilePartition(p))
            return parts

        def read(self, part):
            # Spark hands a single None partition when partitions()
            # returned an empty list (everything stats-pruned).
            if part is None:
                return
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            t = pq.read_table(
                part.path, columns=["doc_id", "source", "n_chars"]
            )
            if self.src_filter is not None:
                t = t.filter(pc.equal(t["source"], self.src_filter))
            for b in t.to_batches():
                yield from zip(
                    *(b.column(i).to_pylist() for i in range(b.num_columns))
                )

    class ManifestDataSource(DataSource):
        @classmethod
        def name(cls):
            return "doc_manifest"

        def schema(self):
            return "doc_id bigint, source string, n_chars bigint"

        def reader(self, schema):
            return _ManifestReader(self.options)

    return ManifestDataSource
