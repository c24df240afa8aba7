"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
metadata columns alongside (the lakehouse-standard pattern). The Spark-side
plumbing — schema, batch iteration, partition-sized Arrow transfer — is
real and tested; the actual media decode is stubbed because no codec
libraries exist in this environment (clearly marked below).

At 100 TB the decode path is the expensive stage: it runs as
``mapInPandas`` so each task streams Arrow batches through one Python
worker (no per-row serde), and upstream filters/column pruning still push
into the parquet scan because the decode is the LAST stage of the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, format string, width int, height int, ok boolean"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload: utf-8 bytes of the text column standing in for media
    bytes; real pipelines read the bytes from parquet/object storage."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def payload_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata derived JVM-side (no Python): size + a deterministic
    pseudo-format tag — the cheap columns you filter on BEFORE decoding."""
    size = F.octet_length(F.col(payload_col))
    return df.withColumns(
        {
            "n_bytes": size.cast("long"),
            "media_format": F.when(size % 3 == 0, F.lit("png"))
            .when(size % 3 == 1, F.lit("jpeg"))
            .otherwise(F.lit("webp")),
        }
    )


def decode_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Batch 'decode' via mapInPandas: Arrow-batched, partition-parallel.

    The iterator-of-batches shape is the real contract a codec UDF needs;
    swap ``fake_decode`` for a real decoder and nothing else changes.

    IMPORTANT: the closure is fully self-contained (the decode helper is
    nested, not a module global) so cloudpickle ships it by value —
    executor Python workers do NOT have this package importable.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_decode(payload: bytes) -> tuple[int, int]:
            # STUB: a real implementation would be e.g.
            # PIL.Image.open(BytesIO(payload)) — image/audio libraries are
            # not available in this container. The fake derives stable
            # dimensions from the byte length so tests can assert exact
            # values through the full mapInPandas path.
            n = len(payload)
            return (64 + n % 640, 64 + (n * 7) % 480)

        for pdf in batches:
            payloads = pdf["payload"]
            dims = [fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "format": pdf["media_format"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "ok": True,
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)
