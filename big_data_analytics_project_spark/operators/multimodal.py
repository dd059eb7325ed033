"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines carry image/audio/video as ``binary`` columns next to typed
metadata, decode/inspect them in Arrow-batched Python (``mapInPandas``),
and keep everything else JVM-side.  The container has no image/audio
libraries, so the decode step is STUBBED per the build contract:

- ``decode_media_meta``: the Spark-side plumbing (schema, batch iteration,
  Arrow transfer, partition preservation) is REAL; the pixel decode is a
  deterministic fake (dimensions derived from byte length).  Swapping in a
  real decoder means replacing ``_fake_decode`` only.
- ``real_decode_image``: gated behind an import-try of PIL and raising
  ``NotImplementedError`` here — the clearly-marked seam for production.

Scale notes: mapInPandas streams Arrow record batches through one Python
worker per core — no collect, no driver round-trip; batch size via
``spark.sql.execution.arrow.maxRecordsPerBatch``.  Binary payloads stay
off-heap in Arrow buffers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

DECODED_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
    ]
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stand-in ingest: utf-8 bytes of the text column as the opaque media
    payload (in production: the raw image/audio bytes from object storage)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decoder: dimensions derived from
    the byte length.  Replace with PIL/ffmpeg in production."""
    n = len(payload)
    width = n % 640 + 1
    height = (n * 7) % 480 + 1
    return width, height


def real_decode_image(payload: bytes):  # pragma: no cover - env-gated stub
    """Production decoder seam.  PIL is not present in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires PIL/Pillow, absent from this environment; "
            "wire it here and drop _fake_decode"
        ) from e
    raise NotImplementedError("plug Image.open(BytesIO(payload)) here")


def decode_media_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched decode → typed metadata.  Input: (doc_id, payload
    binary); output: DECODED_META_SCHEMA.  One pass, partition-preserving."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(_fake_decode)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": pdf["payload"].str.len().astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int64"),
                    "height": dims.map(lambda d: d[1]).astype("int64"),
                }
            )
            out["n_pixels"] = out["width"] * out["height"]
            yield out

    return df.mapInPandas(decode_batches, DECODED_META_SCHEMA)


def frame_index(df: DataFrame, id_col: str, frame_bytes: int = 64) -> DataFrame:
    """Frame/sample index for chunked media: one row per ``frame_bytes``
    window over the payload, with the byte slice attached.  JVM-side only
    (sequence + explode + binary substring) — the pattern for video
    frame-sampling or audio windowing before a per-frame Pandas UDF."""
    n_frames = F.ceil(F.length("payload") / F.lit(frame_bytes)).cast("int")
    return (
        df.select(
            F.col(id_col),
            F.length("payload").cast("long").alias("byte_len"),
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no"),
            F.col("payload"),
        )
        .select(
            id_col,
            "byte_len",
            F.col("frame_no").cast("long").alias("frame_no"),
            (F.col("frame_no") * frame_bytes).cast("long").alias("frame_offset"),
            F.length(
                F.substring(F.col("payload"), F.col("frame_no") * frame_bytes + 1, frame_bytes)
            ).cast("long").alias("frame_len"),
        )
    )
