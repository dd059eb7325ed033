"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines carry image/audio/video as ``binary`` columns next to typed
metadata, decode/inspect them in Arrow-batched Python (``mapInPandas``),
and keep everything else JVM-side.  The container has no image/audio
libraries, so the decode step is STUBBED per the build contract:

- ``decode_media_meta``: the Spark-side plumbing (schema, batch iteration,
  Arrow transfer, partition preservation) is REAL; the default pixel
  decode is a deterministic fake (dimensions derived from byte length) so
  oracle queries stay engine-mirrorable.
- ``real_decode_image``: the production decoder — probed at import
  (``HAS_PIL``) and fully implemented when Pillow is present; pass
  ``decoder=real_decode_image`` (or any ``bytes -> (w, h)`` callable) to
  ``decode_media_meta`` to run it through the same Arrow plumbing.  In
  containers without PIL it raises ``NotImplementedError`` — the
  clearly-marked seam.

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
    the byte length.  The default for oracle queries (engine-mirrorable);
    production passes ``decoder=real_decode_image``."""
    n = len(payload)
    width = n % 640 + 1
    height = (n * 7) % 480 + 1
    return width, height


try:  # probed once at import; real_decode_image auto-enables when present
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover - container has no Pillow
    _PILImage = None
    HAS_PIL = False


def real_decode_image(payload: bytes) -> tuple[int, int]:
    """Production decoder: true pixel dimensions via Pillow.  Raises
    ``NotImplementedError`` where Pillow is absent (this container) — the
    clearly-marked production seam; env-gated test covers the real path."""
    if not HAS_PIL:
        raise NotImplementedError(
            "image decoding requires PIL/Pillow, absent from this environment"
        )
    from io import BytesIO

    with _PILImage.open(BytesIO(payload)) as im:
        return im.width, im.height


def decode_media_meta(df: DataFrame, decoder=None) -> DataFrame:
    """Arrow-batched decode → typed metadata.  Input: (doc_id, payload
    binary); output: DECODED_META_SCHEMA.  One pass, partition-preserving.

    ``decoder`` is any ``bytes -> (width, height)`` callable, shipped to
    executors inside the mapInPandas closure; defaults to the deterministic
    fake so oracle queries stay engine-mirrorable.  Pass
    ``real_decode_image`` (auto-enabled when Pillow is importable) for real
    media bytes."""
    decoder = decoder or _fake_decode

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(decoder)
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
