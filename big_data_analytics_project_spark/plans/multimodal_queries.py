"""Multimodal plumbing queries.

The payload here is utf-8 text bytes standing in for media bytes (no image
libs in the container — see operators/multimodal.py); the *plumbing* —
binary columns, hashes, Arrow-batched decode, frame explosion — is real
and oracle-checked where the math is engine-mirrorable.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..operators import multimodal as M
from ..registry import query
from ..sources import read_table


@query(
    "multimodal_binary_meta",
    sql="""
    SELECT doc_id,
           CAST(octet_length(text::BLOB) AS BIGINT) AS byte_len,
           sha256(text) AS payload_sha256
    FROM documents
    """,
    tags=("multimodal", "binary"),
)
def multimodal_binary_meta(spark, sf_dir):
    """Opaque-binary handling JVM-side: byte length + SHA-256 checksum of
    the payload (content addressing for media dedup/integrity)."""
    docs = read_table(spark, sf_dir, "documents")
    payload = M.attach_binary_payload(docs, "doc_id", "text")
    return payload.select(
        "doc_id",
        F.length("payload").cast("long").alias("byte_len"),
        F.sha2("payload", 256).alias("payload_sha256"),
    )


@query(
    "multimodal_decode_meta",
    sql="""
    SELECT doc_id,
           CAST(octet_length(text::BLOB) AS BIGINT) AS byte_len,
           CAST(octet_length(text::BLOB) % 640 + 1 AS BIGINT) AS width,
           CAST((octet_length(text::BLOB) * 7) % 480 + 1 AS BIGINT) AS height,
           CAST((octet_length(text::BLOB) % 640 + 1)
                * ((octet_length(text::BLOB) * 7) % 480 + 1) AS BIGINT) AS n_pixels
    FROM documents
    """,
    tags=("multimodal", "pandas_udf"),
)
def multimodal_decode_meta(spark, sf_dir):
    """The Arrow-batched mapInPandas decode path (deterministic fake
    decoder, real batch plumbing).  The oracle mirrors the fake's
    arithmetic, so this also verifies the Python batch boundary end-to-end."""
    docs = read_table(spark, sf_dir, "documents")
    payload = M.attach_binary_payload(docs, "doc_id", "text")
    return M.decode_media_meta(payload)


@query(
    "multimodal_frame_index",
    sql="""
    SELECT doc_id,
           CAST(octet_length(text::BLOB) AS BIGINT) AS byte_len,
           CAST(f AS BIGINT) AS frame_no,
           CAST(f * 64 AS BIGINT) AS frame_offset,
           CAST(least(64, octet_length(text::BLOB) - f * 64) AS BIGINT) AS frame_len
    FROM documents,
         LATERAL (SELECT unnest(range(0, CAST(ceil(octet_length(text::BLOB) / 64.0) AS BIGINT)))) t(f)
    """,
    tags=("multimodal", "frames"),
)
def multimodal_frame_index(spark, sf_dir):
    """Frame/window explosion over binary payloads (video frame-sample /
    audio window pattern) — JVM-side sequence+explode+substring."""
    docs = read_table(spark, sf_dir, "documents")
    payload = M.attach_binary_payload(docs, "doc_id", "text")
    return M.frame_index(payload, "doc_id", frame_bytes=64)


@query(
    "multimodal_binary_dedup",
    sql="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT sha256(text) AS payload_sha256,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST(min(octet_length(text::BLOB)) AS BIGINT) AS byte_len,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc_id
    FROM corpus
    GROUP BY 1 HAVING count(*) > 1
    """,
    tags=("multimodal", "binary", "dedup"),
)
def multimodal_binary_dedup(spark, sf_dir):
    """Content-addressed exact dedup of opaque binary payloads — the
    media-asset dedup pass (identical bytes ⇒ identical SHA-256 ⇒ one
    canonical copy).  The fixture has no byte-identical payloads, so
    every 5th document is re-ingested verbatim under a new id and the
    hash-groupBy must find exactly those groups.  Map-only digest +
    hash partition on the digest; the JVM-side sha2 runs inside codegen,
    payload bytes never shuffle (only the 32-byte digest does)."""
    docs = read_table(spark, sf_dir, "documents")
    dups = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionByName(dups)
    payload = M.attach_binary_payload(corpus, "doc_id", "text")
    return (
        payload.groupBy(F.sha2("payload", 256).alias("payload_sha256"))
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.min(F.length("payload")).cast("long").alias("byte_len"),
            F.min("doc_id").cast("long").alias("canonical_doc_id"),
        )
        .where(F.col("n_copies") > 1)
    )
