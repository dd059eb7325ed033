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


# --- payload byte-entropy audit ------------------------------------------------
# The already-compressed detector: media/binary payloads that are already
# entropy-coded (JPEG/MP3/zstd) show per-byte entropy near ln(256), text
# near ~3 nats — storage pipelines route on this before wasting CPU on
# recompression.  Audited over the first 256 payload bytes (the same
# header-window trick as the meta parsers above, so cost per blob is
# constant regardless of payload size).  Per-doc entropy via
# H = ln(n) - (1/n)*sum(c*ln(c)) with portable 6-dp-quantized ln and
# exact DECIMAL sums; per-source roll-up with the decimal-sum/count
# idiom.  The per-doc histogram is computed ENTIRELY IN-MAP (VERDICT r10
# item 4): sort the bounded char array, find run boundaries, run lengths
# = counts — no (doc, char) explode, so the only shuffle left is the
# final source-keyed roll-up.  Subexpressions (sorted array, boundary
# list) are LET-BOUND via single-element-array transform() so Catalyst
# evaluates each once per row instead of inlining them per reference
# (the round-10 projection-collapse lesson, docs/determinism.md).

_ENTROPY_WIN = 256

_ENTROPY_SQL = f"""
WITH prefixes AS (
  SELECT doc_id, source, substr(text, 1, {_ENTROPY_WIN}) AS pre
  FROM documents WHERE length(text) > 0
),
chars AS (
  SELECT doc_id, source, substr(pre, i, 1) AS ch
  FROM prefixes, LATERAL unnest(generate_series(1, length(pre))) AS t(i)
),
cnt AS (
  SELECT doc_id, source, ch, CAST(count(*) AS BIGINT) AS c
  FROM chars GROUP BY doc_id, source, ch
),
per_doc AS (
  SELECT doc_id, source,
         CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)), 6)
                           AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS clnc
  FROM cnt GROUP BY doc_id, source
),
h AS (
  SELECT source,
         CAST(round(round(ln(CAST(n AS DOUBLE)), 6)
                    - CAST(clnc AS DOUBLE) / CAST(n AS DOUBLE), 6)
              AS DECIMAL(18,6)) AS h
  FROM per_doc
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(h) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS avg_entropy,
       CAST(min(h) AS DOUBLE) AS min_entropy,
       CAST(max(h) AS DOUBLE) AS max_entropy
FROM h GROUP BY source
"""


@query(
    "multimodal_byte_entropy",
    sql=_ENTROPY_SQL,
    tags=("multimodal", "audit"),
)
def multimodal_byte_entropy(spark, sf_dir):
    """Per-source byte-entropy audit of payload header windows — see
    block comment."""
    from ..operators.dedup import let, spread_if_few_splits

    docs = read_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    # the in-map histogram kernel is CPU-bound (higher-order functions run
    # interpreted) — see spread_if_few_splits for the guard rationale
    docs = spread_if_few_splits(docs, "doc_id")
    pre = docs.select(
        "doc_id", "source", F.substring("text", 1, _ENTROPY_WIN).alias("pre")
    )

    chars = F.transform(
        F.sequence(F.lit(1), F.length("pre")),
        lambda i: F.substring(F.col("pre"), i, 1),
    )
    # run-length histogram over the sorted char array: boundary positions
    # (0-based indices where the char differs from its predecessor) zipped
    # with their successors give run lengths = per-char counts
    counts = let(
        F.array_sort(chars),
        lambda s: let(
            F.filter(
                F.sequence(F.lit(0), F.size(s) - 1),
                lambda i: (i == 0) | (F.get(s, i) != F.get(s, i - 1)),
            ),
            lambda b: F.zip_with(
                b,
                F.concat(F.slice(b, 2, F.size(b) - 1), F.array(F.size(s))),
                lambda st, en: (en - st).cast("long"),
            ),
        ),
    )
    per_doc = pre.select(
        "source",
        F.length("pre").cast("long").alias("n"),
        F.aggregate(
            counts,
            F.lit(0).cast("decimal(28,6)"),
            lambda a, c: (
                a
                + c.cast("decimal(18,0)")
                * F.round(F.log(c.cast("double")), 6).cast("decimal(18,6)")
            ).cast("decimal(28,6)"),
        ).alias("clnc"),
    )
    h = per_doc.select(
        "source",
        F.round(
            F.round(F.log(F.col("n").cast("double")), 6)
            - F.col("clnc").cast("double") / F.col("n").cast("double"),
            6,
        )
        .cast("decimal(18,6)")
        .alias("h"),
    )
    return h.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(
            F.sum("h").cast("double") / F.count("*").cast("double"), 6
        ).alias("avg_entropy"),
        F.min("h").cast("double").alias("min_entropy"),
        F.max("h").cast("double").alias("max_entropy"),
    )
