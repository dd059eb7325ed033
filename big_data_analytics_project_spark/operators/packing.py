"""Sequence packing: assign documents to fixed-token-budget bins
(LLM-pretraining context-window packing).

Training pipelines concatenate documents into fixed-size context windows
(e.g. 2048 tokens); the packing assignment must be deterministic so every
re-run shards identically.  True first-fit bin packing is inherently
sequential; the distributed-friendly form is LINEAR packing: order docs
by a stable key within each shard, take a running token total, and cut a
new bin every time the total crosses a multiple of the budget:

    bin_id = floor((cumsum_tokens - n_tokens) / budget)

i.e. a document starts in the bin where its first token lands.  Bins can
overflow by at most one document's tokens (the straddler) — the standard
trade for a one-window-pass, fully parallel assignment.

Scale design: packing runs WITHIN a shard column (language, source, or an
explicit hash shard) — one window shuffle on the shard key, no global
sort.  A global ordering at 100 TB would serialize on a single reducer;
per-shard ordering preserves packing quality (bins never span shards by
construction) and parallelism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def pack_linear(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Adds ``bin_id`` (per-shard, 0-based) and ``bin_offset_tokens`` (the
    document's first-token position inside its shard's stream)."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    start = (cum - F.col(tokens_col)).cast("long")
    return df.select(
        "*",
        F.floor(start / budget).cast("long").alias("bin_id"),
        start.alias("bin_offset_tokens"),
    )


def whitespace_token_count(text: Column) -> Column:
    """Whitespace token count (the packing currency; swap in a BPE
    estimate where a tokenizer parity matters)."""
    return F.size(F.split(F.trim(text), r"\s+")).cast("long")


def chunk_documents(
    df: DataFrame,
    text_col: str,
    chunk_tokens: int,
    overlap_tokens: int = 0,
) -> DataFrame:
    """Split each document into token windows of ``chunk_tokens`` with
    ``overlap_tokens`` carried between consecutive chunks (the other half
    of context-window preparation: packing joins short docs, chunking
    splits long ones).  Chunks start at multiples of the stride
    ``chunk_tokens - overlap_tokens``; the last chunk may be short; a doc
    at or under the chunk size yields itself as chunk 0.

    Map-only: tokenize → explode over the per-doc chunk count → slice the
    token array — each row expands independently, no shuffle, no state.
    Deterministic: chunk boundaries are a pure function of the token
    count."""
    stride = chunk_tokens - overlap_tokens
    if stride <= 0:
        raise ValueError("overlap must be smaller than the chunk size")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # number of chunks: 1 + ceil(max(0, n - chunk) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - chunk_tokens, F.lit(0)) / stride
    ).cast("int")
    return (
        df.withColumn("__toks", toks)
        .withColumn("__n_tokens", n.cast("long"))
        .withColumn("chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            "*",
            (F.col("chunk_id") * stride).cast("long").alias("chunk_start_token"),
            F.concat_ws(
                " ",
                F.slice(
                    F.col("__toks"),
                    F.col("chunk_id") * stride + 1,  # slice is 1-based
                    chunk_tokens,
                ),
            ).alias("chunk_text"),
        )
        .withColumn(
            "chunk_n_tokens",
            F.least(
                F.lit(chunk_tokens).cast("long"),
                F.col("__n_tokens") - F.col("chunk_start_token"),
            ),
        )
        .drop("__toks")
    )
