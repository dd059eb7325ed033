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
