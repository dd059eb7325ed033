"""End-to-end pretraining-corpus pipeline: the extension counterpart of
the reference's three clickstream entry points (``plans/clickstream.py``).

One call chains the curation operators the way a 100 TB run would:

    raw documents
      → Gopher-style quality gates        (map-only)
      → exact dedup                        (hash-groupBy, keep min doc_id)
      → MinHash-LSH near-dup clustering    (banded, keep cluster canonical)
      → per-source token-budget draw       (optional; hash-ordered cumsum)
      → deterministic hash split           (train/holdout, engine-portable)
      → train/holdout leakage audit        (13-gram overlap count)
      → context-window sequence packing    (per-shard window cumsum)
      → JSONL shard export                 (bounded shard count)

Every stage is the already-oracle-checked operator — this module adds NO
new math, only the composition, so its correctness reduces to the
registry's per-operator guarantees plus the row-accounting test
(tests/test_pipeline.py).  Scale notes are on each operator; the chain
introduces no extra shuffles beyond the operators' own.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .operators import dedup as D
from .operators.clusters import dedup_clusters
from .operators.packing import pack_linear, whitespace_token_count
from .operators.sampling import budget_select, hash_bucket
from .sources import read_table
from .sources.sinks import write_jsonl_shards


def build_pretraining_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    *,
    token_budget: int = 512,
    holdout_pct: int = 5,
    n_shards: int = 4,
    source_token_budget: int | None = None,
) -> dict[str, int | DataFrame]:
    """Run the full curation chain; return row accounting per stage and
    the final packed DataFrames (written as JSONL when ``out_dir``)."""
    docs = read_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. Gopher-ish gates: word-count bounds + minimal stopword presence
    t = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    stop = F.array([F.lit(w) for w in ("the", "a", "of", "to", "and")])
    gated = docs.where(
        F.size(t).between(10, 100_000)
        & (F.size(F.array_intersect(F.array_distinct(t), stop)) >= 1)
    )
    n_gated = gated.count()

    # 2. exact dedup on the normalized-content fingerprint (keep min
    # doc_id — same normalization as dedup_exact_fingerprint)
    fp = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))
    )
    exact = (
        gated.withColumn("_fp", fp)
        .withColumn(
            "_keep",
            F.row_number().over(Window.partitionBy("_fp").orderBy("doc_id")),
        )
        .where(F.col("_keep") == 1)
        .drop("_fp", "_keep")
    )
    n_exact = exact.count()

    # 3. near-dup clustering, keep each cluster's canonical survivor
    pairs = D.minhash_near_duplicates(
        exact, "doc_id", "text", n=3, k=64, bands=16, threshold=0.5
    )
    clusters = dedup_clusters(exact, pairs)
    survivors = exact.join(
        clusters.where(F.col("is_canonical") == 1).select("doc_id"), "doc_id"
    )
    n_neardup = survivors.count()

    # 3b. optional mixture draw: cap each source at a token budget, rows
    # chosen in deterministic hash order (operators/sampling.budget_select)
    if source_token_budget is not None:
        survivors = budget_select(
            survivors.withColumn(
                "n_tokens", whitespace_token_count(F.col("text"))
            ),
            stratum="source",
            key="doc_id",
            weight="n_tokens",
            budget=source_token_budget,
        ).drop("n_tokens", "cum_n_tokens")
    n_budget = survivors.count()

    # 4. deterministic split (engine-portable, retry-stable)
    with_bucket = survivors.withColumn(
        "_b", hash_bucket(F.col("doc_id").cast("string"), 100)
    )
    train = with_bucket.where(F.col("_b") >= holdout_pct).drop("_b")
    holdout = with_bucket.where(F.col("_b") < holdout_pct).drop("_b")
    n_train, n_holdout = train.count(), holdout.count()

    # 4b. eval hygiene: holdout docs sharing any 13-gram with train are
    # leakage (same math as decontaminate_benchmark_ngrams, applied to
    # our own split) — reported, not silently dropped
    train_grams = (
        D.shingled(train.select("doc_id", "text"), "doc_id", "text", 13)
        .select(F.explode("shingle_set").alias("gram"))
        .distinct()
    )
    holdout_grams = D.shingled(
        holdout.select("doc_id", "text"), "doc_id", "text", 13
    ).select("doc_id", F.explode("shingle_set").alias("gram"))
    n_leaked = (
        holdout_grams.join(train_grams, "gram").select("doc_id").distinct().count()
    )

    # 5. pack into context windows per source shard
    counted = train.withColumn("n_tokens", whitespace_token_count(F.col("text")))
    packed = pack_linear(counted, "source", "doc_id", "n_tokens", token_budget)

    if out_dir is not None:
        write_jsonl_shards(
            packed.select(
                "doc_id", "source", "n_tokens", "bin_id", "bin_offset_tokens", "text"
            ),
            out_dir,
            n_shards=n_shards,
            shard_key="doc_id",
        )

    return {
        "n_raw": n_raw,
        "n_after_quality": n_gated,
        "n_after_exact_dedup": n_exact,
        "n_after_neardup": n_neardup,
        "n_after_budget": n_budget,
        "n_train": n_train,
        "n_holdout": n_holdout,
        "n_holdout_leaked": n_leaked,
        "packed": packed,
        "holdout": holdout,
    }
