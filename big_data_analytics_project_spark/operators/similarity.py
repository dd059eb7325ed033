"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring how ANN is deployed at scale:

- **Brute-force top-k** (the baseline): broadcast the (small) query set,
  cross-join against the corpus, sequential-fold cosine in double, rank
  with a deterministic tie-break.  At 100 TB this is the exact-rescoring
  stage that runs AFTER candidate pruning.
- **Sign-LSH bucketed** (the scale path): hash every vector to a bucket
  from the signs of its leading dimensions (axis-aligned random
  hyperplanes); candidates are bucket-cohabitants only, turning the cross
  join into an equi-join on bucket id — one shuffle, linear candidate
  volume.  Recall is tunable via n_bits / multi-probe; the oracle checks
  the bucketed result deterministically.

No UDFs anywhere: cosine is `zip_with` + `aggregate` inside codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.vector import as_double, cosine, sign_bucket


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus (excluding self).

    Returns (query_id, neighbor_id, cosine_sim, rank).  Ranking uses the
    similarity rounded to ``round_digits`` with the neighbor id as
    tie-break, making the result deterministic across engines.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("__cv")
    )
    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), round_digits).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_bits: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket.  2^n_bits buckets → candidate volume shrinks ~2^n_bits-fold;
    the join is bucket-equi instead of cross."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(vec_col).alias("__qv"),
        sign_bucket(as_double(vec_col), n_bits).alias("__bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("__cv"),
        sign_bucket(as_double(vec_col), n_bits).alias("__bucket"),
    )
    sims = (
        F.broadcast(q)
        .join(c, "__bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), round_digits).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def cosine_near_duplicates(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_bits: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-space near-dup pairs: sign-LSH blocking → within-bucket
    pairs (id_a < id_b) → cosine ≥ threshold."""
    v = corpus.select(
        F.col(id_col),
        as_double(vec_col).alias("__v"),
        sign_bucket(as_double(vec_col), n_bits).alias("__bucket"),
    )
    a = v.select(
        F.col(id_col).alias("id_a"), F.col("__v").alias("__va"), "__bucket"
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"), "__bucket"
    )
    return (
        a.join(b, "__bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), round_digits).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
