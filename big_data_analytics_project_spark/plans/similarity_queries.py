"""Similarity-search query registrations, all oracle-checked.

Cosines are computed as identical sequential double folds on both engines
(see functions/vector.py); rankings order by the *rounded* similarity with
the neighbor id as tie-break so top-k sets are engine-independent.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..functions.vector import duck_cosine, duck_sign_bucket
from ..operators import similarity as S
from ..registry import query
from ..sources import read_table

_COS = duck_cosine("a.v", "b.v")

_DUCK_BRUTE_TOPK = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({_COS}, 6) AS cosine_sim
  FROM v a JOIN v b ON a.vec_id < 5 AND b.vec_id != a.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""

_BUCKET_A = duck_sign_bucket("a.v", 4)
_BUCKET_B = duck_sign_bucket("b.v", 4)

_DUCK_LSH_TOPK = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({_COS}, 6) AS cosine_sim
  FROM v a JOIN v b
    ON a.vec_id < 5 AND b.vec_id != a.vec_id AND {_BUCKET_A} = {_BUCKET_B}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""

_DUCK_COS_NEARDUP = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({_COS}, 6) AS cosine_sim
  FROM v a JOIN v b
    ON a.vec_id < b.vec_id AND {_BUCKET_A} = {_BUCKET_B}
)
SELECT id_a, id_b, cosine_sim FROM pairs WHERE cosine_sim >= 0.4
"""


@query("ann_bruteforce_topk", sql=_DUCK_BRUTE_TOPK, tags=("similarity", "ann"))
def ann_bruteforce_topk(spark, sf_dir):
    """Exact cosine top-10 for query vectors vec_id∈[0,5) — the rescoring
    baseline: broadcast queries × corpus, fold-cosine, in-plan top-k."""
    emb = read_table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(emb, emb.where(F.col("vec_id") < 5), k=10)


@query("ann_lsh_topk", sql=_DUCK_LSH_TOPK, tags=("similarity", "ann", "lsh"))
def ann_lsh_topk(spark, sf_dir):
    """Sign-LSH bucketed approximate top-10 (the scale path: bucket
    equi-join replaces the cross join)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return S.lsh_bucketed_topk(emb, emb.where(F.col("vec_id") < 5), k=10, n_bits=4)


@query("ann_ivf_topk", sql=None, tags=("similarity", "ann", "ivf"))
def ann_ivf_topk(spark, sf_dir):
    """IVF-Flat ANN top-10 (FAISS-style scale path): seeded k-means coarse
    quantizer → map-only inverted-list assignment (centroid literals inside
    codegen, no shuffle) → queries probe their 4 nearest of 16 lists →
    exact cosine within probed lists.  Rows-only: k-means has no DuckDB
    mirror; exactness at nprobe=n_centroids and recall at nprobe=4 are
    pinned in tests/test_similarity.py."""
    emb = read_table(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        emb, emb.where(F.col("vec_id") < 5), k=10, n_centroids=16, nprobe=4
    )


@query("embedding_cosine_neardup", sql=_DUCK_COS_NEARDUP, tags=("dedup", "similarity"))
def embedding_cosine_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs ≥0.4 within sign-LSH buckets —
    the semantic-dedup primitive."""
    emb = read_table(spark, sf_dir, "embeddings")
    return S.cosine_near_duplicates(emb, threshold=0.4, n_bits=4)
