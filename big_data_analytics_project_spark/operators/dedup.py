"""Deduplication operators for large-scale training-data pipelines.

Four families, all expressed with JVM-side built-ins (split/transform/
aggregate/xxhash64) — no Python UDFs in any hot path:

- exact:          hash-groupBy on content (or normalized fingerprint)
- n-gram Jaccard: shingle sets + exact set-overlap similarity
- MinHash + LSH:  k permutation-hashed signatures → banded bucket join →
                  candidate pairs → exact-Jaccard verification
- SimHash:        64-bit sign-majority fingerprint + Hamming distance

Scale design (100 TB corpus):
- Shingling/hashing is embarrassingly parallel (map-only, codegen'd).
- LSH banding turns the quadratic all-pairs problem into
  ``explode(bands) → repartition by (band, key) → within-bucket join``:
  the only shuffle is on band keys; candidate verification touches just
  bucket-cohabitants.  Oversized buckets (degenerate content, e.g. empty
  strings) are capped via ``max_bucket`` to bound worst-case skew.
- Exact Jaccard verification re-joins shingle sets by doc id — at scale
  attach signatures instead and verify on the (much smaller) candidate set.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Mersenne prime 2^61-1 keeps a*x+b in int64 without overflow for a,b < 2^31
_MERSENNE = (1 << 31) - 1


def minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """k deterministic affine permutations (a, b) with a odd, over GF(p)."""
    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE) | 1, rng.randrange(0, _MERSENNE)) for _ in range(k)]


def tokens(text: Column, lower: bool = True) -> Column:
    t = F.lower(text) if lower else text
    return F.split(t, r"\s+")


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token array (JVM higher-order
    fns: sequence → slice → concat_ws)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(grams)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two distinct-element arrays."""
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(F.array_union(a, b))


def shingled(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    return df.select(
        F.col(id_col), shingles(tokens(F.col(text_col)), n).alias("shingle_set")
    ).where(F.size("shingle_set") > 0)


def minhash_signature(shingle_set: Column, k: int = 32, seed: int = 42) -> Column:
    """k-wide MinHash signature: xxhash64 each shingle, then per-permutation
    affine-transform + array_min.  All columnar, no UDF."""
    hashes = F.transform(shingle_set, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))
    sigs = [
        F.array_min(
            F.transform(hashes, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE)))
        )
        for a, b in minhash_params(k, seed)
    ]
    return F.array(*sigs)


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    bands: int = 8,
    rows: int = 4,
    max_bucket: int = 200,
) -> DataFrame:
    """Band the signature (bands × rows = k) and emit candidate id pairs that
    co-occur in ≥1 bucket.  Output: (id_a, id_b) with id_a < id_b, distinct.

    The bucket join is a self-equi-join on (band, band_key): one shuffle.
    ``max_bucket`` drops pathological buckets (skew guard)."""
    banded = sig_df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice(F.col("signature"), b * rows + 1, rows)), b
                    ).alias("band_key"),
                ),
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.band_key")
    counts = banded.groupBy("band", "band_key").count()
    banded = banded.join(
        F.broadcast(counts.where(F.col("count") > max_bucket)),
        ["band", "band_key"],
        "left_anti",
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col(f"a.band_key") == F.col(f"b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → sign → band → candidate
    pairs → exact-Jaccard verify ≥ threshold.

    Returns (id_a, id_b, jaccard_sim) for verified near-duplicate pairs.
    """
    sh = shingled(df, id_col, text_col, n)
    sig = sh.select(
        F.col(id_col), minhash_signature(F.col("shingle_set"), k, seed).alias("signature")
    )
    cand = lsh_candidate_pairs(sig, id_col, bands=bands, rows=k // bands)
    sa = sh.select(F.col(id_col).alias("id_a"), F.col("shingle_set").alias("set_a"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("shingle_set").alias("set_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            jaccard(F.col("set_a"), F.col("set_b")).alias("jaccard_sim"),
        )
        .where(F.col("jaccard_sim") >= threshold)
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """64-bit SimHash per row: per-bit sign-majority over xxhash64 hashes of
    the distinct word n-gram shingles.  bit b = 1 iff more than half the
    shingle hashes have bit b set.  Shingles (not unigrams) are essential
    when the vocabulary is small relative to the corpus — unigram sets are
    near-identical across documents and collapse every fingerprint.
    Pure SQL higher-order functions — map-only, codegen'd (shiftleft with a
    column shift amount needs the SQL form, hence expr)."""
    return df.select(
        F.col(id_col),
        F.transform(
            shingles(tokens(F.col(text_col)), n), lambda t: F.xxhash64(t)
        ).alias("__hs"),
    ).select(
        id_col,
        F.expr(
            """
            aggregate(
              transform(sequence(0, 63), b ->
                IF(size(filter(__hs, h -> ((h >> b) & 1) = 1)) * 2 > size(__hs),
                   shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))),
              CAST(0 AS BIGINT), (acc, x) -> acc | x)
            """
        ).alias("fingerprint"),
    )


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    band_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup: fingerprint → band into 4×16-bit chunks (a pair
    within Hamming ≤ 3 must share ≥1 exact chunk; wider radii trade recall)
    → candidate join → exact Hamming filter via bit_count(xor)."""
    fp = simhash_fingerprints(df, id_col, text_col)
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    banded = fp.select(
        id_col,
        "fingerprint",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("fingerprint", i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "fingerprint", "bk.band", "bk.chunk")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.fingerprint").bitwiseXOR(F.col("b.fingerprint"))
            ).cast("long").alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
