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
- Exact Jaccard verification is two-stage: a narrow signature-only join
  estimates Jaccard for every candidate and discards clear negatives, so
  the full shingle-hash sets are joined only for near/above-threshold
  survivors (the expensive stage shrinks to the interesting pairs).
"""

from __future__ import annotations

import random
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Mersenne prime 2^31-1: with a,b < 2^31 and base hashes reduced mod p
# (so h < 2^31), a*h+b < 2^62 stays inside int64 with no overflow
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
    fns: sequence → slice → concat_ws).  Empty array for docs with fewer
    than n tokens (sequence(1, m) with m < 1 DESCENDS through 0 in Spark
    and slice(toks, 0, n) throws — the when-guard prevents that)."""
    m = F.size(toks) - (n - 1)
    grams = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two distinct-element arrays."""
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(F.array_union(a, b))


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Repartition ahead of CPU-bound per-row work.  Small document corpora
    often arrive as one parquet split; without this, shingling/hashing runs
    on a single core regardless of cluster size.  (At 100 TB the scan
    itself yields thousands of splits and this becomes a cheap no-op-ish
    rebalance; the hash partitioning also pre-aligns the later
    signature/band shuffles.)"""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)


def spread_if_few_splits(df: DataFrame, key: str) -> DataFrame:
    """Guarded ``_spread``: repartition ONLY when the scan yielded fewer
    splits than cores.  For CPU-bound in-map kernels (interpreted
    higher-order functions, md5 gram hashing) a small parquet arrives as
    one input split and would serialize on a single core; at scale inputs
    arrive in thousands of size-capped splits and the guard never fires,
    so no fact-sized shuffle is ever introduced (few splits ⇒ input is at
    most cores × maxPartitionBytes ⇒ the shuffle is bounded-small).
    Canonical form of the determinism.md round-10 lesson 3 guard —
    keep call sites on this helper so the split-count heuristic stays in
    one place.

    Cost note (ADVICE r11): the split-count probe is ``df.rdd
    .getNumPartitions()``, which forces a DataFrame→RDD plan conversion
    each call.  Cheap when ``df`` is a raw scan or a narrow chain over
    one (every current call site); if a future caller sits above a WIDE
    plan, probe the raw scan before the transformations instead of the
    transformed frame."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism, key)
    return df


def let(expr: Column, body: Callable[[Column], Column]) -> Column:
    """Let-bind ``expr`` once via a single-element-array ``transform``:
    inside ``body`` every reference to the bound variable is a cheap
    NamedLambdaVariable lookup, so ``expr`` evaluates exactly ONCE per
    row no matter how many times the body references it — Catalyst's
    projection collapse cannot inline it back (determinism.md round-11
    lesson; the round-10 re-evaluation trap's general cure)."""
    return F.get(F.transform(F.array(expr), body), 0)


def shingled(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    # Two round-10 fixes to the shared shingle build, found profiling the
    # containment query (both apply to EVERY shingle consumer):
    # 1. Materialize the token array BEFORE the per-element shingle lambda
    #    — passing the raw split() expression into transform re-runs the
    #    split per element (determinism.md round-9 re-split trap; this
    #    site was missed in the round-9 sweep).
    # 2. Filter on the CHEAP token count, not on size(shingle_set):
    #    Catalyst inlines the projected expression into the filter, so a
    #    size(shingle_set) > 0 predicate re-evaluates the whole
    #    transform+array_distinct per row (measured 3.1 s vs 0.35 s at
    #    sf0.1).  size(__toks) >= n is exactly equivalent: the gram array
    #    is non-empty iff the doc has at least n tokens.
    return (
        _spread(df, id_col)
        .withColumn("__toks", tokens(F.col(text_col)))
        .where(F.size("__toks") >= n)
        .select(
            F.col(id_col),
            shingles(F.col("__toks"), n).alias("shingle_set"),
            *[F.col(c) for c in carry],
        )
    )


def shingle_hashes(shingle_set: Column) -> Column:
    """Base hashes of a shingle set (compute ONCE per row — string hashing
    dominates minhash cost; the per-permutation work is integer-only)."""
    return F.transform(shingle_set, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))


def minhash_signature_from_hashes(hashes: Column, k: int = 32, seed: int = 42) -> Column:
    """k-wide MinHash signature from pre-computed base hashes: one cheap
    affine pass + array_min per permutation.  All columnar, no UDF."""
    sigs = [
        F.array_min(
            F.transform(hashes, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE)))
        )
        for a, b in minhash_params(k, seed)
    ]
    return F.array(*sigs)


def minhash_signature(shingle_set: Column, k: int = 32, seed: int = 42) -> Column:
    return minhash_signature_from_hashes(shingle_hashes(shingle_set), k, seed)


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    bands: int = 8,
    rows: int = 4,
    max_bucket: int = 200,
) -> DataFrame:
    """Band the signature (bands × rows = k) and emit candidate id pairs that
    co-occur in ≥1 bucket.  Output: (id_a, id_b) with id_a < id_b, distinct.

    Shape: explode band keys → ONE groupBy(band, band_key) collecting the
    sorted member list (size-filtered to [2, max_bucket]) → explode in-bucket
    combinations → distinct.  Two shuffles total (bucket agg + pair
    distinct); the old form (bucket census + broadcast anti-join + banded
    self-join + distinct) had the same asymptotics but 2 extra shuffles of
    the banded frame, which dominated wall-clock on small-stage overhead.

    ``max_bucket`` drops pathological buckets (degenerate content producing
    mega-buckets): it bounds pair fan-out to max_bucket²/2 per bucket.  The
    member list of an oversized bucket is still collected once before being
    dropped (~8 bytes/id — tens of MB even for a million-member bucket); if
    a corpus is so degenerate that this overwhelms an executor, pre-filter
    with a count-only census before this call.

    Callers should persist ``sig_df``'s lineage (or pass cheap-to-recompute
    input): it is consumed once here."""
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
    buckets = (
        banded.groupBy("band", "band_key")
        .agg(
            F.count("*").alias("n"),
            F.sort_array(F.collect_list(id_col)).alias("ids"),
        )
        .where((F.col("n") >= 2) & (F.col("n") <= max_bucket))
    )
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, max_bucket),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(combos).alias("p"))
        .select("p.id_a", "p.id_b")
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
    est_margin: float = 0.3,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → sign → band → candidate
    pairs → signature-estimate pre-filter → exact-Jaccard verify ≥ threshold.

    Returns (id_a, id_b, jaccard_sim) for verified near-duplicate pairs.

    Representation: shingles are never materialized as strings.  Tokens are
    hashed JVM-side (split + xxhash64, codegen); one vectorized numpy kernel
    then derives the rolling n-gram shingle-hash set AND the k-wide MinHash
    signature per document in a single Arrow pass.  The stored shingle set
    keeps the FULL 64-bit rolling-hash values; the mod-p reduction to the
    31-bit permutation domain happens only inside the signature computation
    (min over the reduced multiset equals min over the reduced set, so
    signatures are unchanged by this split).  Exact Jaccard therefore
    verifies in the ~2⁶⁴ hash space — |A∩B|/|A∪B| equals the string-set
    value as long as xxhash64+mix is injective on the observed n-grams
    (collision odds ~|shingles|²/2⁶⁴; the pair set is verified equal to the
    exact string-shingle ground truth in tests/test_dedup.py).

    Verification cost at scale: dragging full shingle-hash sets through the
    verify join for EVERY candidate is the 100 TB cost center, and most LSH
    candidates are spurious one-band hash collisions.  The estimate stage
    joins only the fixed-width signatures (k×8 bytes) onto the candidates,
    estimates Jaccard as the matching-component fraction (E[est] = J), and
    drops candidates with est < threshold - est_margin before the shingle
    sets are touched.  With k=64 and est_margin=0.3, a true J=0.5 pair is
    mis-dropped with P = P[Binom(64, .5) < 12.8] ≈ 8e-7 — far below the
    banding miss rate the pipeline already accepts.  Survivors still get the
    exact join so emitted jaccard_sim values are exact, keeping the output
    bit-identical to the no-prefilter pipeline whenever no true pair is
    estimate-dropped (asserted on fixtures in tests/test_dedup.py).

    The returned frame is persisted and materialized (lineage preserved, so
    executor loss recomputes rather than invalidating it); callers running
    many pipelines in one session may ``unpersist()`` the result when done.
    """
    import numpy as np
    import pandas as pd

    toks = tokens(F.col(text_col))
    hashed = (
        _spread(df, id_col)
        .select(
            F.col(id_col),
            F.transform(toks, lambda t: F.xxhash64(t)).alias("__th"),
        )
        .where(F.size("__th") >= n)
    )
    params = np.array(minhash_params(k, seed), dtype=np.int64)
    A, B = params[:, 0], params[:, 1]
    mix = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 increment as multiplier
    mod = np.uint64(_MERSENNE)

    def kernel(batches):
        # per row: rolling-mix the n token hashes of each window (uint64
        # wraparound, order-sensitive), np.unique → distinct 64-bit
        # shingle-hash set, then reduce mod p only for the k-permutation
        # affine-min signature as one (m × k) int64 matrix op.
        for pdf in batches:
            ids, sets_, sigs = [], [], []
            for i, th in zip(pdf[id_col], pdf["__th"]):
                h = np.asarray(th, dtype=np.int64).view(np.uint64)
                m = len(h) - (n - 1)
                x = h[:m] * mix
                for j in range(1, n):
                    x = (x ^ h[j : m + j]) * mix
                s64 = np.unique(x)
                sets_.append(s64.view(np.int64))
                sr = (s64 % mod).astype(np.int64)  # multiset; min unaffected
                sigs.append(((sr[:, None] * A[None, :] + B[None, :]) % _MERSENNE).min(axis=0))
                ids.append(i)
            yield pd.DataFrame({id_col: ids, "shingles": sets_, "signature": sigs})

    sh = hashed.mapInPandas(
        kernel, f"{id_col} long, shingles array<bigint>, signature array<bigint>"
    ).persist()
    cand = lsh_candidate_pairs(
        sh.select(id_col, "signature"), id_col, bands=bands, rows=k // bands
    )
    # Stage 1 (narrow): estimate Jaccard from the signatures alone and
    # discard clear negatives.  Joins move k int64s per side, never the
    # shingle sets.
    ga = sh.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"))
    gb = sh.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"))
    matches = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    )
    screened = (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .where(matches.cast("double") / F.lit(float(k)) >= threshold - est_margin)
        .select("id_a", "id_b")
    )
    # Stage 2 (wide): exact verification only for near/above-threshold
    # survivors, so emitted similarities are exact.
    sa = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("set_a"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("set_b"))
    verified = (
        screened.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            jaccard(F.col("set_a"), F.col("set_b")).alias("jaccard_sim"),
        )
        .where(F.col("jaccard_sim") >= threshold)
    )
    # materialize the (small) verified-pair result with recoverable lineage,
    # then release the cached shingle frame (otherwise it leaks across
    # queries in a long-lived session)
    verified = verified.persist()
    verified.count()
    sh.unpersist()
    return verified


def md5_hash60(c: Column) -> Column:
    """Engine-portable 60-bit hash: first 15 hex chars of md5, parsed as an
    integer.  Slower than xxhash64 (md5 + base conversion) but computable
    bit-identically in DuckDB/Trino/Postgres — used by the oracle-checked
    SimHash variant so the whole fingerprint→band→Hamming pipeline can be
    cross-engine verified.  60 bits keeps the value inside int64."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def simhash_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    hash_fn: Callable[[Column], Column] = F.xxhash64,
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per row: per-bit sign-majority over xxhash64 hashes of
    the distinct word n-gram shingles.  bit b = 1 iff more than half the
    shingle hashes have bit b set.  Shingles (not unigrams) are essential
    when the vocabulary is small relative to the corpus — unigram sets are
    near-identical across documents and collapse every fingerprint.

    Split execution: string hashing stays JVM-side (xxhash64, one pass);
    the 64-way bit-majority runs vectorized in numpy over Arrow batches.
    A pure-SQL higher-order-function formulation exists but evaluates
    ~n_shingles×64 interpreted lambdas per row (measured ~30× slower at
    5k docs) — this is exactly the "built-ins can't express it
    efficiently" case where a Pandas-batched kernel is the right tool."""
    import numpy as np
    import pandas as pd

    hashed = _spread(df, id_col).select(
        F.col(id_col),
        F.transform(
            shingles(tokens(F.col(text_col)), n), lambda t: hash_fn(t)
        ).alias("__hs"),
    ).where(F.size("__hs") > 0)  # load-bearing: fp_batches' reduceat needs
    # every row's hash list non-empty (asserted inside the kernel)

    n_bits = bits
    # unpackbits is MSB-first per byte over the little-endian uint64 view:
    # bit b of h lands at matrix column (b//8)*8 + (7 - b%8)
    cols = np.arange(64)
    perm = (cols // 8) * 8 + (7 - cols % 8)

    def fp_batches(batches):
        # whole-batch vectorization (r16; guide §4.2): flatten every
        # row's hash list into ONE array, unpackbits once, and reduce
        # per-row segments with add.reduceat — the previous per-row loop
        # paid numpy call overhead per document (measured ~10× slower).
        # Same integer math per row, so fingerprints are bit-identical.
        for pdf in batches:
            lens = np.fromiter(
                (len(h) for h in pdf["__hs"]), dtype=np.int64, count=len(pdf)
            )
            # add.reduceat on a zero-length segment silently returns the
            # neighboring segment's first element (and raises IndexError
            # for a trailing empty row) — the upstream size(__hs) > 0
            # filter guarantees no empty list reaches this kernel, and
            # this assert keeps the kernel honest if that coupled guard
            # ever moves (ADVICE r16).
            assert (lens > 0).all(), "fp_batches requires non-empty __hs rows"
            if len(lens) == 0:
                yield pd.DataFrame(
                    {
                        id_col: pd.Series([], dtype="int64"),
                        "fingerprint": pd.Series([], dtype="int64"),
                    }
                )
                continue
            flat = np.concatenate(
                [np.asarray(h, dtype=np.int64) for h in pdf["__hs"]]
            ).view(np.uint64)
            bitmat = np.unpackbits(
                flat.view(np.uint8).reshape(-1, 8), axis=1
            )
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            counts = np.add.reduceat(bitmat, starts, axis=0)[:, perm]
            maj = (counts * 2 > lens[:, None]) & (cols < n_bits)
            fps = (
                (maj.astype(np.uint64) << cols.astype(np.uint64))
                .sum(axis=1, dtype=np.uint64)
                .view(np.int64)
            )
            yield pd.DataFrame({id_col: pdf[id_col], "fingerprint": fps})

    return hashed.mapInPandas(fp_batches, f"{id_col} long, fingerprint long")


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    band_bits: int = 16,
    hash_fn: Callable[[Column], Column] = F.xxhash64,
    bits: int = 64,
) -> DataFrame:
    """SimHash near-dup: fingerprint → band into (bits/band_bits) chunks
    (a pair within Hamming < n_bands must share ≥1 exact chunk; wider radii
    trade recall) → candidate join → exact Hamming filter via
    bit_count(xor)."""
    fp = simhash_fingerprints(
        df, id_col, text_col, hash_fn=hash_fn, bits=bits
    ).persist()
    n_bands = bits // band_bits
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
    near = (
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
    # materialize small output with recoverable lineage, release big cache
    # (see minhash_near_duplicates — callers may unpersist the result)
    near = near.persist()
    near.count()
    fp.unpersist()
    return near
