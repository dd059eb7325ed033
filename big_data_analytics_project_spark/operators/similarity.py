"""Similarity search over embedding columns (``array<float>``).

Three paths, mirroring how ANN is deployed at scale:

- **Brute-force top-k** (the baseline): broadcast the (small) query set,
  cross-join against the corpus, sequential-fold cosine in double, rank
  with a deterministic tie-break.  At 100 TB this is the exact-rescoring
  stage that runs AFTER candidate pruning.
- **Sign-LSH bucketed**: hash every vector to a bucket from the signs of
  its leading dimensions (axis-aligned random hyperplanes); candidates are
  bucket-cohabitants only, turning the cross join into an equi-join on
  bucket id — one shuffle, linear candidate volume.  Recall is tunable via
  n_bits / multi-probe; the oracle checks the bucketed result
  deterministically.
- **IVF-Flat** (the FAISS-style scale path): a k-means coarse quantizer
  partitions the corpus into inverted lists; each query probes its
  ``nprobe`` nearest centroids and exact-scores only those lists.  Corpus
  assignment is map-only (centroids inlined as literals → pure codegen
  argmin, no join, no shuffle); the probe is an equi-join on list id.
  ``nprobe = n_centroids`` degenerates to exact brute force — the property
  the tests pin.

Scoring kernels: candidate-pair cosine in the brute-force rescorer runs
through the vectorized Arrow fold bridge (r17, guide §4.2 —
``functions.vector.arrow_pairwise_cosine``, bit-identical to the
sequential ``zip_with`` + ``aggregate`` fold it replaced); the remaining
cosine/L2 sites are `zip_with` + `aggregate` JVM expressions; only the
one-off centroid training uses MLlib KMeans.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from ..functions.vector import (
    arrow_pairwise_cosine,
    as_double,
    cosine,
    l2_normalize,
    l2sq,
    sign_bucket,
)


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

    The per-pair cosine runs through the vectorized Arrow fold bridge
    (r17, guide §4.2): the interpreted ``zip_with``+``aggregate`` chain
    evaluated ~3·d lambda frames per PAIR, which dominated every
    brute-force consumer; :func:`arrow_pairwise_cosine` computes the
    bit-identical sequential fold dimension-major in numpy (see its
    docstring for the equality argument).  The rounding that defines the
    result set stays a JVM expression, so cross-engine determinism is
    unchanged.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("__cv")
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    sims = arrow_pairwise_cosine(pairs, "__qv", "__cv", "__cos").select(
        "query_id",
        "neighbor_id",
        F.round(F.col("__cos"), round_digits).alias("cosine_sim"),
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


def train_coarse_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    max_iter: int = 5,
    seed: int = 42,
) -> list[list[float]]:
    """IVF coarse quantizer: k-means centroids over the corpus (MLlib,
    seeded).  At 100 TB train on a sample — the quantizer only needs the
    coarse density shape (`.sample(fraction=...)` upstream); centroid count
    stays driver-sized (C × dim doubles) by construction."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.select(array_to_vector(as_double(vec_col)).alias("features"))
    model = KMeans(
        k=n_centroids, maxIter=max_iter, seed=seed, featuresCol="features"
    ).fit(vecs)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def _centroid_entries(vec: Column, centroids: list[list[float]]) -> Column:
    """array<struct<d, i>> of (squared L2 distance, centroid id) — struct
    ordering compares d first, so array_min/array_sort rank by distance
    with the centroid id as a deterministic tie-break."""
    return F.array(
        *[
            F.struct(
                l2sq(vec, F.array(*[F.lit(x) for x in c])).alias("d"),
                F.lit(i).alias("i"),
            )
            for i, c in enumerate(centroids)
        ]
    )


def nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Map-only inverted-list assignment: argmin over inlined centroid
    literals, fully inside whole-stage codegen — no join, no shuffle."""
    return F.array_min(_centroid_entries(vec, centroids))["i"]


def probe_centroids(
    vec: Column, centroids: list[list[float]], nprobe: int
) -> Column:
    """The query-side probe set: ids of the ``nprobe`` nearest centroids."""
    ranked = F.array_sort(_centroid_entries(vec, centroids))
    return F.transform(F.slice(ranked, 1, nprobe), lambda s: s["i"])


# Inlined-literal assignment embeds C×D doubles in the plan.  Measured
# r16: even at C=16, D=64 the literal form costs SECONDS of driver-side
# plan build+analysis per invocation (worst through probe_centroids'
# array_sort over the unrolled entry structs) at per-row throughput
# identical to the broadcast-data form (flat at 200k rows) — so
# ``ivf_topk``'s "auto" now always picks broadcast data, and the
# literal form remains only as an explicit opt-in (kept because the
# equivalence property test differentially pins the two
# implementations against each other).
_LITERAL_MAX_CENTROIDS = 0


def with_centroid_assignment(
    df: DataFrame,
    vec: Column,
    centroids: list[list[float]],
    out_col: str,
    nprobe: int | None = None,
) -> DataFrame:
    """Broadcast-data centroid assignment for large C: the centroid table
    rides a SINGLE-ROW broadcast nested-loop join as an
    ``array<struct<i,c>>`` column, so it ships as broadcast data (once per
    executor) instead of plan literals — plan size O(1) in C, still
    map-only (a 1-row build side adds no shuffle and no row blowup), and
    the argmin is the identical struct-ordered ``array_min`` as the
    literal form (equivalence property-tested).

    ``nprobe=None`` → ``out_col`` is the nearest-centroid id (corpus
    side); ``nprobe=n`` → ``out_col`` is the probe-set array (query side).
    """
    rows = [([(i, [float(x) for x in c]) for i, c in enumerate(centroids)],)]
    cents = df.sparkSession.createDataFrame(
        rows, "__cents array<struct<i:int,c:array<double>>>"
    )
    joined = df.crossJoin(F.broadcast(cents))
    entries = F.transform(
        F.col("__cents"),
        lambda s: F.struct(l2sq(vec, s["c"]).alias("d"), s["i"].alias("i")),
    )
    if nprobe is None:
        out = joined.withColumn(out_col, F.array_min(entries)["i"])
    else:
        ranked = F.array_sort(entries)
        out = joined.withColumn(
            out_col, F.transform(F.slice(ranked, 1, nprobe), lambda s: s["i"])
        )
    return out.drop("__cents")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    round_digits: int = 6,
    centroids: list[list[float]] | None = None,
    assignment: str = "auto",
) -> DataFrame:
    """IVF-Flat ANN: corpus vectors partitioned into ``n_centroids``
    inverted lists; each query exact-scores only its ``nprobe`` nearest
    lists.  Candidate volume shrinks ~n_centroids/nprobe-fold; the only
    join is an equi-join on list id.  ``nprobe=n_centroids`` probes every
    list and returns exactly the brute-force result (pinned in tests).

    Pass pre-trained ``centroids`` to skip quantizer training (the
    production shape: train once on a sample, reuse across queries).

    ``assignment``: ``"broadcast"`` (and ``"auto"``, since r16) ships
    the centroids as broadcast data via
    :func:`with_centroid_assignment` — O(1) plan size, and measured
    faster even at tiny C because the literal trees cost seconds of
    per-query plan analysis at identical per-row throughput;
    ``"literal"`` inlines them as plan literals (kept as the explicit
    differential-testing dual — see _LITERAL_MAX_CENTROIDS note)."""
    if centroids is None:
        cents = train_coarse_centroids(corpus, vec_col, n_centroids=n_centroids)
    elif not centroids:
        raise ValueError("centroids must be a non-empty list (or None to train)")
    else:
        cents = centroids
    if assignment not in ("auto", "literal", "broadcast"):
        raise ValueError(f"unknown assignment mode: {assignment}")
    use_bcast = assignment == "broadcast" or (
        assignment == "auto" and len(cents) > _LITERAL_MAX_CENTROIDS
    )
    if use_bcast:
        c = with_centroid_assignment(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                as_double(vec_col).alias("__cv"),
            ),
            F.col("__cv"),
            cents,
            "__list",
        )
        q = with_centroid_assignment(
            queries.select(
                F.col(id_col).alias("query_id"),
                as_double(vec_col).alias("__qv"),
            ),
            F.col("__qv"),
            cents,
            "__probes",
            nprobe=nprobe,
        ).select(
            "query_id", "__qv", F.explode("__probes").alias("__list")
        )
    else:
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(vec_col).alias("__cv"),
            nearest_centroid(as_double(vec_col), cents).alias("__list"),
        )
        q = queries.select(
            F.col(id_col).alias("query_id"),
            as_double(vec_col).alias("__qv"),
            F.explode(probe_centroids(as_double(vec_col), cents, nprobe)).alias("__list"),
        )
    sims = (
        F.broadcast(q)
        .join(c, "__list")
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


def lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_bits: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Multi-probe sign-LSH top-k (Lv et al., VLDB'07): each query probes
    its own bucket PLUS every bucket at Hamming distance 1 — one flipped
    hyperplane.  Near-boundary sign flips are where single-probe LSH
    loses its neighbors (measured recall@10 0.10 → multi-probe recovers
    most of it, docs/ann_eval_sf0.01.md), and probing n_bits+1 buckets
    costs (n_bits+1)× candidate volume versus the 2×-per-bit blowup of
    simply lowering n_bits.  Plan shape is unchanged from single-probe —
    explode(probes) then bucket equi-join; the corpus side is still
    hashed ONCE, so at 100 TB the corpus never recomputes or re-shuffles
    per probe."""
    b = sign_bucket(as_double(vec_col), n_bits)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(vec_col).alias("__qv"),
        F.explode(
            F.array(b, *[b.bitwiseXOR(F.lit(2**i)) for i in range(n_bits)])
        ).alias("__bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("__cv"),
        b.alias("__bucket"),
    )
    sims = (
        F.broadcast(q)
        .join(c, "__bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), round_digits).alias(
                "cosine_sim"
            ),
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


def semantic_dedup(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): semantic deduplication by k-means
    clustering + within-cluster cosine pruning.  Every vector is assigned
    to its nearest centroid (map-only argmin over inlined literals — no
    shuffle); candidate duplicate pairs are *within-cluster only* (self
    equi-join on cluster id — never all-pairs); pairs with cosine ≥
    ``threshold`` are semantic duplicates.  The keep-rule is the paper's:
    within a duplicate neighborhood, keep the member with the LOWEST
    cosine similarity to its cluster centroid (the least prototypical
    example carries the most marginal information), applied pairwise-
    greedily with the vector id as a deterministic tie-break — a vector
    is pruned iff some duplicate partner has a lexicographically smaller
    (centroid_sim, id).

    Returns one row per corpus vector: (vec_id, cluster_id,
    centroid_sim, n_dups, keep) — ``keep=false`` marks the rows a
    curation pipeline drops.

    Scale shape: at 100 TB the cluster count is sized ~√N (the paper
    runs 100k clusters on billions of vectors) so within-cluster pair
    volume stays ~N²/C; assignment switches to the broadcast-data form
    (:func:`with_centroid_assignment`) above ``_LITERAL_MAX_CENTROIDS``
    and stays map-only; the pair join is an equi-join on cluster id with
    AQE skew-split as the backstop for lopsided clusters.
    """
    from ..functions.vector import dot, norm2

    # Each vector's norm is computed ONCE here and carried through the
    # pair join, so the per-pair cosine is a single dot-product fold
    # instead of dot + two norm folds (the pair stage is the hot path:
    # N²/C interpreted HOF evaluations — measured ~3× end-to-end).  The
    # float result is bit-identical to cosine(): same ops, same order,
    # just hoisted out of the pair loop.
    # Broadcast-data centroids (r16): the assignment argmin AND the
    # centroid_sim lookup both read the 1-row broadcast __cents table
    # instead of two inlined C×D literal trees — seconds of per-query
    # plan build/analysis at identical per-row arithmetic (the same
    # doubles flow through the same fold).
    # Persisted: this assigned frame feeds THREE plan branches (both
    # sides of the within-cluster self-join and the final per-vector
    # output join), and each reference would otherwise re-run the
    # argmin-over-centroids fold + two norm folds per vector — the
    # dominant map cost.  One corpus-sized frame, computed once
    # (guide §2.1: remove repeated subtree computation).
    cents = corpus.sparkSession.createDataFrame(
        [([(i, [float(x) for x in c]) for i, c in enumerate(centroids)],)],
        "__cents array<struct<i:int,c:array<double>>>",
    )
    entries = F.transform(
        F.col("__cents"),
        lambda s: F.struct(
            l2sq(F.col("__v"), s["c"]).alias("d"), s["i"].alias("i")
        ),
    )
    v = corpus.select(
        F.col(id_col).alias("vec_id"), as_double(vec_col).alias("__v")
    ).crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "__v",
        "__cents",
        norm2(F.col("__v")).alias("__n"),
        F.array_min(entries)["i"].alias("__cluster"),
    ).select(
        "vec_id",
        "__v",
        "__n",
        "__cluster",
        F.round(
            cosine(
                F.col("__v"),
                F.element_at(F.col("__cents"), F.col("__cluster") + 1)["c"],
            ),
            round_digits,
        ).alias("centroid_sim"),
    ).persist()
    a = v.select(
        F.col("vec_id").alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
        "__cluster",
        F.col("centroid_sim").alias("__ca"),
    )
    b = v.select(
        F.col("vec_id").alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
        "__cluster",
        F.col("centroid_sim").alias("__cb"),
    )
    pair_cos = dot(F.col("__va"), F.col("__vb")) / (
        F.col("__na") * F.col("__nb")
    )
    edges = (
        a.join(b, "__cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.round(pair_cos, round_digits) >= threshold)
        .select("id_a", "__ca", "id_b", "__cb")
    )
    # both partner directions from ONE pass over the pair scan: a union of
    # two selects over `edges` would execute the whole within-cluster
    # cosine subtree twice (exchange reuse does not span union branches —
    # measured 2× on the bench), so each edge row explodes into its two
    # directed partner rows instead.
    partners = edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("vec_id"),
                    F.col("__ca").alias("__my"),
                    F.col("__cb").alias("__pc"),
                    F.col("id_b").alias("__pid"),
                ),
                F.struct(
                    F.col("id_b").alias("vec_id"),
                    F.col("__cb").alias("__my"),
                    F.col("__ca").alias("__pc"),
                    F.col("id_a").alias("__pid"),
                ),
            )
        ).alias("__p")
    ).select("__p.*")
    better = (F.col("__pc") < F.col("__my")) | (
        (F.col("__pc") == F.col("__my")) & (F.col("__pid") < F.col("vec_id"))
    )
    pagg = partners.groupBy("vec_id").agg(
        F.count("*").alias("__n_dups"),
        F.max(better.cast("int")).alias("__has_better"),
    )
    return (
        v.join(pagg, "vec_id", "left")
        .select(
            "vec_id",
            F.col("__cluster").cast("long").alias("cluster_id"),
            "centroid_sim",
            F.coalesce(F.col("__n_dups"), F.lit(0)).cast("long").alias("n_dups"),
            (F.coalesce(F.col("__has_better"), F.lit(0)) == 0).alias("keep"),
        )
    )


def semantic_leakage(
    corpus: DataFrame,
    centroids: list[list[float]],
    is_eval: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-space train/eval decontamination audit: find eval
    vectors whose nearest TRAIN vector is semantically too close
    (cosine ≥ ``threshold``) — the leakage n-gram overlap can't see
    (paraphrases, translations, near-dups that share no 13-gram).

    Same scale machinery as :func:`semantic_dedup`: cluster assignment
    is map-only over pinned centroids, candidates are cluster-
    cohabitants only (eval ⋈ train equi-join on cluster id — never
    eval × train), norms are hoisted out of the pair loop.  A leaked
    eval item whose nearest train twin landed in a DIFFERENT cluster is
    missed — the standard blocking recall trade, tuned by cluster count
    exactly as in SemDeDup.

    Returns one row per CONTAMINATED eval vector: (eval_id, cluster_id,
    n_contaminated, top_train_id, top_sim) with the top partner chosen
    by (sim desc, train id) — deterministic across engines.
    """
    from ..functions.vector import dot, norm2

    # Persisted for the same reason as semantic_dedup's assigned frame:
    # both the eval and the train side of the pair join read it, and
    # each reference would re-run the per-vector argmin + norm folds.
    # The assignment itself reads broadcast centroid DATA, not inlined
    # literals (r16 — identical argmin, O(1) plan size).
    base = with_centroid_assignment(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            as_double(vec_col).alias("__v"),
            is_eval.alias("__is_eval"),
        ).withColumn("__n", norm2(F.col("__v"))),
        F.col("__v"),
        centroids,
        "__cluster",
    ).persist()
    ev = base.where(F.col("__is_eval")).select(
        F.col("vec_id").alias("eval_id"),
        F.col("__v").alias("__ev"),
        F.col("__n").alias("__en"),
        "__cluster",
    )
    tr = base.where(~F.col("__is_eval")).select(
        F.col("vec_id").alias("train_id"),
        F.col("__v").alias("__tv"),
        F.col("__n").alias("__tn"),
        "__cluster",
    )
    sim = F.round(
        dot(F.col("__ev"), F.col("__tv")) / (F.col("__en") * F.col("__tn")),
        round_digits,
    )
    pairs = (
        ev.join(tr, "__cluster")
        .select(
            "eval_id",
            F.col("__cluster").cast("long").alias("cluster_id"),
            "train_id",
            sim.alias("__sim"),
        )
        .where(F.col("__sim") >= threshold)
    )
    w = Window.partitionBy("eval_id")
    rn = F.row_number().over(
        w.orderBy(F.desc("__sim"), "train_id")
    )
    return (
        pairs.withColumn("__rn", rn)
        .withColumn("__n_cont", F.count("*").over(w))
        .where(F.col("__rn") == 1)
        .select(
            "eval_id",
            "cluster_id",
            F.col("__n_cont").cast("long").alias("n_contaminated"),
            F.col("train_id").alias("top_train_id"),
            F.col("__sim").alias("top_sim"),
        )
    )


def pq_encode(
    vec: Column, codebooks: list[list[list[float]]]
) -> Column:
    """Product-quantization encoding: the vector is split into
    ``len(codebooks)`` contiguous subvectors; each is assigned to its
    nearest sub-centroid (argmin over inlined literals, same codegen
    pattern as ``nearest_centroid``).  Returns ``array<int>`` of codes —
    the 4-byte-per-vector compressed representation that makes
    billion-vector corpora scannable."""
    m = len(codebooks)
    sub_dim = None
    codes = []
    for j, book in enumerate(codebooks):
        sub_dim = len(book[0])
        sub = F.slice(vec, j * sub_dim + 1, sub_dim)
        entries = F.array(
            *[
                F.struct(
                    l2sq(sub, F.array(*[F.lit(x) for x in c])).alias("d"),
                    F.lit(i).alias("i"),
                )
                for i, c in enumerate(book)
            ]
        )
        codes.append(F.array_min(entries)["i"])
    return F.array(*codes)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    round_digits: int = 6,
    refine: int | None = None,
) -> DataFrame:
    """IVF-PQ (the FAISS production composition): coarse inverted lists
    bound the candidate set (equi-join on list id — no cross product),
    then candidates are scored by ASYMMETRIC DISTANCE COMPUTATION: the
    query stays exact, the candidate is represented by its PQ codes, so
    the per-candidate cost is M centroid-table lookups instead of a
    D-dim exact distance over raw vectors (which at 100 TB would mean
    shipping the full float corpus through the join).

    ``refine=R`` adds the standard refine stage: the ADC top-R per query
    is exact-rescored by cosine over raw vectors (only R×queries raw
    rows move — bounded and tiny) and the final top-k is by exact
    similarity.  Quantization then only has to put true neighbors in the
    top R, not rank them — the practical recall lever when the corpus
    manifold is noisy relative to the codebook resolution.

    Determinism: the ADC sum is a fixed-order chain of M sequential-fold
    subdistances (never a SUM aggregation, whose order is
    engine-dependent), so the oracle matches bit-for-bit."""
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    # The centroid table AND the codebooks ride 1-row broadcasts as DATA
    # (r16): the inlined-literal form embedded M×K×sub_dim + 2×C×D
    # doubles in the plan and cost double-digit seconds of per-query
    # plan build/analysis at identical per-row arithmetic (same folds
    # over the same doubles — differentially pinned against pq_encode's
    # literal dual in tests).
    books = corpus.sparkSession.createDataFrame(
        [([[list(map(float, c_)) for c_ in book] for book in codebooks],)],
        "__books array<array<array<double>>>",
    )

    def encode(vec: Column) -> Column:
        codes = []
        for j in range(m):
            sub = F.slice(vec, j * sub_dim + 1, sub_dim)
            entries = F.transform(
                F.element_at(F.col("__books"), j + 1),
                lambda c_, i: F.struct(
                    l2sq(sub, c_).alias("d"), i.alias("i")
                ),
            )
            codes.append(F.array_min(entries)["i"])
        return F.array(*codes)

    # unit-normalize both sides: on unit vectors the ADC L2 ordering is
    # monotone in cosine, matching the exact brute-force baseline's metric.
    # The normalized vector is materialized as a column in a SEPARATE
    # projection before encoding: the norm is a whole-array fold, and
    # inlining it into every sub-centroid distance term would recompute
    # that fold M×K times per row (measured ~19× slower end-to-end).
    nv = l2_normalize(as_double(vec_col))
    c = with_centroid_assignment(
        corpus.select(F.col(id_col).alias("neighbor_id"), nv.alias("__nv")),
        F.col("__nv"),
        centroids,
        "__list",
    ).crossJoin(F.broadcast(books)).select(
        "neighbor_id",
        "__list",
        encode(F.col("__nv")).alias("__codes"),
    )
    q = with_centroid_assignment(
        queries.select(F.col(id_col).alias("query_id"), nv.alias("__qv")),
        F.col("__qv"),
        centroids,
        "__probes",
        nprobe=nprobe,
    ).select("query_id", "__qv", F.explode("__probes").alias("__list"))
    dist = None
    for j in range(m):
        chosen = F.element_at(
            F.element_at(F.col("__books"), j + 1),
            F.element_at(F.col("__codes"), j + 1) + 1,
        )
        sub_q = F.slice(F.col("__qv"), j * sub_dim + 1, sub_dim)
        term = l2sq(sub_q, chosen)
        dist = term if dist is None else dist + term
    # the ADC lookup table joins back as the same 1-row broadcast at the
    # candidate projection (bounded probe volume), then drops
    sims = (
        F.broadcast(q)
        .join(c, "__list")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .crossJoin(F.broadcast(books))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dist, round_digits).alias("approx_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("approx_dist", "neighbor_id")
    adc_k = k if refine is None else refine
    adc_top = (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= adc_k)
    )
    if refine is None:
        return adc_top
    qv = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("__rq")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("__rc")
    )
    rescored = (
        adc_top.select("query_id", "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__rq"), F.col("__rc")), round_digits).alias(
                "cosine_sim"
            ),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), "neighbor_id")
    return (
        rescored.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
    )


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    max_iter: int = 5,
    seed: int = 42,
) -> list[list[list[float]]]:
    """PQ sub-codebooks: the vector is split into ``m`` contiguous
    subspaces and each gets its own seeded k-means (k sub-centroids) over
    the L2-NORMALIZED corpus subvectors — normalization must match
    ``ivfpq_topk``'s encoding path or the codebooks quantize the wrong
    manifold.  This is the generator behind the pinned literals in
    ``plans/pq_codebooks.py`` (train once on a sample, pin, reuse — the
    same provenance pattern as ``train_coarse_centroids``).  At 100 TB
    the m fits run over a driver-chosen sample; each codebook is k×(D/m)
    doubles — always driver-sized."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    nv = corpus.select(l2_normalize(as_double(vec_col)).alias("__nv")).cache()
    dim = len(nv.first()["__nv"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_dim = dim // m
    books = []
    for j in range(m):
        sub = nv.select(
            array_to_vector(
                F.slice(F.col("__nv"), j * sub_dim + 1, sub_dim)
            ).alias("features")
        )
        model = KMeans(k=k, maxIter=max_iter, seed=seed, featuresCol="features").fit(sub)
        books.append([[float(x) for x in c] for c in model.clusterCenters()])
    nv.unpersist()
    return books


def range_search(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """All corpus vectors within cosine >= ``threshold`` of each query
    (radius search — the other retrieval primitive next to top-k:
    "everything this similar", not "the k most similar").

    Same broadcast-queries x corpus fold-cosine as ``brute_force_topk``
    but with a threshold filter instead of a rank window — the result
    SET is defined by the rounded similarity, so it is engine-exact.
    Scale path: radius search composes with the sign-LSH bucket join the
    same way top-k does (buckets bound candidates, the threshold rescans
    exactly); brute force is the rescoring baseline."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("__cv")
    )
    return (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine(F.col("__qv"), F.col("__cv")), round_digits
            ).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
