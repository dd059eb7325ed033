"""Similarity-search query registrations, all oracle-checked.

Cosines are computed as identical sequential double folds on both engines
(see functions/vector.py); rankings order by the *rounded* similarity with
the neighbor id as tie-break so top-k sets are engine-independent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..functions.vector import (
    duck_cosine,
    duck_l2_normalize,
    duck_l2sq,
    duck_sign_bucket,
)
from ..operators import similarity as S
from ..registry import query
from ..sources import index_scratch_dir, read_table
from .ivf_centroids import IVF_CENTROIDS

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


_DUCK_LSH_MULTIPROBE_TOPK = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
probes AS (
  SELECT a.vec_id,
         CASE WHEN b.i < 0 THEN {_BUCKET_A}
              ELSE xor({_BUCKET_A}, (1 << b.i)::BIGINT) END AS bucket
  FROM v a, (VALUES (-1), (0), (1), (2), (3)) b(i)
  WHERE a.vec_id < 5
),
sims AS (
  SELECT p.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({_COS}, 6) AS cosine_sim
  FROM probes p
  JOIN v a ON a.vec_id = p.vec_id
  JOIN v b ON {_BUCKET_B} = p.bucket AND b.vec_id != p.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""


@query(
    "ann_lsh_multiprobe_topk",
    sql=_DUCK_LSH_MULTIPROBE_TOPK,
    tags=("similarity", "ann", "lsh"),
)
def ann_lsh_multiprobe_topk(spark, sf_dir):
    """Multi-probe sign-LSH approximate top-10: probes the query's bucket
    plus all Hamming-1 neighbors (5 probes at n_bits=4) — the standard
    recall lever over single-probe LSH at linear, not exponential,
    candidate cost.  Fully deterministic (axis-aligned hyperplanes,
    exact-cosine scoring), so the oracle diff is exact."""
    emb = read_table(spark, sf_dir, "embeddings")
    return S.lsh_multiprobe_topk(
        emb, emb.where(F.col("vec_id") < 5), k=10, n_bits=4
    )


# The IVF oracle embeds the SAME pre-trained centroid literals the Spark
# query uses (plans/ivf_centroids.py), so assignment (argmin over l2sq),
# probing (4 nearest lists) and rescoring are deterministic expression
# evaluation on both engines — identical sequential double folds, ties on
# (distance, centroid id) / (cosine, neighbor id).
_CENT_VALUES = ",\n    ".join(
    f"({i}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
    for i, c in enumerate(IVF_CENTROIDS)
)

def _duck_ivf_sql(
    nprobe: int,
    query_pred: str,
    extra_select: str = "",
    index_pred: str = "TRUE",
) -> str:
    """One oracle template for every IVF query: assignment (argmin over
    l2sq to the pinned centroid literals), probing (``nprobe`` nearest
    lists for vectors matching ``query_pred``), exact-cosine rescore,
    (cosine DESC, neighbor_id) tie-broken top-10.  ``extra_select``
    appends derived columns to the final projection (e.g. the append
    query's physical-placement audit); ``index_pred`` restricts the
    INDEX side only (the maintenance queries' post-delete /
    post-compaction rebuild semantics — queries still probe, deleted
    vectors stop being retrievable)."""
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT * FROM (VALUES
    {_CENT_VALUES}) AS t(i, c)),
dists AS (
  SELECT v.vec_id, cent.i, {duck_l2sq("v.v", "cent.c")} AS d
  FROM v CROSS JOIN cent
),
ranked_d AS (
  SELECT vec_id, i, row_number() OVER (PARTITION BY vec_id ORDER BY d, i) AS rn
  FROM dists
),
assign AS (SELECT vec_id, i AS list_id FROM ranked_d
           WHERE rn = 1 AND ({index_pred})),
probes AS (SELECT vec_id, i AS list_id FROM ranked_d WHERE rn <= {nprobe} AND {query_pred}),
sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({_COS}, 6) AS cosine_sim
  FROM probes p
  JOIN v a ON a.vec_id = p.vec_id
  JOIN assign s ON s.list_id = p.list_id
  JOIN v b ON b.vec_id = s.vec_id
  WHERE b.vec_id != a.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS BIGINT) AS rank{extra_select}
FROM ranked WHERE rank <= 10
"""


_DUCK_IVF_TOPK = _duck_ivf_sql(4, "vec_id < 5")


@query("ann_ivf_topk", sql=_DUCK_IVF_TOPK, tags=("similarity", "ann", "ivf"))
def ann_ivf_topk(spark, sf_dir):
    """IVF-Flat ANN top-10 (FAISS-style scale path): pre-trained k-means
    coarse quantizer (checked-in fixture centroids — the production
    train-once-on-a-sample shape) → map-only inverted-list assignment
    (1-row broadcast centroid table, no shuffle — r16) → queries probe
    their 4 nearest of 16 lists → exact cosine within probed lists.  Fully
    deterministic given the pinned centroids, so the DuckDB oracle mirrors
    assignment + probe + rescore; exactness at nprobe=n_centroids is
    additionally pinned in tests/test_similarity.py."""
    emb = read_table(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        emb,
        emb.where(F.col("vec_id") < 5),
        k=10,
        nprobe=4,
        centroids=IVF_CENTROIDS,
    )


@query("embedding_cosine_neardup", sql=_DUCK_COS_NEARDUP, tags=("dedup", "similarity"))
def embedding_cosine_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs ≥0.4 within sign-LSH buckets —
    the semantic-dedup primitive."""
    emb = read_table(spark, sf_dir, "embeddings")
    return S.cosine_near_duplicates(emb, threshold=0.4, n_bits=4)


# Recall audit: both pipelines above are deterministic on both engines, so
# the IVF-vs-exact recall is itself EXACTLY oracle-checkable (no tolerance
# contract needed) — the audit a production ANN deployment runs after any
# quantizer retrain.
_DUCK_IVF_RECALL = f"""
WITH brute AS ({_DUCK_BRUTE_TOPK}),
ivf AS ({_DUCK_IVF_TOPK})
SELECT b.query_id,
       count(i.neighbor_id) AS n_hits,
       CAST(count(i.neighbor_id) AS DOUBLE) / 10 AS recall_at_10
FROM brute b
LEFT JOIN ivf i
  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
GROUP BY b.query_id
"""


@query("ann_ivf_recall_audit", sql=_DUCK_IVF_RECALL, tags=("similarity", "ann", "audit"))
def ann_ivf_recall_audit(spark, sf_dir):
    """Recall@10 of IVF (nprobe=4/16) against the exact brute-force top-10
    per query vector.  Both pipelines are deterministic given the pinned
    centroids, so the recall numbers are exact on both engines — this is
    the audit that gates a quantizer retrain in production (recall drops
    when centroids stop matching the corpus distribution)."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    brute = S.brute_force_topk(emb, q, k=10).select("query_id", "neighbor_id")
    ivf = (
        S.ivf_topk(emb, q, k=10, nprobe=4, centroids=IVF_CENTROIDS)
        .select("query_id", "neighbor_id")
        .withColumn("__hit", F.lit(1))
    )
    return (
        brute.join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("__hit").alias("n_hits"),
            (F.count("__hit").cast("double") / 10).alias("recall_at_10"),
        )
    )


def probe_batch(emb, vec, nprobe=3):
    """(query_id, qv, list_id) probe rows of the standard ``vec_id < 8``
    query batch — PUBLIC shared helper (ADVICE r16: the streaming IVF
    ingest imports it, so it is part of this module's interface, not a
    private detail), via the broadcast-data probe assignment
    (:func:`operators.similarity.with_centroid_assignment` — r16: the
    inlined-literal probe form cost seconds of per-query plan
    build/analysis at identical per-row throughput; the broadcast form is
    plan-size O(1) in C and produces bit-identical probe sets, the
    operator's own equivalence property test)."""
    return S.with_centroid_assignment(
        emb.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), vec.alias("qv")
        ),
        F.col("qv"),
        IVF_CENTROIDS,
        "__probes",
        nprobe=nprobe,
    ).select("query_id", "qv", F.explode("__probes").alias("list_id"))


_DUCK_IVF_POSTING = _duck_ivf_sql(3, "vec_id < 8")


@query(
    "ann_ivf_against_posting_index",
    sql=_DUCK_IVF_POSTING,
    tags=("similarity", "ann", "ivf", "index"),
)
def ann_ivf_against_posting_index(spark, sf_dir):
    """ANN retrieval against a PERSISTED IVF posting index — the
    incremental-retrieval shape a 100 TB corpus needs (index built once,
    query batches probe it), completing the persisted-index triad: exact
    signature index (r10), MinHash band index (r11), IVF posting index.

    Corpus side: map-only inverted-list assignment to the pinned
    centroids (literals inside codegen, no shuffle), written to
    warehouse-rooted shared scratch as parquet PARTITIONED BY list_id —
    the production layout, where a probe touching nprobe of 16 lists
    prunes the other partitions at scan time instead of filtering rows.
    Probe side: the query batch (vec_id < 8) computes its 3 nearest
    lists, equi-joins the read-back index on the partition column, and
    exact-cosine rescores within probed lists only.  Fully deterministic
    given the pinned centroids (same argmin/probe/rescore folds as
    ann_ivf_topk), so the oracle mirrors it exactly — persistence is
    result-transparent.  Reference-class op: FAISS-style IVF serving
    (Johnson et al.), which the reference's batch pipeline has no
    analogue for."""
    emb = read_table(spark, sf_dir, "embeddings")
    vec = S.as_double("embedding")

    # posting_rows has exactly ONE consumer (the partitioned write): the
    # probe below reads the WRITTEN ARTIFACT for both candidate fetch and
    # rescore (v rides in the index), and the query batch re-scans
    # embeddings only under a vec_id<8 pushdown (8 rows).  Measured r13
    # (VERDICT item 6): adding .persist() here reads 2.90→3.09 s min-of-3
    # at sf0.1 — pure added materialization, same bigram-LM lesson as
    # commit 5632fc9.  The corpus-assignment cost IS the index build,
    # which production amortizes across probe batches.
    # broadcast-data assignment (r16): the inlined-literal argmin/probe
    # forms cost seconds of per-query plan build+analysis (16×64 literal
    # leaves, worst in the probe's array_sort) at IDENTICAL per-row
    # throughput — measured 7.4 s → 1.9 s fixed for the nearest+probe
    # pair at sf0.1, bit-identical assignments (the operator's own
    # equivalence property test).  This is also the production form the
    # operator docs prescribe at real centroid counts (C=4096+).
    posting_rows = S.with_centroid_assignment(
        emb.select(F.col("vec_id").alias("neighbor_id"), vec.alias("v")),
        F.col("v"),
        IVF_CENTROIDS,
        "list_id",
    )
    idx_path = index_scratch_dir(spark, "posting_index")
    posting_rows.write.partitionBy("list_id").parquet(idx_path)
    posting = spark.read.parquet(idx_path)

    q = probe_batch(emb, vec)
    sims = (
        F.broadcast(q)
        .join(posting, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(S.cosine(F.col("qv"), F.col("v")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 10)
    )


# --- IVF posting-index incremental APPEND (ANN index maintenance) ----------
# The vector-corpus analogue of the MinHash band-index maintenance verbs
# (dedup_queries.py): a 100 TB embedding corpus ingests new vectors
# continuously, and rebuilding the posting index per wave is the wrong
# shape.  Only the NEW WAVE is assigned to the pinned centroids (map-only,
# centroid literals inside codegen) and lands as a fresh `gen=1` partition
# of the same parquet index (partitionBy gen,list_id + mode append: gen-0
# list files are never touched, so the append costs O(|wave|) regardless
# of index size — the measured property of its band-index sibling,
# scripts/append_cost_vs_index_size.py).  A query batch then probes the
# MERGED index: nprobe nearest lists, exact-cosine rescore, top-10.
#
# Equivalence proof: the oracle knows nothing about generations — it
# assigns ALL vectors in one pass (full rebuild semantics), so the value
# hash proves append ≡ rebuild on the probe surface.  Physical pinning:
# `from_append` flags each returned neighbor by the index's PHYSICAL
# `gen` partition column; the oracle derives the same flag from vec_id
# arithmetic, so a mis-partitioned append (wave rows in gen=0, or
# established rows re-written into gen=1) hash-fails even when the
# top-10 itself is unchanged.
#
# Waves (modular, deterministic): established corpus = vec_id % 3 != 2
# (gen 0), appended wave = vec_id % 3 == 2 (gen 1), query batch =
# vec_id < 8 (spans both, so results prove the appended lists serve
# probes and appended vectors are themselves retrievable).

_DUCK_IVF_APPEND = _duck_ivf_sql(
    3,
    "vec_id < 8",
    extra_select=(
        ",\n       CAST(CASE WHEN neighbor_id % 3 = 2 THEN 1 ELSE 0 END"
        " AS BIGINT) AS from_append"
    ),
)


@query(
    "ann_ivf_posting_index_append",
    sql=_DUCK_IVF_APPEND,
    tags=("similarity", "ann", "ivf", "index", "maintenance"),
)
def ann_ivf_posting_index_append(spark, sf_dir):
    """Incremental IVF posting-index maintenance: assign ONLY the new
    vector wave and append it as a `gen=1` partition of the persisted
    posting index (gen-0 list files untouched, O(|wave|)); probe the
    merged index — see block comment.  The oracle assigns all vectors in
    one pass, so the hash IS the append≡rebuild proof; `from_append` is
    read off the physical `gen` partition column, pinning placement.
    Extends the index-maintenance verbs (band index: append/delete/
    stream-ingest/compact) to the ANN subsystem."""
    emb = read_table(spark, sf_dir, "embeddings")
    vec = S.as_double("embedding")
    # broadcast-data assignment (r16): O(1) plan size, identical argmin —
    # see ann_ivf_against_posting_index
    assigned = S.with_centroid_assignment(
        emb.select(F.col("vec_id").alias("neighbor_id"), vec.alias("v")),
        F.col("v"),
        IVF_CENTROIDS,
        "list_id",
    )
    idx_path = index_scratch_dir(spark, "posting_index_gen")
    # gen-0 build: the established corpus, list-partitioned as always
    (
        assigned.where(F.col("neighbor_id") % 3 != 2)
        .withColumn("gen", F.lit(0))
        .write.partitionBy("gen", "list_id")
        .parquet(idx_path)
    )
    # THE MAINTENANCE STEP: only the wave is assigned and appended as a
    # fresh gen=1 directory — no gen-0 file is rewritten
    (
        assigned.where(F.col("neighbor_id") % 3 == 2)
        .withColumn("gen", F.lit(1))
        .write.partitionBy("gen", "list_id")
        .mode("append")
        .parquet(idx_path)
    )
    posting = spark.read.parquet(idx_path)

    q = probe_batch(emb, vec)
    sims = (
        F.broadcast(q)
        .join(posting, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(S.cosine(F.col("qv"), F.col("v")), 6).alias("cosine_sim"),
            (F.col("gen") == 1).cast("long").alias("from_append"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 10)
    )


# --- IVF posting-index tombstone DELETE (ANN index maintenance) -------------
# The ANN sibling of dedup_band_index_tombstone_delete: takedowns and
# retractions must remove vectors from retrieval WITHOUT rewriting the
# posting index (at 100 TB, dropping 0.1% of vectors by rewriting every
# list file is the wrong shape).  The delete wave's vec_ids land as a
# TOMBSTONE parquet next to the index — an O(|delete set|) write, zero
# list files touched — and the probe anti-joins the (broadcast-sized)
# tombstone set before rescoring, so deleted vectors stop being
# retrievable immediately.  A later compaction folds the tombstones
# physically (the query below).
#
# Equivalence proof: the oracle knows no tombstones — it assigns only the
# SURVIVING vectors (post-delete rebuild semantics) — so a value-hash
# match proves tombstoned probing ≡ physically-deleted rebuild.  Physical
# pinning: `live_index_rows` (a broadcast scalar cross-joined onto every
# probe row) counts the rows the probe can actually see after the
# anti-join; the oracle derives it as the surviving-corpus count, so a
# tombstone set that misses a row (or over-deletes) hash-fails even when
# no top-10 entry flips.  Delete wave = vec_id % 5 == 0 beyond the query
# batch (queries stay live; their former %5 neighbors must be replaced
# by the next-best survivors).

_IVF_DEL_PRED = "vec_id % 5 = 0 AND vec_id >= 8"

_DUCK_IVF_DELETE = f"""
WITH base AS ({_duck_ivf_sql(3, "vec_id < 8", index_pred=f"NOT ({_IVF_DEL_PRED})")}),
nrows AS (
  SELECT CAST(count(*) AS BIGINT) AS live_index_rows
  FROM embeddings WHERE NOT ({_IVF_DEL_PRED})
)
SELECT base.*, nrows.live_index_rows FROM base CROSS JOIN nrows
"""


@query(
    "ann_ivf_posting_index_tombstone_delete",
    sql=_DUCK_IVF_DELETE,
    tags=("similarity", "ann", "ivf", "index", "maintenance"),
)
def ann_ivf_posting_index_tombstone_delete(spark, sf_dir):
    """Logical delete from the persisted IVF posting index via a
    TOMBSTONE parquet — see block comment.  No list file is rewritten
    (the delete write is O(|delete set|)); the probe anti-joins the
    broadcast tombstone set before rescoring.  The oracle assigns only
    surviving vectors, so the value hash proves tombstoned probing ≡
    physically-deleted rebuild; `live_index_rows` pins the post-delete
    probe-able row count.  Fourth ANN index-lifecycle verb
    (build/probe r12, append r14, delete)."""
    emb = read_table(spark, sf_dir, "embeddings")
    vec = S.as_double("embedding")
    idx_path = index_scratch_dir(spark, "posting_index_del")
    (
        S.with_centroid_assignment(
            emb.select(F.col("vec_id").alias("neighbor_id"), vec.alias("v")),
            F.col("v"),
            IVF_CENTROIDS,
            "list_id",
        )
        .write.partitionBy("list_id")
        .parquet(idx_path)
    )
    posting = spark.read.parquet(idx_path)

    # THE DELETE STEP: tombstone the erase wave — an O(|wave|) parquet
    # write next to the index, no list file touched
    tomb_path = index_scratch_dir(spark, "posting_index_tombstones")
    (
        emb.where((F.col("vec_id") % 5 == 0) & (F.col("vec_id") >= 8))
        .select(F.col("vec_id").alias("neighbor_id"))
        .write.parquet(tomb_path)
    )
    tombstones = spark.read.parquet(tomb_path)

    # live view: anti-join the (delete-set-sized, broadcast) tombstones;
    # the list_id partition layout is untouched, so probes still prune
    live = posting.join(F.broadcast(tombstones), "neighbor_id", "left_anti")
    nrows = live.agg(F.count("*").cast("long").alias("live_index_rows"))

    q = probe_batch(emb, vec)
    sims = (
        F.broadcast(q)
        .join(live, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(S.cosine(F.col("qv"), F.col("v")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 10)
        .crossJoin(F.broadcast(nrows))
    )


# --- IVF posting-index COMPACTION (fold generations + tombstones) -----------
# The FIFTH ANN lifecycle verb, completing full symmetry with the band
# index (build/probe/append/delete/compact on both).  A lived-in posting
# index accumulates the same debt as its band sibling: appended `gen=N`
# partitions (each wave a new directory of small files) and a tombstone
# set every probe must anti-join.  The periodic COMPACTION folds all of
# it in one distributed pass — merged generations anti-join the
# tombstones, rewritten PARTITIONED BY list_id into a fresh
# single-generation index (one file per inverted list, so a probe's
# partition pruning touches exactly nprobe files) — and the tombstone
# set retires to empty.
#
# Equivalence proof: the oracle assigns the surviving vectors in one
# pass (no generations, no tombstones), so a value-hash match proves
# compacted-index probing ≡ from-scratch rebuild.  Physical pinning:
# `compacted_index_rows` counts the rows of the REWRITTEN artifact — a
# compaction that leaks a tombstoned vector, drops a live one, or
# double-writes a generation hash-fails on that column even when no
# top-10 entry flips.  Tombstones = vec_id % 7 == 0 beyond the query
# batch (disjoint from the delete query's %5 wave, so the two
# maintenance hashes stay distinct); generations split on vec_id % 3.

_IVF_CMP_PRED = "vec_id % 7 = 0 AND vec_id >= 8"

_DUCK_IVF_COMPACT = f"""
WITH base AS ({_duck_ivf_sql(3, "vec_id < 8", index_pred=f"NOT ({_IVF_CMP_PRED})")}),
nrows AS (
  SELECT CAST(count(*) AS BIGINT) AS compacted_index_rows
  FROM embeddings WHERE NOT ({_IVF_CMP_PRED})
)
SELECT base.*, nrows.compacted_index_rows FROM base CROSS JOIN nrows
"""


@query(
    "ann_ivf_posting_index_compaction",
    sql=_DUCK_IVF_COMPACT,
    tags=("similarity", "ann", "ivf", "index", "maintenance"),
)
def ann_ivf_posting_index_compaction(spark, sf_dir):
    """Periodic IVF posting-index COMPACTION: fold appended generations
    and the tombstone set into a fresh single-generation,
    list-partitioned index, then probe the compacted artifact with no
    anti-join — see block comment.  The oracle assigns surviving vectors
    in one pass, so the value hash proves compacted probing ≡ rebuild;
    `compacted_index_rows` pins the rewritten artifact's physical row
    count.  Completes five-verb lifecycle symmetry with the band index:
    build → probe → append → delete → compact, on BOTH index types."""
    emb = read_table(spark, sf_dir, "embeddings")
    vec = S.as_double("embedding")
    assigned = S.with_centroid_assignment(
        emb.select(F.col("vec_id").alias("neighbor_id"), vec.alias("v")),
        F.col("v"),
        IVF_CENTROIDS,
        "list_id",
    )

    # the LIVED-IN starting state: two generations (gen0 = established
    # vec_id%3!=2, gen1 = appended %3==2 wave) plus a tombstone set
    # spanning BOTH generations
    idx_path = index_scratch_dir(spark, "posting_index_lived")
    (
        assigned.withColumn("gen", (F.col("neighbor_id") % 3 == 2).cast("int"))
        .write.partitionBy("gen", "list_id")
        .parquet(idx_path)
    )
    tomb_path = index_scratch_dir(spark, "posting_tomb_precompact")
    (
        emb.where((F.col("vec_id") % 7 == 0) & (F.col("vec_id") >= 8))
        .select(F.col("vec_id").alias("neighbor_id"))
        .write.parquet(tomb_path)
    )

    # THE COMPACTION STEP: one distributed pass — merged generations
    # anti-join the broadcast tombstones, rewritten partitioned by
    # list_id only (single generation, one file per inverted list);
    # generations and tombstones both retire
    live = (
        spark.read.parquet(idx_path)
        .join(F.broadcast(spark.read.parquet(tomb_path)), "neighbor_id", "left_anti")
        .select("neighbor_id", "v", "list_id")
    )
    compact_path = index_scratch_dir(spark, "posting_index_compacted")
    (
        live.repartition(len(IVF_CENTROIDS), "list_id")
        .write.partitionBy("list_id")
        .parquet(compact_path)
    )
    compacted = spark.read.parquet(compact_path)

    # physical audit scalar: row count of the rewritten artifact (the
    # oracle derives the same number as the surviving-corpus count)
    nrows = compacted.agg(
        F.count("*").cast("long").alias("compacted_index_rows")
    )

    # probe the compacted index EXACTLY like a fresh build — no
    # tombstone anti-join anywhere (that is the point of compaction)
    q = probe_batch(emb, vec)
    sims = (
        F.broadcast(q)
        .join(compacted, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(S.cosine(F.col("qv"), F.col("v")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 10)
        .crossJoin(F.broadcast(nrows))
    )


# NDCG@10 retrieval-quality audit.  Binary relevance (brute-force top-10 =
# the relevant set), so DCG = Σ 1/log2(rank+1) over hit ranks.  The ten
# possible per-rank gains are PRE-ROUNDED DECIMAL LITERALS shared verbatim
# by both engines and summed as exact decimals (order-independent — a
# double SUM here would be addition-order-dependent and flake the value
# hash); only the final ndcg division runs in double, then rounds.
import math as _math

_NDCG_K = 10
_NDCG_WEIGHTS = [
    str(round(1.0 / _math.log2(i + 1), 12)) for i in range(1, _NDCG_K + 1)
]
_NDCG_IDCG = float(sum(float(w) for w in _NDCG_WEIGHTS))

_NDCG_W_VALUES = ",\n    ".join(
    f"({i + 1}, {w}::DECIMAL(14,12))" for i, w in enumerate(_NDCG_WEIGHTS)
)

_DUCK_IVF_NDCG = f"""
WITH brute AS ({_DUCK_BRUTE_TOPK}),
ivf AS ({_DUCK_IVF_TOPK}),
w AS (SELECT * FROM (VALUES
    {_NDCG_W_VALUES}) AS t(rank, w)),
hits AS (
  SELECT i.query_id, i.rank
  FROM ivf i JOIN brute b
    ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
),
agg AS (
  SELECT h.query_id, count(*) AS n_hits, sum(w.w) AS dcg
  FROM hits h JOIN w ON w.rank = h.rank
  GROUP BY h.query_id
),
base AS (SELECT DISTINCT query_id FROM brute)
SELECT base.query_id,
       CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
       round(CAST(coalesce(dcg, 0) AS DOUBLE), 6) AS dcg,
       round(CAST(coalesce(dcg, 0) AS DOUBLE) / {_NDCG_IDCG!r}, 6) AS ndcg_at_10
FROM base LEFT JOIN agg ON agg.query_id = base.query_id
"""


@query("ann_ivf_ndcg_audit", sql=_DUCK_IVF_NDCG, tags=("similarity", "ann", "audit"))
def ann_ivf_ndcg_audit(spark, sf_dir):
    """NDCG@10 of IVF (nprobe=4/16) against the exact brute-force top-10:
    the rank-sensitive companion to the recall audit (recall says the
    neighbors were found; NDCG says they were found NEAR THE TOP).  DCG
    gains are shared pre-rounded decimal literals summed exactly, so the
    score is engine-independent despite being a float metric."""
    from decimal import Decimal

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    brute = S.brute_force_topk(emb, q, k=10).select("query_id", "neighbor_id")
    ivf = S.ivf_topk(emb, q, k=10, nprobe=4, centroids=IVF_CENTROIDS).select(
        "query_id", "neighbor_id", "rank"
    )
    warr = F.array(
        *[F.lit(Decimal(w)).cast("decimal(14,12)") for w in _NDCG_WEIGHTS]
    )
    hits = ivf.join(brute, ["query_id", "neighbor_id"]).select(
        "query_id", F.element_at(warr, F.col("rank").cast("int")).alias("__w")
    )
    agg = hits.groupBy("query_id").agg(
        F.count("*").alias("__n_hits"), F.sum("__w").alias("__dcg")
    )
    base = brute.select("query_id").distinct()
    dcg = F.coalesce(F.col("__dcg"), F.lit(0)).cast("double")
    return base.join(agg, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("__n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        F.round(dcg, 6).alias("dcg"),
        F.round(dcg / F.lit(_NDCG_IDCG), 6).alias("ndcg_at_10"),
    )


# SemDeDup: same pinned coarse centroids as IVF, so cluster assignment,
# cosine-to-centroid, and the within-cluster pair scan are deterministic
# expression evaluation on both engines; the keep-rule's float comparisons
# run on identically-rounded doubles.
_SEMDEDUP_THRESHOLD = 0.5

_DUCK_SEMDEDUP = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT * FROM (VALUES
    {_CENT_VALUES}) AS t(i, c)),
dists AS (
  SELECT v.vec_id, cent.i, {duck_l2sq("v.v", "cent.c")} AS d
  FROM v CROSS JOIN cent
),
ranked_d AS (
  SELECT vec_id, i, row_number() OVER (PARTITION BY vec_id ORDER BY d, i) AS rn
  FROM dists
),
av AS (
  SELECT v.vec_id, v.v, a.i AS cluster_id,
         round({duck_cosine("v.v", "cent.c")}, 6) AS centroid_sim
  FROM v
  JOIN ranked_d a ON a.vec_id = v.vec_id AND a.rn = 1
  JOIN cent ON cent.i = a.i
),
edges AS (
  SELECT a.vec_id AS id_a, a.centroid_sim AS ca,
         b.vec_id AS id_b, b.centroid_sim AS cb
  FROM av a JOIN av b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE round({duck_cosine("a.v", "b.v")}, 6) >= {_SEMDEDUP_THRESHOLD}
),
partners AS (
  SELECT id_a AS vec_id, ca AS my, cb AS pc, id_b AS pid FROM edges
  UNION ALL
  SELECT id_b AS vec_id, cb AS my, ca AS pc, id_a AS pid FROM edges
),
pagg AS (
  SELECT vec_id, count(*) AS n_dups,
         max(CASE WHEN pc < my OR (pc = my AND pid < vec_id)
                  THEN 1 ELSE 0 END) AS has_better
  FROM partners GROUP BY vec_id
)
SELECT av.vec_id,
       CAST(cluster_id AS BIGINT) AS cluster_id,
       centroid_sim,
       CAST(coalesce(n_dups, 0) AS BIGINT) AS n_dups,
       coalesce(has_better, 0) = 0 AS keep
FROM av LEFT JOIN pagg ON pagg.vec_id = av.vec_id
"""


@query(
    "dedup_semantic_clusters",
    sql=_DUCK_SEMDEDUP,
    tags=("dedup", "similarity", "curation"),
)
def dedup_semantic_clusters(spark, sf_dir):
    """SemDeDup semantic deduplication (Abbas et al., 2023): k-means
    cluster assignment (pinned centroids, map-only argmin) → within-
    cluster cosine pairs ≥0.5 → prune every vector that has a duplicate
    partner with lower cosine-to-centroid (keep the least prototypical
    member, id tie-break).  One row per corpus vector with its cluster,
    centroid similarity, duplicate-partner count, and keep flag.  No
    all-pairs join anywhere: candidates are bounded by cluster
    membership, the production knob being cluster count ~√N."""
    emb = read_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(
        emb, IVF_CENTROIDS, threshold=_SEMDEDUP_THRESHOLD
    )


# Semantic decontamination: the 80/20 split is the portable 60-bit md5
# hash (engine-identical), clustering reuses the pinned IVF centroids,
# and the top-partner choice ranks on the rounded sim with the train id
# as tie-break — all deterministic expression evaluation on both engines.
from ._duck import hash60 as _hash60

_LEAK_THRESHOLD = 0.4

_DUCK_SEMANTIC_LEAKAGE = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  {_hash60("CAST(vec_id AS VARCHAR)")} % 10 >= 8 AS is_eval
           FROM embeddings),
cent AS (SELECT * FROM (VALUES
    {_CENT_VALUES}) AS t(i, c)),
dists AS (
  SELECT v.vec_id, cent.i, {duck_l2sq("v.v", "cent.c")} AS d
  FROM v CROSS JOIN cent
),
ranked_d AS (
  SELECT vec_id, i, row_number() OVER (PARTITION BY vec_id ORDER BY d, i) AS rn
  FROM dists
),
av AS (
  SELECT v.vec_id, v.v, v.is_eval, a.i AS cluster_id
  FROM v JOIN ranked_d a ON a.vec_id = v.vec_id AND a.rn = 1
),
pairs AS (
  SELECT e.vec_id AS eval_id, CAST(e.cluster_id AS BIGINT) AS cluster_id,
         t.vec_id AS train_id,
         round({duck_cosine("e.v", "t.v")}, 6) AS sim
  FROM av e JOIN av t
    ON e.cluster_id = t.cluster_id AND e.is_eval AND NOT t.is_eval
),
leaked AS (
  SELECT *,
         row_number() OVER (PARTITION BY eval_id
                            ORDER BY sim DESC, train_id) AS rn,
         count(*) OVER (PARTITION BY eval_id) AS n_cont
  FROM pairs WHERE sim >= {_LEAK_THRESHOLD}
)
SELECT eval_id, cluster_id,
       CAST(n_cont AS BIGINT) AS n_contaminated,
       train_id AS top_train_id,
       sim AS top_sim
FROM leaked WHERE rn = 1
"""


@query(
    "decontaminate_semantic_pairs",
    sql=_DUCK_SEMANTIC_LEAKAGE,
    tags=("dedup", "curation", "audit"),
)
def decontaminate_semantic_pairs(spark, sf_dir):
    """Embedding-space train/eval decontamination: hash-split the corpus
    80/20 (portable md5 split — the same split any engine reproduces),
    then flag every eval vector with a train neighbor at cosine ≥0.4,
    reporting its contamination count and nearest train twin.  Catches
    the leakage n-gram overlap can't see (paraphrase/near-dup); the
    candidate set is cluster-cohabitants only, never eval × train."""
    from ..operators.dedup import md5_hash60

    emb = read_table(spark, sf_dir, "embeddings")
    is_eval = md5_hash60(F.col("vec_id").cast("string")) % 10 >= 8
    return S.semantic_leakage(
        emb, IVF_CENTROIDS, is_eval, threshold=_LEAK_THRESHOLD
    )


# IVF-PQ: coarse lists bound candidates, PQ codes + ADC score them.  Both
# the coarse centroids AND the 4x8 sub-codebooks are pinned literals, so
# encoding (argmin per subspace) and ADC (fixed-order chain of 4
# sequential-fold subdistances — never a SUM aggregate, whose order is
# engine-dependent) are pure deterministic expression evaluation.
from .pq_codebooks import PQ_CODEBOOKS

_SUB_DIM = len(PQ_CODEBOOKS[0][0])

_CB_VALUES = ",\n    ".join(
    f"({j}, {k}, [{', '.join(repr(x) for x in c)}]::DOUBLE[])"
    for j, book in enumerate(PQ_CODEBOOKS)
    for k, c in enumerate(book)
)


def _duck_cb_literal(j: int) -> str:
    rows = ", ".join(
        "[" + ", ".join(repr(x) for x in c) + "]" for c in PQ_CODEBOOKS[j]
    )
    return f"[{rows}]::DOUBLE[][]"


def _duck_adc_chain() -> str:
    terms = []
    for j in range(len(PQ_CODEBOOKS)):
        lo, hi = j * _SUB_DIM + 1, (j + 1) * _SUB_DIM
        chosen = f"({_duck_cb_literal(j)})[cd.codes[{j + 1}] + 1]"
        terms.append(duck_l2sq(f"a.v[{lo}:{hi}]", chosen))
    return " + ".join(f"({t})" for t in terms)


_DUCK_IVFPQ_TOPK = f"""
WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
v AS (SELECT vec_id, {duck_l2_normalize("embedding::DOUBLE[]")} AS v FROM embeddings),
cent AS (SELECT * FROM (VALUES
    {_CENT_VALUES}) AS t(i, c)),
cb AS (SELECT * FROM (VALUES
    {_CB_VALUES}) AS t(j, k, c)),
cdists AS (
  SELECT v.vec_id, cent.i, {duck_l2sq("v.v", "cent.c")} AS d
  FROM v CROSS JOIN cent
),
cranked AS (
  SELECT vec_id, i, row_number() OVER (PARTITION BY vec_id ORDER BY d, i) AS rn
  FROM cdists
),
assign AS (SELECT vec_id, i AS list_id FROM cranked WHERE rn = 1),
probes AS (SELECT vec_id, i AS list_id FROM cranked WHERE rn <= 4 AND vec_id < 5),
sdists AS (
  SELECT v.vec_id, cb.j, cb.k,
         {duck_l2sq("v.v[cb.j*" + str(_SUB_DIM) + "+1 : (cb.j+1)*" + str(_SUB_DIM) + "]", "cb.c")} AS d
  FROM v CROSS JOIN cb
),
sranked AS (
  SELECT vec_id, j, k,
         row_number() OVER (PARTITION BY vec_id, j ORDER BY d, k) AS rn
  FROM sdists
),
codes AS (
  SELECT vec_id, list(k ORDER BY j) AS codes FROM sranked WHERE rn = 1
  GROUP BY vec_id
),
sims AS (
  SELECT a.vec_id AS query_id, s.vec_id AS neighbor_id,
         round({_duck_adc_chain()}, 6) AS approx_dist
  FROM probes p
  JOIN v a ON a.vec_id = p.vec_id
  JOIN assign s ON s.list_id = p.list_id
  JOIN codes cd ON cd.vec_id = s.vec_id
  WHERE s.vec_id != a.vec_id
),
adc_ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY approx_dist, neighbor_id) AS adc_rank
  FROM sims
),
refined AS (
  SELECT r.query_id, r.neighbor_id,
         round({duck_cosine("qa.v", "qb.v")}, 6) AS cosine_sim
  FROM adc_ranked r
  JOIN raw qa ON qa.vec_id = r.query_id
  JOIN raw qb ON qb.vec_id = r.neighbor_id
  WHERE r.adc_rank <= 50
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM refined
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""


@query("ann_ivfpq_topk", sql=_DUCK_IVFPQ_TOPK, tags=("similarity", "ann", "pq"))
def ann_ivfpq_topk(spark, sf_dir):
    """IVF-PQ approximate top-10 (the FAISS production composition):
    coarse inverted lists bound candidates (equi-join, no cross product),
    PQ codes compress each candidate to 4 bytes, and asymmetric distance
    computation scores query-vs-codes — at 100 TB the raw float corpus
    never moves through the join, only codes.  Encoding, probing, the
    fixed-order ADC chain, and the exact-cosine refine of the ADC top-50
    are deterministic given the pinned centroid + codebook literals,
    mirrored exactly in DuckDB."""
    emb = read_table(spark, sf_dir, "embeddings")
    return S.ivfpq_topk(
        emb,
        emb.where(F.col("vec_id") < 5),
        centroids=IVF_CENTROIDS,
        codebooks=PQ_CODEBOOKS,
        k=10,
        nprobe=4,
        refine=50,
    )


# --- matryoshka truncation quality audit ----------------------------------

_MRL_HALF_D = 32
_MRL_PAIR_STRIDE = 5
_MRL_DELTA_OK = 0.15

_MRL_SQL = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.e AS ea, b.e AS eb,
         a.e[1:{_MRL_HALF_D}] AS ha, b.e[1:{_MRL_HALF_D}] AS hb
  FROM v a JOIN v b ON b.vec_id = a.vec_id + {_MRL_PAIR_STRIDE}
)
SELECT vec_a, vec_b,
       round({{cosf}}, 6) AS cos_full,
       round({{cosh}}, 6) AS cos_half,
       round(abs({{cosf}} - {{cosh}}), 6) AS abs_delta,
       CAST(round(abs({{cosf}} - {{cosh}}), 6) <= {_MRL_DELTA_OK} AS BIGINT)
         AS preserved
FROM pairs
"""


def _mrl_sql() -> str:
    from ..functions.vector import duck_cosine

    return _MRL_SQL.replace("{cosf}", duck_cosine("ea", "eb")).replace(
        "{cosh}", duck_cosine("ha", "hb")
    )


@query("embedding_matryoshka_audit", sql=_mrl_sql(), tags=("embedding", "curation"))
def embedding_matryoshka_audit(spark, sf_dir):
    """Matryoshka truncation quality audit: how much does cosine
    similarity move when embeddings are cut to their first
    {_MRL_HALF_D} of 64 dimensions?  The go/no-go check before storing
    MRL-truncated vectors to halve ANN memory and bandwidth.

    The probe set is the deterministic (vec_id, vec_id+{_MRL_PAIR_STRIDE})
    stride join — no RNG, same pairs everywhere; full and truncated
    cosines are the documented order-exact sequential folds
    (functions/vector.py ↔ duck_cosine), so the raw doubles match
    bit-for-bit before the presentation rounding, and the preservation
    flag compares the ROUNDED delta identically on both engines.
    Map-only except the one stride equi-join; output is probe-sized."""
    from ..functions.vector import as_double, cosine

    v = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("e")
    )
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"))
    pairs = a.join(
        b, F.col("vec_b") == F.col("vec_a") + _MRL_PAIR_STRIDE
    ).select(
        "vec_a",
        "vec_b",
        "ea",
        "eb",
        F.slice("ea", 1, _MRL_HALF_D).alias("ha"),
        F.slice("eb", 1, _MRL_HALF_D).alias("hb"),
    )
    cosf = cosine(F.col("ea"), F.col("eb"))
    cosh = cosine(F.col("ha"), F.col("hb"))
    delta = F.round(F.abs(cosf - cosh), 6)
    return pairs.select(
        "vec_a",
        "vec_b",
        F.round(cosf, 6).alias("cos_full"),
        F.round(cosh, 6).alias("cos_half"),
        delta.alias("abs_delta"),
        (delta <= _MRL_DELTA_OK).cast("long").alias("preserved"),
    )


# --- label-centroid similarity matrix -------------------------------------
# "How separable are the classes in embedding space?" — the confusion-risk
# audit run before training a classifier head on frozen embeddings.  The
# 100 TB design point is the CENTROID computation: a float vector mean via
# collect-and-fold would funnel each label's vectors into one task, so each
# dimension is micro-quantized (1e-6 grid) to BIGINT and summed as rows —
# order-independent, exact, map-side-combined, fully distributed
# (posexplode → (label, dim) groupBy).  Only the 10×64 centroid table is
# assembled into arrays, where the pairwise cosine runs as the standard
# mirrored left-fold (functions/vector.py contract), rounded to 6 dp.

_CENTROID_SQL = """
WITH per_dim AS (
  SELECT label, p.d AS dim, CAST(sum(p.v) AS BIGINT) AS s
  FROM (
    SELECT label,
           unnest(list_transform(embedding, (x, i) ->
             {'d': i, 'v': CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                                AS BIGINT)})) AS p
    FROM embeddings
  )
  GROUP BY label, p.d
),
counts AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY label
),
cent AS (
  SELECT d.label, c.n,
         list(CAST(d.s AS DOUBLE) / 1000000.0 / CAST(c.n AS DOUBLE)
              ORDER BY d.dim) AS cv
  FROM per_dim d JOIN counts c ON d.label = c.label
  GROUP BY d.label, c.n
)
SELECT a.label AS label_a, b.label AS label_b,
       a.n AS n_a, b.n AS n_b,
       round(
         list_reduce(list_transform(list_zip(a.cv, b.cv), p -> p[1]*p[2]),
                     (acc, x) -> acc + x)
         / (sqrt(list_reduce(list_transform(a.cv, x -> x*x), (acc, x) -> acc + x))
            * sqrt(list_reduce(list_transform(b.cv, x -> x*x), (acc, x) -> acc + x))),
         6) AS centroid_cosine
FROM cent a JOIN cent b ON a.label < b.label
"""


@query(
    "embedding_label_centroids",
    sql=_CENTROID_SQL,
    tags=("similarity", "embeddings", "audit"),
)
def embedding_label_centroids(spark, sf_dir):
    """Pairwise cosine similarity between per-label embedding centroids —
    see block comment for the distributed exact-integer centroid design."""
    emb = read_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x")
    ).select(
        "label",
        (F.col("pos") + 1).alias("dim"),  # DuckDB's lambda index is 1-based
        F.floor(F.col("x") * 1000000.0 + F.lit(0.5)).cast("long").alias("v"),
    )
    per_dim = exploded.groupBy("label", "dim").agg(
        F.sum("v").cast("long").alias("s")
    )
    counts = emb.groupBy("label").agg(F.count("*").cast("long").alias("n"))
    cent = (
        per_dim.join(F.broadcast(counts), "label")
        .groupBy("label", "n")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "dim",
                            (
                                F.col("s").cast("double")
                                / 1000000.0
                                / F.col("n").cast("double")
                            ).alias("c"),
                        )
                    )
                ),
                lambda t: t["c"],
            ).alias("cv")
        )
    )
    a = cent.select(
        F.col("label").alias("label_a"), F.col("n").alias("n_a"), F.col("cv").alias("cva")
    )
    b = cent.select(
        F.col("label").alias("label_b"), F.col("n").alias("n_b"), F.col("cv").alias("cvb")
    )
    from ..functions.vector import cosine

    return (
        a.join(b, F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            F.round(cosine(F.col("cva"), F.col("cvb")), 6).alias(
                "centroid_cosine"
            ),
        )
    )


# --- int8 quantization recall audit (fp32 queries vs int8 corpus) ---------
# "What does 4× storage compression cost in retrieval quality?" — the
# acceptance gate for shipping the int8 corpus
# (embedding_quantize_int8).  Asymmetric setup, as production ADC runs
# it: queries stay full-precision, the corpus is
# quantize→dequantize-reconstructed, and recall@10 compares against the
# exact fp top-10.  Both engines reconstruct with the identical op
# sequence (floor(127·x/scale + 0.5) · scale / 127) and rank by the
# ROUNDED cosine with id tie-breaks, so the recall numbers are exact.

_DEQ = (
    "CASE WHEN s.scale = 0.0 THEN list_transform(s.v, x -> 0.0) "
    "ELSE list_transform(s.v, x -> CAST(floor(127.0 * x / s.scale + 0.5) "
    "AS BIGINT) * s.scale / 127.0) END"
)

_COS_QD = duck_cosine("a.v", "b.dv")

_DUCK_INT8_RECALL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS scale FROM v
),
dq AS (SELECT vec_id, {_DEQ} AS dv FROM s),
brute AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY round({_COS}, 6) DESC, b.vec_id) AS rank
    FROM v a JOIN v b ON a.vec_id < 5 AND b.vec_id != a.vec_id
  ) WHERE rank <= 10
),
int8 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY round({_COS_QD}, 6) DESC, b.vec_id) AS rank
    FROM v a JOIN dq b ON a.vec_id < 5 AND b.vec_id != a.vec_id
  ) WHERE rank <= 10
)
SELECT b.query_id,
       CAST(count(i.neighbor_id) AS BIGINT) AS n_hits,
       CAST(count(i.neighbor_id) AS DOUBLE) / 10 AS recall_at_10
FROM brute b
LEFT JOIN int8 i
  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
GROUP BY b.query_id
"""


@query(
    "embedding_int8_recall_audit",
    sql=_DUCK_INT8_RECALL,
    tags=("similarity", "embeddings", "audit"),
)
def embedding_int8_recall_audit(spark, sf_dir):
    """Recall@10 of fp32 queries against the int8-reconstructed corpus
    vs the exact fp top-10 — see block comment."""
    from ..operators.embeddings import absmax_scale, quantize_int8

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    brute = S.brute_force_topk(emb, q, k=10).select("query_id", "neighbor_id")
    scale = absmax_scale(F.col("embedding"))
    deq = emb.select(
        "vec_id",
        F.transform(
            quantize_int8(F.col("embedding"), scale),
            lambda c: c.cast("double") * scale / F.lit(127.0),
        ).alias("embedding"),
    )
    int8 = (
        S.brute_force_topk(deq, q, k=10)
        .select("query_id", "neighbor_id")
        .withColumn("__hit", F.lit(1))
    )
    return (
        brute.join(int8, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("__hit").cast("long").alias("n_hits"),
            (F.count("__hit").cast("double") / 10).alias("recall_at_10"),
        )
    )


# --- per-dimension moment audit (PCA prep / dead-dimension detector) -------
# The screening pass before any projection decision (matryoshka truncation,
# PQ subspace split, PCA): which embedding dimensions carry variance and
# which are dead.  Same distributed shape as the centroid audit: each
# dimension micro-quantizes to the 1e-6 BIGINT grid and the corpus reduces
# in ONE posexplode -> (dim) groupBy with map-side combine — no vector is
# ever collected, no per-dim pass repeats the scan.  Second moments ride
# DECIMAL(38,0) (Spark) / DuckDB's exact wide sum so squares never
# overflow; both convert to double once for the mean/variance expression.

_DIMVAR_SQL = """
WITH per_dim AS (
  SELECT CAST(p.d AS BIGINT) AS dim,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(p.v) AS BIGINT) AS s,
         sum(p.v * p.v) AS sq
  FROM (
    SELECT unnest(list_transform(embedding, (x, i) ->
      {'d': i, 'v': CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                         AS BIGINT)})) AS p
    FROM embeddings
  )
  GROUP BY p.d
)
SELECT dim, n,
       round(CAST(s AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE), 6) AS mean,
       CASE WHEN n > 1
            THEN round((CAST(sq AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                          / CAST(n AS DOUBLE))
                       / (CAST(n AS DOUBLE) - 1.0)
                       / 1000000.0 / 1000000.0, 6)
       END AS variance
FROM per_dim
"""


@query(
    "embedding_dim_variance",
    sql=_DIMVAR_SQL,
    tags=("similarity", "embeddings", "audit"),
)
def embedding_dim_variance(spark, sf_dir):
    """Per-dimension mean and variance across the embedding corpus — see
    block comment for the quantized one-scan design."""
    emb = read_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "x"
        )
    ).select(
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.floor(F.col("x") * 1000000.0 + F.lit(0.5)).cast("long").alias("v"),
    )
    per_dim = exploded.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(
            F.col("v").cast("decimal(38,0)") * F.col("v").cast("decimal(38,0)")
        ).alias("sq"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    return per_dim.select(
        "dim",
        "n",
        F.round(sd / 1000000.0 / nd, 6).alias("mean"),
        F.when(
            F.col("n") > 1,
            F.round(
                (F.col("sq").cast("double") - sd * sd / nd)
                / (nd - F.lit(1.0))
                / 1000000.0
                / 1000000.0,
                6,
            ),
        ).alias("variance"),
    )


# --- cosine radius (range) search -------------------------------------------
# The OTHER retrieval primitive: "every vector at least this similar",
# not "the k most similar" — the shape behind near-duplicate sweeps with
# a semantic threshold and recall-oriented retrieval.  The result SET is
# defined on the ROUNDED similarity (>= tau after round-6), so both
# engines keep exactly the same rows; brute force with a broadcast
# 5-vector query side is the documented rescoring baseline, and the
# sign-LSH bucket join is the same scale path as the top-k family.

_RANGE_TAU = 0.25

_DUCK_RANGE_SEARCH = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round({_COS}, 6) AS cosine_sim
  FROM v a JOIN v b ON a.vec_id < 5 AND b.vec_id != a.vec_id
)
SELECT query_id, neighbor_id, cosine_sim
FROM sims WHERE cosine_sim >= {_RANGE_TAU}
"""


@query("ann_range_search", sql=_DUCK_RANGE_SEARCH, tags=("similarity", "ann"))
def ann_range_search(spark, sf_dir):
    """Exact cosine radius search (cos >= 0.25) for query vectors
    vec_id in [0,5) — see block comment."""
    emb = read_table(spark, sf_dir, "embeddings")
    return S.range_search(emb, emb.where(F.col("vec_id") < 5), _RANGE_TAU)


# --- Fisher (ANOVA-F) class separability per dimension ------------------------
# Which embedding dimensions actually separate the labels?  One-way
# ANOVA per dimension: F = [SSB/(k-1)] / [SSW/(N-k)] over the label
# groups.  Same distributed shape as the centroid/dim-variance audits
# (ONE quantized posexplode -> (label, dim) moments); per-dim totals
# join back so each label's SSB/SSW term is computed exactly, then the
# 10-label term sums ride the 1e-9 BIGINT grid (quantize-before-sum —
# the order-insensitive float-reduction rule).  Output is 64 rows.

_FISHER_SQL = """
WITH per AS (
  SELECT label, CAST(p.d AS BIGINT) AS dim,
         CAST(count(*) AS BIGINT) AS n_l,
         CAST(sum(p.v) AS BIGINT) AS s_l,
         sum(p.v * p.v) AS sq_l
  FROM (
    SELECT label,
           unnest(list_transform(embedding, (x, i) ->
             {'d': i, 'v': CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                                AS BIGINT)})) AS p
    FROM embeddings
  )
  GROUP BY label, p.d
),
tot AS (
  SELECT dim,
         CAST(sum(n_l) AS BIGINT) AS n,
         CAST(sum(s_l) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS k
  FROM per GROUP BY dim
),
terms AS (
  SELECT p.dim, t.n, t.k,
         CAST(floor(CAST(p.n_l AS DOUBLE)
                    * (CAST(p.s_l AS DOUBLE) / 1000000.0
                         / CAST(p.n_l AS DOUBLE)
                       - CAST(t.s AS DOUBLE) / 1000000.0
                         / CAST(t.n AS DOUBLE))
                    * (CAST(p.s_l AS DOUBLE) / 1000000.0
                         / CAST(p.n_l AS DOUBLE)
                       - CAST(t.s AS DOUBLE) / 1000000.0
                         / CAST(t.n AS DOUBLE))
                    * 1000000000.0 + 0.5) AS BIGINT) AS ssb_q,
         CAST(floor((CAST(p.sq_l AS DOUBLE)
                     - CAST(p.s_l AS DOUBLE) * CAST(p.s_l AS DOUBLE)
                       / CAST(p.n_l AS DOUBLE))
                    / 1000000.0 / 1000000.0
                    * 1000000000.0 + 0.5) AS BIGINT) AS ssw_q
  FROM per p JOIN tot t ON p.dim = t.dim
)
SELECT dim,
       round(CAST(sum(ssb_q) AS DOUBLE) / 1000000000.0, 6) AS between_ss,
       round(CAST(sum(ssw_q) AS DOUBLE) / 1000000000.0, 6) AS within_ss,
       CASE WHEN min(k) > 1 AND min(n) > min(k) AND sum(ssw_q) > 0
            THEN round((CAST(sum(ssb_q) AS DOUBLE)
                        / (CAST(min(k) AS DOUBLE) - 1.0))
                       / (CAST(sum(ssw_q) AS DOUBLE)
                          / (CAST(min(n) AS DOUBLE)
                             - CAST(min(k) AS DOUBLE))), 6)
       END AS f_stat
FROM terms GROUP BY dim
"""


@query(
    "embedding_fisher_separability",
    sql=_FISHER_SQL,
    tags=("similarity", "embeddings", "audit", "stats"),
)
def embedding_fisher_separability(spark, sf_dir):
    """Per-dimension one-way ANOVA F of the embedding labels — see block
    comment."""
    emb = read_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "x"
        ),
    ).select(
        "label",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.floor(F.col("x") * 1000000.0 + F.lit(0.5)).cast("long").alias("v"),
    )
    per = exploded.groupBy("label", "dim").agg(
        F.count("*").cast("long").alias("n_l"),
        F.sum("v").cast("long").alias("s_l"),
        F.sum(
            F.col("v").cast("decimal(38,0)") * F.col("v").cast("decimal(38,0)")
        ).alias("sq_l"),
    )
    tot = per.groupBy("dim").agg(
        F.sum("n_l").cast("long").alias("n"),
        F.sum("s_l").cast("long").alias("s"),
        F.count("*").cast("long").alias("k"),
    )
    nld = F.col("n_l").cast("double")
    mu_l = F.col("s_l").cast("double") / 1000000.0 / nld
    mu = F.col("s").cast("double") / 1000000.0 / F.col("n").cast("double")
    ssb_q = F.floor(
        nld * (mu_l - mu) * (mu_l - mu) * 1000000000.0 + F.lit(0.5)
    ).cast("long")
    ssw_q = F.floor(
        (
            F.col("sq_l").cast("double")
            - F.col("s_l").cast("double") * F.col("s_l").cast("double") / nld
        )
        / 1000000.0
        / 1000000.0
        * 1000000000.0
        + F.lit(0.5)
    ).cast("long")
    terms = per.join(tot, "dim").select(
        "dim", "n", "k", ssb_q.alias("ssb_q"), ssw_q.alias("ssw_q")
    )
    kd = F.min("k").cast("double")
    ndd = F.min("n").cast("double")
    return terms.groupBy("dim").agg(
        F.round(F.sum("ssb_q").cast("double") / 1000000000.0, 6).alias(
            "between_ss"
        ),
        F.round(F.sum("ssw_q").cast("double") / 1000000000.0, 6).alias(
            "within_ss"
        ),
        F.when(
            (F.min("k") > 1)
            & (F.min("n") > F.min("k"))
            & (F.sum("ssw_q") > 0),
            F.round(
                (F.sum("ssb_q").cast("double") / (kd - F.lit(1.0)))
                / (F.sum("ssw_q").cast("double") / (ndd - kd)),
                6,
            ),
        ).alias("f_stat"),
    )


# --- embedding norm outlier audit -------------------------------------------
# Degenerate embeddings (collapsed to near-zero, or exploded by a bad
# normalization batch) show up as L2-norm outliers before they show up in
# any downstream recall metric.  Per label: exact norm moments and a
# 3-sigma outlier count.  Determinism chain: the norm is an order-exact
# fold of squares (the embedding_l2_normalize rule — identical sequential
# IEEE ops, sqrt correctly rounded), quantized once onto the 1e-6 BIGINT
# grid; first/second moments are exact integers (the second widened
# DECIMAL(38,0) ↔ HUGEINT → one DOUBLE cast, round-7 rule); the 3-sigma
# threshold is the SAME double expression computed from those exact
# integers on both engines, so the per-vector comparison can never flip
# (mirrored-operand rule), and sqrt's argument is clamped at 0 against
# cancellation.  Scale: one map pass + label-keyed aggregates; the stats
# join back is broadcast (labels are few).

_NORM_OUT_SQL = """
WITH q AS (
  SELECT label,
         CAST(floor(sqrt(list_reduce(
                 list_transform(embedding::DOUBLE[], x -> x * x),
                 (a, b) -> a + b)) * 1000000.0 + 0.5) AS BIGINT) AS qn
  FROM embeddings
),
stats AS (
  SELECT label,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qn) AS BIGINT) AS s,
         CAST(sum(CAST(qn AS HUGEINT) * qn) AS DOUBLE) AS sq
  FROM q GROUP BY label
)
SELECT CAST(st.label AS BIGINT) AS label,
       st.n AS n_vecs,
       round(CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE) / 1000000.0, 6)
         AS mean_norm,
       CASE WHEN st.n > 1 THEN
         round(sqrt(greatest(
                 (st.sq - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE)
                          / CAST(st.n AS DOUBLE))
                 / (CAST(st.n AS DOUBLE) - 1.0), 0.0)) / 1000000.0, 6)
       END AS std_norm,
       CAST(count(CASE WHEN st.n > 1 AND CAST(q.qn AS DOUBLE)
                    > CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE)
                      + 3.0 * sqrt(greatest(
                          (st.sq - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE)
                                   / CAST(st.n AS DOUBLE))
                          / (CAST(st.n AS DOUBLE) - 1.0), 0.0))
                  THEN 1 END) AS BIGINT) AS n_outliers
FROM q JOIN stats st ON q.label = st.label
GROUP BY st.label, st.n, st.s, st.sq
"""


@query("embedding_norm_outliers", sql=_NORM_OUT_SQL, tags=("embedding", "quality"))
def embedding_norm_outliers(spark, sf_dir):
    """Per-label L2-norm moments + 3-sigma outlier count — see block
    comment."""
    emb = read_table(spark, sf_dir, "embeddings")
    sq_fold = F.aggregate(
        F.transform(F.col("embedding").cast("array<double>"), lambda x: x * x),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    q = emb.select(
        "label",
        F.floor(F.sqrt(sq_fold) * 1000000.0 + F.lit(0.5))
        .cast("long")
        .alias("qn"),
    )
    stats = q.groupBy("label").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("qn").cast("long").alias("s"),
        F.sum(F.col("qn").cast("decimal(38,0)") * F.col("qn"))
        .cast("double")
        .alias("sq"),
    )
    j = q.join(F.broadcast(stats), "label")
    nd = F.col("n").cast("double")
    sd_ = F.col("s").cast("double")
    var = F.greatest(
        (F.col("sq") - sd_ * sd_ / nd) / (nd - F.lit(1.0)), F.lit(0.0)
    )
    thresh = sd_ / nd + F.lit(3.0) * F.sqrt(var)
    return j.groupBy(
        F.col("label").cast("long").alias("label"), "n", "s", "sq"
    ).agg(
        F.max("n").cast("long").alias("n_vecs"),
        F.round(F.max(sd_ / nd / F.lit(1000000.0)), 6).alias("mean_norm"),
        F.max(
            F.when(
                F.col("n") > 1,
                F.round(F.sqrt(var) / F.lit(1000000.0), 6),
            )
        ).alias("std_norm"),
        F.count(
            F.when(
                (F.col("n") > 1) & (F.col("qn").cast("double") > thresh), 1
            )
        )
        .cast("long")
        .alias("n_outliers"),
    ).drop("n", "s", "sq")


# --- IVF nprobe → recall tuning curve ----------------------------------------
# The production ANN knob: how many inverted lists must a query probe
# before recall is acceptable?  One row per nprobe ∈ {1, 2, 4, 8} with
# the MEAN Recall@10 over the query set against the exact brute-force
# top-10 — the curve that picks the latency/recall trade-off before a
# deploy.  Everything reuses the pinned-centroid machinery
# (ann_ivf_topk): list assignment and probe ranking are computed ONCE
# and shared across the four probe depths; recall is exact integer hit
# counts with one final division.  Scale: candidate volume per query is
# probes × list size — the sweep multiplies query-side work only, never
# the corpus shuffles.

_NPROBE_SWEEP = (1, 2, 4, 8)


def _nprobe_branch(n: int) -> str:
    return f"""
  SELECT CAST({n} AS BIGINT) AS nprobe,
         CAST(count(DISTINCT b.query_id) AS BIGINT) AS n_queries,
         CAST(count(i.neighbor_id) AS BIGINT) AS total_hits,
         CAST(count(i.neighbor_id) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS mean_recall_at_10
  FROM brute b LEFT JOIN (
    SELECT query_id, neighbor_id FROM (
      SELECT s.*, row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM (
        SELECT a.vec_id AS query_id, b2.vec_id AS neighbor_id,
               round({_COS.replace('b.v', 'b2.v')}, 6) AS cosine_sim
        FROM (SELECT vec_id, list_id FROM ranked_d
              WHERE rn <= {n} AND vec_id < 5) p
        JOIN v a ON a.vec_id = p.vec_id
        JOIN assign s2 ON s2.list_id = p.list_id
        JOIN v b2 ON b2.vec_id = s2.vec_id
        WHERE b2.vec_id != a.vec_id
      ) s
    ) WHERE rank <= 10
  ) i ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
"""


_NPROBE_CURVE_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT * FROM (VALUES
    {_CENT_VALUES}) AS t(i, c)),
dists AS (
  SELECT v.vec_id, cent.i, {duck_l2sq("v.v", "cent.c")} AS d
  FROM v CROSS JOIN cent
),
ranked_d AS (
  SELECT vec_id, i AS list_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY d, i) AS rn
  FROM dists
),
assign AS (SELECT vec_id, list_id FROM ranked_d WHERE rn = 1),
brute AS ({_DUCK_BRUTE_TOPK.strip()})
{" UNION ALL ".join(_nprobe_branch(n) for n in _NPROBE_SWEEP)}
"""


@query(
    "ann_ivf_nprobe_recall_curve",
    sql=_NPROBE_CURVE_SQL,
    tags=("similarity", "ann", "tuning"),
)
def ann_ivf_nprobe_recall_curve(spark, sf_dir):
    """Mean Recall@10 per IVF probe depth (nprobe ∈ 1,2,4,8) — see block
    comment.

    Single-DAG sweep: candidates are scored ONCE at the maximum probe
    depth with the probe RANK that admitted each one (a corpus vector
    lives in exactly one list, so the depth-n candidate set is exactly
    `probe_rank <= n`), then replicated across the four depths in-plan
    and cut by one (query, depth)-partitioned window — one cosine pass,
    one window, one brute join, instead of four full IVF pipelines
    (9.3 s → 4.8 s at sf0.1; the once-remaining centroid-literal plan
    overhead is gone since the r16 move to the broadcast-data
    assignment)."""
    from ..functions.vector import as_double, cosine
    from ..operators.similarity import with_centroid_assignment

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    brute = S.brute_force_topk(emb, q, k=10).select("query_id", "neighbor_id")
    max_probe = max(_NPROBE_SWEEP)
    probes = with_centroid_assignment(
        q.select(
            F.col("vec_id").alias("query_id"),
            as_double("embedding").alias("__qv"),
        ),
        F.col("__qv"),
        IVF_CENTROIDS,
        "__probes",
        nprobe=max_probe,
    ).select(
        "query_id",
        "__qv",
        F.posexplode("__probes").alias("__pos", "list_id"),
    ).select(
        "query_id", "__qv", "list_id",
        (F.col("__pos") + 1).alias("probe_rank"),
    )
    corpus = with_centroid_assignment(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            as_double("embedding").alias("__cv"),
        ),
        F.col("__cv"),
        IVF_CENTROIDS,
        "list_id",
    )
    cand = (
        F.broadcast(probes)
        .join(corpus, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "probe_rank",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias(
                "cosine_sim"
            ),
        )
    )
    depths = F.array(*[F.lit(n) for n in _NPROBE_SWEEP])
    per_depth = cand.select(
        "*", F.explode(depths).alias("nprobe")
    ).where(F.col("probe_rank") <= F.col("nprobe"))
    from pyspark.sql import Window

    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("cosine_sim"), "neighbor_id"
    )
    topk = (
        per_depth.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= 10)
        .select(
            F.col("nprobe").cast("long").alias("nprobe"),
            "query_id",
            "neighbor_id",
            F.lit(1).alias("__hit"),
        )
    )
    grid = brute.crossJoin(
        spark.createDataFrame([(n,) for n in _NPROBE_SWEEP], "nprobe long")
    )
    return (
        grid.join(topk, ["nprobe", "query_id", "neighbor_id"], "left")
        .groupBy("nprobe")
        .agg(
            F.countDistinct("query_id").alias("n_queries"),
            F.count("__hit").cast("long").alias("total_hits"),
            (F.count("__hit").cast("double") / F.count("*").cast("double"))
            .alias("mean_recall_at_10"),
        )
    )


# --- embedding anisotropy audit ---------------------------------------------
# Ethayarajh-style anisotropy: contextual/learned embedding spaces often
# collapse into a narrow cone, making raw cosine uninformative.  The two
# standard per-label diagnostics, both computable in ONE pass without any
# pair scan: ||mean direction|| (length of the average unit vector, 0 =
# isotropic, 1 = fully collapsed) and the average pairwise cosine, exactly
# recovered from the identity  ||Σx̂||² = Σ||x̂||² + 2·Σ_{i<j} x̂ᵢ·x̂ⱼ  —
# so the N² pair sum falls out of a d-dimensional component sum.  At
# 100 TB this is a map + one (label, dim)-keyed aggregate; nothing scales
# with pairs.  Determinism: components of each unit vector are
# micro-quantized to BIGINT (floor(x·1e6 + .5)); all sums exact
# (DECIMAL(38,0) for the squared totals); divisions at the end.

_ANISO_SQL = """
WITH base AS (
  SELECT vec_id, label,
         embedding AS e,
         sqrt(list_sum(list_transform(embedding,
                                      x -> CAST(x AS DOUBLE) * x))) AS nrm
  FROM embeddings
),
q AS (
  SELECT vec_id, label,
         list_transform(e, x -> CAST(floor(CAST(x AS DOUBLE) / nrm
                                           * 1000000.0 + 0.5) AS BIGINT)) AS qv
  FROM base WHERE nrm > 0
),
self_sq AS (
  SELECT label,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(list_sum(list_transform(qv, c -> c * c)))
              AS DECIMAL(38,0)) AS self_q
  FROM q GROUP BY label
),
comps AS (
  SELECT label, i AS pos, CAST(sum(qv[i]) AS BIGINT) AS s
  FROM q, LATERAL unnest(generate_series(1, len(qv))) AS t(i)
  GROUP BY label, i
),
tot AS (
  SELECT label, CAST(sum(CAST(s AS DECIMAL(38,0)) * s) AS DOUBLE) AS s2
  FROM comps GROUP BY label
)
SELECT CAST(a.label AS BIGINT) AS label,
       a.n AS n_vecs,
       round(sqrt(t.s2) / CAST(a.n AS DOUBLE) / 1000000.0, 6)
         AS mean_direction_norm,
       CASE WHEN a.n > 1
            THEN round((t.s2 - CAST(a.self_q AS DOUBLE))
                       / 1000000000000.0
                       / (CAST(a.n AS DOUBLE) * CAST(a.n - 1 AS DOUBLE)), 6)
       END AS avg_pairwise_cosine
FROM self_sq a JOIN tot t ON a.label = t.label
"""


@query(
    "embedding_anisotropy_audit",
    sql=_ANISO_SQL,
    tags=("embedding", "audit", "anisotropy"),
)
def embedding_anisotropy_audit(spark, sf_dir):
    """Per-label anisotropy diagnostics (mean-direction norm + exact
    average pairwise cosine WITHOUT a pair scan) — see block comment.

    r17 (guide §4.2): the per-row norm fold + quantize transform +
    self-dot fold (three interpreted HOF chains over the corpus) and the
    corpus×d posexplode are replaced by ONE vectorized Arrow kernel
    emitting per-(batch, label) integer partials
    (``operators.embeddings.aniso_label_partials``); the quantized grid
    makes every reduced quantity an exact integer, so partial
    aggregation order cannot change any total and the final rows are
    bit-identical to the HOF form (oracle-checked)."""
    from ..operators.embeddings import aniso_label_partials

    emb = read_table(spark, sf_dir, "embeddings")
    part = aniso_label_partials(
        emb.select("label", F.col("embedding").cast("array<double>").alias("e"))
    )
    self_sq = part.groupBy("label").agg(
        F.sum("n").cast("long").alias("n"),
        # cast to decimal(38,0) BEFORE the cross-batch fold: per-batch
        # partials fit int64 (kernel contract) but corpus totals are
        # <= rows * d * 10^12, past int64 at ~140k rows/label, while
        # DuckDB silently widens sum(BIGINT) to HUGEINT (ADVICE r10).
        F.sum(F.col("self_q").cast("decimal(38,0)")).alias("self_q"),
    )
    comps = (
        part.select("label", F.posexplode("comps").alias("pos", "qc"))
        .groupBy("label", "pos")
        .agg(F.sum("qc").cast("long").alias("s"))
    )
    tot = comps.groupBy("label").agg(
        F.sum(F.col("s").cast("decimal(38,0)") * F.col("s"))
        .cast("double")
        .alias("s2")
    )
    j = self_sq.join(tot, "label")
    nd = F.col("n").cast("double")
    return j.select(
        F.col("label").cast("long").alias("label"),
        F.col("n").alias("n_vecs"),
        F.round(F.sqrt(F.col("s2")) / nd / 1000000.0, 6).alias(
            "mean_direction_norm"
        ),
        F.when(
            F.col("n") > 1,
            F.round(
                (F.col("s2") - F.col("self_q").cast("double"))
                / 1000000000000.0
                / (nd * (nd - F.lit(1.0))),
                6,
            ),
        ).alias("avg_pairwise_cosine"),
    )
