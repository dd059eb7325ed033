"""Dedup query registrations (SURVEY §7.1 stage 5 / BASELINE.json north star).

Oracle-checkable ones mirror the Spark expression tree in DuckDB SQL
(same tokenization, same shingles, same anchors, same thresholds).
Hash-based ones (MinHash, SimHash — xxhash64 has no DuckDB equivalent)
register rows-only and are property-tested in tests/test_dedup.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..operators import dedup as D
from ..operators.text import normalized_fingerprint
from ..registry import query
from ..sources import index_scratch_dir, read_table
from ._duck import hash60 as _duck_hash60

# Shared DuckDB CTE: tokenize + 3-gram shingle exactly like operators.dedup
_DUCK_SHINGLES = r"""
toks AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                        for i in range(1, len(t) - 1)]) AS s
  FROM toks WHERE len(t) >= 3
)
"""

_DUCK_ANCHOR_PAIRS = f"""
WITH {_DUCK_SHINGLES},
anchors AS (
  SELECT doc_id, s, unnest([list_aggregate(s, 'min'), list_aggregate(s, 'max')]) AS anchor
  FROM sh
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
  FROM anchors a JOIN anchors b ON a.anchor = b.anchor AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       round(len(list_intersect(sa, sb))::DOUBLE
             / len(list_distinct(list_concat(sa, sb))), 6) AS jaccard_sim
FROM cand
WHERE len(list_intersect(sa, sb))::DOUBLE
      / len(list_distinct(list_concat(sa, sb))) >= 0.5
"""


def _anchor_blocked_pairs(spark, sf_dir, threshold=0.5):
    """Spark side of the anchor-shingle-blocked exact-Jaccard pipeline."""
    docs = read_table(spark, sf_dir, "documents")
    sh = D.shingled(docs, "doc_id", "text", 3)
    anchors = sh.select(
        "doc_id",
        "shingle_set",
        F.explode(
            F.array(F.array_min("shingle_set"), F.array_max("shingle_set"))
        ).alias("anchor"),
    )
    a = anchors.select(
        F.col("doc_id").alias("id_a"), F.col("shingle_set").alias("sa"), "anchor"
    )
    b = anchors.select(
        F.col("doc_id").alias("id_b"), F.col("shingle_set").alias("sb"), "anchor"
    )
    cand = (
        a.join(b, "anchor")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sa", "sb")
        .distinct()
    )
    jac = D.jaccard(F.col("sa"), F.col("sb"))
    return cand.select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard_sim"), jac.alias("__raw")
    ).where(F.col("__raw") >= threshold).drop("__raw")


@query(
    "dedup_exact_fingerprint",
    sql="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text || '  .' AS text
      FROM documents WHERE doc_id % 7 = 0
    )
    SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
           min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM corpus
    GROUP BY 1
    """,
    tags=("dedup", "exact"),
)
def dedup_exact_fingerprint(spark, sf_dir):
    """Exact dedup by normalized-content fingerprint (hash-groupBy).  The
    fixture has no raw duplicates, so the query injects whitespace/punct
    variants of every 7th doc and the fingerprint must collapse them:
    n_copies=2 groups are the planted dups.  Map-side partial agg on the
    md5 key → one shuffle, fully scalable."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    variants = (
        docs.where(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit("  .")).alias("text"))
    )
    corpus = docs.unionByName(variants)
    return (
        corpus.groupBy(normalized_fingerprint(F.col("text")).alias("fingerprint"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


@query("dedup_ngram_jaccard", sql=_DUCK_ANCHOR_PAIRS, tags=("dedup", "jaccard"))
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard near-dup pairs with deterministic
    anchor-shingle blocking (min + max shingle as candidate keys — a
    degenerate but fully engine-mirrorable LSH; a j≈0.99 pair shares an
    anchor with p≈0.98 per anchor).  One equi-join shuffle on the anchor;
    no quadratic blow-up."""
    return _anchor_blocked_pairs(spark, sf_dir, threshold=0.5)


@query("dedup_minhash_lsh", sql=_DUCK_ANCHOR_PAIRS, tags=("dedup", "minhash", "lsh"))
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(k=64) + LSH(16 bands × 4 rows) near-dup pairs, exact-Jaccard
    verified at ≥0.5.  The LSH candidate stage isn't DuckDB-mirrorable
    (xxhash64), but because candidates are *verified* with exact Jaccard,
    the output equals the exact near-dup pair set whenever LSH recall is
    total — which holds deterministically on the fixtures (verified equal
    at sf0.001 and sf0.01 against the anchor-blocked exact oracle).  At a
    0.98-Jaccard pair, P[miss] = (1-0.98^4)^16 ≈ 1e-9 per pair."""
    docs = read_table(spark, sf_dir, "documents")
    out = D.minhash_near_duplicates(
        docs, "doc_id", "text", n=3, k=64, bands=16, threshold=0.5
    )
    return out.select("id_a", "id_b", F.round("jaccard_sim", 6).alias("jaccard_sim"))


_DUCK_CLUSTERS = f"""
WITH RECURSIVE
{_DUCK_SHINGLES},
anchors AS (
  SELECT doc_id, s, unnest([list_aggregate(s, 'min'), list_aggregate(s, 'max')]) AS anchor
  FROM sh
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
  FROM anchors a JOIN anchors b ON a.anchor = b.anchor AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT id_a, id_b FROM cand
  WHERE len(list_intersect(sa, sb))::DOUBLE
        / len(list_distinct(list_concat(sa, sb))) >= 0.5
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
  UNION SELECT doc_id, doc_id FROM documents
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
)
SELECT c.doc_id, c.cluster_id,
       count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
       CAST(c.doc_id = c.cluster_id AS BIGINT) AS is_canonical
FROM comp c
"""


@query("dedup_clusters", sql=_DUCK_CLUSTERS, tags=("dedup", "clustering", "iterative"))
def dedup_clusters_query(spark, sf_dir):
    """Near-dup clustering: MinHash-LSH verified pairs → iterative
    min-label connected components (driver-loop with localCheckpoint
    lineage cuts — the genuinely non-single-SQL-pass operator; the oracle
    uses a recursive-CTE transitive closure over the mirrorable exact pair
    set).  Output marks the canonical survivor per cluster."""
    from ..operators.clusters import dedup_clusters as _dc

    docs = read_table(spark, sf_dir, "documents")
    pairs = D.minhash_near_duplicates(
        docs, "doc_id", "text", n=3, k=64, bands=16, threshold=0.5
    )
    return _dc(docs, pairs)


@query("dedup_simhash", sql=None, tags=("dedup", "simhash"))
def dedup_simhash(spark, sf_dir):
    """SimHash-64 near-dup pairs (Hamming ≤ 8 via 16-bit chunk banding).
    xxhash64-based fast path → rows-only; property tests assert planted
    near-dups are recovered.  ``dedup_simhash_pairs`` runs the same
    pipeline over an engine-portable hash and is fully oracle-checked."""
    docs = read_table(spark, sf_dir, "documents")
    return D.simhash_near_duplicates(docs, "doc_id", "text", max_hamming=8)


# DuckDB mirror of the md5-60-bit SimHash pipeline: portable hash via the
# shared hash60 fragment (plans/_duck.py), per-bit sign majority, 4×15-bit
# banding, bit_count(xor) Hamming verify.
_DUCK_SIMHASH = f"""
WITH {_DUCK_SHINGLES},
hashed AS (
  SELECT doc_id,
         [ {_duck_hash60("g")} for g in s ] AS hs
  FROM sh WHERE len(s) > 0
),
fp AS (
  SELECT doc_id,
    list_sum([CASE WHEN 2*list_sum([(h >> b) & 1 for h in hs]) > len(hs)
              THEN (1::BIGINT << b) ELSE 0 END for b in range(0, 60)])::BIGINT
      AS fingerprint
  FROM hashed
),
banded AS (
  SELECT doc_id, fingerprint, t.b AS band,
         ((fingerprint >> (t.b*15)) & 32767)::BIGINT AS chunk
  FROM fp, (SELECT unnest(range(0, 4)) AS b) t
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.fingerprint, b.fingerprint))::BIGINT AS hamming
FROM banded a
JOIN banded b ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 8
"""


@query("dedup_simhash_pairs", sql=_DUCK_SIMHASH, tags=("dedup", "simhash"))
def dedup_simhash_pairs(spark, sf_dir):
    """Oracle-checked SimHash near-dup pairs: identical banding + Hamming
    pipeline to ``dedup_simhash`` but over the engine-portable 60-bit
    md5 hash (``md5_hash60``), so fingerprints, candidate buckets, and the
    final pair set are bit-identical across Spark and DuckDB.  Proves the
    *pipeline* (sign-majority fingerprint → 15-bit chunk banding →
    bucket equi-join → bit_count(xor) filter) hash-exactly; the xxhash64
    variant swaps only the leaf hash."""
    docs = read_table(spark, sf_dir, "documents")
    out = D.simhash_near_duplicates(
        docs, "doc_id", "text", max_hamming=8,
        band_bits=15, hash_fn=D.md5_hash60, bits=60,
    )
    return out.select("id_a", "id_b", "hamming")


# Incremental (batch-vs-index) dedup: the daily-crawl shape — new docs are
# checked against the already-indexed corpus' fingerprints and against each
# other, WITHOUT re-deduplicating the whole corpus.  Index = doc_id < 250;
# batch = the rest plus planted whitespace variants of every 7th index doc
# (so real cross-boundary dups exist in the fixture).
_DUCK_INCREMENTAL = """
WITH index_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 250
),
batch_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id >= 250
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || '  .' AS text
  FROM documents WHERE doc_id < 250 AND doc_id % 7 = 0
),
index_fp AS (
  SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
         min(doc_id) AS idx_keep
  FROM index_docs GROUP BY 1
),
batch_fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
  FROM batch_docs
),
classified AS (
  SELECT b.doc_id, b.fp, i.idx_keep,
         min(b.doc_id) OVER (PARTITION BY b.fp) AS first_in_batch
  FROM batch_fp b LEFT JOIN index_fp i ON b.fp = i.fp
)
SELECT doc_id,
       CASE WHEN idx_keep IS NOT NULL THEN 'dup_of_index'
            WHEN doc_id > first_in_batch THEN 'dup_in_batch'
            ELSE 'unique' END AS status,
       CASE WHEN idx_keep IS NOT NULL THEN idx_keep
            WHEN doc_id > first_in_batch THEN first_in_batch END AS keep_id
FROM classified
"""


@query("dedup_incremental_batch", sql=_DUCK_INCREMENTAL, tags=("dedup", "incremental"))
def dedup_incremental_batch(spark, sf_dir):
    """Incremental dedup (index + new batch): each batch doc is classified
    dup_of_index / dup_in_batch / unique by normalized fingerprint — one
    fingerprint aggregation over the index, one fp-keyed left join, one
    fp-partitioned window over the batch.  At 100 TB the index fingerprint
    table is the persisted artifact; daily batches join against it instead
    of re-deduplicating the corpus (cost scales with the batch, not the
    corpus)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    index_docs = docs.where(F.col("doc_id") < 250)
    variants = (
        docs.where((F.col("doc_id") < 250) & (F.col("doc_id") % 7 == 0))
        .select((F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit("  .")).alias("text"))
    )
    batch_docs = docs.where(F.col("doc_id") >= 250).unionByName(variants)

    fp = normalized_fingerprint(F.col("text"))
    index_fp = index_docs.groupBy(fp.alias("fp")).agg(
        F.min("doc_id").alias("idx_keep")
    )
    batch_fp = batch_docs.select("doc_id", fp.alias("fp"))

    from pyspark.sql import Window

    w = Window.partitionBy("fp")
    classified = (
        batch_fp.join(index_fp, "fp", "left")
        .withColumn("first_in_batch", F.min("doc_id").over(w))
    )
    return classified.select(
        "doc_id",
        F.when(F.col("idx_keep").isNotNull(), F.lit("dup_of_index"))
        .when(F.col("doc_id") > F.col("first_in_batch"), F.lit("dup_in_batch"))
        .otherwise(F.lit("unique"))
        .alias("status"),
        F.when(F.col("idx_keep").isNotNull(), F.col("idx_keep"))
        .when(F.col("doc_id") > F.col("first_in_batch"), F.col("first_in_batch"))
        .alias("keep_id"),
    )


# Benchmark decontamination: the standard LLM-pipeline step — flag corpus
# documents sharing any 13-gram with a held-out benchmark set (stand-in
# here: every 31st doc plays the benchmark).  Shingle both sides, inner
# semi-join on the shingle — one equi-join shuffle on shingle strings; at
# 100 TB hash the shingles first (map-only) so the shuffle carries 8-byte
# keys, and broadcast the benchmark side (benchmarks are tiny).
_N_CONTAM = 13

_DUCK_CONTAM = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i : i + {_N_CONTAM} - 1], ' ')
                        for i in range(1, len(t) - {_N_CONTAM} + 2)]) AS g
  FROM toks WHERE len(t) >= {_N_CONTAM}
),
bench AS (
  SELECT unnest(g) AS gram FROM grams WHERE doc_id % 31 = 0
),
corpus AS (
  SELECT doc_id, unnest(g) AS gram FROM grams WHERE doc_id % 31 != 0
)
SELECT DISTINCT c.doc_id,
       CAST(1 AS BIGINT) AS contaminated
FROM corpus c JOIN bench b ON c.gram = b.gram
"""


@query("decontaminate_benchmark_ngrams", sql=_DUCK_CONTAM, tags=("dedup", "decontamination"))
def decontaminate_benchmark_ngrams(spark, sf_dir):
    """Train/benchmark decontamination: corpus docs sharing any
    13-gram with the benchmark set are flagged for removal (the
    standard n-gram-collision check).  Distinct shingles per doc →
    semi-join-shaped inner join on the gram → distinct doc ids.  One
    equi-join shuffle; the benchmark side is broadcast-sized in
    production."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    grams = D.shingled(docs, "doc_id", "text", _N_CONTAM).select(
        "doc_id", F.explode("shingle_set").alias("gram")
    )
    bench = grams.where(F.col("doc_id") % 31 == 0).select("gram").distinct()
    corpus = grams.where(F.col("doc_id") % 31 != 0)
    return (
        corpus.join(F.broadcast(bench), "gram")
        .select("doc_id")
        .distinct()
        .select("doc_id", F.lit(1).cast("long").alias("contaminated"))
    )


# CDC compaction: the events table read as a changelog keyed by
# (user_id, event_type) — "latest state per key" is THE upsert-log
# compaction every lakehouse MERGE performs internally.
_KEEP_LATEST_SQL = """
WITH ranked AS (
  SELECT user_id, event_type, event_id, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type, event_id AS latest_event_id, value AS latest_value,
       ts_epoch AS latest_ts_epoch
FROM ranked WHERE rn = 1
"""


@query("dedup_keep_latest", sql=_KEEP_LATEST_SQL, tags=("dedup", "cdc", "window"))
def dedup_keep_latest(spark, sf_dir):
    """Changelog compaction (keep-latest-per-key): one row per
    (user_id, event_type) — the newest by (ts, event_id) — exactly what a
    lakehouse MERGE does to an upsert log before applying it.  Distinct
    from the CONTENT-dedup family (fingerprint/MinHash/SimHash dedupe
    equal/near-equal payloads; this dedupes KEY HISTORY).  Plan: one
    shuffle keyed by the compaction key, per-partition sort, rank-1
    filter — Catalyst's WindowGroupLimit pushes the rn=1 predicate into
    the sort so only each group's top row survives the exchange at
    scale.  The (ts DESC, event_id DESC) tie-break keeps the winner —
    and the diff — deterministic."""
    ev = read_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.col("value").alias("latest_value"),
            F.unix_timestamp("ts").cast("long").alias("latest_ts_epoch"),
        )
    )


# --- canonical selection: keep the BEST copy, not the first ---------------
# Production dedup keeps the highest-quality member of each duplicate
# group (longest, cleanest), not min(id): a near-dup crawl snapshot often
# contains one clean copy and N boilerplate-damaged ones.  Same planted
# fingerprint groups as dedup_exact_fingerprint, ranked inside each group
# by the oracle-checked composite quality score (rounded to 6 dp BEFORE
# ranking — determinism.md ordering rule — with doc_id as the tie-break).
# Plan shape: map-only fingerprint+score, ONE hash partition by
# fingerprint for the per-group rank — no global ordering anywhere.

_KEEP_BEST_SQL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || '  .' AS text
  FROM documents WHERE doc_id % 7 = 0
),
scored AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
           AS fingerprint,
         round(least(length(text)::DOUBLE / 500.0, 1.0) * 0.4
               + least(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                       x -> list_contains(['the','a','of','to','and','in','is','it'], x)))::DOUBLE
                       / len(regexp_split_to_array(lower(text), '\\s+')) * 4, 1.0) * 0.3
               + greatest(1.0 - (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
                          / length(text) * 10, 0.0) * 0.3, 6) AS q
  FROM corpus
),
ranked AS (
  SELECT fingerprint, doc_id, q,
         row_number() OVER (PARTITION BY fingerprint ORDER BY q DESC, doc_id)
           AS rn,
         CAST(count(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS n_copies
  FROM scored
)
SELECT fingerprint, CAST(doc_id AS BIGINT) AS keep_id, q AS keep_quality,
       n_copies
FROM ranked WHERE rn = 1
"""


@query("dedup_keep_best_quality", sql=_KEEP_BEST_SQL, tags=("dedup", "quality"))
def dedup_keep_best_quality(spark, sf_dir):
    """Quality-ranked canonical selection per exact-fingerprint duplicate
    group — see block comment."""
    from pyspark.sql import Window

    from ..operators import text as T

    docs = read_table(spark, sf_dir, "documents")
    variants = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit("  .")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(variants)
    toks = T.ws_tokens(F.col("text"))
    scored = corpus.select(
        "doc_id",
        F.md5(
            F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "))
        ).alias("fingerprint"),
        F.round(T.quality_score(F.col("text"), toks), 6).alias("q"),
    )
    w = Window.partitionBy("fingerprint").orderBy(F.desc("q"), "doc_id")
    wc = Window.partitionBy("fingerprint")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count("*").over(wc).cast("long"))
        .where(F.col("rn") == 1)
        .select(
            "fingerprint",
            F.col("doc_id").cast("long").alias("keep_id"),
            F.col("q").alias("keep_quality"),
            "n_copies",
        )
    )


# --- exact-substring duplication via winnowed shingles ---------------------
# Lee et al.'s "Deduplicating Training Data Makes Language Models Better"
# removes exact substrings >= 50 chars shared across documents using a
# suffix array — a structure with no distributed analog.  The Spark-first
# re-expression is winnowing (Schleimer/Wilkerson/Aiken, MOSS): hash every
# dense character 30-gram, slide a window of 10 consecutive positions, and
# keep each window's MINIMUM hash as the fingerprint.  Selection depends
# only on the content inside the window — never on absolute offsets — so
# it is alignment-invariant: any substring of length >= 30 + 10 - 1 = 39
# chars shared by two documents contains a full window of identical grams
# in BOTH docs, whose min hash is the same value; the docs are guaranteed
# to share that fingerprint regardless of where the substring starts.
# (A stride-sampled earlier version only caught overlaps whose offsets
# agreed mod the stride — ADVICE r9 medium.)  Fingerprints are the 60-bit
# portable md5 hash (plans/_duck.hash60 == operators.dedup.md5_hash60) so
# Spark and DuckDB select bit-identical minima.  Per-source report: how
# much of each source's fingerprint mass is duplicated across documents.
# Exact integers + one final division (IEEE-exact).

_SUBSTR_LEN = 30
_WINNOW_W = 10  # guarantee threshold = _SUBSTR_LEN + _WINNOW_W - 1 = 39 chars

_SUBSTR_SQL = f"""
WITH d AS (
  SELECT doc_id, source, lower(text) AS lt
  FROM documents
  WHERE length(text) >= {_SUBSTR_LEN + _WINNOW_W - 1}
),
pos AS (
  SELECT doc_id, source, p,
         {_duck_hash60(f"substr(lt, p, {_SUBSTR_LEN})")} AS h
  FROM d, LATERAL unnest(generate_series(
    1, length(lt) - {_SUBSTR_LEN - 1}, 1)) AS t(p)
),
wins AS (
  SELECT doc_id, source, p,
         min(h) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING)
           AS fp,
         count(*) OVER (PARTITION BY doc_id) AS npos
  FROM pos
),
fps AS (
  SELECT DISTINCT doc_id, source, fp
  FROM wins WHERE p <= npos - {_WINNOW_W - 1}
),
fp_docs AS (
  SELECT fp, CAST(count(*) AS BIGINT) AS n_docs_with
  FROM fps GROUP BY fp
)
SELECT f.source,
       CAST(count(DISTINCT f.doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_fingerprints,
       CAST(count(CASE WHEN g.n_docs_with >= 2 THEN 1 END) AS BIGINT)
         AS n_dup_fingerprints,
       CAST(count(CASE WHEN g.n_docs_with >= 2 THEN 1 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS dup_share
FROM fps f JOIN fp_docs g ON f.fp = g.fp
GROUP BY f.source
"""


def winnow_fingerprints(docs, id_cols=("doc_id", "source")):
    """(*id_cols, fp) winnowed fingerprints of ``docs.text`` — one
    60-bit portable-hash fingerprint per full sliding window of
    ``_WINNOW_W`` dense ``_SUBSTR_LEN``-gram hashes, distinct per doc.
    Alignment-invariance (any shared substring >= 39 chars yields a shared
    fp at ANY pair of offsets) is regression-tested in tests/test_dedup.py.
    All per-doc work is in-map array math: dense gram hashes materialized
    ONCE as a column (determinism.md round-9 re-split lesson — a lambda
    over a non-materialized array recomputes it per element), sliding
    minima via transform+slice+array_min."""
    docs = (
        # need at least one FULL winnowing window of dense grams
        docs.where(F.length("text") >= _SUBSTR_LEN + _WINNOW_W - 1)
        .withColumn("lt", F.lower("text"))
    )
    # The dense-gram md5 kernel is CPU-bound — see spread_if_few_splits
    # for the guard rationale.  Measured 3.1 s -> 0.5 s at sf0.1
    # local[32] when the guard fires.
    docs = D.spread_if_few_splits(docs, "doc_id")
    n_pos = F.length("lt") - F.lit(_SUBSTR_LEN - 1)
    hashed = docs.withColumn(
        "hs",
        F.transform(
            F.sequence(F.lit(1), n_pos),
            lambda i: F.conv(
                F.substring(F.md5(F.col("lt").substr(i, F.lit(_SUBSTR_LEN))), 1, 15),
                16,
                10,
            ).cast("long"),
        ),
    )
    n_wins = F.size("hs") - F.lit(_WINNOW_W - 1)
    fps_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_wins),
            lambda j: F.array_min(F.slice(F.col("hs"), j, _WINNOW_W)),
        )
    )
    return hashed.select(*id_cols, F.explode(fps_arr).alias("fp"))


@query("dedup_exact_substring_shingles", sql=_SUBSTR_SQL, tags=("dedup", "substring"))
def dedup_exact_substring_shingles(spark, sf_dir):
    """Cross-document exact-substring duplication via WINNOWED character
    shingles — see block comment and ``winnow_fingerprints``.
    Reference-class op: training corpora dedup at the substring level, not
    just whole-doc; winnowing is the alignment-invariant linear form of
    that audit (suffix arrays don't distribute).  One gram-partitioned
    window for the cross-doc count above the in-map fingerprint build —
    join-free, <=4 exchanges incl. the helper's guarded CPU-spread
    repartition (pinned in tests/test_plan_pins.py)."""
    from pyspark.sql import Window

    fps = winnow_fingerprints(read_table(spark, sf_dir, "documents"))
    counted = fps.withColumn(
        "n_docs_with",
        F.count("*").over(Window.partitionBy("fp")).cast("long"),
    )
    dup = F.count(F.when(F.col("n_docs_with") >= 2, 1))
    return counted.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").cast("long").alias("n_fingerprints"),
        dup.cast("long").alias("n_dup_fingerprints"),
        (dup.cast("double") / F.count("*").cast("double")).alias("dup_share"),
    )


# --- cross-snapshot dedup against a persisted signature index --------------
# The 100 TB production shape (VERDICT r9 item 7): the fingerprint index is
# a parquet artifact that SURVIVES ingest rounds.  Each new batch is
# (1) signed, (2) deduped within itself, (3) anti-joined against the index
# read back from disk, and (4) the surviving signatures are APPENDED so the
# next batch sees them.  Cost scales with the batch, never the corpus: the
# index side of the anti-join is an equi-join on the fingerprint — at scale
# the index is written bucketed by fp so the per-batch join is co-located
# (shuffle-free on the index side) and a bloom filter on fp prunes index
# buckets the batch never touches.  Output = the UPDATED index with
# provenance, the artifact the next round reads.

_DUCK_SIG_INDEX = """
WITH prior_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
),
batch_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || '  .' AS text
  FROM documents WHERE doc_id % 3 <> 0 AND doc_id % 5 = 0
),
sig_index AS (
  SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
         CAST(min(doc_id) AS BIGINT) AS keep_id
  FROM prior_docs GROUP BY 1
),
batch_sig AS (
  SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
         CAST(min(doc_id) AS BIGINT) AS keep_id
  FROM batch_docs GROUP BY 1
),
new_sigs AS (
  SELECT b.fp, b.keep_id FROM batch_sig b
  WHERE NOT EXISTS (SELECT 1 FROM sig_index i WHERE i.fp = b.fp)
)
SELECT fp, keep_id, 'index' AS origin FROM sig_index
UNION ALL
SELECT fp, keep_id, 'batch' AS origin FROM new_sigs
"""


@query(
    "dedup_against_signature_index",
    sql=_DUCK_SIG_INDEX,
    tags=("dedup", "incremental", "index"),
)
def dedup_against_signature_index(spark, sf_dir):
    """Cross-snapshot dedup-against-index — see block comment.  Differs
    from ``dedup_incremental_batch`` (which classifies a batch against a
    prior BATCH in one plan) in that the signature index is a real
    persisted parquet artifact: built, written to disk, read back, and
    returned UPDATED (index ∪ surviving batch signatures) so it can be
    re-persisted for the next round.  Fixture roles: prior corpus =
    doc_id % 3 != 0; new batch = doc_id % 3 == 0 plus planted
    whitespace-variant copies of every 15th prior doc (doc_id % 5 == 0 of
    the priors), which the anti-join must drop.  Plan: two fp-keyed
    aggregations (map-side combined) + ONE fp equi-anti-join + union —
    reference-class op per Lee et al. incremental corpus dedup."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    fp = normalized_fingerprint(F.col("text"))

    prior = docs.where(F.col("doc_id") % 3 != 0)
    sig_index = prior.groupBy(fp.alias("fp")).agg(
        F.min("doc_id").cast("long").alias("keep_id")
    )

    # persist the index: the artifact a next-round ingest would read.
    # The scratch root is warehouse-derived (driver+executor-shared on a
    # real cluster — see sources.sinks.index_scratch_dir), so the
    # write→read-back round trip is cluster-correct, not local-mode-only.
    idx_path = index_scratch_dir(spark, "signature_index")
    sig_index.write.parquet(idx_path)
    persisted_index = spark.read.parquet(idx_path)

    variants = (
        docs.where((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 5 == 0))
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit("  .")).alias("text"),
        )
    )
    batch = docs.where(F.col("doc_id") % 3 == 0).unionByName(variants)
    batch_sig = batch.groupBy(fp.alias("fp")).agg(
        F.min("doc_id").cast("long").alias("keep_id")
    )

    new_sigs = batch_sig.join(persisted_index, "fp", "left_anti")
    return persisted_index.withColumn("origin", F.lit("index")).unionByName(
        new_sigs.withColumn("origin", F.lit("batch"))
    )


# --- NEAR-dup against a persisted MinHash BAND index ------------------------
# The production 100 TB near-dup shape (VERDICT r10 item 5): where
# ``dedup_against_signature_index`` anti-joins EXACT fingerprints, real
# ingest pipelines persist MinHash *band signatures* so each new batch can
# be checked for NEAR duplicates of the corpus without re-signing it.  The
# index artifact is (band, band_key, doc_id) rows written to parquet (at
# scale: bucketed by (band, band_key) so the per-batch probe is co-located
# and shuffle-free on the index side); each batch is shingled + signed,
# banded the same way, bucket-joined against the read-back index, and the
# candidates are verified with exact Jaccard.  Cost scales with the batch
# and its bucket cohabitants, never the corpus.  Degenerate mega-buckets
# (boilerplate corpora) are bounded the same way as lsh_candidate_pairs'
# max_bucket cap — a df census on band_key drops buckets with df >
# _BANDIDX_MAX_BUCKET from the probe join, identically in both engines
# (a recall trade, inactive at the oracle grades where max df = 2).
#
# Oracle strategy = the ``dedup_simhash_pairs`` pattern: the WHOLE
# pipeline runs on the engine-portable md5-60-bit hash (operators.dedup.
# md5_hash60 == plans/_duck.hash60), with the k=16 affine permutation
# constants generated once (seed 42) and interpolated literally into the
# SQL, so signatures, band keys, candidate buckets, and verified matches
# are bit-identical across Spark and DuckDB — the oracle checks the LSH
# *mechanics*, not just a recall-dependent outcome.  Fixture roles: prior
# corpus = doc_id % 3 != 0; batch = doc_id % 3 == 0 plus planted
# append-tail variants of every 15th doc (near-dup but not exact —
# the exact-fp index would MISS them; this query must flag them).

_BANDIDX_BANDS = 4
_BANDIDX_ROWS = 4
_BANDIDX_K = _BANDIDX_BANDS * _BANDIDX_ROWS
_BANDIDX_PARAMS = D.minhash_params(_BANDIDX_K, seed=42)
_BANDIDX_M = (1 << 31) - 1  # Mersenne 2^31-1: a*h+b < 2^62 stays in int64
_BANDIDX_T = 0.5
# Mega-bucket cap: index buckets with more than this many members are
# dropped from the probe (the lsh_candidate_pairs max_bucket recall
# trade).  Inactive at the oracle grades (max bucket df = 2 at both
# sf0.01 and sf0.001); applied identically in Spark and DuckDB so
# results agree wherever it bites.
_BANDIDX_MAX_BUCKET = 200
_BANDIDX_TAIL = " appended audit note"


def _duck_minhash_mins() -> str:
    return ",\n         ".join(
        f"list_min([(h * {a} + {b}) % {_BANDIDX_M} for h in hs]) AS m{j}"
        for j, (a, b) in enumerate(_BANDIDX_PARAMS)
    )


def _duck_band_rows(sig_cte: str) -> str:
    selects = []
    for bnd in range(_BANDIDX_BANDS):
        key = " || ',' || ".join(
            f"m{bnd * _BANDIDX_ROWS + r}::VARCHAR" for r in range(_BANDIDX_ROWS)
        )
        selects.append(f"SELECT doc_id, {bnd} AS band, {key} AS key FROM {sig_cte}")
    return "\n  UNION ALL ".join(selects)


def _duck_sig_chain(docs_cte: str, suffix: str) -> str:
    """The shared tokenize→shingle→hash→minhash-sign→band CTE chain over
    ``docs_cte`` (must expose doc_id, text), emitting ``sig_<suffix>``
    and ``bands_<suffix>`` — the SQL mirror of ``_bandidx_signed`` +
    ``_bandidx_banded``, factored once for the three band-index queries
    (build/probe, incremental append, tombstone delete)."""
    s = suffix
    return f"""tok_{s} AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM {docs_cte}
),
sh_{s} AS (
  SELECT doc_id,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                        for i in range(1, len(t) - 1)]) AS s
  FROM tok_{s} WHERE len(t) >= 3
),
h_{s} AS (
  SELECT doc_id, s, [({_duck_hash60("g")}) % {_BANDIDX_M} for g in s] AS hs
  FROM sh_{s}
),
sig_{s} AS (
  SELECT doc_id, s,
         {_duck_minhash_mins()}
  FROM h_{s}
),
bands_{s} AS (
  {_duck_band_rows(f"sig_{s}")}
)"""


def _bandidx_signed(df, carry=()):
    """(doc_id, shingle_set, sig[, *carry]) — MinHash-sign ``df``
    (doc_id, text) with the shared ``_BANDIDX_*`` parameters.  ``D.let``
    binds the md5 transform once so Catalyst's projection collapse cannot
    inline it into each of the 16 ``array_min`` consumers.  ``carry``
    names extra input columns to pass through unchanged (e.g. a side
    marker when signing a union of frames)."""
    sh = D.shingled(df, "doc_id", "text", 3, carry=tuple(carry))
    hs = F.transform(
        F.col("shingle_set"),
        lambda g: F.pmod(D.md5_hash60(g), F.lit(_BANDIDX_M)),
    )
    sig = D.let(
        hs,
        lambda h: F.array(
            *[
                F.array_min(
                    F.transform(
                        h,
                        lambda x: F.pmod(x * F.lit(a) + F.lit(b), F.lit(_BANDIDX_M)),
                    )
                )
                for a, b in _BANDIDX_PARAMS
            ]
        ),
    )
    return sh.select("doc_id", "shingle_set", sig.alias("sig"), *carry)


def _sig_artifact(spark, df, leaf):
    """Materialize a signed frame to warehouse-rooted scratch parquet and
    read it back — the reliable-checkpoint shape (ADVICE r13: the
    band-index queries each leaked two corpus-scale signature PERSISTS
    per sweep).  Signing runs exactly once (at the write), nothing stays
    cached across a long driver session, the artifact survives executor
    loss on a real cluster (localCheckpoint blocks would not), and the
    probe's executed plan keeps its real FileScan/join shape for the
    plan-pin tests.

    Stable path + overwrite (ADVICE r14): the artifact is re-derived on
    every call, so each leaf reuses ONE scratch directory per driver
    process instead of landing a fresh corpus-scale parquet in a new
    uuid dir per sweep — a long session running repeated sweeps no
    longer accumulates unbounded scratch (remote warehouses included).

    Single-in-flight-per-query assumption (ADVICE r15): because the path
    is stable, a DataFrame handle returned by a PRIOR invocation of the
    same query points at files the next invocation overwrites, and two
    concurrent invocations of one query in one driver process race on
    the directory.  The driver contract runs queries sequentially and
    collects each result before the next invocation, which is safe; a
    driver that holds an old handle across a re-invocation must
    re-collect BEFORE re-invoking or expect FileNotFound on the stale
    handle (fail-loud, never silent corruption — parquet footers of the
    old files are gone)."""
    path = index_scratch_dir(spark, leaf, stable=True)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _sig_pair_artifact(spark, idx_docs, probe_docs, leaf):
    """ONE signing pass + ONE scratch artifact for an (index, probe) doc
    pair — returns ``(sig_idx, sig_probe)`` views of the same parquet
    (r16; guide §5.2 — fewer driver actions).  Signing the union in one
    job halves the artifact write + read-back round trips (measured
    ~1.3 s of each sweep's cost was the second write at sf0.1).

    Sides are recovered by an explicit ``__is_probe`` marker stamped on
    the union BEFORE signing (ADVICE r16: the original recovery predicate
    duplicated the call sites' id-space convention — index ids < 2000000
    with ``doc_id % 3 != 0``, probe = the rest — and a future caller with
    a different convention would silently have rows assigned to the wrong
    side).  The marker makes the split correct for ANY caller, rides the
    artifact as one boolean column, and pushes down to the parquet scan
    like the id predicate did."""
    tagged = idx_docs.withColumn("__is_probe", F.lit(False)).unionByName(
        probe_docs.withColumn("__is_probe", F.lit(True))
    )
    sig = _sig_artifact(
        spark, _bandidx_signed(tagged, carry=("__is_probe",)), leaf
    )
    return (
        sig.where(~F.col("__is_probe")).drop("__is_probe"),
        sig.where(F.col("__is_probe")).drop("__is_probe"),
    )


def _bandidx_banded(df):
    """Explode a signed frame into (doc_id, band, key) LSH band rows."""
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(_BANDIDX_BANDS - 1)),
        lambda bnd: F.struct(
            bnd.alias("band"),
            F.array_join(
                F.transform(
                    F.slice(F.col("sig"), bnd * _BANDIDX_ROWS + 1, _BANDIDX_ROWS),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("key"),
        ),
    )
    return df.select("doc_id", F.explode(bands).alias("bk")).select(
        "doc_id", "bk.band", "bk.key"
    )


_DUCK_BAND_INDEX = f"""
WITH prior_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
),
batch_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text || '{_BANDIDX_TAIL}' AS text
  FROM documents WHERE doc_id % 3 <> 0 AND doc_id % 5 = 0
),
{_duck_sig_chain("prior_docs", "p")},
{_duck_sig_chain("batch_docs", "b")},
bdf AS (
  SELECT band, key FROM (
    SELECT band, key, count(*) AS df FROM bands_p GROUP BY band, key
  ) WHERE df <= {_BANDIDX_MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT b.doc_id AS bid, p.doc_id AS pid
  FROM bands_b b
  JOIN bands_p p ON b.band = p.band AND b.key = p.key
  JOIN bdf ON p.band = bdf.band AND p.key = bdf.key
),
ver AS (
  SELECT c.bid, c.pid,
         len(list_intersect(sb.s, sp.s))::DOUBLE
           / len(list_distinct(list_concat(sb.s, sp.s))) AS j
  FROM cand c
  JOIN sig_b sb ON sb.doc_id = c.bid
  JOIN sig_p sp ON sp.doc_id = c.pid
),
roll AS (
  SELECT bid,
         CAST(count(*) AS BIGINT) AS n_candidates,
         CAST(count(*) FILTER (WHERE j >= {_BANDIDX_T}) AS BIGINT) AS n_matches,
         round(max(j) FILTER (WHERE j >= {_BANDIDX_T}), 6) AS best_jaccard
  FROM ver GROUP BY bid
)
SELECT sb.doc_id,
       COALESCE(r.n_candidates, 0) AS n_candidates,
       COALESCE(r.n_matches, 0) AS n_matches,
       r.best_jaccard,
       CASE WHEN COALESCE(r.n_matches, 0) > 0
            THEN 'near_dup_of_index' ELSE 'novel' END AS status
FROM sig_b sb LEFT JOIN roll r ON r.bid = sb.doc_id
"""


@query(
    "dedup_near_against_band_index",
    sql=_DUCK_BAND_INDEX,
    tags=("dedup", "incremental", "index", "minhash"),
)
def dedup_near_against_band_index(spark, sf_dir):
    """Near-dup batch classification against a PERSISTED MinHash band
    index — see block comment.  The band index is a real parquet artifact
    (written, read back, probed); the whole MinHash→band→bucket-join→
    exact-Jaccard pipeline runs on the engine-portable md5-60-bit hash so
    the DuckDB oracle reproduces it bit-identically.  Reference-class op:
    the incremental near-dup ingest check (Lee et al. dedup + Broder
    sketches), which the reference's batch pipeline has no analogue for."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    prior = docs.where(F.col("doc_id") % 3 != 0)
    variants = (
        docs.where((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 5 == 0))
        .select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(_BANDIDX_TAIL)).alias("text"),
        )
    )
    batch = docs.where(F.col("doc_id") % 3 == 0).unionByName(variants)
    signed, banded = _bandidx_signed, _bandidx_banded

    # both signature frames feed TWO consumers (band rows + the Jaccard
    # verify join) — scratch-parquet so the md5 signing runs once, in ONE
    # artifact for both sides (disjoint id spaces, r16)
    sig_prior, sig_batch = _sig_pair_artifact(spark, prior, batch, "band_sig")

    # persist the BAND index: the parquet artifact a next-round ingest
    # probes.  Warehouse-rooted scratch (see sources.sinks.index_scratch_dir)
    # keeps the write→read-back round trip correct on a multi-node cluster.
    idx_path = index_scratch_dir(spark, "band_index")
    banded(sig_prior).write.parquet(idx_path)
    band_index = spark.read.parquet(idx_path)

    # df census on band_key: drop degenerate mega-buckets before the
    # probe join (see _BANDIDX_MAX_BUCKET) so per-batch-row fan-out is
    # bounded even on boilerplate corpora
    ok_buckets = (
        band_index.groupBy("band", "key")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= _BANDIDX_MAX_BUCKET)
        .select("band", "key")
    )
    capped_index = band_index.join(ok_buckets, ["band", "key"], "left_semi")
    cand = (
        banded(sig_batch)
        .join(capped_index.withColumnRenamed("doc_id", "pid"), ["band", "key"])
        .select(F.col("doc_id").alias("bid"), "pid")
        .distinct()
    )
    ver = (
        cand.join(
            sig_batch.select(
                F.col("doc_id").alias("bid"), F.col("shingle_set").alias("sb")
            ),
            "bid",
        )
        .join(
            sig_prior.select(
                F.col("doc_id").alias("pid"), F.col("shingle_set").alias("sp")
            ),
            "pid",
        )
        .select("bid", "pid", D.jaccard(F.col("sb"), F.col("sp")).alias("j"))
    )
    roll = ver.groupBy("bid").agg(
        F.count("*").cast("long").alias("n_candidates"),
        F.count(F.when(F.col("j") >= _BANDIDX_T, 1)).cast("long").alias("n_matches"),
        F.round(F.max(F.when(F.col("j") >= _BANDIDX_T, F.col("j"))), 6).alias(
            "best_jaccard"
        ),
    )
    result = (
        sig_batch.select("doc_id")
        .join(roll, F.col("doc_id") == F.col("bid"), "left")
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0).cast("long")).alias("n_candidates"),
            F.coalesce("n_matches", F.lit(0).cast("long")).alias("n_matches"),
            "best_jaccard",
            F.when(F.coalesce("n_matches", F.lit(0)) > 0, "near_dup_of_index")
            .otherwise("novel")
            .alias("status"),
        )
    )
    return result


# --- incremental band-index MAINTENANCE (append, no rebuild) --------------
# The operational shape a 100 TB corpus actually runs (VERDICT r12 item 4):
# a persisted MinHash band index exists (generation 0); a NEW wave of
# documents arrives and is appended to the index WITHOUT rebuilding it —
# only the new wave is signed and banded, and its band rows land as a new
# `gen=1` partition directory of the same parquet index
# (partitionBy("gen") + mode("append"): existing gen=0 files are never
# touched, so the append costs O(|new wave|) regardless of index size).
# The df census (mega-bucket cap) is then RE-TAKEN over the MERGED index —
# a bucket that was under the cap at gen 0 may blow past it once gen 1's
# members join — and a probe batch classifies against the merged index.
#
# Equivalence proof: the DuckDB oracle knows nothing about generations or
# parquet partitions — it builds the index in ONE pass over gen0 ∪ gen1
# (i.e. the full REBUILD semantics).  A value-hash match therefore proves
# append ≡ rebuild on the probe surface.  The Spark side additionally
# reports per-probe-doc how many matches came from the APPENDED partition
# (`n_matches_from_append`), read off the index's PHYSICAL `gen` partition
# column — the oracle derives the same number from doc_id arithmetic, so
# a mis-partitioned append (rows in the wrong directory) also hash-fails.
#
# Waves (modular, deterministic): gen0 = doc_id % 3 == 1, gen1 (appended)
# = doc_id % 3 == 2, probe = doc_id % 3 == 0 plus tail-variant near-dups
# of every 7th index doc — variants of gen1 docs can ONLY match if the
# appended partition actually serves probes.

_BANDAPP_TAIL = " incremental append audit"

_DUCK_BAND_APPEND = f"""
WITH idx_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
),
probe_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text || '{_BANDAPP_TAIL}' AS text
  FROM documents WHERE doc_id % 3 <> 0 AND doc_id % 7 = 0
),
{_duck_sig_chain("idx_docs", "i")},
{_duck_sig_chain("probe_docs", "q")},
bdf AS (
  SELECT band, key FROM (
    SELECT band, key, count(*) AS df FROM bands_i GROUP BY band, key
  ) WHERE df <= {_BANDIDX_MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT q.doc_id AS bid, i.doc_id AS pid
  FROM bands_q q
  JOIN bands_i i ON q.band = i.band AND q.key = i.key
  JOIN bdf ON i.band = bdf.band AND i.key = bdf.key
),
ver AS (
  SELECT c.bid, c.pid,
         CASE WHEN c.pid % 3 = 2 THEN 1 ELSE 0 END AS gen,
         len(list_intersect(sq.s, si.s))::DOUBLE
           / len(list_distinct(list_concat(sq.s, si.s))) AS j
  FROM cand c
  JOIN sig_q sq ON sq.doc_id = c.bid
  JOIN sig_i si ON si.doc_id = c.pid
),
roll AS (
  SELECT bid,
         CAST(count(*) AS BIGINT) AS n_candidates,
         CAST(count(*) FILTER (WHERE j >= {_BANDIDX_T}) AS BIGINT) AS n_matches,
         CAST(count(*) FILTER (WHERE j >= {_BANDIDX_T} AND gen = 1) AS BIGINT)
           AS n_matches_from_append,
         round(max(j) FILTER (WHERE j >= {_BANDIDX_T}), 6) AS best_jaccard
  FROM ver GROUP BY bid
)
SELECT sq.doc_id,
       COALESCE(r.n_candidates, 0) AS n_candidates,
       COALESCE(r.n_matches, 0) AS n_matches,
       COALESCE(r.n_matches_from_append, 0) AS n_matches_from_append,
       r.best_jaccard,
       CASE WHEN COALESCE(r.n_matches, 0) > 0
            THEN 'near_dup_of_index' ELSE 'novel' END AS status
FROM sig_q sq LEFT JOIN roll r ON r.bid = sq.doc_id
"""


@query(
    "dedup_band_index_incremental_append",
    sql=_DUCK_BAND_APPEND,
    tags=("dedup", "incremental", "index", "minhash", "maintenance"),
)
def dedup_band_index_incremental_append(spark, sf_dir):
    """Incremental MinHash band-index maintenance: append a new document
    wave to the persisted index as a `gen=1` partition (no rebuild),
    re-census the mega-bucket cap over the merged index, probe it — see
    block comment.  The oracle rebuilds from scratch in one pass, so the
    value hash IS the append≡rebuild proof; `n_matches_from_append` is
    counted off the physical partition column, pinning partition
    placement too.  Completes the index lifecycle the r10–r12 triad
    started (build→probe → now append)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    gen0 = docs.where(F.col("doc_id") % 3 == 1)
    gen1 = docs.where(F.col("doc_id") % 3 == 2)
    variants = (
        docs.where((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 7 == 0))
        .select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(_BANDAPP_TAIL)).alias("text"),
        )
    )
    probe = docs.where(F.col("doc_id") % 3 == 0).unionByName(variants)

    # sig_idx feeds the two partition writes AND the Jaccard verify join;
    # sig_probe feeds its band rows and the verify join — one shared
    # scratch artifact so the md5 signing runs once for both sides (r16)
    sig_idx, sig_probe = _sig_pair_artifact(
        spark, docs.where(F.col("doc_id") % 3 != 0), probe, "bandapp_sig"
    )

    idx_path = index_scratch_dir(spark, "band_index_gen")
    # initial build: generation-0 docs only, partitioned by gen
    (
        _bandidx_banded(sig_idx.where(F.col("doc_id") % 3 == 1))
        .withColumn("gen", F.lit(0))
        .write.partitionBy("gen")
        .mode("overwrite")
        .parquet(idx_path)
    )
    # THE MAINTENANCE STEP: sign/band only the new wave and APPEND it as
    # a fresh gen=1 directory — gen=0 files are not rewritten
    (
        _bandidx_banded(sig_idx.where(F.col("doc_id") % 3 == 2))
        .withColumn("gen", F.lit(1))
        .write.partitionBy("gen")
        .mode("append")
        .parquet(idx_path)
    )
    merged = spark.read.parquet(idx_path)

    # re-census over the MERGED index: caps must reflect post-append df
    ok_buckets = (
        merged.groupBy("band", "key")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= _BANDIDX_MAX_BUCKET)
        .select("band", "key")
    )
    capped = merged.join(ok_buckets, ["band", "key"], "left_semi")
    cand = (
        _bandidx_banded(sig_probe)
        .join(
            capped.select(
                "band", "key", F.col("doc_id").alias("pid"), F.col("gen").alias("g")
            ),
            ["band", "key"],
        )
        .select(F.col("doc_id").alias("bid"), "pid", "g")
        .distinct()
    )
    ver = (
        cand.join(
            sig_probe.select(
                F.col("doc_id").alias("bid"), F.col("shingle_set").alias("sq")
            ),
            "bid",
        )
        .join(
            sig_idx.select(
                F.col("doc_id").alias("pid"), F.col("shingle_set").alias("si")
            ),
            "pid",
        )
        .select("bid", "pid", "g", D.jaccard(F.col("sq"), F.col("si")).alias("j"))
    )
    hit = F.col("j") >= _BANDIDX_T
    roll = ver.groupBy("bid").agg(
        F.count("*").cast("long").alias("n_candidates"),
        F.count(F.when(hit, 1)).cast("long").alias("n_matches"),
        F.count(F.when(hit & (F.col("g") == 1), 1))
        .cast("long")
        .alias("n_matches_from_append"),
        F.round(F.max(F.when(hit, F.col("j"))), 6).alias("best_jaccard"),
    )
    result = (
        sig_probe.select("doc_id")
        .join(roll, F.col("doc_id") == F.col("bid"), "left")
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0).cast("long")).alias("n_candidates"),
            F.coalesce("n_matches", F.lit(0).cast("long")).alias("n_matches"),
            F.coalesce("n_matches_from_append", F.lit(0).cast("long")).alias(
                "n_matches_from_append"
            ),
            "best_jaccard",
            F.when(F.coalesce("n_matches", F.lit(0)) > 0, "near_dup_of_index")
            .otherwise("novel")
            .alias("status"),
        )
    )
    return result


# --- band-index logical DELETE (tombstones, no rewrite) -------------------
# The third index-lifecycle verb (build r11 → append r13 → delete r13):
# a wave of documents must leave the index — GDPR erasure, licence
# takedown, retraction — WITHOUT rewriting the banded parquet (at 100 TB
# rewriting the index to drop 0.1% of rows is the wrong shape; the
# fact-table analogue `delete_keys_partitioned` rewrites only touched
# partitions, but band rows aren't partitioned by doc, so a physical
# delete would touch every file).  Instead the delete wave's doc_ids are
# written as a TOMBSTONE parquet next to the index — an O(|delete set|)
# write — and every probe anti-joins the tombstone set before matching;
# the df census (mega-bucket cap) runs over the LIVE index so a bucket
# can fall back under the cap when members are deleted.  A periodic
# compaction folds tombstones physically (maintenance_compact_files is
# that machinery).  The oracle knows no tombstones — it builds the live
# index directly with the delete predicate — so a value-hash match
# proves tombstoned probing ≡ physically-deleted rebuild.  A probe
# variant whose only near-dup was deleted must come back 'novel'.

_BANDDEL_TAIL = " tombstone delete audit"

_DUCK_BAND_DELETE = f"""
WITH idx_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
),
probe_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text || '{_BANDDEL_TAIL}' AS text
  FROM documents WHERE doc_id % 3 <> 0 AND doc_id % 5 = 0
),
{_duck_sig_chain("idx_docs", "i")},
live AS (
  SELECT * FROM bands_i WHERE NOT (doc_id % 3 = 1 AND doc_id % 5 = 0)
),
{_duck_sig_chain("probe_docs", "q")},
bdf AS (
  SELECT band, key FROM (
    SELECT band, key, count(*) AS df FROM live GROUP BY band, key
  ) WHERE df <= {_BANDIDX_MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT q.doc_id AS bid, i.doc_id AS pid
  FROM bands_q q
  JOIN live i ON q.band = i.band AND q.key = i.key
  JOIN bdf ON i.band = bdf.band AND i.key = bdf.key
),
ver AS (
  SELECT c.bid, c.pid,
         len(list_intersect(sq.s, si.s))::DOUBLE
           / len(list_distinct(list_concat(sq.s, si.s))) AS j
  FROM cand c
  JOIN sig_q sq ON sq.doc_id = c.bid
  JOIN sig_i si ON si.doc_id = c.pid
),
roll AS (
  SELECT bid,
         CAST(count(*) AS BIGINT) AS n_candidates,
         CAST(count(*) FILTER (WHERE j >= {_BANDIDX_T}) AS BIGINT) AS n_matches,
         round(max(j) FILTER (WHERE j >= {_BANDIDX_T}), 6) AS best_jaccard
  FROM ver GROUP BY bid
)
SELECT sq.doc_id,
       COALESCE(r.n_candidates, 0) AS n_candidates,
       COALESCE(r.n_matches, 0) AS n_matches,
       r.best_jaccard,
       CASE WHEN COALESCE(r.n_matches, 0) > 0
            THEN 'near_dup_of_index' ELSE 'novel' END AS status
FROM sig_q sq LEFT JOIN roll r ON r.bid = sq.doc_id
"""


@query(
    "dedup_band_index_tombstone_delete",
    sql=_DUCK_BAND_DELETE,
    tags=("dedup", "incremental", "index", "minhash", "maintenance"),
)
def dedup_band_index_tombstone_delete(spark, sf_dir):
    """Logical delete from the persisted MinHash band index via a
    TOMBSTONE parquet — see block comment.  The banded index files are
    never rewritten (the delete write is O(|delete set|)); probes
    anti-join the tombstone set and the mega-bucket census runs over the
    live index.  The oracle builds the post-delete index directly, so
    the value hash proves tombstoned probing ≡ physically-deleted
    rebuild.  Completes the index lifecycle: build/probe (r10–r12),
    append, delete."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx_docs = docs.where(F.col("doc_id") % 3 != 0)
    variants = (
        docs.where((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 5 == 0))
        .select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(_BANDDEL_TAIL)).alias("text"),
        )
    )
    probe = docs.where(F.col("doc_id") % 3 == 0).unionByName(variants)

    sig_idx, sig_probe = _sig_pair_artifact(
        spark, idx_docs, probe, "banddel_sig"
    )

    idx_path = index_scratch_dir(spark, "band_index_full")
    _bandidx_banded(sig_idx).write.parquet(idx_path)
    band_index = spark.read.parquet(idx_path)

    # THE DELETE STEP: tombstone the erase wave — an O(|wave|) parquet
    # write next to the index, no index file touched
    tomb_path = index_scratch_dir(spark, "band_index_tombstones")
    (
        idx_docs.where((F.col("doc_id") % 3 == 1) & (F.col("doc_id") % 5 == 0))
        .select("doc_id")
        .write.parquet(tomb_path)
    )
    tombstones = spark.read.parquet(tomb_path)

    # live view of the index: anti-join the tombstones (broadcast at this
    # delete-set size; bucket-key semi-structure unchanged), then
    # re-census the mega-bucket cap over what actually remains probe-able
    live = band_index.join(F.broadcast(tombstones), "doc_id", "left_anti")
    ok_buckets = (
        live.groupBy("band", "key")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= _BANDIDX_MAX_BUCKET)
        .select("band", "key")
    )
    capped = live.join(ok_buckets, ["band", "key"], "left_semi")
    cand = (
        _bandidx_banded(sig_probe)
        .join(capped.withColumnRenamed("doc_id", "pid"), ["band", "key"])
        .select(F.col("doc_id").alias("bid"), "pid")
        .distinct()
    )
    ver = (
        cand.join(
            sig_probe.select(
                F.col("doc_id").alias("bid"), F.col("shingle_set").alias("sq")
            ),
            "bid",
        )
        .join(
            sig_idx.select(
                F.col("doc_id").alias("pid"), F.col("shingle_set").alias("si")
            ),
            "pid",
        )
        .select("bid", "pid", D.jaccard(F.col("sq"), F.col("si")).alias("j"))
    )
    hit = F.col("j") >= _BANDIDX_T
    roll = ver.groupBy("bid").agg(
        F.count("*").cast("long").alias("n_candidates"),
        F.count(F.when(hit, 1)).cast("long").alias("n_matches"),
        F.round(F.max(F.when(hit, F.col("j"))), 6).alias("best_jaccard"),
    )
    result = (
        sig_probe.select("doc_id")
        .join(roll, F.col("doc_id") == F.col("bid"), "left")
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0).cast("long")).alias("n_candidates"),
            F.coalesce("n_matches", F.lit(0).cast("long")).alias("n_matches"),
            "best_jaccard",
            F.when(F.coalesce("n_matches", F.lit(0)) > 0, "near_dup_of_index")
            .otherwise("novel")
            .alias("status"),
        )
    )
    return result


# --- band-index COMPACTION (fold generations + tombstones) -----------------
# The FOURTH and final index-lifecycle verb (build r11 → append r13 →
# tombstone-delete r13 → compact).  A lived-in 100 TB index accumulates
# debt: appended `gen=N` partitions (each wave a new directory of small
# files) and a tombstone set every probe must anti-join.  Left alone,
# probe cost grows with dead rows and file count, and the tombstone
# broadcast grows without bound.  The periodic COMPACTION folds all of it
# into a fresh single-generation index: one distributed anti-join of the
# merged generations against the tombstones, rewritten PARTITIONED BY
# BAND — so the compacted layout is band-clustered (a probe bucket join
# touches only its band's files) and the tombstone set retires to empty.
# The fold costs one pass over the live index — amortized across every
# probe that follows, exactly the economics of `maintenance_compact_files`
# on the fact table (whose block comment, and the tombstone query's,
# named this machinery as the missing piece).
#
# Equivalence proof: the oracle builds the post-compaction index directly
# in one pass over the surviving docs — no generations, no tombstones —
# so a value hash match proves compacted-index probing ≡ from-scratch
# rebuild.  Physical pinning: `compacted_index_rows` (a broadcast scalar
# cross-joined onto every probe row) counts the rows of the REWRITTEN
# artifact, which the oracle derives as the band-row count of surviving
# docs — a compaction that leaks a tombstoned row, drops a live one, or
# double-writes a generation hash-fails on that column even when no probe
# match flips.  Probe variants of every 7th index doc cover both fates:
# a variant of a compacted-away doc (doc_id%35==0 side) must come back
# 'novel'; a variant of a survivor must still match.

_BANDCMP_TAIL = " compaction audit"

_DUCK_BAND_COMPACT = f"""
WITH idx_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
),
probe_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text || '{_BANDCMP_TAIL}' AS text
  FROM documents WHERE doc_id % 3 <> 0 AND doc_id % 7 = 0
),
{_duck_sig_chain("idx_docs", "i")},
live AS (
  SELECT * FROM bands_i WHERE doc_id % 5 <> 0
),
{_duck_sig_chain("probe_docs", "q")},
nrows AS (
  SELECT CAST(count(*) AS BIGINT) AS compacted_index_rows FROM live
),
bdf AS (
  SELECT band, key FROM (
    SELECT band, key, count(*) AS df FROM live GROUP BY band, key
  ) WHERE df <= {_BANDIDX_MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT q.doc_id AS bid, i.doc_id AS pid
  FROM bands_q q
  JOIN live i ON q.band = i.band AND q.key = i.key
  JOIN bdf ON i.band = bdf.band AND i.key = bdf.key
),
ver AS (
  SELECT c.bid, c.pid,
         len(list_intersect(sq.s, si.s))::DOUBLE
           / len(list_distinct(list_concat(sq.s, si.s))) AS j
  FROM cand c
  JOIN sig_q sq ON sq.doc_id = c.bid
  JOIN sig_i si ON si.doc_id = c.pid
),
roll AS (
  SELECT bid,
         CAST(count(*) AS BIGINT) AS n_candidates,
         CAST(count(*) FILTER (WHERE j >= {_BANDIDX_T}) AS BIGINT) AS n_matches,
         round(max(j) FILTER (WHERE j >= {_BANDIDX_T}), 6) AS best_jaccard
  FROM ver GROUP BY bid
)
SELECT sq.doc_id,
       COALESCE(r.n_candidates, 0) AS n_candidates,
       COALESCE(r.n_matches, 0) AS n_matches,
       r.best_jaccard,
       nrows.compacted_index_rows,
       CASE WHEN COALESCE(r.n_matches, 0) > 0
            THEN 'near_dup_of_index' ELSE 'novel' END AS status
FROM sig_q sq LEFT JOIN roll r ON r.bid = sq.doc_id CROSS JOIN nrows
"""


@query(
    "dedup_band_index_compaction",
    sql=_DUCK_BAND_COMPACT,
    tags=("dedup", "incremental", "index", "minhash", "maintenance"),
)
def dedup_band_index_compaction(spark, sf_dir):
    """Periodic band-index COMPACTION: fold appended generations and the
    tombstone set into a fresh single-generation, band-partitioned index,
    then probe the compacted artifact with no anti-join — see block
    comment.  The oracle builds the post-compaction index from surviving
    docs in one pass, so the value hash proves compacted probing ≡
    rebuild; `compacted_index_rows` pins the rewritten artifact's
    physical row count.  Closes the lifecycle: build → probe → append →
    delete → compact."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx_docs = docs.where(F.col("doc_id") % 3 != 0)
    variants = (
        docs.where((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 7 == 0))
        .select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(_BANDCMP_TAIL)).alias("text"),
        )
    )
    probe = docs.where(F.col("doc_id") % 3 == 0).unionByName(variants)

    sig_idx, sig_probe = _sig_pair_artifact(
        spark, idx_docs, probe, "bandcmp_sig"
    )

    # the LIVED-IN starting state: two generations (gen0 = %3==1 build,
    # gen1 = %3==2 appended wave) plus a tombstone set spanning BOTH gens
    idx_path = index_scratch_dir(spark, "band_index_lived")
    (
        _bandidx_banded(sig_idx)
        .withColumn("gen", (F.col("doc_id") % 3 == 2).cast("int"))
        .write.partitionBy("gen")
        .parquet(idx_path)
    )
    tomb_path = index_scratch_dir(spark, "band_index_tomb_precompact")
    (
        idx_docs.where(F.col("doc_id") % 5 == 0)
        .select("doc_id")
        .write.parquet(tomb_path)
    )

    # THE COMPACTION STEP: one distributed pass — merged generations
    # anti-join tombstones, rewritten partitioned by band so the
    # compacted layout is band-clustered (each probe bucket join prunes
    # to its band's directory); generations and tombstones both retire
    live = (
        spark.read.parquet(idx_path)
        .join(F.broadcast(spark.read.parquet(tomb_path)), "doc_id", "left_anti")
        .select("doc_id", "band", "key")
    )
    compact_path = index_scratch_dir(spark, "band_index_compacted")
    (
        live.repartition(_BANDIDX_BANDS, "band")
        .write.partitionBy("band")
        .parquet(compact_path)
    )
    compacted = spark.read.parquet(compact_path)

    # physical audit scalar: row count of the rewritten artifact (the
    # oracle derives the same number as the surviving band-row count)
    nrows = compacted.agg(
        F.count("*").cast("long").alias("compacted_index_rows")
    )

    # probe the compacted index EXACTLY like a fresh build — no
    # tombstone anti-join anywhere (that is the point of compaction)
    ok_buckets = (
        compacted.groupBy("band", "key")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= _BANDIDX_MAX_BUCKET)
        .select("band", "key")
    )
    capped = compacted.join(ok_buckets, ["band", "key"], "left_semi")
    cand = (
        _bandidx_banded(sig_probe)
        .join(capped.withColumnRenamed("doc_id", "pid"), ["band", "key"])
        .select(F.col("doc_id").alias("bid"), "pid")
        .distinct()
    )
    ver = (
        cand.join(
            sig_probe.select(
                F.col("doc_id").alias("bid"), F.col("shingle_set").alias("sq")
            ),
            "bid",
        )
        .join(
            sig_idx.select(
                F.col("doc_id").alias("pid"), F.col("shingle_set").alias("si")
            ),
            "pid",
        )
        .select("bid", "pid", D.jaccard(F.col("sq"), F.col("si")).alias("j"))
    )
    hit = F.col("j") >= _BANDIDX_T
    roll = ver.groupBy("bid").agg(
        F.count("*").cast("long").alias("n_candidates"),
        F.count(F.when(hit, 1)).cast("long").alias("n_matches"),
        F.round(F.max(F.when(hit, F.col("j"))), 6).alias("best_jaccard"),
    )
    result = (
        sig_probe.select("doc_id")
        .join(roll, F.col("doc_id") == F.col("bid"), "left")
        .crossJoin(F.broadcast(nrows))
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0).cast("long")).alias("n_candidates"),
            F.coalesce("n_matches", F.lit(0).cast("long")).alias("n_matches"),
            "best_jaccard",
            "compacted_index_rows",
            F.when(F.coalesce("n_matches", F.lit(0)) > 0, "near_dup_of_index")
            .otherwise("novel")
            .alias("status"),
        )
    )
    return result


def _duck_winnow_cte(docs_cte: str) -> str:
    """DuckDB CTE fragment computing winnowed fingerprints (pos/wins/fps,
    see the winnowing block comment above) of a CTE exposing
    (doc_id, text).  fps = (doc_id, fp), distinct per doc."""
    return f"""
pos AS (
  SELECT doc_id, p,
         {_duck_hash60(f"substr(lower(text), p, {_SUBSTR_LEN})")} AS h
  FROM {docs_cte}, LATERAL unnest(generate_series(
    1, length(text) - {_SUBSTR_LEN - 1}, 1)) AS t(p)
  WHERE length(text) >= {_SUBSTR_LEN + _WINNOW_W - 1}
),
wins AS (
  SELECT doc_id, p,
         min(h) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING)
           AS fp,
         count(*) OVER (PARTITION BY doc_id) AS npos
  FROM pos
),
fps AS (
  SELECT DISTINCT doc_id, fp FROM wins WHERE p <= npos - {_WINNOW_W - 1}
)"""


# --- substring-overlap pair ranking over winnowed fingerprints --------------
# Which document PAIRS share long exact substrings?  The winnowed
# fingerprint table is the linear-cost index; a pair sharing k
# fingerprints shares (roughly) k distinct >=39-char regions.  Boilerplate
# grams shared by many docs are CAPPED OUT (fp doc-frequency 2..20) so the
# per-fingerprint self-join is bucket-bounded — the same candidate-bound
# trick as MinHash-LSH banding; at 100 TB the cap keeps the pair
# explosion at sum_f min(df_f, 20)^2 instead of sum df^2.  The fixture
# plants offset-shifted copies ('PREFIX>> ' = 9 chars, deliberately not a
# multiple of the old stride) of every 11th doc, which ONLY an
# alignment-invariant sampler pairs with its original.

_PAIR_MAX_DF = 20
_PAIR_MIN_SHARED = 3

_SUBSTR_PAIRS_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id, 'PREFIX>> ' || text AS text
  FROM documents WHERE doc_id % 11 = 0
),
{_duck_winnow_cte("corpus")},
fp_docs AS (
  SELECT fp, count(*) AS nd FROM fps GROUP BY fp
),
keep AS (
  SELECT f.doc_id, f.fp
  FROM fps f JOIN fp_docs d ON f.fp = d.fp
  WHERE d.nd BETWEEN 2 AND {_PAIR_MAX_DF}
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared_fps
FROM keep a JOIN keep b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {_PAIR_MIN_SHARED}
"""


@query(
    "dedup_substring_pair_overlap",
    sql=_SUBSTR_PAIRS_SQL,
    tags=("dedup", "substring", "pairs"),
)
def dedup_substring_pair_overlap(spark, sf_dir):
    """Document pairs ranked by shared winnowed fingerprints — see block
    comment.  Plan: in-map winnowing (no join), ONE fp-partitioned window
    for the doc-frequency cap, one capped fp equi-self-join, pair
    aggregate."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    variants = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat(F.lit("PREFIX>> "), F.col("text")).alias("text"),
    )
    corpus = docs.unionByName(variants)
    fps = winnow_fingerprints(corpus, id_cols=("doc_id",))
    capped = (
        fps.withColumn("nd", F.count("*").over(Window.partitionBy("fp")))
        .where((F.col("nd") >= 2) & (F.col("nd") <= _PAIR_MAX_DF))
        .select("doc_id", "fp")
    )
    a = capped.select(F.col("doc_id").alias("id_a"), "fp")
    b = capped.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared_fps"))
        .where(F.col("n_shared_fps") >= _PAIR_MIN_SHARED)
    )


# --- substring-level benchmark decontamination ------------------------------
# The 13-gram decontamination above works at word level; verbatim leaks
# that survive re-tokenization (markup changes, joined/split words) are
# caught at the CHARACTER level by the same winnowed-fingerprint index:
# flag corpus docs sharing any >=39-char substring with a benchmark doc.
# Benchmark side is tiny → broadcast; corpus side never self-joins.

_SUBSTR_DECON_SQL = f"""
WITH bench_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 31 = 0
),
corpus_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 31 <> 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, 'Q: ' || text AS text
  FROM documents WHERE doc_id % 62 = 0
),
all_docs AS (
  SELECT * FROM bench_docs UNION ALL SELECT * FROM corpus_docs
),
{_duck_winnow_cte("all_docs")},
bench_fps AS (
  SELECT DISTINCT fp FROM fps WHERE doc_id % 31 = 0 AND doc_id < 2000000
),
corpus_fps AS (
  SELECT doc_id, fp FROM fps
  WHERE doc_id >= 2000000 OR doc_id % 31 <> 0
)
SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_bench_fps
FROM corpus_fps c JOIN bench_fps b ON c.fp = b.fp
GROUP BY c.doc_id
"""


@query(
    "decontaminate_substring_winnow",
    sql=_SUBSTR_DECON_SQL,
    tags=("dedup", "decontamination", "substring"),
)
def decontaminate_substring_winnow(spark, sf_dir):
    """Character-level benchmark decontamination via winnowed
    fingerprints — see block comment.  Fixture roles mirror
    decontaminate_benchmark_ngrams (benchmark = every 31st doc) plus
    planted 'Q: '-prefixed copies of every 62nd doc in the corpus, which
    only an alignment-invariant sampler flags.  Output: contaminated
    corpus doc → number of benchmark fingerprints it shares."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench_docs = docs.where(F.col("doc_id") % 31 == 0)
    planted = docs.where(F.col("doc_id") % 62 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.lit("Q: "), F.col("text")).alias("text"),
    )
    corpus_docs = docs.where(F.col("doc_id") % 31 != 0).unionByName(planted)

    bench_fps = winnow_fingerprints(bench_docs, id_cols=("doc_id",)).select(
        "fp"
    ).distinct()
    corpus_fps = winnow_fingerprints(corpus_docs, id_cols=("doc_id",))
    return (
        corpus_fps.join(F.broadcast(bench_fps), "fp")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_bench_fps"))
    )


# --- containment / overlap-coefficient near-dup pairs ------------------------
# Jaccard misses SUBSET duplication: a doc quoted or truncated inside
# another has tiny Jaccard (union is large) but overlap coefficient
# |A∩B| / min(|A|,|B|) ≈ 1 (Szymkiewicz–Simpson; "containment" in the
# Broder near-dup taxonomy).  Candidate generation is PREFIX FILTERING
# (the set-similarity-join standard): each doc probes only its 3 RAREST
# shingles (global doc-frequency, shingle tie-break) against the
# df-capped inverted index.  If A ⊆ B then every A shingle — including
# its rarest — appears in B, so the pair is found PROVIDED A's rarest
# probe survives the df cap (df ≤ _CONTAIN_MAX_DF): a contained doc
# whose 3 rarest shingles are ALL more common than the cap probes
# nothing and the pair is missed — the same recall-vs-candidate-volume
# trade LSH banding makes, not an unconditional guarantee; candidate
# volume is ≤ 3·df_cap per doc instead of Σ df² over all shingles (the
# naive capped-index self-join produced 1.2M pairs on the sf0.1 fixture,
# whose template-generated prose shares almost every 3-gram across docs;
# prefix filtering cuts it ~50×).  Fixture plants the first half of
# every 13th doc as a new doc; Jaccard ≈ 0.5 (below the 0.5 near-dup
# gate elsewhere) while containment ≈ 1 — only THIS query catches them.

_CONTAIN_MAX_DF = 20
_CONTAIN_PROBES = 3
_CONTAIN_T = 0.9

_CONTAIN_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 4000000 AS doc_id,
         substr(text, 1, CAST(floor(length(text) / 2) AS INTEGER)) AS text
  FROM documents WHERE doc_id % 13 = 0
),
toks AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM corpus
),
sh AS (
  SELECT doc_id,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                        for i in range(1, len(t) - 1)]) AS s
  FROM toks WHERE len(t) >= 3
),
inv AS (
  SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
  FROM (SELECT doc_id, unnest(s) AS shingle FROM sh)
),
probes AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, shingle,
           row_number() OVER (PARTITION BY doc_id ORDER BY df, shingle) AS rn
    FROM inv
  ) WHERE rn <= {_CONTAIN_PROBES}
),
cand AS (
  SELECT DISTINCT least(p.doc_id, i.doc_id) AS id_a,
                  greatest(p.doc_id, i.doc_id) AS id_b
  FROM probes p
  JOIN inv i ON p.shingle = i.shingle
            AND i.df BETWEEN 2 AND {_CONTAIN_MAX_DF}
            AND p.doc_id <> i.doc_id
)
SELECT c.id_a, c.id_b,
       CAST(len(sa.s) AS BIGINT) AS n_a,
       CAST(len(sb.s) AS BIGINT) AS n_b,
       round(len(list_intersect(sa.s, sb.s))::DOUBLE
             / least(len(sa.s), len(sb.s)), 6) AS containment
FROM cand c JOIN sh sa ON c.id_a = sa.doc_id
            JOIN sh sb ON c.id_b = sb.doc_id
WHERE len(list_intersect(sa.s, sb.s))::DOUBLE
      / least(len(sa.s), len(sb.s)) >= {_CONTAIN_T}
"""


@query(
    "dedup_containment_pairs",
    sql=_CONTAIN_SQL,
    tags=("dedup", "containment"),
)
def dedup_containment_pairs(spark, sf_dir):
    """Overlap-coefficient (containment) near-dup pairs — see block
    comment.  Plan: one shingle window for df, per-doc rarest-3 probes
    (prefix filtering), one probe->index equi-join for candidates, two
    id-keyed equi-joins to re-attach the shingle arrays, in-map
    intersection."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 4000000).alias("doc_id"),
        F.substring(
            F.col("text"), 1, F.floor(F.length("text") / 2).cast("int")
        ).alias("text"),
    )
    corpus = docs.unionByName(planted)
    # sh feeds three consumers (inv + both array re-attach sides) and inv
    # two (probes + index): persist both or the shingle build and its
    # window re-run per consumer (measured 8.9 -> 3.7 s at sf0.1)
    sh = D.shingled(corpus, "doc_id", "text", 3).persist()
    inv = (
        sh.select("doc_id", F.explode("shingle_set").alias("shingle"))
        .withColumn("df", F.count("*").over(Window.partitionBy("shingle")))
        .persist()
    )
    probes = (
        inv.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "shingle")
            ),
        )
        .where(F.col("rn") <= _CONTAIN_PROBES)
        .select(F.col("doc_id").alias("pid"), "shingle")
    )
    index = inv.where(
        (F.col("df") >= 2) & (F.col("df") <= _CONTAIN_MAX_DF)
    ).select(F.col("doc_id").alias("iid"), "shingle")
    cand = (
        probes.join(index, "shingle")
        .where(F.col("pid") != F.col("iid"))
        .select(
            F.least("pid", "iid").alias("id_a"),
            F.greatest("pid", "iid").alias("id_b"),
        )
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("shingle_set").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("shingle_set").alias("sb"))
    joined = cand.join(sa, "id_a").join(sb, "id_b")
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    denom = F.least(F.size("sa"), F.size("sb")).cast("double")
    return (
        joined.select(
            "id_a",
            "id_b",
            F.size("sa").cast("long").alias("n_a"),
            F.size("sb").cast("long").alias("n_b"),
            F.round(inter / denom, 6).alias("containment"),
            (inter / denom).alias("__raw"),
        )
        .where(F.col("__raw") >= _CONTAIN_T)
        .drop("__raw")
    )
