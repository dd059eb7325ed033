"""Property tests for the dedup family (the hash-based members aren't
oracle-expressible, so their guarantees are asserted here)."""

import pyspark.sql.functions as F

from big_data_analytics_project_spark.operators import dedup as D
from big_data_analytics_project_spark.sources import read_table


def _exact_pairs(spark, sf_dir, threshold=0.5):
    """Ground truth: exact all-pairs 3-gram Jaccard (no blocking)."""
    sh = D.shingled(read_table(spark, sf_dir, "documents"), "doc_id", "text", 3)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("shingle_set").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("shingle_set").alias("sb"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    jac = D.jaccard(F.col("sa"), F.col("sb"))
    return {
        (r.id_a, r.id_b)
        for r in pairs.select("id_a", "id_b").where(jac >= threshold).collect()
    }


def test_minhash_lsh_total_recall(spark, sf_dir):
    """MinHash-LSH + exact verification must find the full exact near-dup
    pair set on the fixtures (this property justifies its oracle SQL)."""
    truth = _exact_pairs(spark, sf_dir)
    found = {
        (r.id_a, r.id_b)
        for r in D.minhash_near_duplicates(
            read_table(spark, sf_dir, "documents"), "doc_id", "text", k=64, bands=16
        ).collect()
    }
    assert found == truth and len(truth) > 0


def test_minhash_estimate_prefilter_is_output_invariant(spark, sf_dir):
    """The signature-estimate pre-filter (stage-1 narrow join) must not
    change the verified output vs the filter-disabled pipeline — same
    pairs AND same exact jaccard_sim values."""
    docs = read_table(spark, sf_dir, "documents")

    def run(margin):
        return {
            (r.id_a, r.id_b): round(r.jaccard_sim, 9)
            for r in D.minhash_near_duplicates(
                docs, "doc_id", "text", k=64, bands=16, est_margin=margin
            ).collect()
        }

    # est_margin=1.0 → threshold - margin ≤ 0 → nothing pre-filtered
    assert run(0.3) == run(1.0)


def test_simhash_no_false_positives_and_decent_recall(spark, sf_dir):
    truth = _exact_pairs(spark, sf_dir)
    found = {
        (r.id_a, r.id_b)
        for r in D.simhash_near_duplicates(
            read_table(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=8
        ).collect()
    }
    assert found <= truth, f"false positives: {sorted(found - truth)[:5]}"
    assert len(found) >= 0.7 * len(truth)


def test_exact_fingerprint_collapses_planted_variants(spark, sf_dir):
    from big_data_analytics_project_spark.registry import load_all

    out = load_all()["dedup_exact_fingerprint"].fn(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents")
    n_planted = docs.where(F.col("doc_id") % 7 == 0).count()
    dup_groups = out.where(F.col("n_copies") == 2)
    assert dup_groups.count() == n_planted
    # survivor is always the original (min doc_id < 1000000)
    assert dup_groups.where(F.col("keep_id") >= 1000000).count() == 0


def test_minhash_signature_stability(spark, sf_dir):
    """Same seed → identical signatures across runs (determinism contract)."""
    docs = read_table(spark, sf_dir, "documents").limit(20)
    sh = D.shingled(docs, "doc_id", "text")
    sig = sh.select("doc_id", D.minhash_signature(F.col("shingle_set"), 16).alias("s"))
    a = {r.doc_id: tuple(r.s) for r in sig.collect()}
    b = {r.doc_id: tuple(r.s) for r in sig.collect()}
    assert a == b


def test_tokenization_parity_on_hostile_whitespace(spark, duck):
    """Spark split('\\s+') and the oracle's regexp_split_to_array('\\s+')
    must tokenize identically on tabs / newlines / runs of spaces /
    leading+trailing whitespace — not just the single-space fixture texts
    (regression for the string_split(' ') oracle mismatch)."""
    from big_data_analytics_project_spark.operators.text import ws_tokens

    cases = [
        "plain single space",
        "double  space",
        "tab\tseparated\ttokens",
        "newline\nseparated",
        "  leading and trailing  ",
        "mixed \t\n whitespace  runs",
    ]
    sdf = spark.createDataFrame([(c,) for c in cases], "text string")
    got = {
        r.text: list(r.toks)
        for r in sdf.select("text", ws_tokens(F.col("text")).alias("toks")).collect()
    }
    for c in cases:
        want = duck.execute(
            "select regexp_split_to_array(lower(?), '\\s+')", [c]
        ).fetchone()[0]
        assert got[c] == list(want), f"tokenization diverges on {c!r}"


def test_winnow_fingerprints_alignment_invariant(spark):
    """ADVICE r9 medium regression: the pre-winnowing stride sampler only
    caught overlaps whose start offsets agreed mod the stride.  Winnowing
    selects each window's min hash — a function of content only — so two
    docs sharing a >=39-char substring at DIFFERENT offsets (here shifted
    by 3, the old sampler's worst case) must share a fingerprint."""
    from big_data_analytics_project_spark.plans.dedup_queries import (
        winnow_fingerprints,
    )

    shared = "the quick brown fox jumps over the lazy dog again and again"  # 60 chars
    rows = [
        (1, "srcA", "xyz" + shared + " tail one padding material here"),
        (2, "srcB", shared + " completely different ending text over here"),
        (3, "srcC", "no overlap with anything else in this corpus at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    fps = winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "misaligned 60-char overlap must share a fingerprint"
    assert not (by_doc[3] & (by_doc[1] | by_doc[2])), "unrelated doc must not collide"


def test_band_index_append_leaves_gen0_files_untouched(spark, sf_dir, tmp_path):
    """The round-13 maintenance query's scale claim: appending a new wave
    as a gen=1 partition must not rewrite any gen=0 file (append cost is
    O(|new wave|), independent of index size), and the merged read-back
    must equal the union of the two generations' band rows."""
    import os

    from big_data_analytics_project_spark.plans.dedup_queries import (
        _bandidx_banded,
        _bandidx_signed,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx = str(tmp_path / "band_idx")
    g0 = _bandidx_banded(_bandidx_signed(docs.where(F.col("doc_id") % 3 == 1)))
    g0.withColumn("gen", F.lit(0)).write.partitionBy("gen").mode(
        "overwrite"
    ).parquet(idx)

    def snap_gen0():
        d = os.path.join(idx, "gen=0")
        return {
            f: (os.path.getsize(os.path.join(d, f)),
                os.path.getmtime(os.path.join(d, f)))
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        }

    before = snap_gen0()
    assert before, "gen=0 partition must contain parquet files"

    g1 = _bandidx_banded(_bandidx_signed(docs.where(F.col("doc_id") % 3 == 2)))
    g1.withColumn("gen", F.lit(1)).write.partitionBy("gen").mode(
        "append"
    ).parquet(idx)

    assert snap_gen0() == before, "append rewrote gen=0 files"
    assert os.path.isdir(os.path.join(idx, "gen=1"))

    merged = spark.read.parquet(idx)
    n0, n1 = g0.count(), g1.count()
    assert merged.count() == n0 + n1
    assert merged.where(F.col("gen") == 0).count() == n0
    assert merged.where(F.col("gen") == 1).count() == n1


def test_tombstone_delete_flips_orphaned_variants_to_novel(duck):
    """The tombstone query's semantic teeth: a probe variant whose ONLY
    near-dup was deleted must classify 'novel' once the tombstones hide
    it.  Checked oracle-side (both engines are hash-equal per the parity
    suite, so the oracle carries the semantics)."""
    from big_data_analytics_project_spark.plans.dedup_queries import (
        _DUCK_BAND_DELETE,
    )

    with_del = duck.execute(_DUCK_BAND_DELETE).fetchdf()
    no_del = duck.execute(
        _DUCK_BAND_DELETE.replace(
            "WHERE NOT (doc_id % 3 = 1 AND doc_id % 5 = 0)", ""
        )
    ).fetchdf()
    m = with_del.merge(no_del, on="doc_id", suffixes=("_d", "_n"))
    flipped = (
        (m.status_n == "near_dup_of_index") & (m.status_d == "novel")
    ).sum()
    assert flipped > 0, "delete wave must orphan at least one variant"
    # deletion can only REMOVE matches, never add them
    assert (m.n_matches_d <= m.n_matches_n).all()
