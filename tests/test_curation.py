"""Curation operators: deterministic sampling, sequence packing, int8
embedding quantization."""

import math

import pyspark.sql.functions as F

from big_data_analytics_project_spark.operators.embeddings import (
    absmax_scale,
    quantize_int8,
)
from big_data_analytics_project_spark.operators.packing import (
    pack_linear,
    whitespace_token_count,
)
from big_data_analytics_project_spark.operators.sampling import (
    deterministic_sample,
    hash_bucket,
)
from big_data_analytics_project_spark.sources import read_table


def test_sample_invariant_to_partitioning_and_close_to_rate(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    a = {r["event_id"] for r in deterministic_sample(ev, F.col("event_id"), 20).collect()}
    b = {
        r["event_id"]
        for r in deterministic_sample(
            ev.repartition(13, "user_id"), F.col("event_id"), 20
        ).collect()
    }
    assert a == b, "hash sampling must not depend on partitioning"
    n = ev.count()
    # binomial 5-sigma envelope around 20%
    sigma = math.sqrt(n * 0.2 * 0.8)
    assert abs(len(a) - 0.2 * n) < 5 * sigma


def test_sample_nested_rates(spark, sf_dir):
    """bucket < 10 is a subset of bucket < 20: raising the rate only ADDS
    rows (stable incremental splits — the property RNG sampling lacks)."""
    ev = read_table(spark, sf_dir, "events")
    small = {r["event_id"] for r in deterministic_sample(ev, F.col("event_id"), 10).collect()}
    big = {r["event_id"] for r in deterministic_sample(ev, F.col("event_id"), 20).collect()}
    assert small <= big


def test_hash_bucket_range(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select(
        hash_bucket(F.col("event_id")).alias("b")
    )
    row = ev.agg(F.min("b").alias("lo"), F.max("b").alias("hi")).collect()[0]
    assert 0 <= row["lo"] and row["hi"] <= 99


def test_pack_linear_bins_and_offsets(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", whitespace_token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_linear(docs, "lang", "doc_id", "n_tokens", budget=2048).collect()
    max_tokens = max(r["n_tokens"] for r in packed)
    by_shard_bin = {}
    for r in packed:
        by_shard_bin.setdefault((r["lang"], r["bin_id"]), []).append(r)
    for rows in by_shard_bin.values():
        total = sum(r["n_tokens"] for r in rows)
        # linear packing: a bin holds its budget plus at most one straddler
        assert total < 2048 + max_tokens
    # offsets are a contiguous token stream per shard
    by_shard = {}
    for r in packed:
        by_shard.setdefault(r["lang"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        pos = 0
        for r in rows:
            assert r["bin_offset_tokens"] == pos
            assert r["bin_id"] == pos // 2048
            pos += r["n_tokens"]


def test_quantize_int8_roundtrip_error_and_zero_vector(spark):
    data = [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0]), (3, [2.0])]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r
        for r in df.select(
            "vec_id",
            "embedding",
            absmax_scale(F.col("embedding")).alias("scale"),
        )
        .select(
            "vec_id",
            "embedding",
            "scale",
            quantize_int8(F.col("embedding"), F.col("scale")).alias("q"),
        )
        .collect()
    }
    assert out[2]["q"] == [0, 0, 0] and out[2]["scale"] == 0.0
    assert out[3]["q"] == [127]
    r = out[1]
    for x, code in zip(r["embedding"], r["q"]):
        assert -127 <= code <= 127
        # dequantized value within half a quantization step
        assert abs(code * r["scale"] / 127.0 - x) <= r["scale"] / 127.0 / 2 + 1e-9


def test_scd2_merge_micro(spark):
    from big_data_analytics_project_spark.operators.scd import scd2_merge

    current = spark.createDataFrame(
        [
            (1, "A", 100, None),   # will change → close + reopen
            (2, "B", 100, None),   # unchanged
            (1, "Z", 50, 100),     # closed history row — untouched
        ],
        "k long, attr string, valid_from_epoch long, valid_to_epoch long",
    )
    updates = spark.createDataFrame(
        [(1, "C"), (2, "B"), (9, "N")], "k long, attr string"
    )
    rows = {
        (r["k"], r["attr"], r["valid_from_epoch"], r["valid_to_epoch"])
        for r in scd2_merge(current, updates, "k", "attr", 200).collect()
    }
    assert rows == {
        (1, "Z", 50, 100),     # history preserved
        (1, "A", 100, 200),    # closed at update time
        (1, "C", 200, None),   # new open version
        (2, "B", 100, None),   # same value → untouched
        (9, "N", 200, None),   # brand-new key opens
    }


def test_dq_rules_detect_planted_violations(spark):
    from big_data_analytics_project_spark.operators import quality as Q

    df = spark.createDataFrame(
        [(1, "ok", 5.0), (2, None, 150.0), (2, "Bad Value", None)],
        "id long, name string, v double",
    )
    parent = spark.createDataFrame([(1,)], "id long")
    got = {
        r["rule"]: r["n_violations"]
        for r in Q.audit([
            Q.predicate_rules(df, [
                ("name_not_null", Q.not_null("name")),
                ("v_range", Q.in_range("v", 0, 100)),
                ("name_enum", Q.matches("name", "[a-z]+")),
            ]),
            Q.unique("id_unique", df, ["id"]),
            Q.references("id_fk", df, "id", parent, "id"),
        ]).collect()
    }
    assert got == {
        "name_not_null": 1,   # one null name
        "v_range": 1,         # 150 out of range (null v is not a violation)
        "name_enum": 1,       # 'Bad Value' fails full-match, null skipped
        "id_unique": 1,       # key 2 appears twice → one violating key
        "id_fk": 2,           # both id=2 rows orphaned
    }


def test_scd2_plan_single_join_single_scan_pair(spark, sf_dir):
    """The scale claim: one materialized full-outer join; no union branch
    re-runs the join or re-scans the inputs."""
    import re

    from big_data_analytics_project_spark.operators.scd import scd2_merge

    cust = read_table(spark, sf_dir, "customer")
    current = cust.select(
        "c_custkey", "c_mktsegment",
        F.lit(100).cast("long").alias("valid_from_epoch"),
        F.lit(None).cast("long").alias("valid_to_epoch"),
    )
    updates = cust.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", F.lit("MOBILE").alias("c_mktsegment")
    )
    plan = (
        scd2_merge(current, updates, "c_custkey", "c_mktsegment", 200)
        ._jdf.queryExecution().executedPlan().toString()
    )
    top = plan.split("InMemoryRelation")[0]
    assert "Join" not in top, top[:600]          # all branches read the cache
    assert len(re.findall(r"InMemoryTableScan", plan)) >= 3


def test_predicate_rules_share_one_scan(spark, sf_dir):
    import re

    from big_data_analytics_project_spark.operators import quality as Q

    ev = read_table(spark, sf_dir, "events")
    plan = (
        Q.predicate_rules(ev, [
            ("a", Q.not_null("value")),
            ("b", Q.in_range("value", 0, 1000)),
            ("c", Q.matches("event_type", "[a-z_]+")),
        ])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert len(re.findall(r"FileScan", plan)) == 1, plan[:400]


def test_chunk_documents_overlap_and_reconstruction(spark):
    from big_data_analytics_project_spark.operators.packing import chunk_documents

    text = " ".join(f"t{i}" for i in range(100))  # 100 tokens
    df = spark.createDataFrame([(1, text), (2, "short doc")], "doc_id long, text string")
    out = sorted(
        ((r["doc_id"], r["chunk_id"], r["chunk_start_token"],
          r["chunk_text"], r["chunk_n_tokens"])
         for r in chunk_documents(df, "text", 64, 16).collect()),
    )
    short = [c for c in out if c[0] == 2]
    assert len(short) == 1 and short[0][3] == "short doc" and short[0][4] == 2

    long_chunks = [c for c in out if c[0] == 1]
    # 100 tokens, chunk 64, stride 48 → chunks at 0 and 48
    assert [c[2] for c in long_chunks] == [0, 48]
    a, b = long_chunks[0][3].split(), long_chunks[1][3].split()
    assert len(a) == 64 and len(b) == 52  # last chunk short
    assert a[48:] == b[:16]  # 16-token overlap carried
    # every token appears; stride-union reconstructs the doc
    assert a + b[16:] == text.split()


def test_mask_span_corruption_accounting(spark, sf_dir, registry):
    """Structural invariants of the deterministic masker: every span masks
    at most 3 tokens (overlaps only shrink coverage), ratios are
    consistent, and the corpus-level realized mask rate sits near the
    0.08 x 3 = 24% target (below it, because spans overlap and truncate
    at the document end)."""
    rows = registry["mask_span_corruption"].fn(spark, sf_dir).collect()
    assert rows
    tot_tokens = tot_masked = 0
    for r in rows:
        assert 0 <= r.n_spans <= r.n_tokens
        assert r.n_masked <= 3 * r.n_spans
        assert r.n_masked >= r.n_spans  # each start masks >= itself
        assert abs(r.mask_ratio - r.n_masked / r.n_tokens) < 1e-12
        tot_tokens += r.n_tokens
        tot_masked += r.n_masked
    rate = tot_masked / tot_tokens
    assert 0.15 < rate < 0.24, rate


def test_mask_span_corruption_is_rerun_deterministic(spark, sf_dir, registry):
    fn = registry["mask_span_corruption"].fn
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b


def test_interleave_schedule_stride_property(spark, sf_dir, registry):
    """Stride scheduling: within each source, positions advance by exactly
    1/weight; and in any position-sorted prefix the per-source share
    tracks weight share to within one stride."""
    rows = registry["mix_interleave_schedule"].fn(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    total_w = sum(rs[0].weight for rs in by_src.values())
    n = len(rows)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.src_rank)
        w = rs[0].weight
        for i, r in enumerate(rs, start=1):
            assert r.src_rank == i
            assert abs(r.position - (i - 0.5) / w) < 1e-9
    # proportionality: first half of the merged stream carries each source
    # at ~ w/total_w of its docs-per-weight budget
    merged = sorted(rows, key=lambda r: (r.position, r.source, r.doc_id))
    half = merged[: n // 2]
    cut = half[-1].position
    for src, rs in by_src.items():
        w = rs[0].weight
        expect = min(len(rs), int(cut * w + 0.5))
        got = sum(1 for r in half if r.source == src)
        assert abs(got - expect) <= 1, (src, got, expect)


def test_l2_normalize_unit_norm(spark, sf_dir, registry):
    """Reassembled vectors must have unit L2 norm (within fp eps) unless
    the source vector was zero."""
    import math

    rows = registry["embedding_l2_normalize"].fn(spark, sf_dir).collect()
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, []).append(r)
    assert by_vec
    for vec_id, rs in by_vec.items():
        norm = rs[0].norm
        s = sum(r.val * r.val for r in rs)
        if norm == 0.0:
            assert all(r.val == 0.0 for r in rs)
        else:
            assert abs(math.sqrt(s) - 1.0) < 1e-9, (vec_id, s)
