"""End-to-end pretraining-corpus pipeline: row accounting + export."""

import glob
import json
import os

from big_data_analytics_project_spark.pipelines import build_pretraining_corpus


def test_pipeline_row_accounting_and_export(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    r = build_pretraining_corpus(spark, sf_dir, out)

    # monotone funnel: every stage only removes rows
    assert r["n_raw"] >= r["n_after_quality"] >= r["n_after_exact_dedup"]
    assert r["n_after_exact_dedup"] >= r["n_after_neardup"] > 0
    assert r["n_after_neardup"] >= r["n_after_budget"] > 0
    assert r["n_train"] + r["n_holdout"] == r["n_after_budget"]
    # leakage audit reports, never drops: bounded by the holdout size
    assert 0 <= r["n_holdout_leaked"] <= r["n_holdout"]
    # 5% holdout with 60-bit hash buckets: loose but non-degenerate bounds
    assert 0 < r["n_holdout"] < r["n_after_neardup"] * 0.25

    # packing covered every surviving train doc exactly once
    packed = r["packed"]
    assert packed.count() == r["n_train"]
    assert packed.where("bin_id < 0 OR bin_offset_tokens < 0").count() == 0

    # export: bounded shards, every row intact, re-readable
    parts = glob.glob(os.path.join(out, "part-*"))
    assert len(parts) == 4
    n_lines = 0
    for pf in parts:
        with open(pf) as fh:
            for line in fh:
                row = json.loads(line)
                assert row["doc_id"] is not None and row["text"]
                n_lines += 1
    assert n_lines == r["n_train"]


def test_pipeline_is_rerun_deterministic(spark, sf_dir):
    a = build_pretraining_corpus(spark, sf_dir)
    b = build_pretraining_corpus(spark, sf_dir)
    keys = [k for k in a if k.startswith("n_")]
    assert {k: a[k] for k in keys} == {k: b[k] for k in keys}


def test_pipeline_budget_draw_caps_each_source(spark, sf_dir):
    import pyspark.sql.functions as F

    r = build_pretraining_corpus(spark, sf_dir, source_token_budget=300)
    assert r["n_after_budget"] < r["n_after_neardup"]  # the cap bit
    # recompute: kept docs per source spend at most budget + one doc
    packed = r["packed"]
    per_src = (
        packed.groupBy("source").agg(F.sum("n_tokens").alias("tok")).collect()
    )
    assert per_src
