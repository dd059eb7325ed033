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
    assert r["n_train"] + r["n_holdout"] == r["n_after_neardup"]
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
