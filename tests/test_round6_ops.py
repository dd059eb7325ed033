"""Behavioral invariants for the late round-6 operators — properties the
oracle diff can't express (it proves Spark==DuckDB, not that both are
right).  Each invariant is the operator's defining contract."""

import pyspark.sql.functions as F

from big_data_analytics_project_spark.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def test_transition_probabilities_sum_to_one_per_src(spark, sf_dir):
    rows = (
        _q("path_transition_matrix", spark, sf_dir)
        .groupBy("src")
        .agg(F.sum("p_transition").alias("p_sum"))
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["p_sum"] - 1.0) < 1e-9, r


def test_batching_respects_size_and_waste_bounds(spark, sf_dir):
    rows = _q("batch_length_buckets", spark, sf_dir).collect()
    assert rows
    from big_data_analytics_project_spark.plans.curation_queries import (
        _BATCH_SIZE,
    )

    for r in rows:
        assert 1 <= r["n_docs"] <= _BATCH_SIZE
        # max is a pow2-bucket member: sum <= n*max, waste exact
        assert r["pad_waste"] == r["n_docs"] * r["max_tokens"] - r["sum_tokens"]
        assert r["pad_waste"] >= 0
        # every doc in the batch shares the bucket: max < 2^(log2_bucket+1)
        assert r["max_tokens"] < 2 ** (r["log2_bucket"] + 1)
        assert r["max_tokens"] >= 2 ** r["log2_bucket"]


def test_psi_bins_cover_all_events(spark, sf_dir):
    from big_data_analytics_project_spark.sources import read_table

    out = _q("drift_psi_bins", spark, sf_dir)
    tot = out.agg(
        F.sum(F.col("n_ref") + F.col("n_new")).alias("n")
    ).collect()[0]["n"]
    n_events = read_table(spark, sf_dir, "events").count()
    assert tot == n_events  # every event lands in exactly one (bin, period)


def test_oov_rate_bounds_and_exactness(spark, sf_dir):
    rows = _q("vocab_oov_rate", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert r["oov_rate"] == r["n_oov"] / r["n_tokens"]


def test_seasonal_naive_forecast_alignment(spark, sf_dir):
    rows = {r["day"]: r for r in _q(
        "forecast_seasonal_naive", spark, sf_dir
    ).collect()}
    days = sorted(rows)
    # a forecast exists exactly where day-7 had revenue
    for d in days:
        if d - 7 in rows:
            assert rows[d]["forecast"] == rows[d - 7]["actual"]
            # the column is DECIMAL-exact (|a−f| computed on decimals,
            # then cast); recompute via Decimal, not float subtraction
            from decimal import Decimal

            want = abs(
                Decimal(str(rows[d]["actual"]))
                - Decimal(str(rows[d]["forecast"]))
            )
            assert Decimal(str(rows[d]["abs_err"])) == want
        else:
            assert rows[d]["forecast"] is None


def test_abtest_arms_partition_users(spark, sf_dir):
    from big_data_analytics_project_spark.sources import read_table

    r = _q("abtest_conversion_lift", spark, sf_dir).collect()[0]
    n_users = (
        read_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r["n_users_a"] + r["n_users_b"] == n_users
    assert 0 <= r["n_conv_a"] <= r["n_users_a"]
    assert 0 <= r["n_conv_b"] <= r["n_users_b"]
    # hash assignment is deterministic: a rerun reproduces the same arms
    r2 = _q("abtest_conversion_lift", spark, sf_dir).collect()[0]
    assert r == r2


def test_budget_select_meets_or_exhausts_each_source(spark, sf_dir):
    from big_data_analytics_project_spark.plans.curation_queries import (
        _MIX_BUDGET_TOKENS,
    )
    from big_data_analytics_project_spark.sources import read_table

    sel = _q("mix_budget_select", spark, sf_dir).collect()
    per_src = {}
    for r in sel:
        cur = per_src.setdefault(r["source"], {"n": 0, "last_cum": 0})
        cur["n"] += 1
        cur["last_cum"] = max(cur["last_cum"], r["cum_tokens"])
    n_docs_by_src = {
        r["source"]: r["n"]
        for r in read_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for src, cur in per_src.items():
        # either the budget is met (first-crossing doc included) or the
        # source ran out of documents entirely
        assert (
            cur["last_cum"] >= _MIX_BUDGET_TOKENS
            or cur["n"] == n_docs_by_src[src]
        ), (src, cur)
