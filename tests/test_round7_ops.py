"""Behavioral invariants for the round-7 operators — properties the
oracle diff can't express (it proves Spark==DuckDB, not that both are
right).  Each invariant is the operator's defining contract."""

import pyspark.sql.functions as F

from big_data_analytics_project_spark.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


def test_km_survival_is_monotone_nonincreasing_from_one(spark, sf_dir):
    rows = sorted(
        _q("survival_kaplan_meier", spark, sf_dir).collect(),
        key=lambda r: r["duration_day"],
    )
    assert rows
    prev = 1.0 + 1e-9
    for r in rows:
        assert 0.0 <= r["survival"] <= prev, r
        prev = r["survival"]
        assert r["n_events"] + r["n_censored"] <= r["n_at_risk"], r
    # risk sets shrink as time advances
    risks = [r["n_at_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_km_at_risk_accounting_is_exact(spark, sf_dir):
    rows = sorted(
        _q("survival_kaplan_meier", spark, sf_dir).collect(),
        key=lambda r: r["duration_day"],
    )
    # each day's at-risk = previous at-risk minus everyone who exited then
    for a, b in zip(rows, rows[1:]):
        assert b["n_at_risk"] == a["n_at_risk"] - a["n_events"] - a["n_censored"]


def test_cusum_state_bounds_and_alarm_consistency(spark, sf_dir):
    r = _q("anomaly_cusum_shift", spark, sf_dir).collect()[0]
    assert r["cusum_pos"] >= 0 and r["cusum_neg"] >= 0
    assert r["max_cusum_pos"] >= r["cusum_pos"]
    assert r["max_cusum_neg"] >= r["cusum_neg"]
    assert 0 <= r["n_alarm_days"] <= r["n_days"]
    # no alarm is possible unless some excursion crossed 4 sigma
    if r["n_alarm_days"] > 0:
        h = 4.0 * r["sigma_daily"]
        assert max(r["max_cusum_pos"], r["max_cusum_neg"]) > h - 1e-6


def test_cusum_detects_planted_level_shift(spark):
    # 30 flat days then 30 days shifted by +6: the positive CUSUM must
    # alarm and the negative side must stay quiet
    import pandas as pd

    from big_data_analytics_project_spark.plans.temporal_queries import (
        anomaly_cusum_shift,
    )

    # build a tiny parquet fixture in a temp dir with the events schema
    import os
    import tempfile

    rows = []
    eid = 0
    for d in range(60):
        n = 10 if d < 30 else 16
        for i in range(n):
            eid += 1
            rows.append(
                {
                    "event_id": eid,
                    "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(days=d, minutes=i),
                    "user_id": i,
                    "event_type": "view",
                    "value": 1.0,
                    "props": "{}",
                }
            )
    tmp = tempfile.mkdtemp(prefix="bdap_cusum_")
    pd.DataFrame(rows).to_parquet(os.path.join(tmp, "events.parquet"))
    out = anomaly_cusum_shift(spark, tmp).collect()[0]
    # a step change relative to the GLOBAL mean drives both sides: the
    # low first half feeds s-, the high second half feeds s+ — both must
    # breach the 4-sigma interval, and alarms must fire
    assert out["n_alarm_days"] > 0
    h = 4.0 * out["sigma_daily"]
    assert out["max_cusum_pos"] > h and out["max_cusum_neg"] > h


def test_benford_shares_partition_and_match_theory_shape(spark, sf_dir):
    rows = {r["digit"]: r for r in _q("dq_benford_leading_digit", spark, sf_dir).collect()}
    assert set(rows) <= set(range(1, 10))
    assert abs(sum(r["observed_share"] for r in rows.values()) - 1.0) < 1e-4
    # theoretical shares decrease in d and sum to 1
    bs = [rows[d]["benford_share"] for d in sorted(rows)]
    assert bs == sorted(bs, reverse=True)
    assert abs(sum(bs) - 1.0) < 1e-4


def test_pps_sampling_favors_longer_documents(spark, sf_dir):
    rows = _q("sample_weighted_pps", spark, sf_dir).collect()
    n = sum(r["n_docs"] for r in rows)
    kept = sum(r["n_kept"] for r in rows)
    chars = sum(r["total_chars"] for r in rows)
    kept_chars = sum(r["kept_chars"] for r in rows)
    assert 0 < kept < n
    # by-construction bias: the kept set's char share must exceed its
    # doc share (longer docs are more likely to be kept)
    assert kept_chars / chars > kept / n


def test_fold_assignment_covers_and_balances(spark, sf_dir):
    rows = _q("ml_fold_assignment", spark, sf_dir).collect()
    folds = {r["fold"] for r in rows}
    assert folds <= set(range(5))
    by_fold = {}
    for r in rows:
        by_fold[r["fold"]] = by_fold.get(r["fold"], 0) + r["n_docs"]
    total = sum(by_fold.values())
    # every doc is in exactly one fold (counts partition the corpus)
    from big_data_analytics_project_spark.sources import read_table

    assert total == read_table(spark, sf_dir, "documents").count()
    # hash-balance: no fold is off the uniform share by more than 2x
    for v in by_fold.values():
        assert total / 10 <= v <= total * 2 / 5


def test_skipgram_pairs_are_vocab_bounded_and_ranked(spark, sf_dir):
    from big_data_analytics_project_spark.plans.text_queries import (
        _SKIPGRAM_TOP,
        _SKIPGRAM_VOCAB_K,
    )

    rows = _q("text_skipgram_pairs", spark, sf_dir).collect()
    assert 0 < len(rows) <= _SKIPGRAM_TOP
    vocab = {r["term_a"] for r in rows} | {r["term_b"] for r in rows}
    assert len(vocab) <= _SKIPGRAM_VOCAB_K
    counts = [r["n_pairs"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert counts == sorted(counts, reverse=True)


def test_keep_best_quality_keeps_the_argmax_member(spark, sf_dir):
    rows = _q("dedup_keep_best_quality", spark, sf_dir).collect()
    assert rows
    # planted groups exist (every 7th doc has a variant) and a canonical
    # row is emitted per fingerprint exactly once
    fps = [r["fingerprint"] for r in rows]
    assert len(fps) == len(set(fps))
    assert any(r["n_copies"] >= 2 for r in rows)
    for r in rows:
        assert 0.0 <= r["keep_quality"] <= 1.0 + 1e-9


def test_engagement_calibration_accounting_is_exact(spark, sf_dir):
    rows = _q("ml_engagement_calibration", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_users"] > 0
        assert abs(
            r["purchases_per_user"] - round(r["total_purchases"] / r["n_users"], 6)
        ) < 1e-9
    # lift must average to ~1 weighted by purchases share
    tot_u = sum(r["n_users"] for r in rows)
    tot_p = sum(r["total_purchases"] for r in rows)
    w = sum(r["purchase_lift"] * r["n_users"] for r in rows) / tot_u
    assert abs(w - 1.0) < 0.01, (w, tot_u, tot_p)


def test_binary_dedup_finds_exactly_the_planted_copies(spark, sf_dir):
    from big_data_analytics_project_spark.sources import read_table

    rows = _q("multimodal_binary_dedup", spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents")
    planted = docs.where(F.col("doc_id") % 5 == 0).count()
    # fixture texts are unique, so every dup group is a planted pair
    assert len(rows) == planted
    for r in rows:
        assert r["n_copies"] == 2
        assert r["canonical_doc_id"] < 2000000  # canonical is the original


def test_merge_upsert_change_classes_account_for_everything(spark, sf_dir):
    from big_data_analytics_project_spark.sources import read_table

    rows = _q("maintenance_merge_upsert", spark, sf_dir).collect()
    cust = read_table(spark, sf_dir, "customer")
    n_cust = cust.count()
    n_upd = cust.where(F.col("c_custkey") % 7 == 0).count()
    by_class = {}
    for r in rows:
        by_class[r["change_class"]] = by_class.get(r["change_class"], 0) + r["n_rows"]
    assert by_class.get(0, 0) == n_cust - n_upd
    assert by_class.get(1, 0) == n_upd
    assert by_class.get(2, 0) == 50
    # every updated row went MOBILE, every inserted ONLINE
    for r in rows:
        if r["change_class"] == 1:
            assert r["c_mktsegment"] == "MOBILE"
        if r["change_class"] == 2:
            assert r["c_mktsegment"] == "ONLINE"


def test_association_rules_metric_bounds(spark, sf_dir):
    rows = _q("basket_association_rules", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert 0 < r["support"] <= 1
        assert 0 < r["confidence"] <= 1
        assert r["n_ab"] <= min(r["n_a"], r["n_b"])
        # the top rules by lift should associate beyond independence
        assert r["lift"] > 0


def test_growth_accounting_partitions_daily_actives(spark, sf_dir):
    from big_data_analytics_project_spark.sources import read_table

    rows = _q("retention_growth_accounting", spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / 86400).cast("long")
    dau = {
        r["day"]: r["n"]
        for r in ev.select("user_id", day.alias("day"))
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    by_day = {}
    for r in rows:
        by_day.setdefault(r["day"], 0)
        by_day[r["day"]] += r["n_users"]
        assert r["activity_class"] in {"new", "retained", "resurrected"}
    assert by_day == dau  # classes exactly partition each day's actives
    # day 0 actives are all new
    d0 = min(by_day)
    d0_classes = {r["activity_class"] for r in rows if r["day"] == d0}
    assert d0_classes == {"new"}


def test_dow_adjusted_zscores_center_per_weekday(spark, sf_dir):
    rows = _q("anomaly_dow_adjusted", spark, sf_dir).collect()
    assert rows
    by_dow = {}
    for r in rows:
        if r["z_score"] is not None:
            by_dow.setdefault(r["dow"], []).append(r["z_score"])
        assert r["is_anomaly"] == (
            r["z_score"] is not None and abs(r["z_score"]) > 2.0
        )
    for dow, zs in by_dow.items():
        # standardized residuals per weekday average to ~0
        assert abs(sum(zs) / len(zs)) < 1e-3, (dow, zs)


def test_doc_keywords_rank_is_dense_per_doc(spark, sf_dir):
    rows = _q("text_doc_keywords", spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["rank"])
    for doc, ranks in by_doc.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), doc


def test_int8_recall_is_high_on_this_corpus(spark, sf_dir):
    rows = _q("embedding_int8_recall_audit", spark, sf_dir).collect()
    assert len(rows) == 5
    # int8 reconstruction error is ~0.4% of absmax; top-10 should survive
    for r in rows:
        assert r["recall_at_10"] >= 0.7, rows


def test_centroid_cosines_are_valid_and_complete(spark, sf_dir):
    rows = _q("embedding_label_centroids", spark, sf_dir).collect()
    labels = {r["label_a"] for r in rows} | {r["label_b"] for r in rows}
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2  # every unordered pair once
    for r in rows:
        assert -1.0 - 1e-6 <= r["centroid_cosine"] <= 1.0 + 1e-6


def test_ks_statistic_is_a_valid_distance(spark, sf_dir):
    r = _q("abtest_ks_statistic", spark, sf_dir).collect()[0]
    assert 0.0 <= r["ks_d"] <= 1.0
    assert r["critical_005"] > 0
    assert r["reject_at_005"] == (r["ks_d"] > r["critical_005"])


def test_time_bounded_funnel_is_dominated_by_unbounded(spark, sf_dir):
    tb = {r["stage"]: r["n_users"] for r in _q("funnel_time_bounded", spark, sf_dir).collect()}
    ub = {r["stage"]: r["n_users"] for r in _q("funnel_ordered_stages", spark, sf_dir).collect()}
    assert tb["view"] == ub["view"]
    assert tb["click_within_24h"] <= ub["view_click"]
    assert tb["purchase_within_24h"] <= tb["click_within_24h"] <= tb["view"]


def test_position_weights_never_exceed_full_credit(spark, sf_dir):
    rows = _q("attribution_position_weighted", spark, sf_dir).collect()
    assert rows
    # total credited micro-cents <= total purchase cents * 1e6 (remainder
    # from middle-split floor division is dropped, never over-credited)
    from big_data_analytics_project_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events")
    cents = ev.where(F.col("event_type") == "purchase").agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("c")
    ).collect()[0]["c"]
    credited = sum(r["credit_micro_cents"] for r in rows)
    assert credited <= cents * 1_000_000
    assert credited >= cents * 1_000_000 * 0.5  # most epochs have touches


def test_curriculum_phases_order_by_quality(spark, sf_dir):
    rows = _q("curriculum_phase_assignment", spark, sf_dir).collect()
    by_phase = {}
    for r in rows:
        agg = by_phase.setdefault(r["phase"], [0, 0.0])
        agg[0] += r["n_docs"]
        agg[1] += r["mean_quality"] * r["n_docs"]
    assert set(by_phase) == {0, 1, 2}
    means = [by_phase[p][1] / by_phase[p][0] for p in (0, 1, 2)]
    assert means[0] <= means[1] <= means[2]
    sizes = [by_phase[p][0] for p in (0, 1, 2)]
    assert max(sizes) - min(sizes) <= 1 * 3  # tertiles are near-equal


def test_heatmap_covers_the_week_and_sums_to_corpus(spark, sf_dir):
    from big_data_analytics_project_spark.sources import read_table

    rows = _q("eda_hour_of_week_heatmap", spark, sf_dir).collect()
    assert all(0 <= r["dow"] <= 6 and 0 <= r["hour"] <= 23 for r in rows)
    total = sum(r["n_events"] for r in rows)
    assert total == read_table(spark, sf_dir, "events").count()
    assert all(r["n_purchases"] <= r["n_events"] for r in rows)


def test_uniqueness_profile_flags_the_key_column(spark, sf_dir):
    rows = {r["col"]: r for r in _q("eda_uniqueness_profile", spark, sf_dir).collect()}
    assert rows["event_id"]["is_unique_key"] is True
    assert rows["event_type"]["is_unique_key"] is False
    for r in rows.values():
        assert r["n_distinct"] <= r["n_nonnull"] <= r["n_rows"]
        assert r["duplication_factor"] >= 1.0


def test_wow_growth_is_lagged_consistently(spark, sf_dir):
    rows = sorted(
        _q("revenue_wow_growth", spark, sf_dir).collect(), key=lambda r: r["week"]
    )
    assert rows[0]["prev_rev_cents"] is None and rows[0]["wow_growth"] is None
    for a, b in zip(rows, rows[1:]):
        assert b["week"] == a["week"] + 1 or b["week"] > a["week"]
        assert b["prev_rev_cents"] == a["rev_cents"]
        if b["prev_rev_cents"]:
            expect = round(
                (b["rev_cents"] - b["prev_rev_cents"]) / b["prev_rev_cents"], 6
            )
            assert abs(b["wow_growth"] - expect) < 1e-9


def test_top_share_bounds_and_ordering(spark, sf_dir):
    r = _q("inequality_top_user_share", spark, sf_dir).collect()[0]
    assert 0 < r["top1pct_share"] <= r["top10pct_share"] <= 1.0
    # the top 1% must capture at least its population share of revenue
    assert r["top1pct_share"] >= r["top1pct_users"] / r["n_users"] - 1e-9


def test_langid_confusion_partitions_the_corpus(spark, sf_dir):
    from big_data_analytics_project_spark.sources import read_table

    rows = _q("quality_langid_mismatch", spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == read_table(
        spark, sf_dir, "documents"
    ).count()
    for r in rows:
        assert r["agrees"] == (r["labeled_lang"] == r["predicted_lang"])


def test_merge_upsert_vs_scd2_philosophies_agree_on_the_latest(spark, sf_dir):
    # the MERGE result's updated segment values must equal the OPEN rows
    # an SCD2 merge of the same update batch would produce (history
    # differs; the "current view" must not)
    rows = _q("maintenance_merge_upsert", spark, sf_dir).collect()
    mobile = sum(r["n_rows"] for r in rows if r["c_mktsegment"] == "MOBILE")
    from big_data_analytics_project_spark.sources import read_table

    cust = read_table(spark, sf_dir, "customer")
    n_upd = cust.where(F.col("c_custkey") % 7 == 0).count()
    n_native_mobile = cust.where(
        (F.col("c_mktsegment") == "MOBILE") & (F.col("c_custkey") % 7 != 0)
    ).count()
    assert mobile == n_upd + n_native_mobile


def test_entropy_bounded_by_log_vocab(spark, sf_dir):
    import math

    rows = _q("text_source_entropy", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["entropy_nats"] <= math.log(r["vocab_size"]) + 1e-6
        assert abs(r["perplexity"] - round(math.exp(r["entropy_nats"]), 2)) < max(
            0.01 * r["perplexity"], 0.02
        )
        assert r["vocab_size"] <= r["n_tokens"]


def test_abc_classes_respect_share_boundaries(spark, sf_dir):
    rows = sorted(
        _q("abc_brand_revenue", spark, sf_dir).collect(),
        key=lambda r: r["cum_revenue_share"],
    )
    assert rows[-1]["cum_revenue_share"] == 1.0
    shares = [r["cum_revenue_share"] for r in rows]
    assert shares == sorted(shares)
    for r in rows:
        if r["abc_class"] == "A":
            assert r["cum_revenue_share"] <= 0.80 + 1e-9
        elif r["abc_class"] == "B":
            assert 0.80 - 1e-9 < r["cum_revenue_share"] <= 0.95 + 1e-9
        else:
            assert r["cum_revenue_share"] > 0.95 - 1e-9
    assert {r["abc_class"] for r in rows} == {"A", "B", "C"}


def test_repeat_intervals_percentiles_are_ordered(spark, sf_dir):
    r = _q("repeat_purchase_intervals", spark, sf_dir).collect()[0]
    assert r["n_repeat_buyers"] > 0 and r["n_gaps"] >= r["n_repeat_buyers"]
    assert 0 <= r["p50_sec"] <= r["p90_sec"] <= r["p99_sec"]
    assert r["p50_sec"] <= r["mean_gap_sec"] * 3  # sanity, not theory


def test_migration_matrix_partitions_buyers(spark, sf_dir):
    from big_data_analytics_project_spark.sources import read_table

    rows = _q("segment_migration_matrix", spark, sf_dir).collect()
    n = sum(r["n_users"] for r in rows)
    buyers = (
        read_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert n == buyers  # every buyer lands in exactly one matrix cell
    for r in rows:
        assert 0 <= r["q_first_half"] <= 4 and 0 <= r["q_second_half"] <= 4
        assert not (r["q_first_half"] == 0 and r["q_second_half"] == 0)


def test_curation_funnel_is_monotone_and_budget_capped(spark, sf_dir):
    from big_data_analytics_project_spark.plans.curation_queries import (
        _PIPE_BUDGET,
    )

    rows = sorted(
        _q("pipeline_curation_accounting", spark, sf_dir).collect(),
        key=lambda r: r["stage_order"],
    )
    assert [r["stage"] for r in rows] == [
        "raw", "quality_gate", "dedup_keep_best", "pps_sample", "token_budget",
    ]
    for a, b in zip(rows, rows[1:]):
        assert b["n_docs"] <= a["n_docs"]
        assert b["n_tokens"] <= a["n_tokens"]
    # the budget stage caps tokens near sources x budget (first-crossing
    # doc included, so allow one doc's overshoot per source)
    assert rows[-1]["n_tokens"] <= 20 * _PIPE_BUDGET * 2


def test_fulfillment_lag_percentiles_are_ordered_per_priority(spark, sf_dir):
    rows = _q("ops_fulfillment_lag_by_priority", spark, sf_dir).collect()
    assert len(rows) == 5  # the five TPC-H priorities
    for r in rows:
        assert (
            r["min_days"] <= r["p50_days"] <= r["p90_days"] <= r["max_days"]
        ), r
        assert r["n_orders"] > 0


def test_sequential_patterns_are_strictly_ordered_and_confident(spark, sf_dir):
    rows = _q("basket_sequential_patterns", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["seq_confidence"] <= 1.0 + 1e-9
        assert r["n_ab"] <= r["n_a"]
    confs = [r["seq_confidence"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert confs == sorted(confs, reverse=True)
    # sequence is directional: (a,b) and (b,a) may both appear, but each
    # (a,b) cell appears once
    cells = [(r["part_a"], r["part_b"]) for r in rows]
    assert len(cells) == len(set(cells))
