"""Behavioral invariants for the round-7 closing batches (statistics,
graph components, layout pushdown, DQ/maintenance/seasonality) —
properties the oracle diff can't express (it proves Spark==DuckDB, not
that both are right)."""

import pyspark.sql.functions as F

from big_data_analytics_project_spark.registry import load_all


def _q(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir)


# --- Welch t-test ----------------------------------------------------------


def test_welch_moments_and_df_bounds(spark, sf_dir):
    r = _q("abtest_welch_ttest", spark, sf_dir).collect()[0]
    assert r["n_purchase"] > 1 and r["n_click"] > 1
    assert r["var_purchase_cents"] >= 0 and r["var_click_cents"] >= 0
    # t's sign must match the mean difference
    diff = r["mean_purchase_cents"] - r["mean_click_cents"]
    if r["t_stat"] is not None and abs(diff) > 1e-9:
        assert (r["t_stat"] > 0) == (diff > 0)
    # Welch-Satterthwaite df is bounded by min(n)-1 and n1+n2-2
    if r["welch_df"] is not None:
        assert (
            min(r["n_purchase"], r["n_click"]) - 1 - 1e-6
            <= r["welch_df"]
            <= r["n_purchase"] + r["n_click"] - 2 + 1e-6
        )


# --- Spearman --------------------------------------------------------------


def test_spearman_bounds_and_cell_accounting(spark, sf_dir):
    r = _q("agg_spearman_rank_corr", spark, sf_dir).collect()[0]
    # the synthetic fixture draws price independently of quantity, so the
    # value itself hovers near 0 (cross-checked against pandas rank corr)
    assert -1.0 - 1e-9 <= r["spearman_rho"] <= 1.0 + 1e-9
    assert r["n_quantity_values"] <= 50
    assert r["n_rows"] >= r["n_price_values"]


def test_spearman_is_one_on_planted_monotone_data(spark, tmp_path):
    import big_data_analytics_project_spark.plans.stats_queries as S

    # qty 1..40 with ties, price a strictly increasing function of qty:
    # a perfect monotone relation must score exactly rho = 1
    rows = [(float(i % 40 + 1), float((i % 40 + 1) * 7 + 0.25)) for i in range(200)]
    spark.createDataFrame(rows, "l_quantity double, l_extendedprice double").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    r = S.agg_spearman_rank_corr(spark, str(tmp_path)).collect()[0]
    assert abs(r["spearman_rho"] - 1.0) < 1e-9
    assert r["n_rows"] == 200 and r["n_quantity_values"] == 40


# --- ACF -------------------------------------------------------------------


def test_acf_lags_and_magnitude(spark, sf_dir):
    rows = sorted(
        _q("timeseries_acf_daily", spark, sf_dir).collect(),
        key=lambda r: r["lag_days"],
    )
    assert [r["lag_days"] for r in rows] == list(range(1, 8))
    # overlap shrinks by exactly one pair per extra lag on a dense grid
    pairs = [r["n_pairs"] for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    for r in rows:
        if r["acf"] is not None:
            assert abs(r["acf"]) <= 1.0 + 1e-6


# --- rolling correlation -----------------------------------------------------


def test_rolling_corr_window_and_bounds(spark, sf_dir):
    rows = _q("window_rolling_corr", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_window_days"] <= 7
        if r["rolling_corr"] is not None:
            assert -1.0 - 1e-9 <= r["rolling_corr"] <= 1.0 + 1e-9
    # a 1-day window has zero variance -> guarded null
    for r in rows:
        if r["n_window_days"] == 1:
            assert r["rolling_corr"] is None


# --- connected components ----------------------------------------------------


def test_connected_components_fixed_point_contract(spark, sf_dir):
    from big_data_analytics_project_spark.operators import graph as G
    from big_data_analytics_project_spark.sources import read_table

    li = read_table(spark, sf_dir, "lineitem")
    edges = G.copurchase_edges_with_support(li, 2).persist()
    labels = G.connected_components(edges).persist()
    # component id is the min reachable node -> never exceeds the node id
    assert labels.where(F.col("component") > F.col("node")).count() == 0
    # the defining contract: every edge's endpoints share a component
    a = labels.withColumnRenamed("node", "src").withColumnRenamed(
        "component", "ca"
    )
    b = labels.withColumnRenamed("node", "dst").withColumnRenamed(
        "component", "cb"
    )
    crossing = (
        edges.join(a, "src").join(b, "dst").where(F.col("ca") != F.col("cb"))
    )
    assert crossing.count() == 0
    # summary query accounts for every node exactly once
    total = (
        _q("graph_connected_components", spark, sf_dir)
        .agg(F.sum("n_nodes"))
        .collect()[0][0]
    )
    assert total == labels.count()
    edges.unpersist()
    labels.unpersist()


# --- runtime key pushdown ----------------------------------------------------


def test_pushdown_fallback_path_matches(spark, sf_dir, monkeypatch):
    import big_data_analytics_project_spark.plans.curation_queries as C

    fast = {
        tuple(sorted(r.asDict().items()))
        for r in _q("layout_runtime_key_pushdown", spark, sf_dir).collect()
    }
    # force the broadcast-semi-join fallback and require identical output
    monkeypatch.setattr(C, "_PUSHDOWN_MAX_KEYS", 0)
    slow = {
        tuple(sorted(r.asDict().items()))
        for r in C.layout_runtime_key_pushdown(spark, sf_dir).collect()
    }
    assert fast == slow


# --- hapax / TTR -------------------------------------------------------------


def test_hapax_accounting_inequalities(spark, sf_dir):
    rows = _q("text_hapax_ratio", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_hapax"] <= r["n_types"] <= r["n_tokens"]
        assert 0.0 < r["type_token_ratio"] <= 1.0
        assert 0.0 <= r["hapax_share"] <= 1.0


# --- embedding dim variance ---------------------------------------------------


def test_dim_variance_shape_and_nonnegativity(spark, sf_dir):
    rows = _q("embedding_dim_variance", spark, sf_dir).collect()
    assert len(rows) == 64
    ns = {r["n"] for r in rows}
    assert len(ns) == 1  # every dim sees every vector
    for r in rows:
        assert r["variance"] is None or r["variance"] >= 0.0


# --- referential integrity -----------------------------------------------------


def test_referential_integrity_clean_fixture(spark, sf_dir):
    rows = _q("dq_referential_integrity", spark, sf_dir).collect()
    assert len(rows) == 7
    for r in rows:
        assert r["n_child_rows"] > 0
        assert r["n_orphans"] == 0
        assert r["orphan_share"] == 0.0


def test_referential_integrity_detects_planted_orphan(spark, tmp_path, sf_dir):
    # copy the fixture, point one nation at a missing region, re-audit
    import shutil
    from pathlib import Path

    import big_data_analytics_project_spark.plans.curation_queries as C

    src = Path(sf_dir)
    dst = tmp_path / "broken"
    dst.mkdir()
    for f in src.glob("*.parquet"):
        shutil.copy(f, dst / f.name)
    nation = spark.read.parquet(str(dst / "nation.parquet"))
    broken = nation.withColumn(
        "n_regionkey",
        F.when(F.col("n_nationkey") == 0, F.lit(999)).otherwise(
            F.col("n_regionkey")
        ),
    )
    broken.write.mode("overwrite").parquet(str(dst / "nation_new"))
    (dst / "nation.parquet").unlink()
    shutil.move(str(dst / "nation_new"), str(dst / "nation.parquet"))
    rows = {
        r["fk"]: r
        for r in C.dq_referential_integrity(spark, str(dst)).collect()
    }
    assert rows["nation.n_regionkey -> region.r_regionkey"]["n_orphans"] == 1


# --- incremental aggregate -----------------------------------------------------


def test_incremental_agg_partition_is_exhaustive(spark, sf_dir):
    from big_data_analytics_project_spark.sources import read_table

    out = _q("maintenance_incremental_agg", spark, sf_dir)
    merged_n = out.agg(F.sum("n_orders")).collect()[0][0]
    assert merged_n == read_table(spark, sf_dir, "orders").count()


# --- backlog sweep-line --------------------------------------------------------


def test_backlog_conservation_and_nonnegativity(spark, sf_dir):
    rows = sorted(
        _q("ops_open_orders_backlog", spark, sf_dir).collect(),
        key=lambda r: r["month_key"],
    )
    assert rows
    run = 0
    for r in rows:
        run += r["n_opened"] - r["n_closed"]
        assert run == r["backlog_end"]
        assert r["backlog_end"] >= 0
    # every order eventually ships: the curve must close at zero
    assert rows[-1]["backlog_end"] == 0
    assert sum(r["n_opened"] for r in rows) == sum(
        r["n_closed"] for r in rows
    )


# --- monthly seasonality --------------------------------------------------------


def test_seasonality_index_weighted_mean_is_one(spark, sf_dir):
    rows = _q("timeseries_monthly_seasonality", spark, sf_dir).collect()
    assert 1 <= len(rows) <= 12
    n_all = sum(r["n_months"] for r in rows)
    weighted = sum(r["seasonal_index"] * r["n_months"] for r in rows) / n_all
    # the index is avg_m / grand_avg; its month-count-weighted mean is
    # exactly 1 up to the 6dp output rounding
    assert abs(weighted - 1.0) < 1e-3
    for r in rows:
        assert r["avg_monthly_revenue"] > 0
        assert r["seasonal_index"] > 0


# --- forward as-of ------------------------------------------------------------


def test_forward_asof_matches_within_window_and_direction(spark, sf_dir):
    rows = _q("asof_join_forward_event", spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["asof_ts_epoch"] is not None:
            assert r["asof_ts_epoch"] >= r["ts_epoch"]  # forward only
            assert 0 <= r["latency_sec"] <= 604800  # inside tolerance
            assert r["latency_sec"] == r["asof_ts_epoch"] - r["ts_epoch"]


def test_forward_asof_picks_the_nearest_following_row(spark):
    import datetime as dt

    from big_data_analytics_project_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0)], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, t0 - dt.timedelta(seconds=5), 100),  # before: ignored
            (1, t0 + dt.timedelta(seconds=9), 200),  # nearest following
            (1, t0 + dt.timedelta(seconds=60), 300),
        ],
        "k long, ts timestamp, v long",
    )
    out = asof_join(
        left, right, on=["k"], ts_col="ts", right_value_cols=["v"],
        direction="forward",
    ).collect()[0]
    assert out["asof_v"] == 200
    # tolerance below the gap nulls the match
    out2 = asof_join(
        left, right, on=["k"], ts_col="ts", right_value_cols=["v"],
        direction="forward", tolerance_sec=5,
    ).collect()[0]
    assert out2["asof_v"] is None


def test_forward_asof_equal_ts_is_inclusive(spark):
    import datetime as dt

    from big_data_analytics_project_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t0)], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, t0, 7)], "k long, ts timestamp, v long"
    )
    out = asof_join(
        left, right, on=["k"], ts_col="ts", right_value_cols=["v"],
        direction="forward",
    ).collect()[0]
    assert out["asof_v"] == 7
    assert out["asof_ts_epoch"] == int(out["ts"].timestamp())


# --- Zipf slope ----------------------------------------------------------------


def test_zipf_slope_is_negative_with_full_grid(spark, sf_dir):
    r = _q("text_zipf_slope", spark, sf_dir).collect()[0]
    assert r["n_terms"] <= 200
    # frequency is non-increasing in rank, so the fitted slope can't be
    # positive on any real rank-frequency curve
    assert r["zipf_slope"] <= 0.0
    assert 0.0 <= r["r_squared"] <= 1.0 + 1e-9


# --- weighted median -------------------------------------------------------------


def test_weighted_median_matches_numpy_definition(spark, sf_dir, duck):
    rows = {
        r["l_returnflag"]: r
        for r in _q("agg_weighted_median", spark, sf_dir).collect()
    }
    ref = duck.sql(
        """
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
               CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS w
        FROM lineitem
        """
    ).fetchdf()
    for flag, grp in ref.groupby("l_returnflag"):
        g = grp.sort_values("q")
        tot = int(g["w"].sum())
        cum = 0
        for qv, wv in zip(g["q"], g["w"]):
            cum += int(wv)
            if 2 * cum >= tot:
                expected = int(qv)
                break
        assert rows[flag]["weighted_median_qty"] == expected
        assert rows[flag]["total_weight_cents"] == tot


# --- Theil-Sen --------------------------------------------------------------------


def test_theilsen_pair_count_and_bounds(spark, sf_dir):
    r = _q("timeseries_theilsen_slope", spark, sf_dir).collect()[0]
    assert r["n_pairs"] == r["n_days"] * (r["n_days"] - 1) // 2
    # the median slope lies within the min/max pairwise slope by definition
    assert r["theilsen_slope_cents_per_day"] is not None


def test_theilsen_recovers_planted_linear_trend(spark, tmp_path):
    import datetime as dt

    import big_data_analytics_project_spark.plans.stats_queries as S

    # 20 days of purchases: one event per day with value = 10 + 2.5*day
    # dollars; the pairwise-slope median must be exactly 250 cents/day
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(days=i), 1, "purchase", 10.0 + 2.5 * i, "{}")
        for i in range(20)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = S.timeseries_theilsen_slope(spark, str(tmp_path)).collect()[0]
    assert abs(r["theilsen_slope_cents_per_day"] - 250.0) < 1e-9


# --- mode ------------------------------------------------------------------------


def test_mode_is_the_argmax_with_min_value_tiebreak(spark, sf_dir, duck):
    rows = {
        r["l_returnflag"]: r
        for r in _q("agg_mode_value", spark, sf_dir).collect()
    }
    ref = duck.sql(
        """
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
               count(*) AS c
        FROM lineitem GROUP BY 1, 2
        """
    ).fetchdf()
    for flag, grp in ref.groupby("l_returnflag"):
        best = grp.sort_values(["c", "q"], ascending=[False, True]).iloc[0]
        assert rows[flag]["mode_quantity"] == int(best["q"])
        assert rows[flag]["mode_count"] == int(best["c"])


# --- Naive Bayes -------------------------------------------------------------


def test_naive_bayes_confusion_accounting(spark, sf_dir):
    import pyspark.sql.functions as F  # noqa: F811

    from big_data_analytics_project_spark.operators.dedup import md5_hash60
    from big_data_analytics_project_spark.sources import read_table

    conf = _q("ml_naive_bayes_langid", spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents")
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    n_test = docs.where(
        md5_hash60(F.col("doc_id").cast("string")) % 5 == 0
    ).count()
    assert sum(r["n_docs"] for r in conf) == n_test
    for r in conf:
        assert r["lang_actual"] in langs and r["lang_pred"] in langs
        assert r["n_docs"] > 0


def test_naive_bayes_separates_disjoint_vocabularies(spark, tmp_path):
    import big_data_analytics_project_spark.plans.ml_queries as M

    # two languages with completely disjoint vocabularies: every held-out
    # doc must classify correctly regardless of the split
    rows = []
    for i in range(60):
        lang = "aa" if i % 2 == 0 else "bb"
        words = ("foo bar baz qux" if lang == "aa" else "uno dos tres cuatro")
        rows.append((i, f"{words} {words}", lang, "s", 8))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    conf = M.ml_naive_bayes_langid(spark, str(tmp_path)).collect()
    for r in conf:
        assert r["lang_actual"] == r["lang_pred"], r


# --- streaks ------------------------------------------------------------------


def test_streak_histogram_covers_every_user(spark, sf_dir):
    import pyspark.sql.functions as F  # noqa: F811

    from big_data_analytics_project_spark.sources import read_table

    rows = _q("retention_longest_streak", spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    n_days = (
        ev.select(
            F.floor(F.unix_timestamp("ts") / 86400).cast("long")
        )
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert 1 <= r["streak_days"] <= n_days


# --- rolling median ------------------------------------------------------------


def test_rolling_median_is_a_window_member(spark, sf_dir):
    rows = sorted(
        _q("timeseries_rolling_median", spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    daily = {r["day"]: None for r in rows}
    assert rows[0]["n_window_days"] == 1
    for r in rows:
        assert 1 <= r["n_window_days"] <= 7
    # windows grow by one per day over a dense grid until they saturate
    for prev, cur in zip(rows, rows[1:]):
        if cur["day"] == prev["day"] + 1 and prev["n_window_days"] < 7:
            assert cur["n_window_days"] == prev["n_window_days"] + 1
    assert daily  # non-empty grid


# --- SCD2 point-in-time lookup --------------------------------------------------


def test_pit_lookup_accounts_for_every_event(spark, sf_dir):
    from big_data_analytics_project_spark.sources import read_table

    rows = {r["tier"]: r for r in _q("scd2_point_in_time_lookup", spark, sf_dir).collect()}
    total = read_table(spark, sf_dir, "events").count()
    assert set(rows) == {"standard", "premium"}
    assert rows["standard"]["n_events"] + rows["premium"]["n_events"] == total
    # premium covers ~20% of users for ~half the window -> strictly less
    assert rows["premium"]["n_events"] < rows["standard"]["n_events"]


# --- Theil index -----------------------------------------------------------------


def test_theil_nonnegative_and_zero_on_equal_incomes(spark, sf_dir, tmp_path):
    import datetime as dt

    import big_data_analytics_project_spark.plans.stats_queries as S

    r = _q("inequality_theil_index", spark, sf_dir).collect()[0]
    assert r["theil_index"] >= 0.0
    assert r["n_users"] > 0 and r["mean_cents"] > 0
    # perfectly equal incomes -> Theil exactly 0
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, i, "purchase", 25.0, "{}") for i in range(50)]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r0 = S.inequality_theil_index(spark, str(tmp_path)).collect()[0]
    assert r0["theil_index"] == 0.0


# --- revenue reconciliation --------------------------------------------------------


def test_reconciliation_internal_consistency(spark, sf_dir):
    rows = _q("dq_revenue_reconciliation", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["orders_total"] > 0 and r["lineitem_charge"] > 0
        if r["rel_diff"] is not None:
            implied = r["orders_total"] * (1.0 + r["rel_diff"])
            # rel_diff is rounded to 6dp; totals are ~1e8, so the implied
            # product can drift by totals * 5e-7
            assert abs(implied - r["lineitem_charge"]) <= max(
                1e-6, abs(r["orders_total"]) * 1e-6
            )


# --- HHI ---------------------------------------------------------------------------


def test_hhi_bounds_and_equal_share_case(spark, sf_dir, tmp_path):
    import big_data_analytics_project_spark.plans.stats_queries as S

    r = _q("inequality_hhi_supplier", spark, sf_dir).collect()[0]
    n = r["n_suppliers"]
    assert 1.0 / n - 1e-9 <= r["hhi"] <= 1.0 + 1e-9
    assert 0 < r["effective_suppliers"] <= n + 1e-6
    # equal revenue for 8 suppliers -> hhi exactly 1/8
    rows = [(float(s), 100.0) for s in range(8) for _ in range(3)]
    spark.createDataFrame(
        rows, "l_suppkey double, l_extendedprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r0 = S.inequality_hhi_supplier(spark, str(tmp_path)).collect()[0]
    assert abs(r0["hhi"] - 0.125) < 1e-9
    assert abs(r0["effective_suppliers"] - 8.0) < 1e-9


# --- date dimension rollup --------------------------------------------------------


def test_quarter_rollup_accounts_for_every_order(spark, sf_dir):
    from big_data_analytics_project_spark.sources import read_table

    rows = _q("date_dimension_quarter_rollup", spark, sf_dir).collect()
    total = read_table(spark, sf_dir, "orders").count()
    assert sum(r["n_orders"] for r in rows) == total
    for r in rows:
        assert 1 <= r["quarter"] <= 4
        assert r["revenue_cents"] > 0


# --- percent of parent --------------------------------------------------------------


def test_percent_of_parent_shares_sum_to_one(spark, sf_dir):
    rows = _q("agg_percent_of_parent", spark, sf_dir).collect()
    assert len(rows) == 25  # TPC-H nations
    by_region = {}
    for r in rows:
        by_region.setdefault(r["region"], []).append(r)
    region_shares = {}
    for region, nations in by_region.items():
        assert abs(sum(n["share_of_region"] for n in nations) - 1.0) < 1e-4
        region_shares[region] = nations[0]["region_share_of_total"]
        # every nation in a region reports the same region share
        assert len({n["region_share_of_total"] for n in nations}) == 1
    assert abs(sum(region_shares.values()) - 1.0) < 1e-4


# --- bitmasks -------------------------------------------------------------------------


def test_bitmask_distribution_covers_every_user_day(spark, sf_dir):
    import pyspark.sql.functions as F  # noqa: F811

    from big_data_analytics_project_spark.sources import read_table

    rows = _q("agg_bitmask_event_types", spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    n_user_days = (
        ev.select(
            "user_id",
            F.floor(F.unix_timestamp("ts") / 86400).cast("long"),
        )
        .distinct()
        .count()
    )
    assert sum(r["n_user_days"] for r in rows) == n_user_days
    for r in rows:
        assert 1 <= r["mask"] <= 31
        assert r["has_purchase"] == bool(r["mask"] & 8)
        assert r["has_error"] == bool(r["mask"] & 16)


# --- BFS distances ------------------------------------------------------------------


def test_bfs_levels_contiguous_and_match_component(spark, sf_dir):
    rows = sorted(
        _q("graph_bfs_distances", spark, sf_dir).collect(),
        key=lambda r: r["dist"],
    )
    # levels run 0..ecc with no holes; level 0 is the root alone
    assert [r["dist"] for r in rows] == list(range(len(rows)))
    assert rows[0]["n_nodes"] == 1
    for r in rows:
        assert r["n_nodes"] > 0
    # BFS reaches exactly the root's connected component (root = min node
    # id = the id of the largest... of ITS component): cross-check size
    cc = _q("graph_connected_components", spark, sf_dir).collect()
    root_comp = min(r["component"] for r in cc)
    comp_size = next(
        r["n_nodes"] for r in cc if r["component"] == root_comp
    )
    assert sum(r["n_nodes"] for r in rows) == comp_size


# --- k-anonymity --------------------------------------------------------------------


def test_k_anonymity_accounting(spark, sf_dir):
    from big_data_analytics_project_spark.sources import read_table

    r = _q("privacy_k_anonymity", spark, sf_dir).collect()[0]
    assert r["n_rows"] == read_table(spark, sf_dir, "customer").count()
    assert 0 <= r["n_classes_below_k"] <= r["n_classes"]
    assert 0 <= r["n_rows_below_k"] < r["n_rows"]
    assert r["n_rows_below_k"] <= r["n_classes_below_k"] * (r["k"] - 1)
    assert 1 <= r["min_class_size"]
    assert abs(r["row_share_below_k"] - r["n_rows_below_k"] / r["n_rows"]) < 1e-6


# --- bot regularity -----------------------------------------------------------------


def test_bot_detector_flags_planted_scheduler(spark, tmp_path, sf_dir):
    import datetime as dt

    import big_data_analytics_project_spark.plans.curation_queries as C

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: a metronome — exactly one event every 60 s (cv = 0)
    for i in range(30):
        rows.append((eid, t0 + dt.timedelta(seconds=60 * i), 1, "view", 1.0, "{}"))
        eid += 1
    # user 2: bursty human-ish gaps (1s..20min)
    for i, gap in enumerate([1, 500, 30, 1200, 7, 90, 600, 15, 300, 45]):
        t0 = t0 + dt.timedelta(seconds=gap)
        rows.append((eid, t0, 2, "view", 1.0, "{}"))
        eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r["user_id"]: r
        for r in C.quality_bot_regularity(spark, str(tmp_path)).collect()
    }
    assert out[1]["is_suspect"] is True and out[1]["cv_gap"] == 0.0
    assert out[2]["is_suspect"] is False and out[2]["cv_gap"] > 0.5
    # real fixture: Poisson-ish traffic should flag nobody
    real = _q("quality_bot_regularity", spark, sf_dir).collect()
    assert not any(r["is_suspect"] for r in real)


# --- business-day lag ----------------------------------------------------------------


def test_business_days_closed_form_matches_calendar(spark, sf_dir):
    import datetime as dt

    # the closed form g(b+3)-g(a+3) must equal a brute calendar count
    def brute(a, b):
        e = dt.date(1970, 1, 1)
        return sum(
            1
            for d in range(a + 1, b + 1)
            if (e + dt.timedelta(days=d)).weekday() < 5
        )

    def g(m):
        return (m // 7) * 5 + min(m % 7 + 1, 5)

    for a, b in [(9131, 9131), (9131, 9138), (9134, 9136), (10000, 10093)]:
        assert g(b + 3) - g(a + 3) == brute(a, b)
    rows = _q("ops_business_days_lag", spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        # ~5/7 of calendar days are business days; the ship-window span is nonnegative
        assert 0 <= r["avg_business_days"] <= r["max_business_days"]


# --- Neyman allocation ---------------------------------------------------------------


def test_neyman_shares_sum_to_one_and_budget_bounded(spark, sf_dir):
    rows = _q("sample_neyman_allocation", spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["neyman_share"] for r in rows) - 1.0) < 1e-4
    total = sum(r["alloc_n"] for r in rows)
    # floor() loses at most one doc per stratum
    assert 1000 - len(rows) <= total <= 1000
    for r in rows:
        assert r["sigma_chars"] >= 0.0
        assert 0 <= r["alloc_n"] <= 1000


# --- burstiness ----------------------------------------------------------------------


def test_burstiness_bounds_and_planted_extremes(spark, sf_dir, tmp_path):
    import big_data_analytics_project_spark.plans.text_queries as T

    rows = _q("text_term_burstiness", spark, sf_dir).collect()
    assert 1 <= len(rows) <= 100
    for r in rows:
        assert r["corpus_tf"] >= r["doc_freq"] >= 1
        assert r["vmr"] is None or r["vmr"] >= 0.0
    # planted: "glue" appears once in every doc (VMR = 0), "topic"
    # appears 10 times in a single doc (VMR >> 1)
    docs = [(i, "glue " + ("topic " * 10 if i == 0 else ""), "en", "s", 1)
            for i in range(10)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["term"]: r for r in T.text_term_burstiness(spark, str(tmp_path)).collect()}
    assert out["glue"]["vmr"] == 0.0
    assert out["topic"]["vmr"] > 5.0


# --- basket histogram ------------------------------------------------------------------


def test_basket_histogram_conservation(spark, sf_dir):
    from big_data_analytics_project_spark.sources import read_table

    rows = _q("eda_basket_size_histogram", spark, sf_dir).collect()
    li = read_table(spark, sf_dir, "lineitem")
    assert sum(r["basket_size"] * r["n_orders"] for r in rows) == li.count()
    assert (
        sum(r["n_orders"] for r in rows)
        == li.select("l_orderkey").distinct().count()
    )


# --- Fisher separability -----------------------------------------------------------------


def test_fisher_anova_identity_against_dim_variance(spark, sf_dir):
    fisher = {
        r["dim"]: r
        for r in _q("embedding_fisher_separability", spark, sf_dir).collect()
    }
    var = {
        r["dim"]: r
        for r in _q("embedding_dim_variance", spark, sf_dir).collect()
    }
    assert set(fisher) == set(var)
    for dim, fr in fisher.items():
        assert fr["between_ss"] >= 0 and fr["within_ss"] >= 0
        if fr["f_stat"] is not None:
            assert fr["f_stat"] >= 0.0
        # one-way ANOVA identity: SSB + SSW == (n-1) * total variance,
        # up to the two queries' quantization grids
        n = var[dim]["n"]
        sst = var[dim]["variance"] * (n - 1)
        assert abs((fr["between_ss"] + fr["within_ss"]) - sst) < max(
            1e-3, sst * 1e-4
        )


# --- max drawdown -------------------------------------------------------------------


def test_drawdown_bounds_and_monotone_curve_case(spark, sf_dir, tmp_path):
    import datetime as dt

    import big_data_analytics_project_spark.plans.temporal_queries as T

    r = _q("timeseries_max_drawdown", spark, sf_dir).collect()[0]
    assert 0 <= r["max_drawdown_cents"] <= r["peak_cents"]
    # strictly increasing revenue -> zero drawdown by definition
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(days=i), 1, "purchase", 10.0 + i, "{}")
        for i in range(10)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r0 = T.timeseries_max_drawdown(spark, str(tmp_path)).collect()[0]
    assert r0["max_drawdown_cents"] == 0


# --- equi-width histogram --------------------------------------------------------------


def test_equiwidth_histogram_partitions_the_range(spark, sf_dir):
    from big_data_analytics_project_spark.sources import read_table

    rows = sorted(
        _q("profile_equiwidth_histogram", spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    orders = read_table(spark, sf_dir, "orders")
    assert sum(r["n_orders"] for r in rows) == orders.count()
    width = rows[0]["bucket_hi_cents"] - rows[0]["bucket_lo_cents"] + 1
    for r in rows:
        assert 0 <= r["bucket"] < 20
        assert r["bucket_hi_cents"] - r["bucket_lo_cents"] + 1 == width
        assert r["n_orders"] > 0
    # buckets tile the range without overlap
    for a, b in zip(rows, rows[1:]):
        if b["bucket"] == a["bucket"] + 1:
            assert b["bucket_lo_cents"] == a["bucket_hi_cents"] + 1
