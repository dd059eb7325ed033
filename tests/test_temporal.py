"""Temporal operators: as-of join, bucketed range join, hypertable rollup.

Semantics pinned against hand-computed micro-fixtures AND against naive
(unscalable) Spark formulations over the real fixture tables — the
bucketed/windowed compositions must be result-identical to the obvious
theta-join/grouping-sets forms they replace.
"""

import datetime as dt

import pyspark.sql.functions as F

from big_data_analytics_project_spark.operators.asof import asof_join
from big_data_analytics_project_spark.operators.hypertable import hypertable_rollup
from big_data_analytics_project_spark.operators.rangejoin import (
    range_join_points_in_intervals,
)
from big_data_analytics_project_spark.sources import read_table


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_inclusive_ties_and_missing(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "p1"),
         (1, _ts("2024-01-01T12:00:00"), "p2"),
         (2, _ts("2024-01-01T09:00:00"), "p3")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 100.0),   # equal ts → matches p1
         (1, _ts("2024-01-01T11:30:00"), 200.0)],  # most recent before p2
        "user_id long, ts timestamp, price double",
    )
    out = {
        r["tag"]: (r["asof_price"], r["asof_ts_epoch"])
        for r in asof_join(
            left, right, on=["user_id"], ts_col="ts", right_value_cols=["price"]
        ).collect()
    }
    assert out["p1"] == (100.0, int(_ts("2024-01-01T10:00:00").timestamp()))
    assert out["p2"] == (200.0, int(_ts("2024-01-01T11:30:00").timestamp()))
    assert out["p3"] == (None, None)  # no right row for user 2 → left-outer


def test_asof_tolerance_masks_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"))], "user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 5.0)],
        "user_id long, ts timestamp, price double",
    )
    hit = asof_join(left, right, ["user_id"], "ts", ["price"],
                    tolerance_sec=3 * 3600).collect()[0]
    miss = asof_join(left, right, ["user_id"], "ts", ["price"],
                     tolerance_sec=3600).collect()[0]
    assert hit["asof_price"] == 5.0
    assert miss["asof_price"] is None and miss["asof_ts_epoch"] is None


def test_asof_matches_naive_formulation_on_fixture(spark, sf_dir):
    """Union+window asof == groupBy-argmax over the range theta-join."""
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    got = {
        (r["event_id"], r["asof_view_event_id"])
        for r in asof_join(
            purchases, views, ["user_id"], "ts", ["view_event_id"]
        ).collect()
    }
    naive = (
        purchases.alias("p")
        .join(
            views.alias("v"),
            (F.col("p.user_id") == F.col("v.user_id"))
            & (F.col("v.ts") <= F.col("p.ts")),
            "left",
        )
        .groupBy("p.event_id")
        .agg(F.max_by("v.view_event_id", "v.ts").alias("view_event_id"))
    )
    want = {(r["event_id"], r["view_event_id"]) for r in naive.collect()}
    assert got == want and len(got) > 0


def test_range_join_matches_naive_theta_join(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    intervals = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 14400 SECONDS")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    points = ev.where(F.col("event_type") == "view").select("user_id", "ts", "value")
    got = {
        (r["event_id"], r["pt_ts"])
        for r in range_join_points_in_intervals(
            intervals, points, ["user_id"], "w_start", "w_end", "ts",
            bucket_sec=14400,
        ).collect()
    }
    naive = intervals.alias("i").join(
        points.alias("pt"),
        (F.col("i.user_id") == F.col("pt.user_id"))
        & (F.col("pt.ts") >= F.col("i.w_start"))
        & (F.col("pt.ts") <= F.col("i.w_end")),
    )
    want = {(r["event_id"], r["ts"]) for r in naive.collect()}
    assert got == want and len(got) > 0


def test_range_join_no_duplicate_pairs(spark):
    """An interval spanning a bucket boundary must not double-match a
    point (each point lives in exactly one bucket)."""
    intervals = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T09:30:00"), _ts("2024-01-01T10:30:00"))],
        "iid long, user_id long, w_start timestamp, w_end timestamp",
    ).select("iid", "user_id", "w_start", "w_end")
    points = spark.createDataFrame(
        [(10, _ts("2024-01-01T10:00:00"), 1.0)],
        "user_id long, ts timestamp, value double",
    )
    out = range_join_points_in_intervals(
        intervals, points, ["user_id"], "w_start", "w_end", "ts", bucket_sec=3600
    ).collect()
    assert len(out) == 1


def test_hypertable_rollup_day_equals_direct_and_sketch_merges(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    rolled = hypertable_rollup(ev).persist()
    day = {r["bucket_start_epoch"]: r for r in rolled.where(F.col("grain") == "day").collect()}
    hour = rolled.where(F.col("grain") == "hour").collect()

    # exact measures: day == recompute from raw
    direct = ev.groupBy(
        (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long").alias("b")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"),
        F.countDistinct("user_id").alias("d"),
    )
    for r in direct.collect():
        row = day[r["b"]]
        assert row["n_events"] == r["n"]
        assert abs(row["total_value"] - r["v"]) < 1e-9
        # merged HLL sketch estimate within 10% of exact distinct
        assert abs(row["approx_users"] / r["d"] - 1.0) <= 0.10

    # hour partials sum exactly to day totals
    by_day = {}
    for r in hour:
        b = r["bucket_start_epoch"] // 86400 * 86400
        agg = by_day.setdefault(b, [0, 0.0])
        agg[0] += r["n_events"]
        agg[1] += r["total_value"]
    for b, (n, v) in by_day.items():
        assert day[b]["n_events"] == n
        assert abs(day[b]["total_value"] - v) < 1e-6
    rolled.unpersist()


def test_hypertable_rollup_scans_raw_once(spark, sf_dir):
    """The hierarchical claim: coarse re-aggregates the MATERIALIZED fine
    grain, so raw data is scanned exactly once (InMemoryTableScan serves
    the second reference)."""
    import re

    from big_data_analytics_project_spark.sources import read_table as rt

    ev = rt(spark, sf_dir, "events")
    plan = (
        hypertable_rollup(ev)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # both union branches read the cached fine aggregate (the cache's own
    # build plan embeds the one raw FileScan); neither branch re-scans raw
    assert len(re.findall(r"InMemoryTableScan", plan)) >= 2, plan[:800]
    top = plan.split("InMemoryRelation")[0]  # above the cached sub-plan
    assert "FileScan" not in top, top


def test_asof_plan_is_one_shuffle_no_join(spark):
    """The union+window composition compiles to ZERO join operators and a
    single hash-partition exchange (the window sort) — the whole point
    over the quadratic range-join formulation."""
    import re

    left = spark.createDataFrame([(1, _ts("2024-01-01T10:00:00"))], "user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 1.0)], "user_id long, ts timestamp, price double"
    )
    plan = (
        asof_join(left, right, ["user_id"], "ts", ["price"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert not re.search(r"Join", plan), plan[:500]
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan[:500]


def test_range_join_plan_has_no_nested_loop(spark, sf_dir):
    """The bucketed formulation must plan as an equi-join (hash or sort-
    merge/broadcast-hash), never BroadcastNestedLoopJoin or a cartesian."""
    ev = read_table(spark, sf_dir, "events")
    intervals = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id",
        (F.col("ts") - F.expr("INTERVAL 14400 SECONDS")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    points = ev.where(F.col("event_type") == "view").select("user_id", "ts", "value")
    plan = (
        range_join_points_in_intervals(
            intervals, points, ["user_id"], "w_start", "w_end", "ts", bucket_sec=14400
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan[:500]
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_gap_sessionize_matches_sequential_reference(spark, sf_dir):
    """Property: gap session assignment equals the obvious sequential
    per-user scan (sort events, walk, bump index when gap > g)."""
    from big_data_analytics_project_spark.operators.sessionization import gap_sessionize

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    got = {
        r.event_id: r.session_idx
        for r in gap_sessionize(
            ev, "user_id", "ts", gap_sec=1800, tiebreak="event_id"
        ).collect()
    }
    rows = sorted(ev.collect(), key=lambda r: (r.user_id, r.ts, r.event_id))
    want, prev_user, prev_ts, idx = {}, None, None, 0
    for r in rows:
        if r.user_id != prev_user:
            idx = 1
        elif (int(r.ts.timestamp()) - int(prev_ts.timestamp())) > 1800:
            idx += 1
        want[r.event_id] = idx
        prev_user, prev_ts = r.user_id, r.ts
    assert got == want and len(got) > 0


def test_gap_sessionize_single_exchange(spark, sf_dir):
    """lag and the running sum share one (partition, order) spec, so the
    physical plan must contain exactly ONE shuffle exchange."""
    from big_data_analytics_project_spark.operators.sessionization import gap_sessionize

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = gap_sessionize(ev, "user_id", "ts", gap_sec=1800, tiebreak="event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
