"""Semantic tests that the oracle can't express: statistical properties of
seeded operators, approximation error bounds, plan-shape assertions, and the
window-vs-join differential (SURVEY §2.3: both formulations must agree).
"""

import pyspark.sql.functions as F

from big_data_analytics_project_spark.operators.sessionization import (
    first_conversion_join,
    first_conversion_window,
)
from big_data_analytics_project_spark.sources import read_table


def test_window_and_join_first_conversion_agree(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    w = first_conversion_window(ev, "user_id", "ts").select(
        "event_id", "first_conversion_ts"
    )
    j = first_conversion_join(ev, "user_id", "ts").select(
        "event_id", "first_conversion_ts"
    )
    assert w.subtract(j).count() == 0 and j.subtract(w).count() == 0


def test_leakage_cutoff_keeps_ties(spark, sf_dir):
    """The `<=` rule: the first conversion row itself must survive."""
    ev = read_table(spark, sf_dir, "events")
    marked = first_conversion_window(ev, "user_id", "ts")
    kept = marked.where(
        F.col("first_conversion_ts").isNull() | (F.col("ts") <= F.col("first_conversion_ts"))
    )
    n_converting_users = (
        ev.where(F.col("event_type") == "purchase").select("user_id").distinct().count()
    )
    n_kept_purchases = (
        kept.where(F.col("event_type") == "purchase").select("user_id").distinct().count()
    )
    assert n_kept_purchases == n_converting_users


def test_approx_count_distinct_error_bound(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.1


def test_seeded_sample_fraction(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    n = o.count()
    s = o.sample(fraction=0.5, seed=42).count()
    assert 0.35 * n < s < 0.65 * n
    # seeded → reproducible within the same engine
    assert s == o.sample(fraction=0.5, seed=42).count()


def test_random_split_partitions_everything(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    train, test = o.randomSplit([0.8, 0.2], seed=42)
    assert train.count() + test.count() == o.count()
    assert train.join(test, "o_orderkey", "inner").count() == 0


def test_broadcast_join_plan_shape(spark, sf_dir):
    """The dimension join must compile to a broadcast-hash join, keeping the
    fact side shuffle-free (100 TB requirement)."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """Predicate + projection must reach the parquet reader."""
    li = read_table(spark, sf_dir, "lineitem")
    q = li.where(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity" in plan
    assert "ReadSchema" in plan


def test_global_windows_have_no_single_partition_exchange(spark, sf_dir, registry):
    """window_range_frame / window_distribution used to be global
    Window.orderBy plans, which physically move the whole table through an
    Exchange SinglePartition (one reducer — the 100x scale-killer).  The
    reworked bucketed-range-join / two-pass-rank forms must keep every
    stage partitioned."""
    for name in ("window_range_frame", "window_distribution"):
        df = registry[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, f"{name} still has a single-reducer stage"
