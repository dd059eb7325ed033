"""Partitioned parquet sink round-trip + pruning behavior."""

import os

import pyspark.sql.functions as F

from big_data_analytics_project_spark.sources import read_table
from big_data_analytics_project_spark.sources.sinks import (
    date_partitioned,
    read_parquet,
    write_partitioned,
)


def test_partitioned_write_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_pt")
    ev = date_partitioned(read_table(spark, sf_dir, "events"), "ts")
    write_partitioned(ev, out, ["pt_month"])

    # directory layout: one subdir per month, few files per partition
    subdirs = [d for d in os.listdir(out) if d.startswith("pt_month=")]
    assert len(subdirs) >= 1
    for d in subdirs:
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert 1 <= len(files) <= 4  # layout-aligned repartition, no file explosion

    back = read_parquet(spark, out)
    assert back.count() == ev.count()

    # partition filter must prune directories (PartitionFilters, zero data read
    # from other months)
    month = sorted(s.split("=")[1] for s in subdirs)[0]
    q = back.where(F.col("pt_month") == month)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "pt_month" in plan


def test_flagship_plan_shape_regression(spark, sf_dir):
    """The flagship must keep its single-exchange shape: one hash exchange
    shared by the window and the aggregate (SURVEY §4 physical plan)."""
    from big_data_analytics_project_spark.registry import load_all

    # other tests may have cached the flagship plan (CacheManager would
    # rightly substitute an InMemoryTableScan); assert on the cold plan
    spark.catalog.clearCache()
    df = load_all()["flagship_sessionization"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Window" in plan
