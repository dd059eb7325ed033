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


def test_session_has_graceful_streaming_confs(spark):
    """T8: the session factory bakes in the reference's streaming shutdown
    hygiene (stream_processor.py:106-107)."""
    assert spark.conf.get("spark.streaming.stopGracefullyOnShutdown") == "true"
    assert (
        spark.conf.get("spark.sql.streaming.forceDeleteTempCheckpointLocation")
        == "true"
    )


def test_data_dir_auto_detection(tmp_path, monkeypatch):
    """U2: priority-list probe, env-var short-circuit, and the error fall-
    through (reference config.py:24-53)."""
    from big_data_analytics_project_spark.sources import detect_data_dir

    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    (b / "events.parquet").write_bytes(b"")
    assert detect_data_dir((str(a), str(b))) == str(b)  # first WITH the table
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/custom/sf9")
    assert detect_data_dir((str(a), str(b))) == "/custom/sf9"  # env wins
    monkeypatch.delenv("SPARK_GRAFT_SF_DIR")
    import pytest

    with pytest.raises(FileNotFoundError):
        detect_data_dir((str(a),))
