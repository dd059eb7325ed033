"""Small-file compaction: file-count contract, content preservation,
range-clustering of the sort_by variant."""

import os

import pyspark.sql.functions as F
import pytest

from big_data_analytics_project_spark.operators import maintenance as M
from big_data_analytics_project_spark.sources import read_table


@pytest.fixture()
def fragmented(spark, sf_dir, tmp_path):
    src = str(tmp_path / "fragmented")
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    ev.repartition(24).write.parquet(src)
    return src


def _content(spark, path):
    df = spark.read.parquet(path)
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("v"),
        F.sum(F.crc32(F.col("event_id").cast("string"))).alias("h"),
    ).collect()[0]
    return (row["n"], row["v"], row["h"])


def test_plan_output_files_contract():
    assert M.plan_output_files(0, 128) == 1
    assert M.plan_output_files(127, 128) == 1
    assert M.plan_output_files(128, 128) == 1
    assert M.plan_output_files(129, 128) == 2
    assert M.plan_output_files(10, 0) == 10  # degenerate target clamps to 1 byte


def test_compact_merges_and_preserves(spark, fragmented, tmp_path):
    dest = str(tmp_path / "compacted")
    stats = M.compact(spark, fragmented, dest, target_bytes=64 * 1024 * 1024)
    assert stats["files_before"] == 24
    # a tiny fixture fits one 64 MiB target file
    assert stats["planned_files"] == 1
    assert stats["files_after"] == stats["planned_files"]
    assert _content(spark, fragmented) == _content(spark, dest)


def test_compact_splits_to_target(spark, fragmented, tmp_path):
    dest = str(tmp_path / "split")
    before = M.data_files(spark, fragmented)
    target = max(1, sum(sz for _, sz in before) // 6)
    stats = M.compact(spark, fragmented, dest, target_bytes=target)
    assert stats["planned_files"] >= 6
    assert stats["files_after"] == stats["planned_files"]
    assert _content(spark, fragmented) == _content(spark, dest)


def test_compact_coalesce_path_is_merge_only(spark, fragmented, tmp_path):
    dest = str(tmp_path / "coalesced")
    stats = M.compact(
        spark, fragmented, dest, target_bytes=64 * 1024 * 1024, shuffle=False
    )
    assert stats["files_after"] <= stats["files_before"]
    assert _content(spark, fragmented) == _content(spark, dest)


def test_compact_sort_by_range_clusters(spark, fragmented, tmp_path):
    dest = str(tmp_path / "clustered")
    before = M.data_files(spark, fragmented)
    target = max(1, sum(sz for _, sz in before) // 4)
    stats = M.compact(
        spark, fragmented, dest, target_bytes=target, sort_by=["event_id"]
    )
    assert stats["files_after"] >= 2
    assert _content(spark, fragmented) == _content(spark, dest)
    # per-file min/max key ranges must not interleave: that is exactly the
    # property that keeps parquet row-group stats prunable after compaction
    ranges = []
    for path, _ in M.data_files(spark, dest):
        row = (
            spark.read.parquet(path)
            .agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi"))
            .collect()[0]
        )
        if row["lo"] is not None:
            ranges.append((row["lo"], row["hi"]))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next


def test_registered_query_audit_row(spark, sf_dir, registry):
    df = registry["maintenance_compact_files"].fn(spark, sf_dir)
    row = df.collect()[0]
    assert row["files_before"] == 48
    assert row["compacted_fewer_files"] and row["after_eq_planned"]
    assert row["rows_preserved"] and row["value_sum_preserved"]
    assert row["n_rows"] > 0
