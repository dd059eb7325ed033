"""snapshot_diff: status semantics, hash/exact agreement, null handling."""

import pyspark.sql.functions as F
import pytest

from big_data_analytics_project_spark.operators.diff import snapshot_diff


@pytest.fixture(scope="module")
def snapshots(spark):
    v1 = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", None),
            (4, "d", 40.0),
        ],
        "k long, s string, v double",
    )
    v2 = spark.createDataFrame(
        [
            (1, "a", 10.0),   # unchanged
            (2, "B", 20.0),   # changed (string)
            (3, "c", None),   # unchanged (null == null under eqNullSafe)
            (5, "e", 50.0),   # added; 4 removed
        ],
        "k long, s string, v double",
    )
    return v1, v2


def _statuses(df):
    return {r["k"]: r["status"] for r in df.collect()}


def test_exact_statuses(snapshots, spark):
    v1, v2 = snapshots
    got = _statuses(snapshot_diff(v1, v2, ["k"]))
    assert got == {2: "changed", 4: "removed", 5: "added"}


def test_hash_agrees_with_exact(snapshots):
    v1, v2 = snapshots
    exact = _statuses(snapshot_diff(v1, v2, ["k"], method="exact"))
    hashed = _statuses(snapshot_diff(v1, v2, ["k"], method="hash"))
    assert exact == hashed


def test_identical_snapshots_empty_diff(snapshots):
    v1, _ = snapshots
    assert snapshot_diff(v1, v1, ["k"]).count() == 0


def test_null_to_value_is_changed(spark):
    v1 = spark.createDataFrame([(1, None)], "k long, v double")
    v2 = spark.createDataFrame([(1, 7.0)], "k long, v double")
    assert _statuses(snapshot_diff(v1, v2, ["k"])) == {1: "changed"}


def test_compare_cols_subset_ignores_rest(spark):
    v1 = spark.createDataFrame([(1, "x", 1.0)], "k long, s string, v double")
    v2 = spark.createDataFrame([(1, "x", 2.0)], "k long, s string, v double")
    assert snapshot_diff(v1, v2, ["k"], compare_cols=["s"]).count() == 0
    assert _statuses(snapshot_diff(v1, v2, ["k"], compare_cols=["v"])) == {
        1: "changed"
    }


def test_compound_key(spark):
    v1 = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")], "k1 long, k2 long, s string")
    v2 = spark.createDataFrame([(1, 1, "a"), (2, 2, "b")], "k1 long, k2 long, s string")
    got = {
        (r["k1"], r["k2"]): r["status"]
        for r in snapshot_diff(v1, v2, ["k1", "k2"]).collect()
    }
    assert got == {(1, 2): "removed", (2, 2): "added"}


def test_unknown_method_raises(snapshots):
    v1, v2 = snapshots
    with pytest.raises(ValueError):
        snapshot_diff(v1, v2, ["k"], method="sketchy")
