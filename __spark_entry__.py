"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``big_data_analytics_project_spark``; this module
only adapts its query registry to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_analytics_project_spark.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (leakage-free sessionization) on the detected data
    dir: $SPARK_GRAFT_SF_DIR if set, else the smallest fixture directory
    containing the events table (U2 auto-detection, sf0.001 by default)."""
    from big_data_analytics_project_spark.sources.readers import detect_data_dir

    registry = load_all()
    return registry["flagship_sessionization"].fn(spark, detect_data_dir())


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; rows-only
    operators (seeded/approximate/streaming-stateful) are omitted."""
    return {name: spec.sql for name, spec in load_all().items() if spec.sql is not None}
