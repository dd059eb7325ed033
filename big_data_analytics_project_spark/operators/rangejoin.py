"""Bucketed range (interval) join — "points in interval" without a
cross-product (extension operator; DuckDB/Trino plan this natively as an
IEJoin, Spark does not).

The naive Spark formulation ``left.join(right, (key ==) & (ts BETWEEN
start AND end))`` plans the range predicate as a post-join filter on the
per-key group — every point compared against every interval of its key
(quadratic in hot keys).  For bounded-width intervals the scalable shape
is TIME BUCKETING:

1. pick ``bucket_sec`` >= the maximum interval width;
2. each point maps to exactly ONE bucket (``floor(epoch/bucket)``);
3. each interval explodes to the (at most ``width/bucket + 1 = 2``)
   buckets it overlaps;
4. equi-join on ``(key, bucket)`` — a plain shuffled hash join — then
   apply the exact range predicate.

Each (interval, point) pair meets in exactly one bucket (the point's),
so no post-join dedup is needed.  At 100 TB this is one bounded-fanout
explode + one equi-join shuffle; AQE handles residual bucket skew.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def range_join_points_in_intervals(
    intervals: DataFrame,
    points: DataFrame,
    on: list[str],
    start_col: str,
    end_col: str,
    point_ts_col: str,
    bucket_sec: int,
) -> DataFrame:
    """Inner-join each row of ``points`` to every interval of the same
    ``on`` key with ``start <= point_ts <= end`` (inclusive).  Returns all
    interval columns plus the point's non-key columns prefixed ``pt_``.
    ``bucket_sec`` must be >= the widest interval for the 2-bucket explode
    bound to hold."""
    bucket = lambda c: F.floor(F.unix_timestamp(c) / bucket_sec)  # noqa: E731
    exploded = intervals.select(
        "*",
        F.explode(
            F.sequence(bucket(F.col(start_col)), bucket(F.col(end_col)))
        ).alias("__bucket"),
    )
    pts = points.select(
        *[F.col(c).alias(f"__p_{c}") for c in points.columns],
        bucket(F.col(point_ts_col)).alias("__bucket"),
    )
    cond = [exploded[k] == pts[f"__p_{k}"] for k in on] + [
        exploded["__bucket"] == pts["__bucket"]
    ]
    keep_point_cols = [c for c in points.columns if c not in on]
    return (
        exploded.join(pts, cond)
        .where(
            (F.col(f"__p_{point_ts_col}") >= F.col(start_col))
            & (F.col(f"__p_{point_ts_col}") <= F.col(end_col))
        )
        .select(
            *[F.col(c) for c in intervals.columns],
            *[F.col(f"__p_{c}").alias(f"pt_{c}") for c in keep_point_cols],
        )
    )
