"""Flagship query: leakage-free per-user sessionization over ``events``.

Maps the reference's §3.1 pipeline onto the driver fixtures per FIXTURES §C:
``user_id`` ↔ user_session, ``ts`` ↔ event_time, ``value`` ↔ price,
``purchase`` as the conversion event; counts for each observed event type.

Exercises S3, P3-P10, W1/J2, A1-A6 in one query (SURVEY §7.1 stage 1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.sessionization import (
    first_conversion_join,
    first_conversion_window,
    leakage_cutoff,
)
from ..registry import query
from ..sources import read_table

COUNT_TYPES = ("view", "click", "signup", "error", "purchase")


def _features(kept: DataFrame) -> DataFrame:
    aggs = [
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("label"),
    ]
    for t in COUNT_TYPES:
        aggs.append(F.count(F.when(F.col("event_type") == t, 1)).alias(f"{t}_count"))
    aggs.extend(
        [
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            .cast("long")
            .alias("session_duration_sec"),
            # exact decimal sum ÷ count in double: bit-reproducible vs DuckDB
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count("value")
            ).alias("avg_value"),
            F.max("value").alias("max_value"),
            F.countDistinct("event_id").alias("unique_items"),
        ]
    )
    return kept.groupBy("user_id").agg(*aggs).fillna(0)


FLAGSHIP_SQL = """
WITH marked AS (
  SELECT *,
         min(CASE WHEN event_type = 'purchase' THEN ts END)
             OVER (PARTITION BY user_id) AS first_conversion_ts
  FROM events
), kept AS (
  SELECT * FROM marked
  WHERE first_conversion_ts IS NULL OR ts <= first_conversion_ts
)
SELECT
  user_id,
  CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS label,
  count(CASE WHEN event_type = 'view'     THEN 1 END) AS view_count,
  count(CASE WHEN event_type = 'click'    THEN 1 END) AS click_count,
  count(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup_count,
  count(CASE WHEN event_type = 'error'    THEN 1 END) AS error_count,
  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_count,
  CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS session_duration_sec,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value,
  max(value) AS max_value,
  count(DISTINCT event_id) AS unique_items
FROM kept
GROUP BY user_id
"""


@query("flagship_sessionization", sql=FLAGSHIP_SQL, tags=("flagship", "window", "agg"))
def flagship_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-form first-conversion marker → `<=` cutoff → multi-measure agg."""
    ev = read_table(spark, sf_dir, "events")
    kept = leakage_cutoff(first_conversion_window(ev, "user_id", "ts"), "ts")
    return _features(kept)


@query("flagship_sessionization_joinform", sql=FLAGSHIP_SQL, tags=("flagship", "join", "agg"))
def flagship_sessionization_joinform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same logical result via aggregate + broadcast left join (J1 form);
    differentially tested against the window form through the shared oracle."""
    ev = read_table(spark, sf_dir, "events")
    kept = leakage_cutoff(first_conversion_join(ev, "user_id", "ts"), "ts")
    return _features(kept)
