"""Slowly-changing-dimension type 2 (SCD2) merge — the standard warehouse
history-keeping update (extension operator; the reference's pipeline has
no dimension maintenance at all).

Given the current dimension state (one open row per key, ``valid_to``
null) and a batch of updates, produce the new state:

- keys whose tracked attributes CHANGED: the open row is closed
  (``valid_to`` = the update's effective time) and a new open row is
  appended with the new attributes;
- unchanged keys and closed history rows pass through untouched;
- brand-new keys open their first row.

Scale design: ONE equi-join shuffle of dim × updates on the key (both
sides hash-partitioned; updates are usually tiny → AQE broadcasts), then
a union of three shuffle-free projections.  No window functions, no
global ordering — this is the merge a nightly 100 TB dimension build can
afford.  Deterministic: output is a pure function of (state, updates,
effective time).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attr: str,
    effective_epoch: int,
) -> DataFrame:
    """Apply one update batch to an SCD2 dimension.  ``current`` columns:
    key, attr, valid_from_epoch, valid_to_epoch (null = open).
    ``updates`` columns: key, attr (the new value)."""
    upd = updates.select(
        F.col(key), F.col(attr).alias("__new_attr")
    )
    open_rows = current.where(F.col("valid_to_epoch").isNull())
    closed_rows = current.where(F.col("valid_to_epoch").isNotNull())

    joined = open_rows.join(upd, key, "left")
    changed = F.col("__new_attr").isNotNull() & (F.col("__new_attr") != F.col(attr))

    untouched_open = joined.where(~changed).select(*current.columns)
    newly_closed = joined.where(changed).select(
        F.col(key),
        F.col(attr),
        F.col("valid_from_epoch"),
        F.lit(effective_epoch).cast("long").alias("valid_to_epoch"),
    )
    new_open = joined.where(changed).select(
        F.col(key),
        F.col("__new_attr").alias(attr),
        F.lit(effective_epoch).cast("long").alias("valid_from_epoch"),
        F.lit(None).cast("long").alias("valid_to_epoch"),
    )
    brand_new = upd.join(open_rows.select(key), key, "left_anti").select(
        F.col(key),
        F.col("__new_attr").alias(attr),
        F.lit(effective_epoch).cast("long").alias("valid_from_epoch"),
        F.lit(None).cast("long").alias("valid_to_epoch"),
    )
    return (
        closed_rows.unionByName(untouched_open)
        .unionByName(newly_closed)
        .unionByName(new_open)
        .unionByName(brand_new)
    )
