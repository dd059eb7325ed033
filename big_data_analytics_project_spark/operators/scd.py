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

Scale design: ONE full-outer equi-join shuffle of open-state × updates
on the key (hash-partitioned both sides — full outer cannot broadcast),
materialized once, then a union of shuffle-free projections over it.  No
window functions, no global ordering — this is the merge a nightly
100 TB dimension build can afford.  Deterministic: output is a pure
function of (state, updates, effective time).
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
    pinned: list[DataFrame] | None = None,
) -> DataFrame:
    """Apply one update batch to an SCD2 dimension.  ``current`` columns:
    key, attr, valid_from_epoch, valid_to_epoch (null = open).
    ``updates`` columns: key, attr (the new value).

    The classification join is persisted for in-plan reuse; pass ``pinned``
    (a list) to receive that frame so the caller can ``unpersist()`` it
    after materializing the result — surgical, unlike a session-wide
    ``clearCache()`` which would drop every caller-owned cached frame."""
    upd = updates.select(
        F.col(key), F.col(attr).alias("__new_attr")
    )
    open_rows = current.where(F.col("valid_to_epoch").isNull())
    closed_rows = current.where(F.col("valid_to_epoch").isNotNull())

    # ONE full-outer equi-join classifies every key (changed / unchanged /
    # update-only / state-only), MATERIALIZED because the outcome classes
    # below reference it four times and Spark's plan reuse does not span
    # union branches — without this each branch would re-run the join
    # (verified by the plan test in tests/test_curation.py).  In a nightly
    # build this frame is the natural intermediate table.
    joined = open_rows.join(upd, [key], "full").persist()
    if pinned is not None:
        pinned.append(joined)
    in_state = F.col("valid_from_epoch").isNotNull()
    in_upd = F.col("__new_attr").isNotNull()
    changed = in_state & in_upd & (F.col("__new_attr") != F.col(attr))

    untouched_open = joined.where(in_state & ~changed).select(*current.columns)
    newly_closed = joined.where(changed).select(
        F.col(key),
        F.col(attr),
        F.col("valid_from_epoch"),
        F.lit(effective_epoch).cast("long").alias("valid_to_epoch"),
    )
    new_open = joined.where(changed | ~in_state).select(
        F.col(key),
        F.col("__new_attr").alias(attr),
        F.lit(effective_epoch).cast("long").alias("valid_from_epoch"),
        F.lit(None).cast("long").alias("valid_to_epoch"),
    )
    return (
        closed_rows.unionByName(untouched_open)
        .unionByName(newly_closed)
        .unionByName(new_open)
    )
