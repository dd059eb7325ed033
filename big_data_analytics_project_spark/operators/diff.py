"""Snapshot diff — CDC-style reconciliation of two versions of a table.

The question every pipeline migration, backfill, and replication job
eventually asks: *what changed between these two snapshots?*  Answered
Spark-first as ONE full-outer equi-join on the key with per-row change
detection — no driver-side iteration, no collect.

Scale shape at 100 TB:

- Both sides are column-pruned to key + compared columns before the
  join, so the shuffle carries only what the comparison needs.
- ``method="hash"`` collapses the compared columns to a single
  ``xxhash64`` fingerprint per row BEFORE the join — the shuffle rows
  are (key, 8 bytes) regardless of table width.  The trade is the
  2^-64 per-row collision odds (a changed row reported unchanged),
  which reconciliation jobs accept; ``method="exact"`` carries the
  columns and compares with null-safe equality when they don't.
- The join is shuffle-hash/sort-merge on the key — both sides are
  fact-sized, so there is deliberately NO broadcast hint.  If both
  snapshots are written with the same bucketing (``sources/sinks.py``),
  the join plans with zero exchanges.
- Unchanged rows (the overwhelming majority of a real diff) are
  filtered BEFORE the result materializes, so the output is
  change-sized, not table-sized.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

STATUS_ADDED = "added"
STATUS_REMOVED = "removed"
STATUS_CHANGED = "changed"


def snapshot_diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    method: str = "exact",
) -> DataFrame:
    """Rows that differ between ``left`` (old) and ``right`` (new):
    (*keys, status) with status in {added, removed, changed}."""
    keys = list(keys)
    compare = list(
        compare_cols
        if compare_cols is not None
        else [c for c in left.columns if c not in keys]
    )

    if method == "hash":
        l = left.select(*keys, F.xxhash64(*compare).alias("_lfp"))
        r = right.select(*keys, F.xxhash64(*compare).alias("_rfp"))
        in_left, in_right = F.col("_lfp").isNotNull(), F.col("_rfp").isNotNull()
        differs: Column = F.col("_lfp") != F.col("_rfp")
    elif method == "exact":
        l = left.select(
            *keys, F.lit(True).alias("_inl"),
            *[F.col(c).alias(f"_l_{c}") for c in compare],
        )
        r = right.select(
            *keys, F.lit(True).alias("_inr"),
            *[F.col(c).alias(f"_r_{c}") for c in compare],
        )
        in_left, in_right = F.col("_inl").isNotNull(), F.col("_inr").isNotNull()
        same = F.lit(True)
        for c in compare:
            same = same & F.col(f"_l_{c}").eqNullSafe(F.col(f"_r_{c}"))
        differs = ~same
    else:
        raise ValueError(f"unknown method: {method!r}")

    status = (
        F.when(~in_right, F.lit(STATUS_REMOVED))
        .when(~in_left, F.lit(STATUS_ADDED))
        .when(differs, F.lit(STATUS_CHANGED))
    )
    return (
        l.join(r, keys, "full_outer")
        .select(*keys, status.alias("status"))
        .where(F.col("status").isNotNull())
    )
