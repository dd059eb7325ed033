"""As-of join — "for each left row, the most recent right row at or before
its timestamp" (pandas ``merge_asof`` / kdb ``aj`` / DuckDB ``ASOF JOIN``
semantics; the reference has no native equivalent — extension operator per
the large-scale-pipeline charter).

Spark-first design: Spark has no asof join physical operator, and the
naive formulation (range theta-join + argmax) degenerates to a per-key
cross product.  The scalable composition is UNION + WINDOW:

1. tag right rows 0 and left rows 1, union them on the shared key/time
   columns (right value columns null on left rows and vice versa);
2. one window over ``partitionBy(keys) orderBy(ts, tag)`` carries the
   latest right values forward via ``last(col, ignorenulls=True)`` with an
   unbounded-preceding frame (running state, no re-scan per row);
3. keep only left rows.

Cost: ONE shuffle on the join keys (the window sort) — same as a plain
equi-join — regardless of how many right rows precede each left row.  At
100 TB both sides shuffle-sort once on the key; no skew beyond what the
key distribution itself has, no interval explosion.  Ties (right.ts ==
left.ts) are inclusive: the right row sorts before the left row at equal
timestamps (tag 0 < 1), matching ``ON right.ts <= left.ts``.

Determinism: callers should ensure at most one right row per (keys, ts) —
pre-aggregate duplicates — otherwise "the" most recent row is undefined
(DuckDB's ASOF JOIN has the same caveat).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_value_cols: list[str],
    tolerance_sec: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left enriched with the nearest ``right_value_cols`` at
    ``right.ts_col <= left.ts_col`` (``direction="backward"``, the
    default) or ``right.ts_col >= left.ts_col`` (``direction="forward"``,
    pandas ``merge_asof(direction="forward")``), per ``on`` key.  Left
    rows with no match in that direction (or none within
    ``tolerance_sec``) keep nulls — left-outer semantics.

    Forward runs the SAME one-shuffle union+window composition with the
    frame mirrored: right rows sort AFTER left rows at equal timestamps
    (inclusive ``>=``) and ``first(ignorenulls)`` over
    ``currentRow..unboundedFollowing`` carries the next right values
    backward.

    Both inputs must carry ``on`` + ``ts_col``; ``left``'s other columns
    pass through, prefixed right values are appended as
    ``asof_<col>`` plus ``asof_ts_epoch``."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    fwd = direction == "forward"
    r_side, l_side = (1, 0) if fwd else (0, 1)
    left_cols = [c for c in left.columns if c not in set(on) | {ts_col}]
    tagged_r = right.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(r_side).alias("__side"),
        F.col(ts_col).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        *[F.lit(None).alias(f"__l_{c}") for c in left_cols],
    )
    tagged_l = left.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast(tagged_r.schema["__r_ts"].dataType).alias("__r_ts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in right_value_cols
        ],
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    # right rows sort adjacent to left rows so equal-ts matches are
    # inclusive in the join direction (backward: right first; forward:
    # right after, picked up by the following frame)
    if fwd:
        w = (
            Window.partitionBy(*on)
            .orderBy("__ts", "__side")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy("__ts", "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    carried = [
        pick(f"__r_{c}").over(w).alias(f"__c_{c}") for c in right_value_cols
    ]
    carried_ts = pick("__r_ts").over(w).alias("__c_ts")
    enriched = (
        tagged_r.unionByName(tagged_l)
        .select("*", carried_ts, *carried)
        .where(F.col("__side") == l_side)
    )
    if tolerance_sec is None:
        in_tol = F.lit(True)
    elif fwd:
        in_tol = F.col("__c_ts") <= F.col("__ts") + F.expr(
            f"INTERVAL {tolerance_sec} SECONDS"
        )
    else:
        in_tol = F.col("__c_ts") >= F.col("__ts") - F.expr(
            f"INTERVAL {tolerance_sec} SECONDS"
        )
    return enriched.select(
        *on,
        F.col("__ts").alias(ts_col),
        *[F.col(f"__l_{c}").alias(c) for c in left_cols],
        F.when(in_tol, F.unix_timestamp("__c_ts"))
        .cast("long")
        .alias("asof_ts_epoch"),
        *[
            F.when(in_tol, F.col(f"__c_{c}")).alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )
