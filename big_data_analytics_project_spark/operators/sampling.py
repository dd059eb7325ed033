"""Deterministic hash-based sampling (reproducible splits for training
pipelines).

Seeded RNG sampling (``df.sample``, X1/X4) is reproducible only within
one engine+partitioning; a training pipeline needs splits that are stable
across engines, re-runs, repartitions, and incremental arrivals — the
standard trick is to hash a stable row key and threshold the hash
(``hash(key) % 100 < rate``).  A row's membership then depends on nothing
but its key: backfills and late data land in the same split, and any
engine that can compute the hash (here: md5-based ``md5_hash60``, which
DuckDB/Trino can mirror bit-exactly) draws the identical sample.

Map-only, codegen'd, no shuffle; composes with stratification by keying
the rate on a stratum column.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .dedup import md5_hash60


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from a row key (cast to string)."""
    return md5_hash60(key.cast("string")) % buckets


def deterministic_sample(
    df: DataFrame, key: Column, pct: int, buckets: int = 100
) -> DataFrame:
    """Keep rows whose hash bucket < pct (≈ pct/buckets of the data,
    exactly reproducible everywhere)."""
    return df.where(hash_bucket(key, buckets) < pct)


def budget_select(
    df: DataFrame,
    stratum: str,
    key: str,
    weight: str,
    budget: int,
) -> DataFrame:
    """Weight-budget subsetting per stratum: keep rows in deterministic
    hash order until the stratum's budget of ``weight`` (e.g. tokens) is
    spent; the first row crossing the budget is included, so every budget
    is met unless the stratum runs dry.  Adds ``cum_<weight>`` (the
    running total through each kept row).  ONE window shuffle keyed by
    the stratum; membership depends only on (hash, key) order, so reruns,
    backfills, and other engines select identical rows."""
    from pyspark.sql import Window

    h = md5_hash60(F.col(key).cast("string"))
    w = (
        Window.partitionBy(stratum)
        .orderBy(h.asc(), key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(weight).over(w)
    return (
        df.withColumn(f"cum_{weight}", cum)
        .where(F.col(f"cum_{weight}") - F.col(weight) < budget)
    )


def stratified_hash_sample(
    df: DataFrame, key: Column, stratum: Column, rates: dict[str, int],
    default_pct: int, buckets: int = 100
) -> DataFrame:
    """Per-stratum sampling rates (e.g. keep 50% of rare 'purchase'
    events but 10% of 'view' events) — one CASE expression, map-only."""
    rate = F.lit(default_pct)
    for value, pct in sorted(rates.items()):
        rate = F.when(stratum == value, F.lit(pct)).otherwise(rate)
    return df.where(hash_bucket(key, buckets) < rate)
