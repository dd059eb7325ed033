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
