"""Skew-handling utilities for power-law keys (SURVEY §7.2.6: the
reference's ``user_session`` key is power-law; one giant key stalls a
1000-executor cluster on a single reducer).

Two standard remedies, both expressed declaratively so Catalyst still
optimizes around them:

- **Two-phase salted aggregation**: groupBy((key, salt)) partial → groupBy
  (key) final.  Works for any algebraic aggregate (sum/count/min/max);
  here exposed for the common count/sum shapes.
- **Salted broadcast-side-replicated join**: big side gets a random salt in
  [0,S); the small side is exploded ×S so every salted key finds its
  match.  Use when the big side's join key is skewed and the small side is
  broadcastable-but-over-threshold (otherwise plain broadcast already
  avoids the skewed shuffle).

AQE's skew-join splitting (on by default in session.py) handles sort-merge
skew automatically; these are for the cases AQE can't see — skewed
*aggregation* keys and non-splittable stateful stages.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_salt(df: DataFrame, n_salts: int, col_name: str = "__salt") -> DataFrame:
    """Uniform random salt in [0, n_salts). Nondeterministic by design —
    never use in an oracle-checked result column."""
    return df.withColumn(col_name, (F.rand() * n_salts).cast("int"))


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {count, sum, min, max}.  Phase 1 aggregates on (key, salt) — the hot
    key's rows spread over ``n_salts`` reducers; phase 2 re-aggregates the
    (tiny) partials on key alone.
    """
    merge = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    phase1 = [getattr(F, fn)(src).alias(out) for out, (src, fn) in aggs.items()]
    partial = with_salt(df, n_salts).groupBy(key, "__salt").agg(*phase1)
    phase2 = [
        getattr(F, merge[fn])(out).alias(out) for out, (src, fn) in aggs.items()
    ]
    return partial.groupBy(key).agg(*phase2)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side ×
    n_salts, join on (key, salt).  Output columns = big ∪ small (minus the
    duplicate key)."""
    b = with_salt(big, n_salts)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")
