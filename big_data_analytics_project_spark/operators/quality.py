"""Declarative data-quality audit (dbt-test / Deequ-style constraint
checking) — the validation gate a production ingest runs before
publishing a partition.

Each rule reduces to a violation COUNT (not a row dump — at 100 TB the
audit output must stay driver-sized regardless of how broken the data
is).  Rule kinds:

- ``not_null`` / ``in_range`` / ``matches``: violation PREDICATES —
  ``predicate_rules`` fuses any number of them over one table into a
  single scan (one aggregate, one conditional count per rule, map-side
  combined, unpivoted to rows);
- ``unique``: one hash aggregation on the key (count of keys seen >1);
- ``references`` (FK): left-anti join child→parent — broadcast when the
  parent is dim-sized, shuffled hash join otherwise.

The audit result is a tiny (rule, n_violations) frame — unionable,
storable, alert-able.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def not_null(col: str) -> Column:
    """Violation predicate: value is null."""
    return F.col(col).isNull()


def in_range(col: str, lo, hi) -> Column:
    """Violation predicate: non-null value outside [lo, hi]."""
    c = F.col(col)
    return c.isNotNull() & ((c < lo) | (c > hi))


def matches(col: str, pattern: str) -> Column:
    """Violation predicate: non-null value failing a FULL-string match
    (the pattern is anchored: rlike is substring-search, so an unanchored
    enum check would accept 'Purch2ase').  Anchors are ``\\A…\\z`` rather
    than ``^…$``: Java's ``$`` also matches before a trailing newline, so
    ``^…$`` would accept ``'Purchase\\n'`` while the DuckDB oracle's
    ``regexp_full_match`` rejects it — ``\\A``/``\\z`` (supported by both
    Java regex and RE2) match full-string semantics exactly."""
    c = F.col(col)
    return c.isNotNull() & ~c.rlike(f"\\A(?:{pattern})\\z")


def predicate_rules(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """ALL predicate rules over one table in ONE scan: a single aggregate
    with one conditional count per rule (map-side combined), unpivoted to
    (rule, n_violations) rows.  N rules cost the same scan as one —
    verified by the plan test in tests/test_curation.py."""
    wide = df.agg(
        *[F.count(F.when(cond, 1)).alias(name) for name, cond in rules]
    )
    return wide.unpivot([], [name for name, _ in rules], "rule", "n_violations")


def unique(name: str, df: DataFrame, cols: list[str]) -> DataFrame:
    dupes = (
        df.groupBy(*cols).count().where(F.col("count") > 1)
    )
    return dupes.agg(
        F.lit(name).alias("rule"),
        F.count("*").cast("long").alias("n_violations"),
    )


def references(
    name: str,
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    broadcast: bool = True,
) -> DataFrame:
    """FK orphan count via left-anti join child→parent.  ``broadcast=True``
    (default) hints the parent side — right for dim-sized parents; pass
    ``False`` for a large parent so Spark plans a shuffled hash join
    instead of OOMing the driver trying to broadcast a fact table."""
    parent_keys = parent.select(parent_col)
    if broadcast:
        parent_keys = F.broadcast(parent_keys)
    orphans = child.where(F.col(child_col).isNotNull()).join(
        parent_keys,
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
