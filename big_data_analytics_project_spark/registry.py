"""Query registry — the single source of truth for the verification surface.

Every operator in SURVEY §2 (plus the large-scale extension operators) is
registered here as a named ``QuerySpec``: a Spark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, the equivalent
DuckDB oracle SQL.  ``__spark_entry__.py`` exposes the registry to the
driver, which cross-checks row-count + schema + order-insensitive
value-hash at sf0.01.

Determinism rules for oracle-checked queries (see ``docs/determinism.md``):
 - alias every computed column identically in Spark and SQL;
 - integer-valued computed columns cast to BIGINT on both sides;
 - high-cardinality float aggregates use exact decimal sums divided in
   double (bit-reproducible across engines); low-cardinality ones may use
   ``round(x, n)``;
 - ties broken by a unique key wherever ranking/top-k is involved;
 - no seeded-random / approximate operators in oracle queries (rows-only).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: SparkQuery
    sql: str | None = None  # DuckDB oracle; None → driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, sql: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver owns the session; pin runtime confs that affect
            # cross-engine determinism (UTC timestamps).
            from .session import tune_for_oracle

            tune_for_oracle(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(
            name=name, fn=wrapped, sql=sql, doc=fn.__doc__ or "", tags=tuple(tags)
        )
        return fn

    return deco


_LOADED = False


def load_all() -> dict[str, QuerySpec]:
    """Import every module that registers queries, once."""
    global _LOADED
    if not _LOADED:
        from .plans import (  # noqa: F401
            dedup_queries,
            extras_queries,
            flagship,
            ml_queries,
            multimodal_queries,
            relational,
            scalar_queries,
            similarity_queries,
            streaming_queries,
            text_queries,
        )

        _LOADED = True
    return REGISTRY
