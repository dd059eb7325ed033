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

# The verification driver cross-checks only the FIRST 50 registered queries
# per round, in iteration order.  Rounds 1-2 used raw module-import order,
# which left 19 oracle-backed queries (positions 51-73) without a driver row.
# ``load_all`` therefore rebuilds the registry into an explicit priority
# order so the 50-query window is spent entirely on oracle-backed checks:
#
#   tier 0 — oracle-backed queries never driver-checked in r01/r02 (19);
#   tier 1 — the remaining oracle-backed core (31);
#   tier 2 — family-redundant oracle-backed queries that were hash-green in
#            BOTH r01 and r02 (rotated out this round; each family keeps a
#            representative in tier 0/1, and the local DuckDB-parity suite
#            still checks every query at sf0.001);
#   tier 3 — rows-only (sql=None) queries: a driver rows-only row proves
#            little beyond "it runs", which pytest already covers.
#
# Rotation plan (also in README): tiers 0+1 are sized to exactly fill the
# window; next round, swap tier 2 back in front of this round's tier 1 so
# every oracle-backed query has a driver row at least once per two rounds.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # tier 0 — never driver-checked, oracle-backed
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "embedding_cosine_neardup",
    "text_token_stats",
    "text_quality_scores",
    "text_language_id",
    "text_fingerprint",
    "streaming_tumbling_window",
    "streaming_session_window",
    "math_funcs",
    "conditional_funcs",
    "array_explode_tokens",
    "pivot_event_counts",
    "heuristic_intent_score",
    "dedup_subset_keys",
    "agg_percentiles",
    "agg_corr_covar",
    "topk_global_orders",
    "sort_by_aggregate",
    # new in round 3 — oracle-backed, no driver row yet
    "text_redact_pii",
    "skew_salted_agg",
    "text_repetition_ratio",
)

_ROTATED_OUT: frozenset[str] = frozenset(
    {
        # window family — window_rank_topn_per_group / window_range_frame /
        # window_distribution stay in-window as representatives
        "window_rank_dense_rank",
        "window_lag_lead",
        "window_running_total",
        "window_first_last",
        "window_nth_lag_defaults",
        # set-op family — union_schema_evolution stays in-window
        "set_union_all",
        "set_intersect",
        "set_except",
        "distinct_pairs",
        # join family — multiway/left/semi stay in-window
        "join_broadcast_part",
        "join_anti_inactive_customers",
        # grouping-id family — agg_rollup_orders stays in-window
        "agg_cube_customer",
        "agg_grouping_sets",
        # multi-measure agg family — agg_pricing_summary stays in-window
        # (rotated to make room for round 3's new text_redact_pii)
        "agg_stats_summary",
        # flagship J1 join-form — the J2 window form (flagship_sessionization,
        # same oracle) stays in-window; rotated for round 3's skew_salted_agg
        "flagship_sessionization_joinform",
        # date family — date_arithmetic stays in-window; rotated for round
        # 3's text_repetition_ratio
        "date_parts_agg",
    }
)


def _driver_order(reg: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    prio = {name: i for i, name in enumerate(_DRIVER_PRIORITY)}

    def key(item: tuple[int, str]) -> tuple[int, int]:
        idx, name = item
        spec = reg[name]
        if spec.sql is None:
            tier = 3
        elif name in prio:
            tier = 0
        elif name in _ROTATED_OUT:
            tier = 2
        else:
            tier = 1
        # tier 0 keeps the explicit priority order; others keep
        # registration order (stable within tier)
        return (tier, prio.get(name, idx))

    ordered = sorted(enumerate(reg), key=key)
    return {name: reg[name] for _, name in ordered}


def load_all() -> dict[str, QuerySpec]:
    """Import every module that registers queries, once, and return the
    registry in driver-priority order (see ``_DRIVER_PRIORITY``)."""
    global _LOADED, REGISTRY
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

        reordered = _driver_order(REGISTRY)
        REGISTRY.clear()
        REGISTRY.update(reordered)
        _LOADED = True
    return REGISTRY
