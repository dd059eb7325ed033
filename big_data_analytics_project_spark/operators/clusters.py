"""Connected components over a pair graph — dedup *clustering*.

Near-dup detection yields pairs; curation needs clusters ("keep one doc
per duplicate group").  Components are computed by iterative min-label
propagation — the canonical Spark iterative-algorithm pattern:

    labels(v) = v
    repeat: labels(v) = min(labels(v), min over neighbors u of labels(u))
    until no label changes

Each iteration is one join + one aggregate (two shuffles) over the edge
list; lineage is cut every round via ``reliable_pin`` (localCheckpoint in
local mode, reliable warehouse-scratch checkpoint on a cluster) so the
plan doesn't grow unboundedly (the classic iterative-Spark failure mode).
Iteration count is O(diameter); near-dup graphs are overwhelmingly tiny
stars/cliques, so 2-4 rounds converge.

Scale shape: the loop runs over EDGE-TOUCHED nodes only.  In a near-dup
graph over a 100 TB corpus the overwhelming majority of documents have no
edge at all — they are singleton components by definition and are added
back (component = own id) after convergence, never joined per round.  Per-
iteration state is therefore proportional to the duplicate-pair graph, not
the corpus.
"""

from __future__ import annotations

import logging

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..sources.sinks import reliable_pin

_log = logging.getLogger(__name__)


def connected_components(
    nodes: DataFrame,  # one column: "id"
    edges: DataFrame,  # columns: "src", "dst"
    max_iter: int = 20,
) -> DataFrame:
    """Return (id, component) with component = min node id reachable.
    Edge endpoints must be drawn from ``nodes`` (holds by construction for
    dedup pairs, which come from the same corpus)."""
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .persist()
    )
    # propagate labels over edge-touched nodes only; isolated nodes are
    # singleton components and rejoin after convergence (see module doc)
    labels = reliable_pin(
        sym.select(F.col("a").alias("id")).distinct()
        .select("id", F.col("id").alias("component"))
    )
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        # pin each round (reliable_pin: localCheckpoint locally, reliable
        # warehouse-scratch checkpoint on a cluster): materializes the
        # (small) label frame, keeps lineage flat, and makes the
        # convergence count below read materialized data instead of
        # replaying all prior rounds.  The pinned frame carries BOTH the
        # old and the new component, so convergence is a filter-count
        # over the materialized blocks — not a per-round shuffle join of
        # old labels against new (the shape graph.connected_components
        # already uses).
        merged = reliable_pin(
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                F.col("component").alias("__old"),
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
        )
        changed = merged.where(F.col("component") != F.col("__old")).count()
        labels = merged.select("id", "component")
        if changed == 0:
            break
    sym.unpersist()
    if changed > 0:
        # a component with diameter > max_iter would carry a wrong (non-minimal)
        # label with no other signal — surface it instead of silently returning
        _log.warning(
            "connected_components did not converge after %d iterations "
            "(%d labels still changing); results may split components. "
            "Increase max_iter for high-diameter graphs.",
            max_iter,
            changed,
        )
    isolated = nodes.join(labels.select("id"), "id", "left_anti").select(
        "id", F.col("id").alias("component")
    )
    return labels.unionByName(isolated)


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Cluster docs by near-dup pairs: (doc_id, cluster_id, cluster_size,
    is_canonical).  cluster_id = min doc id in the component; the canonical
    survivor of each cluster is that minimum."""
    nodes = docs.select(F.col(id_col).alias("id"))
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comp = connected_components(nodes, edges)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("id").alias(id_col),
            F.col("component").alias("cluster_id"),
            F.col("cluster_size"),
            (F.col("id") == F.col("component")).cast("long").alias("is_canonical"),
        )
    )
