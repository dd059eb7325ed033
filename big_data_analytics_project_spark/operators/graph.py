"""Graph analytics over a co-occurrence graph derived from the fact table.

The graph: parts are nodes; an undirected edge connects two parts that
appear in the same order (the classic co-purchase graph).  Edges are
CANONICAL (src < dst, distinct) so every undirected edge exists exactly
once — the representation that makes triangle counting's ordering trick
and degree math exact.

Scale shape: the pair-generation self-join is quadratic in ORDER SIZE,
not order count — order sizes are bounded small (≤ ~20 items), so the
explosion is bounded per group and the join shuffles once on the order
key.  For pathological mega-baskets, cap items per order before pairing
(documented knob, same idea as the LSH ``max_bucket`` cap in
``operators/dedup.py``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..sources.sinks import reliable_pin


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Canonical undirected co-purchase edges (src < dst, distinct).

    One ``collect_set`` aggregation groups each order's distinct parts
    (map-side partial aggregation, one shuffle on the order key), then
    the bounded within-order pair explosion runs entirely inside
    codegen as higher-order array functions — sorted set, so ``src <
    dst`` by construction — followed by the global edge distinct.  TWO
    shuffles total (order key, edge key); the earlier self-join form
    spent a third exchange re-clustering the distinct (order, part)
    pairs onto the order key and moved k rows per order through it
    instead of one array row."""
    arrs = (
        lineitem.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("__parts"))
    )
    parts = F.col("__parts")
    pair_lists = F.transform(
        parts,
        lambda x, i: F.transform(
            F.slice(parts, i + F.lit(2), F.size(parts)),
            lambda y: F.struct(x.alias("src"), y.alias("dst")),
        ),
    )
    return (
        arrs.select(F.explode(F.flatten(pair_lists)).alias("e"))
        .select("e.src", "e.dst")
        .distinct()
    )


def directed(edges: DataFrame) -> DataFrame:
    """Both directions of the canonical edge list (for degree/PageRank).

    Each edge row explodes into its two directions in ONE pass — the
    union-of-two-selects form executed the whole upstream edge build
    twice, because exchange reuse does not span union branches."""
    return edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("src"), F.col("dst").alias("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("__e")
    ).select("__e.src", "__e.dst")


def degrees(edges: DataFrame) -> DataFrame:
    """(node, deg) from the canonical edge list — one count per endpoint."""
    return (
        directed(edges)
        .groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("deg"))
    )


def pagerank(
    edges: DataFrame, iterations: int = 3, damping: float = 0.85
) -> DataFrame:
    """Fixed-iteration PageRank on the undirected graph, cross-engine
    deterministic via FIXED-POINT arithmetic.

    Ranks live as BIGINT on a 10¹² grid.  Per iteration: each node sends
    rank_k DIV deg to every neighbor (true integer division — exact and
    identical on both engines, unlike any double or decimal rounding),
    contributions sum as BIGINT (exact, order-insensitive), and the new
    rank is floor(0.15·10¹²/N + 0.85·sum + 0.5) — the only float ops are
    on identical inputs (sum < 2⁵³ is exactly representable), so the
    result bits match engine-for-engine.  (Earlier forms using
    round(x, 12) or CAST(x AS DECIMAL) drifted: engines implement
    decimal rounding of doubles differently — exact-BigDecimal in Spark,
    FP-scaled in DuckDB — and near-boundary values flip.  Integer
    message passing has no such boundary.)

    The DIV truncation leaks ≤ deg·10⁻¹² rank per node per iteration —
    bounded and deterministic, the standard fixed-point trade.

    Scale shape: the canonical iterative-Spark loop — edges and degrees
    are computed once and persisted; each iteration is one shuffle
    (contributions grouped by destination).  Every node has degree ≥ 1
    by construction (it came from an edge), so there are no dangling
    nodes."""
    scale = 1_000_000_000_000  # 12-dp fixed-point grid
    dir_edges = directed(edges).persist()
    deg = degrees(edges).persist()
    n = deg.agg(F.count("*").cast("double").alias("_n"))
    pr = deg.join(F.broadcast(n)).select(
        "node",
        "deg",
        F.floor(F.lit(float(scale)) / F.col("_n") + 0.5)
        .cast("long")
        .alias("pr_k"),
    )
    for _ in range(iterations):
        contrib = dir_edges.join(pr, dir_edges.src == pr.node).select(
            F.col("dst").alias("node"),
            F.expr("pr_k div deg").alias("_c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        pr = (
            sums.join(deg, "node")
            .join(F.broadcast(n))
            .select(
                "node",
                "deg",
                F.floor(
                    (1.0 - damping) * float(scale) / F.col("_n")
                    + damping * F.col("_s").cast("double")
                    + 0.5
                )
                .cast("long")
                .alias("pr_k"),
            )
        )
    return pr.select(
        "node", "deg", (F.col("pr_k").cast("double") / float(scale)).alias("pr")
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count via the ordering trick: with canonical edges
    (a<b) ⋈ (b<c) builds each wedge a<b<c exactly once, and the closing
    (a,c) probe finds each triangle exactly once — no division by 6, no
    double counting, and the wedge intermediate is bounded by
    Σ_b in(b)·out(b) instead of Σ deg² (canonical orientation roughly
    quarters it).  Integer-exact on both engines."""
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    wedges = e1.join(e2, F.col("e1.dst") == F.col("e2.src")).select(
        F.col("e1.src").alias("a"), F.col("e2.dst").alias("c")
    )
    # inner join, NOT left_semi: wedges sharing (a, c) but differing in
    # the middle node are distinct triangles and must each count
    tri = wedges.join(
        e3, (F.col("a") == F.col("e3.src")) & (F.col("c") == F.col("e3.dst"))
    )
    return tri.agg(F.count("*").alias("n_triangles"))


def common_neighbors(edges: DataFrame) -> DataFrame:
    """(a, c, cn) for every non-adjacent-or-adjacent pair with ≥1 common
    neighbor, pair canonicalized a < c.  Uses the DIRECTED view on both
    legs — unlike the triangle wedge (a<b<c), link prediction needs every
    middle b, whichever side of a and c it sorts on.  Intermediate is
    Σ deg² wedges; the groupBy collapses it map-side first."""
    d1 = directed(edges).alias("d1")
    d2 = directed(edges).alias("d2")
    return (
        d1.join(
            d2,
            (F.col("d1.dst") == F.col("d2.src"))
            & (F.col("d1.src") < F.col("d2.dst")),
        )
        .groupBy(F.col("d1.src").alias("a"), F.col("d2.dst").alias("c"))
        .agg(F.count("*").alias("cn"))
    )


def triangles_per_node(edges: DataFrame) -> DataFrame:
    """(node, triangles) — each triangle credits all three corners.
    Same canonical wedge join as ``triangle_count``, keeping the middle."""
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e1.src") == F.col("e3.src"))
            & (F.col("e2.dst") == F.col("e3.dst")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return corners.groupBy("node").agg(F.count("*").alias("triangles"))


def copurchase_edges_with_support(
    lineitem: DataFrame, min_support: int = 2
) -> DataFrame:
    """Canonical undirected edges kept only when the pair co-occurs in at
    least ``min_support`` distinct orders.

    Same bounded within-order array pairing as ``copurchase_edges`` (one
    shuffle on the order key), but the final distinct becomes a counting
    aggregate so the support threshold applies map-side-combined.  The
    threshold is the graph-sparsification knob: the raw co-purchase
    graph percolates into one giant component at any realistic density,
    while support >= 2 keeps only repeated affinities (the same rule
    basket_association_rules applies via min-support)."""
    arrs = (
        lineitem.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("__parts"))
    )
    parts = F.col("__parts")
    pair_lists = F.transform(
        parts,
        lambda x, i: F.transform(
            F.slice(parts, i + F.lit(2), F.size(parts)),
            lambda y: F.struct(x.alias("src"), y.alias("dst")),
        ),
    )
    return (
        arrs.select(F.explode(F.flatten(pair_lists)).alias("e"))
        .select("e.src", "e.dst")
        .groupBy("src", "dst")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_support)
        .select("src", "dst")
    )


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """(node, component) by iterative min-label propagation, run to
    CONVERGENCE (component = smallest node id reachable from the node).

    Each round joins the current labels onto the directed edge list,
    takes the min over each node's neighborhood plus its own label, then
    POINTER-JUMPS (each node's label replaced by its label's label —
    path compression, sound because labels only decrease and remain
    reachable-from), and pins the result via ``reliable_pin`` (eager
    localCheckpoint in local mode, reliable warehouse-scratch checkpoint
    on a cluster — the truncation is load-bearing, so a lost
    executor-local block would otherwise kill the multi-round job) so
    the loop's lineage stays one round deep — the convergence-count
    action then reads the checkpointed blocks instead of recomputing
    the join.
    Compression cuts rounds from O(diameter) to O(log diameter); every
    round is two bounded joins + one min aggregate on (nodes +
    edges)-sized data, nothing accumulates.

    100 TB note: this is the hash-to-min shape (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 use the same
    join-aggregate primitive in their large-star/small-star rounds); the
    compression hop is what keeps round count logarithmic on
    high-diameter graphs."""
    # pin the edge list once: without this the whole upstream edge build
    # (pair explosion + support aggregate) re-executes EVERY round
    d = reliable_pin(directed(edges))
    labels = reliable_pin(
        d.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )

    def step(cur: DataFrame) -> DataFrame:
        """One propagate + compress step: (node, lbl) -> (node, lbl)."""
        neighbor = d.join(cur, d.src == cur.node).select(
            F.col("dst").alias("node"), F.col("lbl")
        )
        best = (
            neighbor.unionByName(cur.select("node", "lbl"))
            .groupBy("node")
            .agg(F.min("lbl").alias("cand"))
        )
        # pointer jumping: follow cand one hop through its own label
        hop = best.select(
            F.col("node").alias("h_node"), F.col("cand").alias("h_cand")
        )
        return best.join(hop, best.cand == hop.h_node, "left").select(
            "node",
            F.coalesce(F.col("h_cand"), F.col("cand")).alias("lbl"),
        )

    for _ in range(max_iter):
        # TWO propagate+compress steps per materialization (r17, guide
        # §2.4/§5: each reliable_pin is a full job round-trip — batching
        # two steps between pins halves the pin count and the convergence
        # actions; the unpinned intermediate keeps lineage two bounded
        # steps deep, well inside the truncation contract).  Labels only
        # decrease, so "no change across the double step" is exactly the
        # fixed point a single step would detect.
        stepped = step(step(labels))
        merged = reliable_pin(
            labels.join(
                stepped.select("node", F.col("lbl").alias("new_lbl")), "node"
            )
        )
        changed = (
            merged.where(F.col("new_lbl") < F.col("lbl")).limit(1).count()
        )
        labels = merged.select("node", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            break
    return labels.select("node", F.col("lbl").alias("component"))


def bfs_distances(edges: DataFrame, max_iter: int = 64) -> DataFrame:
    """(node, dist) — unweighted shortest-path distances from the graph's
    smallest node id, by frontier BFS run to convergence.

    Classic level-synchronous BFS: each round joins the current frontier
    onto the directed edge list, anti-joins out already-visited nodes,
    and pins the new frontier via ``reliable_pin`` (one-round lineage,
    same cluster-safety contract as ``connected_components``).  Unweighted level-order
    guarantees first-visit = shortest, so no relaxation loop is needed;
    rounds = eccentricity of the root.  Unreached nodes (other
    components) are absent from the output — distances are defined
    within the root's component only."""
    d = reliable_pin(directed(edges))
    root = d.agg(F.min("src").alias("node")).select(
        "node", F.lit(0).cast("long").alias("dist")
    )
    dist = reliable_pin(root)
    frontier = dist
    for _ in range(max_iter):
        nxt = reliable_pin(
            d.join(frontier, d.src == frontier.node)
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
            .join(dist.select("node"), "node", "left_anti")
        )
        if nxt.limit(1).count() == 0:
            break
        # accumulate visited levels as a LAZY union of the already-pinned
        # layer frames (r17, guide §5: the old per-round
        # reliable_pin(dist ∪ nxt) re-materialized EVERY visited node
        # each round — O(n·rounds) checkpoint writes; each layer is
        # pinned exactly once, and the anti-join/result read the pinned
        # blocks through the union without recompute)
        dist = dist.unionByName(nxt)
        frontier = nxt
    return dist
