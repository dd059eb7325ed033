"""Graph-analytics registrations over the co-purchase graph.

The graph derives from lineitem (parts co-occurring in an order — see
``operators/graph.py`` for the scale shape of edge generation).  All
three queries are fully oracle-checked; PageRank's DuckDB mirror unrolls
the fixed iterations as CTE stages with the SAME per-iteration decimal
contribution sums and 12-dp rounding, so ranks match hash-exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..operators import graph as G
from ..registry import query
from ..sources import read_table

_EDGES_SQL = """
items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
dir AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
deg AS (SELECT src AS node, count(*) AS deg FROM dir GROUP BY src)
"""


@query(
    "graph_degree_distribution",
    sql=f"""
    WITH {_EDGES_SQL}
    SELECT deg AS degree, count(*) AS n_nodes
    FROM deg GROUP BY deg ORDER BY degree
    """,
    tags=("graph", "agg"),
)
def graph_degree_distribution(spark, sf_dir):
    """Degree histogram of the co-purchase graph — the first diagnostic of
    any graph workload (skew here predicts shuffle skew in every
    downstream graph op).  Integer-exact; two bounded shuffles to build
    edges, then two tiny aggs."""
    li = read_table(spark, sf_dir, "lineitem")
    deg = G.degrees(G.copurchase_edges(li))
    return (
        deg.groupBy(F.col("deg").alias("degree"))
        .agg(F.count("*").alias("n_nodes"))
        .orderBy("degree")
    )


@query(
    "graph_triangle_count",
    sql=f"""
    WITH {_EDGES_SQL},
    w AS (SELECT e1.src AS a, e2.dst AS c
          FROM edges e1 JOIN edges e2 ON e1.dst = e2.src)
    SELECT (SELECT count(*) FROM w JOIN edges e3
            ON w.a = e3.src AND w.c = e3.dst) AS n_triangles,
           (SELECT count(*) FROM edges) AS n_edges,
           (SELECT count(*) FROM deg) AS n_nodes
    """,
    tags=("graph", "join"),
)
def graph_triangle_count(spark, sf_dir):
    """Exact triangle count with the canonical-orientation wedge join
    (each triangle found exactly once — see operators/graph.py).  The
    wedge intermediate is the scale knob: Σ in(b)·out(b) under the a<b<c
    orientation, ~¼ of the naive Σ deg²; for power-law graphs the
    standard refinement (orient edges low-degree→high-degree) drops it
    further and slots into the same pipeline."""
    li = read_table(spark, sf_dir, "lineitem")
    edges = G.copurchase_edges(li).persist()
    deg = G.degrees(edges)
    tri = G.triangle_count(edges)
    counts = edges.agg(F.count("*").alias("n_edges"))
    nodes = deg.agg(F.count("*").alias("n_nodes"))
    return tri.join(F.broadcast(counts)).join(F.broadcast(nodes))


_PR_ITER = """
it{i} AS (
  SELECT d.node, d.deg,
         CAST(floor((1.0 - 0.85) * 1000000000000.0 / n.n
                    + 0.85 * CAST(sum(p.pr_k // p.deg) AS DOUBLE)
                    + 0.5) AS BIGINT) AS pr_k
  FROM dir e
  JOIN it{prev} p ON e.src = p.node
  JOIN deg d ON e.dst = d.node
  CROSS JOIN n
  GROUP BY d.node, d.deg, n.n
)"""


def _pagerank_sql(iterations: int = 3) -> str:
    stages = ",".join(
        _PR_ITER.format(i=i, prev=i - 1) for i in range(1, iterations + 1)
    )
    return f"""
    WITH {_EDGES_SQL},
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
    it0 AS (SELECT node, deg,
                   CAST(floor(1000000000000.0 / n.n + 0.5) AS BIGINT) AS pr_k
            FROM deg CROSS JOIN n),
    {stages}
    SELECT node, CAST(deg AS BIGINT) AS deg,
           CAST(pr_k AS DOUBLE) / 1000000000000.0 AS pr
    FROM it{iterations}
    """


@query("graph_pagerank_copurchase", sql=_pagerank_sql(3), tags=("graph", "iterative"))
def graph_pagerank_copurchase(spark, sf_dir):
    """3-iteration PageRank (d=0.85) over the co-purchase graph,
    hash-exact against an unrolled-CTE DuckDB mirror: per-edge
    ranks are BIGINTs on a 10^12 fixed-point grid and contributions move
    by exact integer division, so both engines compute identical bits
    (operators/graph.py::pagerank).  The Spark side is the canonical
    iterative loop — one destination-grouped shuffle per iteration over
    persisted edges; iteration count is the convergence knob (fixed here
    so the oracle can unroll it)."""
    li = read_table(spark, sf_dir, "lineitem")
    pr = G.pagerank(G.copurchase_edges(li), iterations=3)
    return pr.select("node", F.col("deg").cast("long").alias("deg"), "pr")


@query(
    "graph_link_prediction_topk",
    sql=f"""
    WITH {_EDGES_SQL},
    cn AS (
      SELECT d1.src AS a, d2.dst AS c, count(*) AS cn
      FROM dir d1 JOIN dir d2
        ON d1.dst = d2.src AND d1.src < d2.dst
      GROUP BY d1.src, d2.dst
    ),
    nonadj AS (
      SELECT cn.a, cn.c, cn.cn FROM cn
      WHERE NOT EXISTS (SELECT 1 FROM edges e
                        WHERE e.src = cn.a AND e.dst = cn.c)
    )
    SELECT n.a, n.c, n.cn,
           CAST(n.cn AS DOUBLE) / (da.deg + dc.deg - n.cn) AS jaccard
    FROM nonadj n
    JOIN deg da ON n.a = da.node
    JOIN deg dc ON n.c = dc.node
    ORDER BY jaccard DESC, n.a, n.c
    LIMIT 200
    """,
    tags=("graph", "link-prediction", "topk"),
)
def graph_link_prediction_topk(spark, sf_dir):
    """Common-neighbor link prediction: for every NON-adjacent pair with a
    shared neighbor, the neighborhood Jaccard cn/(deg_a + deg_c − cn);
    global top-200 (the "customers also bought together" candidate set).
    The Jaccard is one double division of exact integers — deterministic
    with the (a, c) tie-break.  Scale: the Σ deg² wedge intermediate is
    collapsed map-side by the count; existing edges leave via a single
    anti-join against the (much smaller) canonical edge list; top-200
    stays in-plan as TakeOrdered."""
    li = read_table(spark, sf_dir, "lineitem")
    edges = G.copurchase_edges(li).persist()
    deg = G.degrees(edges)
    cn = G.common_neighbors(edges)
    nonadj = cn.join(
        edges,
        (cn.a == edges.src) & (cn.c == edges.dst),
        "left_anti",
    )
    # degrees are node-sized (unbounded at scale) — NO broadcast hint;
    # AQE broadcasts when small, shuffles on the node key otherwise
    da = deg.select(F.col("node").alias("_na"), F.col("deg").alias("_da"))
    dc = deg.select(F.col("node").alias("_nc"), F.col("deg").alias("_dc"))
    return (
        nonadj.join(da, nonadj.a == F.col("_na"))
        .join(dc, nonadj.c == F.col("_nc"))
        .select(
            "a",
            "c",
            "cn",
            (
                F.col("cn").cast("double")
                / (F.col("_da") + F.col("_dc") - F.col("cn"))
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "a", "c")
        .limit(200)
    )


@query(
    "graph_clustering_coefficient",
    sql=f"""
    WITH {_EDGES_SQL},
    w AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
          FROM edges e1 JOIN edges e2 ON e1.dst = e2.src),
    tri AS (SELECT w.a, w.b, w.c FROM w JOIN edges e3
            ON w.a = e3.src AND w.c = e3.dst),
    per_node AS (
      SELECT node, count(*) AS triangles
      FROM (SELECT a AS node FROM tri UNION ALL
            SELECT b FROM tri UNION ALL
            SELECT c FROM tri)
      GROUP BY node
    )
    SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
           CAST(coalesce(p.triangles, 0) AS BIGINT) AS triangles,
           CASE WHEN d.deg < 2 THEN CAST(0 AS DOUBLE)
                ELSE 2.0 * coalesce(p.triangles, 0) / (d.deg * (d.deg - 1))
           END AS coefficient
    FROM deg d LEFT JOIN per_node p ON d.node = p.node
    """,
    tags=("graph", "agg"),
)
def graph_clustering_coefficient(spark, sf_dir):
    """Local clustering coefficient per node: 2·T(v) / (deg·(deg−1)) —
    how close each part's co-purchase neighborhood is to a clique (the
    basket-cohesion signal behind bundle recommendations).  The triangle
    listing credits all three corners in one pass (canonical wedge join),
    and the coefficient is one double division of exact integer products
    — deterministic, no rounding.  Degree-1 nodes define 0."""
    li = read_table(spark, sf_dir, "lineitem")
    edges = G.copurchase_edges(li).persist()
    deg = G.degrees(edges)
    tri = G.triangles_per_node(edges)
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            F.col("deg").cast("long").alias("deg"),
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
            F.when(F.col("deg") < 2, F.lit(0.0))
            .otherwise(
                2.0
                * F.coalesce(F.col("triangles"), F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1))
            )
            .alias("coefficient"),
        )
    )


# --- association rules (market-basket support / confidence / lift) --------
# The classic basket question behind "customers who bought X also
# bought Y".  Reuses the graph family's bounded within-basket pair
# fan-out (collect_set → sorted array → in-codegen index-pair explosion,
# one shuffle on the order key — never a self-join), then three exact
# count tables meet in broadcast joins.  All three metrics stay exact
# until ONE division each: support = n_ab/N, confidence = n_ab/n_a,
# lift = (n_ab·N)/(n_a·n_b) with BIGINT numerators (PMI's exact-ratio
# rule).  Ranking orders by the ROUNDED lift with a (part_a, part_b)
# tie-break — determinism.md ordering rule — and the top-20 cut runs
# in-plan (TakeOrdered over the pair table, itself bounded by basket
# width² per order).

_RULES_MIN_COUNT = 3
_RULES_TOP = 20

_RULES_SQL = f"""
WITH baskets AS (
  SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS parts
  FROM lineitem GROUP BY l_orderkey
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_baskets FROM baskets),
item AS (
  SELECT p.part, CAST(count(*) AS BIGINT) AS n_item
  FROM (SELECT unnest(parts) AS part FROM baskets) p
  GROUP BY p.part
),
pairs AS (
  SELECT p.pr.a AS part_a, p.pr.b AS part_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM (
    SELECT unnest(flatten(list_transform(parts, (x, i) ->
             list_transform(parts[i + 1:], y -> {{'a': x, 'b': y}})))) AS pr
    FROM baskets
  ) p
  GROUP BY p.pr.a, p.pr.b
),
scored AS (
  SELECT pr.part_a, pr.part_b, pr.n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
         round(CAST(pr.n_ab AS DOUBLE) / CAST(n.n_baskets AS DOUBLE), 6)
           AS support,
         round(CAST(pr.n_ab AS DOUBLE) / CAST(ia.n_item AS DOUBLE), 6)
           AS confidence,
         round(CAST(pr.n_ab * n.n_baskets AS DOUBLE)
               / CAST(ia.n_item * ib.n_item AS DOUBLE), 6) AS lift
  FROM pairs pr
  JOIN item ia ON pr.part_a = ia.part
  JOIN item ib ON pr.part_b = ib.part
  CROSS JOIN n
  WHERE pr.n_ab >= {_RULES_MIN_COUNT}
)
SELECT part_a, part_b, n_ab, n_a, n_b, support, confidence, lift,
       CAST(row_number() OVER (ORDER BY lift DESC, part_a, part_b)
            AS BIGINT) AS rank
FROM scored
ORDER BY lift DESC, part_a, part_b
LIMIT {_RULES_TOP}
"""


@query("basket_association_rules", sql=_RULES_SQL, tags=("graph", "basket", "analytics"))
def basket_association_rules(spark, sf_dir):
    """Top-{_RULES_TOP} association rules by lift over order baskets —
    see block comment for the join-free pair fan-out and exact-ratio
    metric design."""
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    n = baskets.agg(F.count("*").cast("long").alias("n_baskets"))
    item = (
        baskets.select(F.explode("parts").alias("part"))
        .groupBy("part")
        .agg(F.count("*").cast("long").alias("n_item"))
    )
    parts = F.col("parts")
    pair_lists = F.transform(
        parts,
        lambda x, i: F.transform(
            F.slice(parts, i + F.lit(2), F.size(parts)),
            lambda y: F.struct(x.alias("a"), y.alias("b")),
        ),
    )
    pairs = (
        baskets.select(F.explode(F.flatten(pair_lists)).alias("pr"))
        .groupBy(F.col("pr.a").alias("part_a"), F.col("pr.b").alias("part_b"))
        .agg(F.count("*").cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= _RULES_MIN_COUNT)
    )
    ia = item.select(F.col("part").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("part").alias("part_b"), F.col("n_item").alias("n_b"))
    # ia/ib are part-sized (unbounded at scale) — no broadcast hint; AQE
    # broadcasts when small, shuffles on the part key otherwise.  Only the
    # 1-row total keeps an explicit hint.
    scored = (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.col("n_ab").cast("double") / F.col("n_baskets").cast("double"),
                6,
            ).alias("support"),
            F.round(
                F.col("n_ab").cast("double") / F.col("n_a").cast("double"), 6
            ).alias("confidence"),
            F.round(
                (F.col("n_ab") * F.col("n_baskets")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
    wr = Window.orderBy(F.desc("lift"), "part_a", "part_b")
    return (
        scored.orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(_RULES_TOP)
        .withColumn("rank", F.row_number().over(wr).cast("long"))
    )


# --- sequential purchase patterns (A then later B) ------------------------
# basket_association_rules finds same-basket affinity; this finds
# SEQUENCE: parts a customer first bought strictly before first buying
# another — the 2-sequence mining that feeds "next purchase" models.
# Shape: one (customer, part) first-purchase rollup (order-keyed join +
# customer-keyed agg), then a customer-keyed self-equi-join whose
# fan-out is bounded by per-customer assortment (tens), never the
# catalog; counts cut at min-support and the top-20 ranks on the ROUNDED
# sequence-confidence with (a, b) tie-breaks.

_SEQ_MIN_COUNT = 3
_SEQ_TOP = 20
# Skew cap (VERDICT r7 item 3): the pairs self-join below is quadratic in a
# customer's DISTINCT PART count k (k² ordered pairs per customer).  TPC-H
# customers are near-uniform (max k: 66 @ sf0.001, 90 @ sf0.01, 105 @
# sf0.1), but a power-law user distribution at 100× data would hand one
# hot customer a million-row pair group.  So each customer keeps at most
# _SEQ_MAX_PARTS earliest-adopted parts (first_day ASC, part ASC — a
# deterministic, oracle-reproducible rule that preserves the sequence
# HEAD, where 2-sequence evidence lives) before pairing — the same
# cap-items-per-group idea as ``operators/graph.py`` mega-basket note and
# the LSH ``max_bucket`` cap.  Inactive at the sf0.01/sf0.001 oracle
# grades (max k = 90 < 128); applied identically in Spark and DuckDB so
# results agree wherever it does bite.
_SEQ_MAX_PARTS = 128

_SEQPAT_SQL = f"""
WITH cp0 AS (
  SELECT o.o_custkey AS cust, l.l_partkey AS part,
         CAST(min(floor(epoch(o.o_orderdate) / 86400)) AS BIGINT) AS first_day
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY cust, part
),
cp AS (
  SELECT cust, part, first_day FROM (
    SELECT cust, part, first_day,
           row_number() OVER (PARTITION BY cust
                              ORDER BY first_day, part) AS pos
    FROM cp0
  ) WHERE pos <= {_SEQ_MAX_PARTS}
),
firsts AS (
  SELECT part, CAST(count(*) AS BIGINT) AS n_first FROM cp GROUP BY part
),
pairs AS (
  SELECT a.part AS part_a, b.part AS part_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM cp a JOIN cp b
    ON a.cust = b.cust AND a.first_day < b.first_day
  GROUP BY a.part, b.part
),
scored AS (
  SELECT p.part_a, p.part_b, p.n_ab, f.n_first AS n_a,
         round(CAST(p.n_ab AS DOUBLE) / CAST(f.n_first AS DOUBLE), 6)
           AS seq_confidence
  FROM pairs p JOIN firsts f ON p.part_a = f.part
  WHERE p.n_ab >= {_SEQ_MIN_COUNT}
)
SELECT part_a, part_b, n_ab, n_a, seq_confidence,
       CAST(row_number() OVER (ORDER BY seq_confidence DESC, part_a, part_b)
            AS BIGINT) AS rank
FROM scored
ORDER BY seq_confidence DESC, part_a, part_b
LIMIT {_SEQ_TOP}
"""


@query(
    "basket_sequential_patterns",
    sql=_SEQPAT_SQL,
    tags=("graph", "basket", "sequence"),
)
def basket_sequential_patterns(spark, sf_dir):
    """Top-{_SEQ_TOP} strictly-ordered purchase 2-sequences by sequence
    confidence — see block comment."""
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    cp0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part")
        )
        .agg(
            F.min(F.floor(F.unix_timestamp("o_orderdate") / 86400))
            .cast("long")
            .alias("first_day")
        )
    )
    # Skew cap — see _SEQ_MAX_PARTS block comment above.
    wcap = Window.partitionBy("cust").orderBy("first_day", "part")
    # The capped (cust, part, first_day) table feeds THREE branches
    # (firsts, and both sides of the self-join); without a persist the
    # orders⋈lineitem join + rollup + cap window runs three times — the
    # r16 before-plan shows 3 identical scan-join-agg-window subtrees
    # and zero ReusedExchange.  It is small by construction (≤
    # _SEQ_MAX_PARTS rows per customer), and the bench clears the cache
    # after every timed run, so this is in-plan reuse, not cross-run
    # memoization (guide §2.1: remove repeated subtree computation).
    cp = (
        cp0.withColumn("pos", F.row_number().over(wcap))
        .where(F.col("pos") <= _SEQ_MAX_PARTS)
        .drop("pos")
    ).persist()
    firsts = cp.groupBy("part").agg(F.count("*").cast("long").alias("n_first"))
    a = cp.select(
        "cust", F.col("part").alias("part_a"), F.col("first_day").alias("da")
    )
    b = cp.select(
        "cust", F.col("part").alias("part_b"), F.col("first_day").alias("db")
    )
    pairs = (
        a.join(b, "cust")
        .where(F.col("da") < F.col("db"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= _SEQ_MIN_COUNT)
    )
    fa = firsts.select(
        F.col("part").alias("part_a"), F.col("n_first").alias("n_a")
    )
    # fa is part-sized (unbounded at scale) — no broadcast hint; AQE decides
    scored = pairs.join(fa, "part_a").select(
        "part_a",
        "part_b",
        "n_ab",
        "n_a",
        F.round(
            F.col("n_ab").cast("double") / F.col("n_a").cast("double"), 6
        ).alias("seq_confidence"),
    )
    w = Window.orderBy(F.desc("seq_confidence"), "part_a", "part_b")
    return (
        scored.orderBy(F.desc("seq_confidence"), "part_a", "part_b")
        .limit(_SEQ_TOP)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )


# --- connected components (iterative, run to convergence) ------------------
# The registry's first converge-until-fixed-point algorithm: min-label
# propagation over the support->=2 co-purchase graph (the raw graph
# percolates into ONE giant component; thresholding on repeated
# co-occurrence leaves real cluster structure).  The DuckDB oracle is a
# recursive CTE seeded (node, node) and propagating labels along edges
# only while lbl < dst — sound because a component's minimum id is
# smaller than every hop on any path out of it — so min(lbl) per node is
# exactly the Spark loop's fixed point.  Both sides are exact integer
# set computations: no floats anywhere.

_CC_SQL = """
WITH RECURSIVE items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
sedges AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY src, dst HAVING count(*) >= 2
),
sdir AS (SELECT src, dst FROM sedges UNION ALL SELECT dst, src FROM sedges),
snodes AS (SELECT DISTINCT src AS node FROM sdir),
reach AS (
  SELECT node, node AS lbl FROM snodes
  UNION
  SELECT d.dst AS node, r.lbl
  FROM reach r JOIN sdir d ON d.src = r.node
  WHERE r.lbl < d.dst
),
comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
SELECT CAST(component AS BIGINT) AS component,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM comp GROUP BY component
"""


@query("graph_connected_components", sql=_CC_SQL, tags=("graph", "iterative"))
def graph_connected_components(spark, sf_dir):
    """Connected components of the support->=2 co-purchase graph, as a
    per-component size summary — see block comment.  The Spark side runs
    ``operators/graph.py::connected_components`` (iterative min-label
    propagation, localCheckpoint per round, O(diameter) rounds) over
    ``copurchase_edges_with_support``."""
    li = read_table(spark, sf_dir, "lineitem")
    cc = G.connected_components(G.copurchase_edges_with_support(li, 2))
    return cc.groupBy("component").agg(
        F.count("*").cast("long").alias("n_nodes")
    )


# --- BFS shortest-path level histogram --------------------------------------
# Unweighted shortest-path distances from the support->=2 graph's
# smallest node id, reported as the level histogram — the reachability
# profile ("how many hops does the catalog span?").  Spark runs
# level-synchronous frontier BFS (operators/graph.py::bfs_distances,
# O(eccentricity) rounds, one-round lineage via localCheckpoint); the
# oracle is a recursive CTE walking (node, d) pairs with a depth bound
# well past any plausible diameter and taking min(d) per node —
# UNION-dedup bounds the recursion at nodes x depth rows.  Exact
# integers end to end; unreachable components are absent on both sides.

_BFS_SQL = """
WITH RECURSIVE items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
sedges AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY src, dst HAVING count(*) >= 2
),
sdir AS (SELECT src, dst FROM sedges UNION ALL SELECT dst, src FROM sedges),
root AS (SELECT min(src) AS r FROM sdir),
walk AS (
  SELECT (SELECT r FROM root) AS node, CAST(0 AS BIGINT) AS d
  UNION
  SELECT e.dst, w.d + 1
  FROM walk w JOIN sdir e ON e.src = w.node
  WHERE w.d < 40
),
dist AS (SELECT node, CAST(min(d) AS BIGINT) AS dist FROM walk GROUP BY node)
SELECT dist, CAST(count(*) AS BIGINT) AS n_nodes
FROM dist GROUP BY dist
"""


@query("graph_bfs_distances", sql=_BFS_SQL, tags=("graph", "iterative"))
def graph_bfs_distances(spark, sf_dir):
    """BFS shortest-path level histogram from the smallest node of the
    support->=2 co-purchase graph — see block comment."""
    li = read_table(spark, sf_dir, "lineitem")
    dist = G.bfs_distances(G.copurchase_edges_with_support(li, 2))
    return dist.groupBy("dist").agg(
        F.count("*").cast("long").alias("n_nodes")
    )


# --- modularity of the brand partition ----------------------------------------
# Newman modularity Q of a GIVEN node partition (part brand) over the
# co-purchase graph: per community c, contribution = e_c/m - (d_c/2m)^2.
# This is the evaluation half of community detection — at 100 TB you
# score candidate partitions (brand, category, label-prop output) with
# exactly this aggregate: the edge table joins the node-label dimension
# twice (hint-free: AQE broadcasts it when small, shuffles on the node
# key when not), degrees come from the existing degree pipeline, and
# everything reduces to community-sized integer cells (e_c, d_c).
# Integer-exact: each row's contribution is an IEEE-exact function of
# BIGINT (e_c, d_c, m).

_MODULARITY_SQL = f"""
WITH {_EDGES_SQL},
labels AS (SELECT p_partkey AS node, p_brand AS brand FROM part),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges),
within AS (
  SELECT la.brand, CAST(count(*) AS BIGINT) AS e_c
  FROM edges e
  JOIN labels la ON e.src = la.node
  JOIN labels lb ON e.dst = lb.node AND la.brand = lb.brand
  GROUP BY la.brand
),
degs AS (
  SELECT l.brand,
         CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(d.deg) AS BIGINT) AS d_c
  FROM deg d JOIN labels l ON d.node = l.node
  GROUP BY l.brand
)
SELECT degs.brand,
       degs.n_nodes,
       degs.d_c,
       CAST(coalesce(w.e_c, 0) AS BIGINT) AS e_c,
       round(CAST(coalesce(w.e_c, 0) AS DOUBLE) / CAST(m.m AS DOUBLE)
             - (CAST(degs.d_c AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE)))
               * (CAST(degs.d_c AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE))), 6)
         AS q_contribution
FROM degs LEFT JOIN within w ON degs.brand = w.brand
CROSS JOIN m
"""


@query(
    "graph_modularity_brands",
    sql=_MODULARITY_SQL,
    tags=("graph", "community"),
)
def graph_modularity_brands(spark, sf_dir):
    """Per-brand Newman modularity contribution over the co-purchase
    graph — see block comment."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("brand")
    )
    edges = G.copurchase_edges(li).persist()
    m = edges.agg(F.count("*").cast("long").alias("m"))
    la = part.select(F.col("node").alias("src"), F.col("brand").alias("brand_a"))
    lb = part.select(F.col("node").alias("dst"), F.col("brand").alias("brand_b"))
    # la/lb/part are node-sized label dims (unbounded at scale) — no
    # broadcast hint (same policy as degrees above); AQE broadcasts when
    # small, shuffles on the node key otherwise.  m stays hinted (1 row).
    within = (
        edges.join(la, "src")
        .join(lb, "dst")
        .where(F.col("brand_a") == F.col("brand_b"))
        .groupBy(F.col("brand_a").alias("brand"))
        .agg(F.count("*").cast("long").alias("e_c"))
    )
    degs = (
        G.degrees(edges)
        .join(part, "node")
        .groupBy("brand")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.sum("deg").cast("long").alias("d_c"),
        )
    )
    md = F.col("m").cast("double")
    half = F.col("d_c").cast("double") / (F.lit(2.0) * md)
    return (
        degs.join(within, "brand", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "brand",
            "n_nodes",
            "d_c",
            F.coalesce(F.col("e_c"), F.lit(0)).cast("long").alias("e_c"),
            F.round(
                F.coalesce(F.col("e_c"), F.lit(0)).cast("double") / md
                - half * half,
                6,
            ).alias("q_contribution"),
        )
    )


# --- degree assortativity -------------------------------------------------------
# Newman's degree assortativity: the Pearson correlation of endpoint
# degrees over the directed edge list (each undirected edge counted in
# both directions, the standard convention).  Positive = hubs link to
# hubs (social nets), negative = hub-and-spoke (tech/co-occurrence
# graphs).  By the both-directions symmetry the two endpoint-degree
# marginals are identical, so r reduces to
# (M·Σjk − (Σj)²) / (M·Σj² − (Σj)²) over exact BIGINT/DECIMAL moments
# with one IEEE division — no sqrt needed.  Edge build + degrees reuse
# the existing 2-shuffle pipeline; the moment pass is one hint-free
# degree join over the edge list (AQE broadcasts the node-sized degree
# table when small, key-shuffles when not — scale-adaptive by design).

_ASSORT_SQL = f"""
WITH {_EDGES_SQL},
ends AS (
  SELECT da.deg AS j, db.deg AS k
  FROM dir e
  JOIN deg da ON e.src = da.node
  JOIN deg db ON e.dst = db.node
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS m2,
         CAST(sum(j) AS DECIMAL(38,0)) AS sj,
         CAST(sum(CAST(j AS DECIMAL(38,0)) * j) AS DECIMAL(38,0)) AS sjj,
         CAST(sum(CAST(j AS DECIMAL(38,0)) * k) AS DECIMAL(38,0)) AS sjk
  FROM ends
)
SELECT CAST(m2 / 2 AS BIGINT) AS n_edges,
       CASE WHEN CAST(m2 AS DOUBLE) * CAST(sjj AS DOUBLE)
                 - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE) > 0.0
            THEN round((CAST(m2 AS DOUBLE) * CAST(sjk AS DOUBLE)
                        - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE))
                       / (CAST(m2 AS DOUBLE) * CAST(sjj AS DOUBLE)
                          - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE)), 6)
       END AS assortativity
FROM mom
"""


@query("graph_assortativity", sql=_ASSORT_SQL, tags=("graph", "stats"))
def graph_assortativity(spark, sf_dir):
    """Degree assortativity of the co-purchase graph — see block
    comment."""
    li = read_table(spark, sf_dir, "lineitem")
    edges = G.copurchase_edges(li)
    dir_ = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = G.degrees(edges)
    da = deg.select(F.col("node").alias("src"), F.col("deg").alias("j"))
    db = deg.select(F.col("node").alias("dst"), F.col("deg").alias("k"))
    # da/db are node-sized degree tables (unbounded at scale) — no
    # broadcast hint; AQE broadcasts when small, shuffles otherwise
    ends = dir_.join(da, "src").join(db, "dst")
    mom = ends.agg(
        F.count("*").cast("long").alias("m2"),
        F.sum("j").cast("decimal(38,0)").alias("sj"),
        F.sum(F.col("j").cast("decimal(38,0)") * F.col("j"))
        .cast("decimal(38,0)")
        .alias("sjj"),
        F.sum(F.col("j").cast("decimal(38,0)") * F.col("k"))
        .cast("decimal(38,0)")
        .alias("sjk"),
    )
    m2d = F.col("m2").cast("double")
    sj = F.col("sj").cast("double")
    den = m2d * F.col("sjj").cast("double") - sj * sj
    return mom.select(
        (F.col("m2") / 2).cast("long").alias("n_edges"),
        F.when(
            den > 0.0,
            F.round(
                (m2d * F.col("sjk").cast("double") - sj * sj) / den, 6
            ),
        ).alias("assortativity"),
    )
