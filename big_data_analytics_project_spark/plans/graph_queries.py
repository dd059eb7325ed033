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
