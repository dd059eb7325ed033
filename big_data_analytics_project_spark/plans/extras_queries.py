"""Family-completion queries: window extras, date arithmetic, array
functions, edit distance, union-by-name with schema evolution."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..registry import query
from ..sources import read_table


@query(
    "window_nth_lag_defaults",
    sql=r"""
    SELECT o_custkey, o_orderkey,
           nth_value(o_orderkey, 2) OVER w AS second_order,
           lag(o_totalprice, 2, -1.0) OVER w AS price_2_back,
           lead(o_totalprice, 2, -1.0) OVER w AS price_2_ahead
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
)
def window_nth_lag_defaults(spark, sf_dir):
    """nth_value + offset lag/lead with explicit defaults."""
    o = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wseq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.lag("o_totalprice", 2, -1.0).over(wseq).alias("price_2_back"),
        F.lead("o_totalprice", 2, -1.0).over(wseq).alias("price_2_ahead"),
    )


@query(
    "date_arithmetic",
    sql=r"""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(last_day(o_orderdate::DATE) AS VARCHAR) AS month_end,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
           CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS woy
    FROM orders
    WHERE o_orderkey % 5 = 0
    """,
    tags=("datetime",),
)
def date_arithmetic(spark, sf_dir):
    """Interval arithmetic, truncation, day/week extraction.

    Cross-engine notes: DuckDB ``dayofweek`` is 0=Sunday..6 while Spark is
    1=Sunday..7 → subtract 1 on the Spark side... actually emit Spark's
    ``dayofweek(ts)-1`` to match DuckDB's 0-based convention."""
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 5 == 0)
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).cast("long").alias("days_since_epoch_start"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        F.weekofyear("o_orderdate").cast("long").alias("woy"),
    )


@query(
    "array_funcs",
    sql=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM documents
      WHERE doc_id < 100
    )
    SELECT doc_id,
           list_sort(list_distinct(toks))[1] AS first_token_sorted,
           CAST(len(toks) AS BIGINT) AS n_toks,
           CAST(coalesce(list_position(toks, 'data'), 0) AS BIGINT) AS data_pos,
           CAST(list_has_any(toks, ['data', 'query']) AS BIGINT) AS mentions_data_or_query,
           array_to_string(list_sort(list_distinct(toks))[1:3], '|') AS top3_sorted
    FROM t
    """,
    tags=("array",),
)
def array_funcs(spark, sf_dir):
    """array_sort / array_position / arrays_overlap / slice / join.
    (Spark array_position and DuckDB list_position are both 1-based with
    0/NULL-on-missing — DuckDB returns NULL, Spark returns 0 → coalesce
    on the SQL side ... handled by emitting coalesce there; here the Spark
    value is used as-is and the mirror coalesces to 0.)"""
    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    toks = F.split(F.lower("text"), r"\s+")
    sorted_distinct = F.array_sort(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        F.element_at(sorted_distinct, 1).alias("first_token_sorted"),
        F.size(toks).cast("long").alias("n_toks"),
        F.array_position(toks, "data").cast("long").alias("data_pos"),
        F.arrays_overlap(toks, F.array(F.lit("data"), F.lit("query")))
        .cast("long")
        .alias("mentions_data_or_query"),
        F.array_join(F.slice(sorted_distinct, 1, 3), "|").alias("top3_sorted"),
    )


@query(
    "text_edit_distance",
    sql=r"""
    WITH a AS (SELECT doc_id, substring(lower(text), 1, 40) AS prefix FROM documents WHERE doc_id < 60),
         b AS (SELECT doc_id, substring(lower(text), 1, 40) AS prefix FROM documents WHERE doc_id < 60)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist
    FROM a JOIN b ON b.doc_id = a.doc_id + 1
    """,
    tags=("text", "fuzzy"),
)
def text_edit_distance(spark, sf_dir):
    """Levenshtein distance between consecutive docs' 40-char prefixes —
    the fuzzy-matching primitive (both engines implement the standard DP)."""
    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    pfx = docs.select("doc_id", F.substring(F.lower("text"), 1, 40).alias("prefix"))
    a = pfx.alias("a")
    b = pfx.alias("b")
    return a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.levenshtein(F.col("a.prefix"), F.col("b.prefix")).cast("long").alias("edit_dist"),
    )


@query(
    "union_schema_evolution",
    sql=r"""
    SELECT c_custkey AS id, c_acctbal AS balance, c_mktsegment AS segment, NULL AS region
    FROM customer WHERE c_custkey % 3 = 0
    UNION ALL
    SELECT s_suppkey AS id, s_acctbal AS balance, NULL AS segment, CAST(s_nationkey AS VARCHAR) AS region
    FROM supplier
    """,
    tags=("setop", "union"),
)
def union_schema_evolution(spark, sf_dir):
    """unionByName(allowMissingColumns=True): bag-union across evolving
    schemas — missing columns null-filled by name, not position."""
    c = read_table(spark, sf_dir, "customer").where(F.col("c_custkey") % 3 == 0)
    s = read_table(spark, sf_dir, "supplier")
    a = c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_acctbal").alias("balance"),
        F.col("c_mktsegment").alias("segment"),
    )
    b = s.select(
        F.col("s_suppkey").alias("id"),
        F.col("s_acctbal").alias("balance"),
        F.col("s_nationkey").cast("string").alias("region"),
    )
    return a.unionByName(b, allowMissingColumns=True)


@query(
    "skew_salted_agg",
    sql=r"""
    SELECT event_type,
           count(value) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
    tags=("skew", "agg"),
)
def skew_salted_agg(spark, sf_dir):
    """Two-phase salted aggregation over the skewed event_type key (a
    handful of hot keys across every row — exactly the shape that stalls
    one reducer per key at 100 TB).  The random salt spreads each hot key
    over 16 reducers; decimal sums make both phases associative, so the
    result is bit-identical to the oracle's plain GROUP BY regardless of
    how the salt partitions rows."""
    from ..operators.skew import salted_agg

    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("decimal(18,2)").alias("val")
    )
    out = salted_agg(
        ev,
        "event_type",
        {"n_events": ("val", "count"), "total_value": ("val", "sum")},
        n_salts=16,
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("total_value").cast("double").alias("total_value"),
    )


@query(
    "skew_salted_join",
    sql=r"""
    WITH dim AS (
      SELECT DISTINCT event_type,
             CASE event_type
               WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'cart' THEN 3
               WHEN 'purchase' THEN 5 ELSE 4 END AS weight
      FROM events
    )
    SELECT e.event_type, dim.weight,
           count(*) AS n_rows,
           CAST(sum(CAST(e.value AS DECIMAL(18,2)) * dim.weight) AS DOUBLE)
             AS weighted_value
    FROM events e JOIN dim USING (event_type)
    GROUP BY e.event_type, dim.weight
    """,
    tags=("skew", "join"),
)
def skew_salted_join(spark, sf_dir):
    """Skew-safe salted equi-join: every events row carries one of a
    handful of hot ``event_type`` keys — a plain shuffle join would stall
    one reducer per key at 100 TB.  ``salted_join`` salts the big side and
    replicates the small dimension ×8 so each hot key spreads over 8
    reducers.  The random salt never reaches the output: the post-join
    aggregate (decimal sums — associative) is hash-compared against the
    oracle's PLAIN equi-join, proving the salted plan computes the same
    relation."""
    from ..operators.skew import salted_join

    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("decimal(18,2)").alias("val")
    )
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "weight",
            F.when(F.col("event_type") == "view", 1)
            .when(F.col("event_type") == "click", 2)
            .when(F.col("event_type") == "cart", 3)
            .when(F.col("event_type") == "purchase", 5)
            .otherwise(4),
        )
    )
    joined = salted_join(ev, dim, "event_type", n_salts=8)
    return joined.groupBy("event_type", "weight").agg(
        F.count("*").alias("n_rows"),
        (F.sum(F.col("val") * F.col("weight"))).cast("double").alias("weighted_value"),
    )


# --- Count-Min sketch contract ---------------------------------------------------
# Completes the DataSketches family (Theta / KLL / approx_top_k above)
# with Spark's count_min_sketch aggregate: the streaming-frequency
# structure whose guarantee is one-sided — estimates NEVER undercount
# and overcount by at most eps*N with probability >= confidence.  The
# contract asserts exactly that, per event type, against exact counts
# the oracle recomputes: seeded sketch -> deterministic binary, so the
# booleans are stable.  Estimation uses the JVM sketch object directly
# (org.apache.spark.util.sketch.CountMinSketch.readFrom) on the
# one-row collected sketch — driver-side scalar work on a 5-key domain,
# the same shape as the ML contracts.  At 100 TB the sketch is the
# point: mergeable partials, fixed size, one pass.

_CMS_EPS = 0.001
_CMS_CONF = 0.99
_CMS_SEED = 42

_CMS_SQL = """
WITH per_type AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type
)
SELECT CAST(sum(cnt) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(max(cnt) AS BIGINT) AS max_type_count,
       CAST(TRUE AS BOOLEAN) AS cms_never_undercounts,
       CAST(TRUE AS BOOLEAN) AS cms_within_eps
FROM per_type
"""


@query(
    "sketch_count_min_contract",
    sql=_CMS_SQL,
    tags=("sketch", "contract"),
)
def sketch_count_min_contract(spark, sf_dir):
    """Count-Min sketch one-sided-error contract over event types — see
    block comment."""
    import math

    ev = read_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["cnt"]
        for r in ev.groupBy("event_type")
        .agg(F.count("*").cast("long").alias("cnt"))
        .collect()
    }
    n_events = sum(exact.values())
    sketch_bytes = ev.agg(
        F.count_min_sketch(
            "event_type",
            F.lit(_CMS_EPS),
            F.lit(_CMS_CONF),
            F.lit(_CMS_SEED),
        ).alias("s")
    ).collect()[0]["s"]
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sketch_bytes)
    )
    bound = math.ceil(_CMS_EPS * n_events)
    never_under = all(
        cms.estimateCount(k) >= v for k, v in exact.items()
    )
    within_eps = all(
        cms.estimateCount(k) <= v + bound for k, v in exact.items()
    )
    return spark.createDataFrame(
        [
            (
                int(n_events),
                len(exact),
                int(max(exact.values())),
                bool(never_under),
                bool(within_eps),
            )
        ],
        "n_events long, n_types long, max_type_count long, "
        "cms_never_undercounts boolean, cms_within_eps boolean",
    )


# --- HLL sketch contract ----------------------------------------------------------
# The last missing DataSketches member (Theta / KLL / approx_top_k / CMS
# above): Datasketches HLL via hll_sketch_agg, whose 100 TB point is
# MERGEABILITY — per-partition/per-day sketches union to the global
# cardinality without re-scanning.  The contract asserts both halves
# against exact counts the oracle recomputes: every per-event-type
# estimate within 5% of the exact distinct-user count (lgK=12 gives
# ~1.6% rse), and the UNION of the per-type sketches estimating the
# global distinct within 5% — the merge path exercised end-to-end.
# DataSketches HLL is deterministic by construction (no seed), so the
# booleans are stable across engines, sessions and partitionings.

_HLL_LGK = 12
_HLL_TOL = 0.05

_HLL_SQL = """
WITH per_type AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_u
  FROM events GROUP BY event_type
)
SELECT CAST(count(*) AS BIGINT) AS n_types,
       CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT)
         AS exact_global_users,
       CAST(max(exact_u) AS BIGINT) AS max_type_users,
       CAST(TRUE AS BOOLEAN) AS per_type_within_5pct,
       CAST(TRUE AS BOOLEAN) AS union_within_5pct
FROM per_type
"""


@query(
    "sketch_hll_distinct_contract",
    sql=_HLL_SQL,
    tags=("sketch", "hll", "contract"),
)
def sketch_hll_distinct_contract(spark, sf_dir):
    """Datasketches-HLL distinct-count contract with a real merge path —
    see block comment."""
    ev = read_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_u"),
        F.hll_sketch_agg("user_id", F.lit(_HLL_LGK)).alias("sk"),
    )
    rows = per.select(
        "event_type", "exact_u", F.hll_sketch_estimate("sk").alias("est")
    ).collect()
    union_est = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("u")
    ).collect()[0]["u"]
    exact_global = ev.agg(
        F.countDistinct("user_id").cast("long").alias("g")
    ).collect()[0]["g"]
    per_ok = all(
        abs(r["est"] - r["exact_u"]) <= _HLL_TOL * r["exact_u"] for r in rows
    )
    union_ok = abs(union_est - exact_global) <= _HLL_TOL * exact_global
    return spark.createDataFrame(
        [
            (
                len(rows),
                int(exact_global),
                int(max(r["exact_u"] for r in rows)),
                bool(per_ok),
                bool(union_ok),
            )
        ],
        "n_types long, exact_global_users long, max_type_users long, "
        "per_type_within_5pct boolean, union_within_5pct boolean",
    )
