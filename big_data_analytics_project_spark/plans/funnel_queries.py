"""Ordered-funnel and cohort-retention analytics (clickstream extensions:
the reference's e-commerce domain asks exactly these questions; its own
pipeline stops at per-session conversion labels).

Both are oracle-checked aggregate-of-aggregate chains: every stage is an
equi-join/groupBy on user_id (hash-partitioned once per stage, no windows
over global orderings), so they scale like any keyed aggregation.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..registry import query
from ..sources import read_table

# Stage k's timestamp must be >= stage k-1's (ordered funnel, not mere
# presence): min(view) → first cart AT OR AFTER it → first purchase AT OR
# AFTER that.
_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'cart' AND e.ts >= v.v_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
  GROUP BY e.user_id
)
SELECT 'view' AS stage, (SELECT count(*) FROM v) AS n_users
UNION ALL
SELECT 'view_cart', (SELECT count(*) FROM c)
UNION ALL
SELECT 'view_cart_purchase', (SELECT count(*) FROM p)
"""


@query("funnel_ordered_stages", sql=_FUNNEL_SQL, tags=("funnel", "clickstream"))
def funnel_ordered_stages(spark, sf_dir):
    """Ordered three-stage funnel (view → cart → purchase): a user counts
    at stage k only if stage k's first event is at-or-after stage k-1's —
    presence alone isn't conversion.  Three keyed aggregations chained by
    user_id equi-joins; each stage's filter pushes to its own scan."""
    ev = read_table(spark, sf_dir, "events")

    def first_at_or_after(event_type, prev, prev_ts_col, out_col):
        return (
            ev.where(F.col("event_type") == event_type)
            .join(prev, "user_id")
            .where(F.col("ts") >= F.col(prev_ts_col))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_col))
        )

    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = first_at_or_after("cart", v, "v_ts", "c_ts")
    p = first_at_or_after("purchase", c, "c_ts", "p_ts")

    def stage(name, df):
        return df.agg(
            F.lit(name).alias("stage"), F.count("*").alias("n_users")
        )

    return (
        stage("view", v)
        .unionByName(stage("view_cart", c))
        .unionByName(stage("view_cart_purchase", p))
    )


_COHORT_SQL = """
WITH firsts AS (
  SELECT user_id,
         CAST(min(floor(epoch(ts) / 86400)) AS BIGINT) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id,
         f.cohort_day,
         CAST(floor(epoch(e.ts) / 86400) AS BIGINT) - f.cohort_day AS day_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_day, day_offset, count(*) AS n_active_users
FROM activity
GROUP BY cohort_day, day_offset
"""


@query("cohort_retention_daily", sql=_COHORT_SQL, tags=("cohort", "clickstream"))
def cohort_retention_daily(spark, sf_dir):
    """Daily cohort retention: users grouped by first-seen day, activity
    counted per day offset from that cohort day (the retention-curve
    input).  One aggregation for cohort assignment, one distinct + count
    for the matrix — all keyed on user_id, broadcast-joining the
    driver-sized cohort map at scale."""
    ev = read_table(spark, sf_dir, "events")
    day = (F.floor(F.unix_timestamp("ts") / 86400)).cast("long")
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            (day - F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count("*").alias("n_active_users")
    )


# Path mining: the per-user event sequence is ordered by (ts, event_id) —
# the event_id tie-break makes the path deterministic even if two events
# share a timestamp — and every consecutive 3-step path is counted.
_PATHS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
paths AS (
  SELECT event_type || '>' || e2 || '>' || e3 AS path
  FROM seq WHERE e3 IS NOT NULL
),
counted AS (
  SELECT path, count(*) AS n_occurrences FROM paths GROUP BY path
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, path) AS rank
  FROM counted
)
SELECT path, n_occurrences, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 20
"""


@query("path_common_journeys", sql=_PATHS_SQL, tags=("funnel", "path", "window"))
def path_common_journeys(spark, sf_dir):
    """Clickstream path mining: the top-20 most common 3-step event paths
    (`view>cart>purchase`, ...) across all users — the journey-analysis
    question the reference's e-commerce domain asks beyond per-session
    conversion.  Plan: one window shuffle keyed by user (lead ×2 shares a
    single sort), map-side-combined path counts, in-plan TakeOrdered for
    the top-20 (never a global sort).  The (ts, event_id) ordering makes
    the path — and therefore the counts — deterministic under timestamp
    ties."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    counted = (
        seq.select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n_occurrences"))
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition heaps,
    # 20-row merge); the row_number window then runs over 20 rows only.
    wr = Window.orderBy(F.desc("n_occurrences"), "path")
    return (
        counted.orderBy(F.desc("n_occurrences"), "path")
        .limit(20)
        .withColumn("rank", F.row_number().over(wr).cast("long"))
    )


# Markov transition matrix: P(next event | current event) over per-user
# event sequences.  The per-src normalizer is an exact BIGINT sum, so the
# probability is ONE double division — IEEE-deterministic, no rounding
# needed (docs/determinism.md "row-level arithmetic").
_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst
  FROM events
),
c AS (
  SELECT src, dst, count(*) AS n_transitions
  FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
)
SELECT src, dst, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / sum(n_transitions) OVER (PARTITION BY src) AS p_transition
FROM c
"""


@query(
    "path_transition_matrix",
    sql=_TRANSITIONS_SQL,
    tags=("funnel", "path", "window"),
)
def path_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over the clickstream: for each
    (current, next) event-type pair, the transition count and conditional
    probability P(next | current) — the input to journey simulation and
    next-action prediction.  Plan: one window shuffle keyed by user_id for
    the lead(), map-side-combined pair counts (|event_types|² ≤ 25 rows),
    then a window over that tiny aggregate for the per-src normalizer.
    The (ts, event_id) ordering pins sequences under timestamp ties."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    counted = seq.groupBy("src", "dst").agg(
        F.count("*").alias("n_transitions")
    )
    norm = Window.partitionBy("src")
    return counted.withColumn(
        "p_transition",
        F.col("n_transitions").cast("double")
        / F.sum("n_transitions").over(norm),
    )
