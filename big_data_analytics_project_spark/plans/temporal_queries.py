"""Temporal operator registrations: as-of join, bucketed range join,
hypertable-style hierarchical rollup (extension operators — SURVEY §2 has
no native equivalents; these are the time-series joins a training-data /
clickstream pipeline needs at scale).

All three are oracle-checked: DuckDB has native ASOF JOIN and IEJoin-style
range joins, so the oracles are straightforward declarative SQL while the
Spark side proves the scalable composition (union+window asof, bucketed
equi-join range join, hierarchical re-aggregation rollup) produces
identical results.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..operators.asof import asof_join
from ..operators.hypertable import hypertable_rollup
from ..operators.rangejoin import range_join_points_in_intervals
from ..registry import query
from ..sources import read_table

# --- as-of join -----------------------------------------------------------

# Views deduped to one row per (user_id, ts): "the" most recent view is
# otherwise undefined at ts collisions (same caveat as DuckDB ASOF JOIN).
_ASOF_SQL = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, ts, max(event_id) AS view_event_id
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS ts_epoch,
       CAST(floor(epoch(v.ts)) AS BIGINT) AS asof_ts_epoch,
       v.view_event_id AS asof_view_event_id,
       CAST(floor(epoch(p.ts)) - floor(epoch(v.ts)) AS BIGINT) AS gap_sec
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
"""


@query("asof_join_nearest_event", sql=_ASOF_SQL, tags=("temporal", "asof", "join"))
def asof_join_nearest_event(spark, sf_dir):
    """Backward as-of join: each purchase enriched with the user's most
    recent view at-or-before it (attribution).  Spark composition is
    union + one key-partitioned window with last(ignorenulls) — ONE
    shuffle, no interval explosion (operators/asof.py); the oracle is
    DuckDB's native ASOF LEFT JOIN.  Purchases with no prior view keep
    nulls (left-outer)."""
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    out = asof_join(
        purchases, views, on=["user_id"], ts_col="ts",
        right_value_cols=["view_event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").cast("long").alias("ts_epoch"),
        "asof_ts_epoch",
        F.col("asof_view_event_id").cast("long").alias("asof_view_event_id"),
        (F.unix_timestamp("ts") - F.col("asof_ts_epoch"))
        .cast("long")
        .alias("gap_sec"),
    )


# --- bucketed range join --------------------------------------------------

_ATTRIBUTION_WINDOW_SEC = 14400  # 4 h lookback per purchase

_RANGE_SQL = f"""
WITH p AS (
  SELECT event_id, user_id,
         ts - INTERVAL {_ATTRIBUTION_WINDOW_SEC} SECONDS AS w_start,
         ts AS w_end
  FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'view'
)
SELECT p.event_id, p.user_id,
       CAST(floor(epoch(p.w_end)) AS BIGINT) AS ts_epoch,
       count(v.ts) AS n_views,
       CAST(sum(CAST(v.value AS DECIMAL(18,2))) AS DOUBLE) AS view_value
FROM p JOIN v
  ON p.user_id = v.user_id AND v.ts >= p.w_start AND v.ts <= p.w_end
GROUP BY 1, 2, 3
"""


@query("range_join_attribution", sql=_RANGE_SQL, tags=("temporal", "range", "join"))
def range_join_attribution(spark, sf_dir):
    """Interval join: views falling in each purchase's 4-hour lookback
    window, aggregated per purchase.  Spark side uses the bucketed range
    join (explode intervals over <=2 time buckets → equi-join on
    (user, bucket) → exact BETWEEN filter; operators/rangejoin.py) — no
    per-key cross product; the oracle is the plain declarative range join
    DuckDB plans natively.  Purchases with zero in-window views don't
    appear (inner semantics, mirrored)."""
    ev = read_table(spark, sf_dir, "events")
    intervals = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        (F.col("ts") - F.expr(f"INTERVAL {_ATTRIBUTION_WINDOW_SEC} SECONDS")).alias(
            "w_start"
        ),
        F.col("ts").alias("w_end"),
    )
    points = ev.where(F.col("event_type") == "view").select("user_id", "ts", "value")
    joined = range_join_points_in_intervals(
        intervals, points,
        on=["user_id"], start_col="w_start", end_col="w_end",
        point_ts_col="ts", bucket_sec=_ATTRIBUTION_WINDOW_SEC,
    )
    return (
        joined.groupBy(
            "event_id", "user_id", F.unix_timestamp("w_end").cast("long").alias("ts_epoch")
        )
        .agg(
            F.count("pt_ts").alias("n_views"),
            F.sum(F.col("pt_value").cast("decimal(18,2)"))
            .cast("double")
            .alias("view_value"),
        )
    )


# --- hypertable rollup ----------------------------------------------------

# Exact distinct per bucket lives only in the ORACLE-facing contract: the
# operator itself carries the mergeable HLL sketch (scale path).  The
# compared columns are the exact measures plus a boolean pinning the
# sketch estimate within 10% of exact (deterministic for fixed input).
_ROLLUP_SQL = """
WITH hourly AS (
  SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket_start_epoch,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         count(DISTINCT user_id) AS n_users_exact
  FROM events GROUP BY 1
),
daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket_start_epoch,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         count(DISTINCT user_id) AS n_users_exact
  FROM events GROUP BY 1
)
SELECT 'hour' AS grain, bucket_start_epoch, n_events, total_value,
       n_users_exact, CAST(TRUE AS BOOLEAN) AS approx_within_10pct
FROM hourly
UNION ALL
SELECT 'day' AS grain, bucket_start_epoch, n_events, total_value,
       n_users_exact, CAST(TRUE AS BOOLEAN) AS approx_within_10pct
FROM daily
"""


@query("hypertable_rollup_events", sql=_ROLLUP_SQL, tags=("temporal", "rollup", "sketch"))
def hypertable_rollup_events(spark, sf_dir):
    """Hierarchical hour→day rollup (TimescaleDB continuous-aggregate
    shape): raw data aggregated ONCE at hour grain, the day grain
    re-aggregated from hourly partials — including the distinct-user HLL
    sketch, merged upward via hll_union_agg, never recomputed from raw
    (operators/hypertable.py).  Exact counts and sums merge exactly; the
    sketch is pinned by a within-10%-of-exact boolean contract (estimate
    values are engine-specific, the bound is deterministic)."""
    ev = read_table(spark, sf_dir, "events")
    rolled = hypertable_rollup(ev)

    # exact distinct per grain for the contract: distinct (hour, user)
    # pairs once, then both grains' exact counts reduce from those pairs
    # persisted: both grains' exact counts reduce from these pairs, and
    # without materialization each branch re-runs the distinct from raw
    pairs = ev.select(
        _hour_bucket(F.col("ts")).alias("h"), F.col("user_id")
    ).distinct().persist()
    exact_hour = pairs.groupBy(F.col("h").alias("bucket_start_epoch")).agg(
        F.count("*").alias("n_users_exact")
    ).withColumn("grain", F.lit("hour"))
    exact_day = (
        pairs.select(
            (F.floor(F.col("h") / 86400) * 86400).cast("long").alias("bucket_start_epoch"),
            "user_id",
        )
        .distinct()
        .groupBy("bucket_start_epoch")
        .agg(F.count("*").alias("n_users_exact"))
        .withColumn("grain", F.lit("day"))
    )
    exact = exact_hour.unionByName(exact_day)
    return (
        rolled.join(exact, ["grain", "bucket_start_epoch"])
        .select(
            "grain",
            "bucket_start_epoch",
            "n_events",
            "total_value",
            "n_users_exact",
            (
                F.abs(
                    F.col("approx_users").cast("double") / F.col("n_users_exact") - 1.0
                )
                <= 0.10
            ).alias("approx_within_10pct"),
        )
    )


def _hour_bucket(ts):
    return (F.floor(F.unix_timestamp(ts) / 3600) * 3600).cast("long")


# --- inactivity-gap sessionization ----------------------------------------

_GAP_SEC = 1800

_GAP_SESSION_SQL = f"""
WITH lagged AS (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT event_id, user_id,
       CAST(sum(CASE WHEN prev_ts IS NULL
                       OR date_diff('second', prev_ts, ts) > {_GAP_SEC}
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
FROM lagged
"""


@query("session_gap_assignment", sql=_GAP_SESSION_SQL, tags=("temporal", "session", "window"))
def session_gap_assignment(spark, sf_dir):
    """Classic 30-minute inactivity-gap sessionization over the event
    stream (operators/sessionization.py::gap_sessionize) — the batch
    mirror of the streaming session_window query.  lag + running sum
    share one (partition, order) spec → a single Exchange; event_id is
    the tie-break so timestamp collisions order identically across
    engines."""
    from ..operators.sessionization import gap_sessionize

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = gap_sessionize(ev, "user_id", "ts", gap_sec=_GAP_SEC, tiebreak="event_id")
    return out.select("event_id", "user_id", "session_idx")


# --- hypertable gap-fill + linear interpolation ---------------------------

_GAPFILL_SQL = """
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1
  FROM events
),
grid AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h
              FROM bounds) g
),
agg AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS measured
  FROM events GROUP BY 1, 2
),
j AS (
  SELECT g.event_type, g.h, coalesce(a.n, 0) AS n_events, a.measured
  FROM grid g LEFT JOIN agg a USING (event_type, h)
),
w AS (
  SELECT *,
    last_value(measured IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY h
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN measured IS NOT NULL THEN h END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY h
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
    first_value(measured IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY h
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN measured IS NOT NULL THEN h END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY h
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM j
)
SELECT event_type, h AS bucket_ts, CAST(n_events AS BIGINT) AS n_events,
       measured,
       CASE WHEN measured IS NOT NULL THEN measured
            WHEN pv IS NULL THEN nv
            WHEN nv IS NULL THEN pv
            ELSE pv + (nv - pv)
                 * (CAST(CAST(floor(epoch(h)) AS BIGINT)
                         - CAST(floor(epoch(ph)) AS BIGINT) AS DOUBLE)
                    / CAST(CAST(floor(epoch(nh)) AS BIGINT)
                           - CAST(floor(epoch(ph)) AS BIGINT) AS DOUBLE))
       END AS filled,
       CAST(measured IS NULL AS BIGINT) AS was_gap
FROM w
"""


@query("timeseries_gapfill_interpolate", sql=_GAPFILL_SQL, tags=("temporal", "gapfill"))
def timeseries_gapfill_interpolate(spark, sf_dir):
    """Hypertable gap-fill with linear interpolation (the TimescaleDB
    time_bucket_gapfill + interpolate idiom): densify each series to a
    complete hourly grid, then fill empty buckets by interpolating
    between the nearest measured neighbors (edges fall back to
    locf/nocb).  All window-function machinery: last/first_value with
    IGNORE NULLS over the densified series — one window shuffle on the
    series key, no self-joins, no driver loop.  Determinism: the
    measured values are decimal-summed doubles, the interpolation ratio
    is a single double division of exact hour-aligned epoch integers,
    and the blend pv + (nv−pv)·ratio is per-row IEEE arithmetic —
    identical on both engines with no rounding step.  At scale the grid
    is |series| × |buckets| rows — generated, never shuffled until the
    one window pass."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("_t0"),
        F.date_trunc("hour", F.max("ts")).alias("_t1"),
    )
    types = ev.select("event_type").distinct()
    grid = (
        types.join(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("_t0", "_t1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.count("*").alias("_n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("measured"),
    )
    j = grid.join(agg, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
        "measured",
    )
    wb = Window.partitionBy("event_type").orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wf = Window.partitionBy("event_type").orderBy("h").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    mh = F.when(F.col("measured").isNotNull(), F.col("h"))
    w = j.select(
        "event_type",
        "h",
        "n_events",
        "measured",
        F.last("measured", ignorenulls=True).over(wb).alias("pv"),
        F.last(mh, ignorenulls=True).over(wb).alias("ph"),
        F.first("measured", ignorenulls=True).over(wf).alias("nv"),
        F.first(mh, ignorenulls=True).over(wf).alias("nh"),
    )
    ratio = (
        (F.unix_timestamp("h") - F.unix_timestamp("ph")).cast("double")
        / (F.unix_timestamp("nh") - F.unix_timestamp("ph")).cast("double")
    )
    return w.select(
        "event_type",
        F.col("h").alias("bucket_ts"),
        "n_events",
        "measured",
        F.when(F.col("measured").isNotNull(), F.col("measured"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * ratio)
        .alias("filled"),
        F.col("measured").isNull().cast("long").alias("was_gap"),
    )


# EWMA: recursive per-user state (ewma_i = α·x_i + (1−α)·ewma_{i−1}) is
# not expressible as a frame-based window aggregate, so both engines run
# the SAME left-fold over the (ts, event_id)-ordered value list — an
# identical sequence of double ops, hence an exact diff.  α = 0.3.
_EWMA_SQL = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(list_reduce(list(value ORDER BY ts, event_id),
                         (acc, x) -> acc * 0.7 + x * 0.3), 6) AS ewma_value
FROM events
GROUP BY user_id
"""


@query("timeseries_ewma_by_user", sql=_EWMA_SQL, tags=("timeseries", "fold"))
def timeseries_ewma_by_user(spark, sf_dir):
    """Per-user exponentially-weighted moving average of event values
    (α = 0.3) — the classic smoothing feature for activity scoring.
    EWMA is a linear recurrence, so it cannot be a frame-based window
    aggregate; the scale-correct Spark form is ONE hash aggregation
    (collect_list per user, map-side partial) followed by a JVM-side
    `aggregate` fold over the time-ordered array — per-user state never
    leaves the executor and there is exactly one shuffle, keyed by user.
    The (ts, event_id) sort key makes the fold order — and thus the
    float result — deterministic and identical to the DuckDB
    `list_reduce` mirror."""
    ev = read_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("seq"),
    )
    vals = F.transform("seq", lambda x: x["value"])
    ewma = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(0.7) + x * F.lit(0.3),
    )
    return seq.select(
        "user_id", "n_events", F.round(ewma, 6).alias("ewma_value")
    )


# --- seasonal-naive forecast backtest -------------------------------------
# The simplest defensible baseline forecast (y_hat[d] = y[d-7]) and its
# backtest error, all in EXACT decimal arithmetic: daily totals are
# DECIMAL sums, the 7-day shift is a key join (day = day-7) rather than a
# row-offset lag — correct under calendar gaps — and the error is a
# decimal difference, so both engines agree bit-for-bit with no rounding.

_SEASONAL_SQL = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         sum(CAST(value AS DECIMAL(18,2))) AS total
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT a.day,
       CAST(a.total AS DOUBLE) AS actual,
       CAST(f.total AS DOUBLE) AS forecast,
       CAST(abs(a.total - f.total) AS DOUBLE) AS abs_err
FROM daily a LEFT JOIN daily f ON f.day = a.day - 7
"""


@query(
    "forecast_seasonal_naive",
    sql=_SEASONAL_SQL,
    tags=("timeseries", "forecast"),
)
def forecast_seasonal_naive(spark, sf_dir):
    """Seasonal-naive revenue backtest: each day's forecast is the total
    from 7 days earlier, with per-day absolute error — the baseline every
    forecasting pipeline must beat, and the shape of its backtesting scan.
    Plan: one keyed aggregation reduces the fact table to ~|days| rows;
    the lag is then a BROADCAST self-join on the shifted day key (exact
    under calendar gaps, unlike a row-offset lag), costing nothing at any
    scale.  Decimal-exact throughout: no float rounding on either engine."""
    ev = read_table(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / 86400).cast("long")
    daily = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(day.alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("total"))
    )
    fc = daily.select(
        (F.col("day") + 7).alias("fday"), F.col("total").alias("ftotal")
    )
    return daily.join(
        F.broadcast(fc), daily.day == fc.fday, "left"
    ).select(
        "day",
        F.col("total").cast("double").alias("actual"),
        F.col("ftotal").cast("double").alias("forecast"),
        F.abs(F.col("total") - F.col("ftotal"))
        .cast("double")
        .alias("abs_err"),
    )


# --- in-plan closed-form OLS (daily revenue trend) ------------------------

_OLS_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS y
  FROM events WHERE event_type = 'purchase'
  GROUP BY CAST(ts AS DATE)
),
dmin AS (SELECT min(d) AS d0 FROM daily),
xy AS (
  SELECT CAST(date_diff('day', m.d0, daily.d) AS BIGINT) AS x, y
  FROM daily CROSS JOIN dmin m
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM xy
)
SELECT n AS n_days,
       CASE WHEN n * sxx - sx * sx > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) END
         AS slope_cents_per_day,
       CASE WHEN n * sxx - sx * sx > 0
            THEN CAST(sy * sxx - sx * sxy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) END
         AS intercept_cents
FROM s
"""


@query(
    "regression_daily_revenue_trend",
    sql=_OLS_SQL,
    tags=("temporal", "regression", "analytics"),
)
def regression_daily_revenue_trend(spark, sf_dir):
    """Closed-form OLS trend of daily purchase revenue — regression as a
    single aggregation pass, no MLlib, no iteration: slope and intercept
    from the normal equations over (day index, revenue) pairs.

    Exactness: revenue is quantized to integer CENTS with the portable
    floor(x*100+0.5) grid and every moment (Σx, Σy, Σxy, Σx²) is a BIGINT
    sum of exact integers — x is days-since-first-day, so the products
    stay far from the long range at any realistic timeline — leaving two
    IEEE divisions at the very end (numerator/denominator each exact, so
    both engines divide identical doubles).  The degenerate single-day
    denominator guards with CASE (ANSI rule).  Plan: map-side-combined
    day rollup (one shuffle), a 1-row min-date broadcast, then a scalar
    moment aggregate — at 100 TB the cost is the purchase scan; the
    regression itself touches only day-cardinality rows."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(
                F.floor(F.col("value") * 100.0 + 0.5).cast("long")
            ).alias("y")
        )
    )
    dmin = daily.agg(F.min("d").alias("d0"))
    xy = daily.crossJoin(F.broadcast(dmin)).select(
        F.datediff(F.col("d"), F.col("d0")).cast("long").alias("x"), "y"
    )
    s = xy.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        F.col("n").alias("n_days"),
        F.when(
            den > 0,
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / den.cast("double"),
        ).alias("slope_cents_per_day"),
        F.when(
            den > 0,
            (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast("double")
            / den.cast("double"),
        ).alias("intercept_cents"),
    )


# --- Holt linear-trend smoothing (two-state mirrored fold) ----------------
# Extends the EWMA contract to a TWO-variable linear recurrence: level and
# trend evolve together (l' = αx + (1−α)(l+t); t' = β(l'−l) + (1−β)t), so
# the fold carries an [l, t] array as its state.  Both engines run the
# SAME op sequence — including the deliberately duplicated l' expression
# inside the trend update — over the same (ts, event_id)-ordered values,
# so the doubles match exactly.  α = 0.5, β = 0.3; init l₀ = x₁,
# t₀ = x₂ − x₁ (users need ≥ 2 events, filtered identically both sides).

_HOLT_SQL = """
WITH seq AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
  FROM events GROUP BY user_id
),
ht AS (
  SELECT user_id, n_events,
         list_reduce(
           [[vals[1], vals[2] - vals[1]]] || [[v, 0.0] for v in vals[3:]],
           (acc, x) -> [0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
                        0.3 * (0.5 * x[1] + 0.5 * (acc[1] + acc[2]) - acc[1])
                        + 0.7 * acc[2]]
         ) AS lt
  FROM seq WHERE n_events >= 2
)
SELECT user_id, n_events,
       round(lt[1], 6) AS level,
       round(lt[2], 6) AS trend,
       round(lt[1] + lt[2], 6) AS forecast_1
FROM ht
"""


@query("timeseries_holt_trend", sql=_HOLT_SQL, tags=("timeseries", "fold"))
def timeseries_holt_trend(spark, sf_dir):
    """Per-user Holt double exponential smoothing (level + trend,
    α = 0.5, β = 0.3) with a one-step-ahead forecast — the next rung
    above EWMA for activity trajectories.

    A two-variable linear recurrence can't be a window aggregate either;
    the scale shape is the EWMA one — ONE user-keyed hash aggregation
    (map-side-combined collect_list), then a JVM-side ``aggregate`` fold
    whose STATE IS AN ARRAY [level, trend].  The DuckDB mirror folds the
    identical op sequence (duplicated l' subexpression and all) over the
    identically-ordered list, so the floats diff exactly — the
    determinism.md 'linear recurrences as mirrored left-folds' rule
    generalized to vector state."""
    ev = read_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("seq"),
    )
    vals = F.transform("seq", lambda x: x["value"].cast("double"))
    init = F.array(
        F.element_at(vals, 1), F.element_at(vals, 2) - F.element_at(vals, 1)
    )
    fold = F.aggregate(
        F.slice(vals, 3, F.size(vals) - 2),
        init,
        lambda acc, x: F.array(
            F.lit(0.5) * x + F.lit(0.5) * (acc[0] + acc[1]),
            F.lit(0.3)
            * ((F.lit(0.5) * x + F.lit(0.5) * (acc[0] + acc[1])) - acc[0])
            + F.lit(0.7) * acc[1],
        ),
    )
    return (
        seq.where(F.col("n_events") >= 2)
        .select(
            "user_id",
            "n_events",
            F.round(fold[0], 6).alias("level"),
            F.round(fold[1], 6).alias("trend"),
            F.round(fold[0] + fold[1], 6).alias("forecast_1"),
        )
    )


# --- daily session metrics (bounce rate, depth, duration) -----------------

_SESSION_METRICS_SQL = f"""
WITH lagged AS (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
tagged AS (
  SELECT user_id, ts,
         sum(CASE WHEN prev_ts IS NULL
                    OR date_diff('second', prev_ts, ts) > {_GAP_SEC}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM lagged
),
sessions AS (
  SELECT user_id, session_idx,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_sec,
         CAST(floor(epoch(min(ts)) / 86400) AS BIGINT) AS day
  FROM tagged GROUP BY user_id, session_idx
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS bounce_rate,
       CAST(sum(n_events) AS BIGINT) AS total_events,
       CAST(sum(n_events) AS DOUBLE) / count(*) AS avg_session_depth,
       CAST(sum(duration_sec) AS BIGINT) AS total_duration_sec,
       CAST(sum(duration_sec) AS DOUBLE) / count(*) AS avg_duration_sec
FROM sessions GROUP BY day
"""


@query(
    "session_daily_metrics",
    sql=_SESSION_METRICS_SQL,
    tags=("temporal", "session", "analytics"),
)
def session_daily_metrics(spark, sf_dir):
    """The daily session-health rollup every web-analytics dashboard
    leads with: session count, bounce rate (single-event sessions),
    average depth, and average duration, keyed by the session's start
    day (emitted as an epoch-day BIGINT — the portable day key, seasonal-
    naive precedent).

    Built on the same ``gap_sessionize`` single-exchange window as
    session_gap_assignment, then ONE (user, session) rollup and one
    day rollup — counts and second-granularity durations are exact
    BIGINTs (truncating unix diff rule), so every rate/average is a
    single IEEE division of exact operands; no rounding anywhere."""
    from ..operators.sessionization import gap_sessionize

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    tagged = gap_sessionize(
        ev, "user_id", "ts", gap_sec=_GAP_SEC, tiebreak="event_id"
    )
    sessions = tagged.groupBy("user_id", "session_idx").agg(
        F.count("*").cast("long").alias("n_events"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).cast("long").alias("duration_sec"),
        (F.floor(F.unix_timestamp(F.min("ts")) / 86400)).cast("long").alias("day"),
    )
    bounces = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return sessions.groupBy("day").agg(
        F.count("*").cast("long").alias("n_sessions"),
        bounces.cast("long").alias("n_bounces"),
        (bounces.cast("double") / F.count("*")).alias("bounce_rate"),
        F.sum("n_events").alias("total_events"),
        (F.sum("n_events").cast("double") / F.count("*")).alias(
            "avg_session_depth"
        ),
        F.sum("duration_sec").alias("total_duration_sec"),
        (F.sum("duration_sec").cast("double") / F.count("*")).alias(
            "avg_duration_sec"
        ),
    )


# --- inter-event gap histogram (activity cadence) -------------------------

_GAP_HIST_SQL = """
WITH lagged AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
gaps AS (
  SELECT date_diff('second', prev_ts, ts) AS gap_sec
  FROM lagged WHERE prev_ts IS NOT NULL
)
SELECT CAST(length(printf('%b', gap_sec + 1)) - 1 AS BIGINT) AS log2_bucket,
       CAST(min(gap_sec) AS BIGINT) AS lo_sec,
       CAST(max(gap_sec) AS BIGINT) AS hi_sec,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM gaps GROUP BY 1
"""


@query(
    "timeseries_gap_histogram",
    sql=_GAP_HIST_SQL,
    tags=("temporal", "profile"),
)
def timeseries_gap_histogram(spark, sf_dir):
    """Power-of-two histogram of inter-event gaps per user — the cadence
    profile that picks sessionization gap thresholds and watermark delays
    from data instead of folklore (the 30-minute default is exactly the
    kind of constant this table justifies or refutes).

    Zero float operations anywhere: gaps are exact truncating-second
    diffs off one user-keyed lag window, and the log2 bucket is the
    integer bit-length trick (``length(bin(n+1)) - 1`` ≡ DuckDB
    ``length(printf('%b', n+1)) - 1`` — no libm, no boundary flips;
    tokens_length_histogram precedent, +1 shifts the zero-gap case onto
    the grid).  One window exchange, then a bucket-cardinality rollup."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "ts", F.lag("ts").over(w).alias("prev_ts")
        )
        .where(F.col("prev_ts").isNotNull())
        .select(
            (
                F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
            ).cast("long").alias("gap_sec")
        )
    )
    bucket = (F.length(F.bin(F.col("gap_sec") + 1)) - 1).cast("long")
    return gaps.groupBy(bucket.alias("log2_bucket")).agg(
        F.min("gap_sec").alias("lo_sec"),
        F.max("gap_sec").alias("hi_sec"),
        F.count("*").cast("long").alias("n_gaps"),
    )


# --- CUSUM level-shift detection on the daily event series ----------------
# Tabular CUSUM (Page's test): the standard sequential change detector for
# "did the daily volume shift from its baseline?" — more sensitive to
# small sustained shifts than per-point z-scores (anomaly_mad_outliers
# flags spikes; CUSUM accumulates drift).  Reference allowance k = σ/2,
# decision interval h = 4σ (the textbook defaults).
#
# The recurrence s⁺_i = max(0, s⁺_{i-1} + (x_i − μ − k)) is order-sensitive
# float state — exactly the EWMA/Holt shape — so both engines run the SAME
# left-fold over the SAME day-ordered list with a 5-slot vector state
# [s⁺, s⁻, max⁺, max⁻, alarms] (docs/determinism.md mirrored-fold rule).
# μ, σ derive from exact BIGINT day-count moments through an identical
# IEEE op sequence on both sides.
#
# Scale: one date-keyed aggregation reduces the corpus to ≤ thousands of
# daily counts; the fold runs on that driver-sized list in one task.  At
# 100 TB the daily rollup is the only data-sized stage (and is exactly the
# hypertable rollup's shape).

_CUSUM_SQL = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY day
),
ser AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(x * x) AS BIGINT) AS sq,
         list(CAST(x AS DOUBLE) ORDER BY day) AS xs
  FROM daily
),
params AS (
  SELECT n_days, xs,
         CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE) AS mu,
         sqrt((CAST(sq AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))
              / (CAST(n_days AS DOUBLE) - 1.0)) AS sigma
  FROM ser
),
folded AS (
  SELECT n_days, mu, sigma,
         list_reduce(
           [[0.0, 0.0, 0.0, 0.0, 0.0]] || [[v, 0.0, 0.0, 0.0, 0.0] for v in xs],
           (a, e) -> [
             greatest(0.0, a[1] + (e[1] - mu - 0.5 * sigma)),
             greatest(0.0, a[2] + (mu - 0.5 * sigma - e[1])),
             greatest(a[3], greatest(0.0, a[1] + (e[1] - mu - 0.5 * sigma))),
             greatest(a[4], greatest(0.0, a[2] + (mu - 0.5 * sigma - e[1]))),
             a[5] + CASE WHEN greatest(0.0, a[1] + (e[1] - mu - 0.5 * sigma))
                              > 4.0 * sigma
                           OR greatest(0.0, a[2] + (mu - 0.5 * sigma - e[1]))
                              > 4.0 * sigma
                         THEN 1.0 ELSE 0.0 END
           ]
         ) AS st
  FROM params
)
SELECT n_days,
       round(mu, 6) AS mean_daily,
       round(sigma, 6) AS sigma_daily,
       round(st[1], 6) AS cusum_pos,
       round(st[2], 6) AS cusum_neg,
       round(st[3], 6) AS max_cusum_pos,
       round(st[4], 6) AS max_cusum_neg,
       CAST(st[5] AS BIGINT) AS n_alarm_days
FROM folded
"""


@query("anomaly_cusum_shift", sql=_CUSUM_SQL, tags=("timeseries", "anomaly", "fold"))
def anomaly_cusum_shift(spark, sf_dir):
    """Tabular CUSUM over the daily event-count series: positive/negative
    cumulative sums, their maxima, and the number of days breaching the
    4σ decision interval (see block comment for the mirrored vector-fold
    determinism design and the single-rollup scale shape)."""
    ev = read_table(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / 86400).cast("long")
    daily = ev.groupBy(day.alias("day")).agg(F.count("*").cast("long").alias("x"))
    ser = daily.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sq"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            lambda t: t["x"].cast("double"),
        ).alias("xs"),
    )
    nd = F.col("n_days").cast("double")
    params = ser.select(
        "n_days",
        "xs",
        (F.col("s").cast("double") / nd).alias("mu"),
        F.sqrt(
            (
                F.col("sq").cast("double")
                - F.col("s").cast("double") * F.col("s").cast("double") / nd
            )
            / (nd - F.lit(1.0))
        ).alias("sigma"),
    )
    mu, sg = F.col("mu"), F.col("sigma")
    kk = F.lit(0.5) * sg
    h = F.lit(4.0) * sg

    def step(a, x):
        s_pos = F.greatest(F.lit(0.0), a[0] + (x - mu - kk))
        s_neg = F.greatest(F.lit(0.0), a[1] + (mu - kk - x))
        return F.array(
            s_pos,
            s_neg,
            F.greatest(a[2], s_pos),
            F.greatest(a[3], s_neg),
            a[4] + F.when((s_pos > h) | (s_neg > h), 1.0).otherwise(0.0),
        )

    st = F.aggregate(
        "xs", F.array(*[F.lit(0.0)] * 5), step
    )
    return params.select(
        "n_days",
        F.round(mu, 6).alias("mean_daily"),
        F.round(sg, 6).alias("sigma_daily"),
        F.round(st[0], 6).alias("cusum_pos"),
        F.round(st[1], 6).alias("cusum_neg"),
        F.round(st[2], 6).alias("max_cusum_pos"),
        F.round(st[3], 6).alias("max_cusum_neg"),
        st[4].cast("long").alias("n_alarm_days"),
    )


# --- seasonally-adjusted daily anomalies (day-of-week z-scores) -----------
# A Monday is only anomalous relative to MONDAYS: raw daily z-scores
# (anomaly_mad_outliers' cousin) flag weekly seasonality itself, so this
# detector standardizes each day against its own weekday's mean/σ.
# Epoch-day mod 7 is the portable weekday (the chi-square query's rule —
# dodges the engines' 1-based/0-based dayofweek mismatch).  Moments are
# exact BIGINT sums per weekday meeting in the identical IEEE mean/σ/z
# expressions on both engines; σ=0 weekdays yield NULL z (guarded
# division).  One date rollup + one 7-row broadcast join — the corpus
# touches one keyed aggregation.

_DOW_ANOM_SQL = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY day
),
dow_stats AS (
  SELECT day % 7 AS dow,
         CAST(count(*) AS BIGINT) AS n_d,
         CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(x * x) AS BIGINT) AS sq
  FROM daily GROUP BY day % 7
)
SELECT d.day, CAST(d.day % 7 AS BIGINT) AS dow, d.x AS n_events,
       round(CAST(s.s AS DOUBLE) / CAST(s.n_d AS DOUBLE), 6) AS dow_mean,
       CASE WHEN s.n_d > 1 AND
                 (CAST(s.sq AS DOUBLE)
                  - CAST(s.s AS DOUBLE) * CAST(s.s AS DOUBLE)
                    / CAST(s.n_d AS DOUBLE)) > 0.0
            THEN round((CAST(d.x AS DOUBLE)
                        - CAST(s.s AS DOUBLE) / CAST(s.n_d AS DOUBLE))
                       / sqrt((CAST(s.sq AS DOUBLE)
                               - CAST(s.s AS DOUBLE) * CAST(s.s AS DOUBLE)
                                 / CAST(s.n_d AS DOUBLE))
                              / (CAST(s.n_d AS DOUBLE) - 1.0)), 6)
       END AS z_score,
       CAST(CASE WHEN s.n_d > 1 AND
                      (CAST(s.sq AS DOUBLE)
                       - CAST(s.s AS DOUBLE) * CAST(s.s AS DOUBLE)
                         / CAST(s.n_d AS DOUBLE)) > 0.0
                 THEN abs((CAST(d.x AS DOUBLE)
                           - CAST(s.s AS DOUBLE) / CAST(s.n_d AS DOUBLE))
                          / sqrt((CAST(s.sq AS DOUBLE)
                                  - CAST(s.s AS DOUBLE) * CAST(s.s AS DOUBLE)
                                    / CAST(s.n_d AS DOUBLE))
                                 / (CAST(s.n_d AS DOUBLE) - 1.0))) > 2.0
                 ELSE FALSE END AS BOOLEAN) AS is_anomaly
FROM daily d JOIN dow_stats s ON d.day % 7 = s.dow
"""


@query("anomaly_dow_adjusted", sql=_DOW_ANOM_SQL, tags=("timeseries", "anomaly"))
def anomaly_dow_adjusted(spark, sf_dir):
    """Day-of-week-adjusted daily anomaly z-scores over event volume —
    see block comment."""
    ev = read_table(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / 86400).cast("long")
    daily = ev.groupBy(day.alias("day")).agg(F.count("*").cast("long").alias("x"))
    dow_stats = daily.groupBy((F.col("day") % 7).alias("dow")).agg(
        F.count("*").cast("long").alias("n_d"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sq"),
    )
    j = daily.join(
        F.broadcast(dow_stats), daily.day % 7 == dow_stats.dow
    )
    nd = F.col("n_d").cast("double")
    mean = F.col("s").cast("double") / nd
    ssq = (
        F.col("sq").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / nd
    )
    sd = F.sqrt(ssq / (nd - F.lit(1.0)))
    z = (F.col("x").cast("double") - mean) / sd
    ok = (F.col("n_d") > 1) & (ssq > 0.0)
    return j.select(
        "day",
        (F.col("day") % 7).cast("long").alias("dow"),
        F.col("x").alias("n_events"),
        F.round(mean, 6).alias("dow_mean"),
        F.when(ok, F.round(z, 6)).alias("z_score"),
        F.when(ok, F.abs(z) > 2.0).otherwise(F.lit(False)).alias("is_anomaly"),
    )


# --- week-over-week revenue growth ----------------------------------------
# The BI staple: weekly purchase revenue with WoW growth.  Weeks are
# epoch-day div 7 (pure integer arithmetic — no calendar, no locale, no
# tz); revenue sums exact cents; the growth rate is ONE division on
# exact inputs, guarded for a zero prior week.  The week rollup is the
# only corpus-sized stage — the lag window runs over a handful of rows.
# (The fixture spans ~1 month, so a monthly grain would leave the lag
# untested; weekly gives a real series at every SF.)  Trap note: DuckDB
# `//` on DOUBLE operands does NOT floor — and the following BIGINT cast
# ROUNDS — so the week must be an explicit floor(x / 7.0).

_WOW_SQL = """
WITH weekly AS (
  SELECT CAST(floor(floor(epoch(ts) / 86400) / 7.0) AS BIGINT) AS week,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_cents,
         CAST(count(*) AS BIGINT) AS n_purchases
  FROM events WHERE event_type = 'purchase'
  GROUP BY week
)
SELECT week, rev_cents, n_purchases,
       CAST(lag(rev_cents) OVER (ORDER BY week) AS BIGINT) AS prev_rev_cents,
       CASE WHEN lag(rev_cents) OVER (ORDER BY week) > 0
            THEN round((CAST(rev_cents AS DOUBLE)
                        - CAST(lag(rev_cents) OVER (ORDER BY week) AS DOUBLE))
                       / CAST(lag(rev_cents) OVER (ORDER BY week) AS DOUBLE), 6)
       END AS wow_growth
FROM weekly
"""


@query("revenue_wow_growth", sql=_WOW_SQL, tags=("timeseries", "agg"))
def revenue_wow_growth(spark, sf_dir):
    """Weekly purchase revenue with week-over-week growth — see block
    comment."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    weekly = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(
            F.floor(F.floor(F.unix_timestamp("ts") / 86400) / 7)
            .cast("long")
            .alias("week")
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("rev_cents"),
            F.count("*").cast("long").alias("n_purchases"),
        )
    )
    w = Window.orderBy("week")
    prev = F.lag("rev_cents").over(w)
    return weekly.select(
        "week",
        "rev_cents",
        "n_purchases",
        prev.cast("long").alias("prev_rev_cents"),
        F.when(
            prev > 0,
            F.round(
                (F.col("rev_cents").cast("double") - prev.cast("double"))
                / prev.cast("double"),
                6,
            ),
        ).alias("wow_growth"),
    )


# --- month-of-year seasonal index over orders ------------------------------
# Annual seasonality (the complement of anomaly_dow_adjusted's weekly
# view): each calendar month's average monthly revenue as a share of the
# all-months average.  The orders corpus reduces ONCE to the (year,
# month) grid with exact DECIMAL revenue sums; everything after runs on
# <= ~100 rows.  The index is two divisions on exact decimal-to-double
# conversions, mirrored and rounded to 6 dp.  month()/year() agree
# between engines under the pinned UTC session.

_SEASONAL_SQL = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
           AS month_key,
         CAST(month(o_orderdate) AS BIGINT) AS moy,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
           AS rev
  FROM orders GROUP BY month_key, moy
),
bym AS (
  SELECT moy,
         CAST(count(*) AS BIGINT) AS n_months,
         CAST(sum(rev) AS DECIMAL(38,2)) AS s
  FROM monthly GROUP BY moy
),
tot AS (
  SELECT CAST(sum(n_months) AS BIGINT) AS n_all,
         CAST(sum(s) AS DECIMAL(38,2)) AS s_all
  FROM bym
)
SELECT moy AS month_of_year, n_months,
       round(CAST(s AS DOUBLE) / CAST(n_months AS DOUBLE), 6)
         AS avg_monthly_revenue,
       round((CAST(s AS DOUBLE) / CAST(n_months AS DOUBLE))
             / (CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE)), 6)
         AS seasonal_index
FROM bym CROSS JOIN tot
"""


@query(
    "timeseries_monthly_seasonality",
    sql=_SEASONAL_SQL,
    tags=("timeseries", "agg"),
)
def timeseries_monthly_seasonality(spark, sf_dir):
    """Month-of-year revenue seasonality index over orders — see block
    comment."""
    orders = read_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("month_key"),
        F.month("o_orderdate").cast("long").alias("moy"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("rev")
    )
    bym = monthly.groupBy("moy").agg(
        F.count("*").cast("long").alias("n_months"),
        F.sum("rev").cast("decimal(38,2)").alias("s"),
    )
    tot = bym.agg(
        F.sum("n_months").cast("long").alias("n_all"),
        F.sum("s").cast("decimal(38,2)").alias("s_all"),
    )
    avg = F.col("s").cast("double") / F.col("n_months").cast("double")
    grand = F.col("s_all").cast("double") / F.col("n_all").cast("double")
    return bym.crossJoin(F.broadcast(tot)).select(
        F.col("moy").alias("month_of_year"),
        "n_months",
        F.round(avg, 6).alias("avg_monthly_revenue"),
        F.round(avg / grand, 6).alias("seasonal_index"),
    )


# --- forward as-of join (time-to-convert enrichment) -----------------------
# The mirrored direction of asof_join_nearest_event: each SIGNUP enriched
# with the user's FIRST purchase at-or-after it, within a 7-day
# conversion window.  Same one-shuffle union+window composition with the
# frame reversed (operators/asof.py direction="forward"); the oracle is
# DuckDB's native ASOF LEFT JOIN with the >= inequality, tolerance
# applied as a null-out (ASOF picks the nearest row; the window only
# decides whether it counts).  Purchases deduped to one row per
# (user_id, ts) with min(event_id) — "the first" is otherwise undefined
# at ts collisions (same caveat as the backward query).

_ASOF_FWD_TOL_SEC = 604800  # 7-day conversion window

_ASOF_FWD_SQL = f"""
WITH s AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'
),
p AS (
  SELECT user_id, ts, min(event_id) AS purchase_event_id
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
)
SELECT s.event_id, s.user_id,
       CAST(floor(epoch(s.ts)) AS BIGINT) AS ts_epoch,
       CAST(CASE WHEN p.ts <= s.ts + INTERVAL {_ASOF_FWD_TOL_SEC} SECONDS
                 THEN floor(epoch(p.ts)) END AS BIGINT) AS asof_ts_epoch,
       CAST(CASE WHEN p.ts <= s.ts + INTERVAL {_ASOF_FWD_TOL_SEC} SECONDS
                 THEN p.purchase_event_id END AS BIGINT)
         AS asof_purchase_event_id,
       CAST(CASE WHEN p.ts <= s.ts + INTERVAL {_ASOF_FWD_TOL_SEC} SECONDS
                 THEN floor(epoch(p.ts)) - floor(epoch(s.ts)) END AS BIGINT)
         AS latency_sec
FROM s ASOF LEFT JOIN p ON s.user_id = p.user_id AND p.ts >= s.ts
"""


@query(
    "asof_join_forward_event",
    sql=_ASOF_FWD_SQL,
    tags=("temporal", "asof", "join"),
)
def asof_join_forward_event(spark, sf_dir):
    """Forward as-of join: each signup enriched with the user's first
    purchase at-or-after it within 7 days — see block comment."""
    ev = read_table(spark, sf_dir, "events")
    signups = ev.where(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("purchase_event_id"))
    )
    out = asof_join(
        signups,
        purchases,
        on=["user_id"],
        ts_col="ts",
        right_value_cols=["purchase_event_id"],
        tolerance_sec=_ASOF_FWD_TOL_SEC,
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").cast("long").alias("ts_epoch"),
        "asof_ts_epoch",
        F.col("asof_purchase_event_id").cast("long").alias(
            "asof_purchase_event_id"
        ),
        (F.col("asof_ts_epoch") - F.unix_timestamp("ts"))
        .cast("long")
        .alias("latency_sec"),
    )


# --- longest consecutive-day activity streak (gaps and islands) ------------
# The classic gaps-and-islands pattern: within a user's distinct active
# days, day - row_number() is constant across each unbroken run, so one
# user-keyed window + two keyed aggregates produce every streak without
# any self-join.  Output is the longest-streak histogram (engagement-
# depth distribution).  Everything is exact integer counting; the only
# window is user-partitioned (no global sort).

_STREAK_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
),
isl AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS island
  FROM days
),
streaks AS (
  SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
  FROM isl GROUP BY user_id, island
),
best AS (
  SELECT user_id, CAST(max(len) AS BIGINT) AS longest
  FROM streaks GROUP BY user_id
)
SELECT longest AS streak_days, CAST(count(*) AS BIGINT) AS n_users
FROM best GROUP BY longest
"""


@query(
    "retention_longest_streak",
    sql=_STREAK_SQL,
    tags=("window", "analytics", "retention"),
)
def retention_longest_streak(spark, sf_dir):
    """Longest consecutive-day activity streak per user, as a histogram —
    the gaps-and-islands pattern (see block comment)."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.select(
        "user_id",
        "day",
        (F.col("day") - F.row_number().over(w)).alias("island"),
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count("*").cast("long").alias("len")
    )
    best = streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest")
    )
    return best.groupBy(F.col("longest").alias("streak_days")).agg(
        F.count("*").cast("long").alias("n_users")
    )


# --- trailing 7-day rolling median of daily volume --------------------------
# The robust companion to window_rolling_corr's moment frames: a moving
# ORDER STATISTIC (lower median, no interpolation — the MAD convention)
# over the trailing calendar week.  Frames-with-ranking don't compose in
# one window, so the member set is built by a day-grid range self-join
# (grid x 7 rows, bounded by the TIME RANGE, not the corpus) and ranked
# per anchor day.  Exact integers end to end.

_ROLLMED_SQL = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY day
),
win AS (
  SELECT a.day AS day, b.x,
         row_number() OVER (PARTITION BY a.day ORDER BY b.x, b.day) AS rn,
         count(*) OVER (PARTITION BY a.day) AS n
  FROM daily a JOIN daily b ON b.day BETWEEN a.day - 6 AND a.day
)
SELECT day, CAST(n AS BIGINT) AS n_window_days, x AS rolling_median
FROM win WHERE rn = (n + 1) // 2
"""


@query(
    "timeseries_rolling_median",
    sql=_ROLLMED_SQL,
    tags=("timeseries", "window"),
)
def timeseries_rolling_median(spark, sf_dir):
    """Trailing 7-day rolling lower median of daily event volume — see
    block comment."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day")
    ).agg(F.count("*").cast("long").alias("x"))
    daily = daily.persist()
    a = daily.select(F.col("day").alias("anchor"))
    b = daily.select(F.col("day").alias("b_day"), F.col("x"))
    win = a.join(
        b,
        (F.col("b_day") >= F.col("anchor") - 6)
        & (F.col("b_day") <= F.col("anchor")),
    )
    w = Window.partitionBy("anchor").orderBy("x", "b_day")
    wn = Window.partitionBy("anchor")
    ranked = win.select(
        F.col("anchor").alias("day"),
        "x",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    return ranked.where(
        F.col("rn") == F.floor((F.col("n") + 1) / 2).cast("int")
    ).select(
        "day",
        F.col("n").cast("long").alias("n_window_days"),
        F.col("x").alias("rolling_median"),
    )


# --- maximum drawdown of cumulative revenue ----------------------------------
# The risk lens on the revenue curve: the deepest peak-to-trough fall of
# cumulative daily purchase revenue (how bad did the worst stretch get).
# One corpus reduction to the daily cent grid; cumulative sum, running
# max, and the argmax row all run over the ~30-row grid.  Pure BIGINT
# arithmetic; the worst day ties break to the earliest.

_DRAWDOWN_SQL = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY day
),
curve AS (
  SELECT day,
         CAST(sum(cents) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM daily
),
dd AS (
  SELECT day, cum,
         CAST(max(cum) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS peak
  FROM curve
),
ranked AS (
  SELECT day, cum, peak, peak - cum AS drawdown,
         row_number() OVER (ORDER BY peak - cum DESC, day) AS rn,
         count(*) OVER () AS n_days
  FROM dd
)
SELECT CAST(n_days AS BIGINT) AS n_days,
       peak AS peak_cents,
       CAST(drawdown AS BIGINT) AS max_drawdown_cents,
       day AS worst_day
FROM ranked WHERE rn = 1
"""


@query(
    "timeseries_max_drawdown",
    sql=_DRAWDOWN_SQL,
    tags=("timeseries", "window", "analytics"),
)
def timeseries_max_drawdown(spark, sf_dir):
    """Maximum drawdown of cumulative daily purchase revenue — see block
    comment."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(
            F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day")
        )
        .agg(
            F.sum(
                F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    wrun = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    curve = daily.select(
        "day", F.sum("cents").over(wrun).cast("long").alias("cum")
    )
    dd = curve.select(
        "day",
        "cum",
        F.max("cum").over(wrun).cast("long").alias("peak"),
    ).withColumn("drawdown", F.col("peak") - F.col("cum"))
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = dd.select(
        "day",
        "peak",
        "drawdown",
        F.row_number()
        .over(Window.orderBy(F.col("drawdown").desc(), F.col("day")))
        .alias("rn"),
        F.count("*").over(wall).alias("n_days"),
    )
    return ranked.where(F.col("rn") == 1).select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("peak").alias("peak_cents"),
        F.col("drawdown").cast("long").alias("max_drawdown_cents"),
        F.col("day").alias("worst_day"),
    )


# --- STL-lite decomposition of the daily revenue series ---------------------
# Classical trend/seasonal/residual split over the daily order-revenue
# grid: trend = centered 7-row moving average (ROWS ±3 over the
# day-ordered grid — row-based so calendar gaps don't change the frame
# arity on either engine), seasonal = per-weekday mean of the detrended
# series, residual = what's left.  The corpus reduces ONCE to the daily
# cent grid (a few thousand rows — calendar-bounded, so the partitionless
# window over it is the accepted day-grid pattern); every aggregate is an
# exact BIGINT cent sum with single IEEE divisions at the edges; weekday
# comes from exact epoch-day arithmetic ((day + 4) % 7).  round(·, 6) on
# the composed outputs (low-cardinality grid, per determinism.md).

_STL_SQL = """
WITH daily AS (
  SELECT CAST(floor(floor(epoch(o_orderdate)) / 86400) AS BIGINT) AS day,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
trended AS (
  SELECT day, cents,
         CAST(sum(cents) OVER w AS BIGINT) AS win_cents,
         CAST(count(*) OVER w AS BIGINT) AS win_n
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detrended AS (
  SELECT day, cents,
         CAST(win_cents AS DOUBLE) / CAST(win_n AS DOUBLE) / 100.0 AS trend,
         CAST(cents AS DOUBLE) / 100.0
           - CAST(win_cents AS DOUBLE) / CAST(win_n AS DOUBLE) / 100.0
           AS detr,
         (day + 4) % 7 AS dow
  FROM trended
),
seasonal AS (
  SELECT dow,
         CAST(sum(CAST(floor(detr * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) / 100.0 AS seas
  FROM detrended GROUP BY dow
)
SELECT d.day,
       round(CAST(d.cents AS DOUBLE) / 100.0, 2) AS revenue,
       round(d.trend, 6) AS trend,
       round(s.seas, 6) AS seasonal,
       round(d.detr - s.seas, 6) AS residual
FROM detrended d JOIN seasonal s ON d.dow = s.dow
"""


@query("timeseries_stl_lite", sql=_STL_SQL, tags=("timeseries", "decomposition"))
def timeseries_stl_lite(spark, sf_dir):
    """Trend / weekday-seasonal / residual decomposition of daily revenue
    — see block comment."""
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / 86400)
        .cast("long")
        .alias("day")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "day",
        "cents",
        F.sum("cents").over(w).cast("long").alias("win_cents"),
        F.count("*").over(w).cast("long").alias("win_n"),
    )
    trend = (
        F.col("win_cents").cast("double")
        / F.col("win_n").cast("double")
        / F.lit(100.0)
    )
    detrended = trended.select(
        "day",
        "cents",
        trend.alias("trend"),
        (F.col("cents").cast("double") / F.lit(100.0) - trend).alias("detr"),
        ((F.col("day") + 4) % 7).alias("dow"),
    )
    seasonal = detrended.groupBy("dow").agg(
        (
            F.sum(
                F.floor(F.col("detr") * 100.0 + F.lit(0.5)).cast("long")
            ).cast("double")
            / F.count("*").cast("double")
            / F.lit(100.0)
        ).alias("seas")
    )
    return detrended.join(F.broadcast(seasonal), "dow").select(
        "day",
        F.round(F.col("cents").cast("double") / F.lit(100.0), 2).alias(
            "revenue"
        ),
        F.round("trend", 6).alias("trend"),
        F.round("seas", 6).alias("seasonal"),
        F.round(F.col("detr") - F.col("seas"), 6).alias("residual"),
    )


# --- CUSUM changepoint detection ---------------------------------------------
# Page's cumulative-sum changepoint estimate on the daily revenue series:
# the day t maximizing |prefix_t - t*mean| is the single-changepoint MLE
# for a mean shift.  Kept integer-exact by scaling out the division:
# D_t = n*prefix_t - t*total (cents), argmax |D_t| with min-day
# tie-break; the reported magnitude max|CUSUM| = |D|/n in currency units
# divides only at the end.  The fact table reduces once to the bounded
# day grid; the cumulative window runs on that grid (documented bounded
# single-partition frame, like the STL/Holt folds above).

_CUSUM_SQL = """
WITH daily AS (
  SELECT CAST(floor(epoch(o_orderdate) / 86400.0) AS BIGINT) AS d,
         CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
serie AS (
  SELECT d, cents,
         row_number() OVER (ORDER BY d) AS t,
         sum(cents) OVER (ORDER BY d
                          ROWS UNBOUNDED PRECEDING) AS prefix
  FROM daily
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS DECIMAL(38,0)) AS total
  FROM daily
),
dev AS (
  SELECT s.d, s.t,
         CAST(s.prefix AS DECIMAL(38,0)) * tot.n
           - CAST(s.t AS DECIMAL(38,0)) * tot.total AS dt,
         tot.n AS n
  FROM serie s, tot
)
SELECT n AS n_days,
       d AS changepoint_day,
       round(abs(CAST(dt AS DOUBLE)) / CAST(n AS DOUBLE) / 100.0, 6)
         AS max_abs_cusum
FROM dev
ORDER BY abs(dt) DESC, d ASC
LIMIT 1
"""


@query(
    "timeseries_changepoint_cusum",
    sql=_CUSUM_SQL,
    tags=("timeseries", "changepoint"),
)
def timeseries_changepoint_cusum(spark, sf_dir):
    """CUSUM single-changepoint estimate over daily order revenue — see
    block comment."""
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400.0))
        .cast("long")
        .alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100.0, 0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    # bounded day-grid window (single partition over ~years of days)
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    serie = daily.select(
        "d",
        "cents",
        F.row_number().over(Window.orderBy("d")).alias("t"),
        F.sum("cents").over(w).alias("prefix"),
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("total"),
    )
    dev = serie.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        (
            F.col("prefix").cast("decimal(38,0)") * F.col("n")
            - F.col("t").cast("decimal(38,0)") * F.col("total")
        ).alias("dt"),
    )
    return (
        dev.orderBy(F.abs(F.col("dt")).desc(), F.col("d").asc())
        .limit(1)
        .select(
            F.col("n").alias("n_days"),
            F.col("d").alias("changepoint_day"),
            F.round(
                F.abs(F.col("dt").cast("double"))
                / F.col("n").cast("double")
                / F.lit(100.0),
                6,
            ).alias("max_abs_cusum"),
        )
    )


# --- autocorrelation function -------------------------------------------------
# ACF at lags 1..14 of the daily revenue series — the seasonality /
# model-order diagnostic (the STL and Holt queries above assume weekly
# structure; this measures it).  Integer-exact via mean scale-out:
# with n days, total S and x_t in cents, D_t = n*x_t - S, so
# acf(k) = sum_t D_t*D_{t+k} / sum_t D_t^2 with every sum an exact
# DECIMAL(38,0) and ONE IEEE division per lag.  Lags index the
# row_number-ordered series (consecutive observations), the standard ACF
# convention.  The fact table reduces once to the bounded day grid; the
# lag join is a 14-way self-join of that grid, day-grid-sized.

_ACF_MAX_LAG = 14

_ACF_SQL = f"""
WITH daily AS (
  SELECT CAST(floor(epoch(o_orderdate) / 86400.0) AS BIGINT) AS d,
         CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
serie AS (
  SELECT row_number() OVER (ORDER BY d) AS t, cents FROM daily
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
  FROM serie
),
dev AS (
  SELECT t, CAST(serie.cents AS DECIMAL(38,0)) * tot.n
            - CAST(tot.s AS DECIMAL(38,0)) AS dt
  FROM serie, tot
),
den AS (
  SELECT CAST(sum(dt * dt) AS DOUBLE) AS den FROM dev
),
lags AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag),
num AS (
  SELECT l.lag, CAST(sum(a.dt * b.dt) AS DOUBLE) AS num,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM lags l
  JOIN dev a ON TRUE
  JOIN dev b ON b.t = a.t + l.lag
  GROUP BY l.lag
)
SELECT CAST(num.lag AS BIGINT) AS lag,
       num.n_pairs,
       CASE WHEN den.den > 0 THEN round(num.num / den.den, 6) END AS acf
FROM num, den
ORDER BY lag
"""


@query("timeseries_acf_lags", sql=_ACF_SQL, tags=("timeseries", "stats"))
def timeseries_acf_lags(spark, sf_dir):
    """Daily-revenue autocorrelation at lags 1..14 (_ACF_MAX_LAG) — see
    block comment."""
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400.0))
        .cast("long")
        .alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100.0, 0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    serie = daily.select(
        F.row_number().over(Window.orderBy("d")).alias("t"), "cents"
    )
    tot = serie.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    dev = serie.crossJoin(F.broadcast(tot)).select(
        "t",
        (
            F.col("cents").cast("decimal(38,0)") * F.col("n")
            - F.col("s").cast("decimal(38,0)")
        ).alias("dt"),
    )
    den = dev.agg(
        F.sum(F.col("dt") * F.col("dt")).cast("double").alias("den")
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = dev.select(F.col("t").alias("ta"), F.col("dt").alias("da"))
    b = dev.select(F.col("t").alias("tb"), F.col("dt").alias("db"))
    num = (
        F.broadcast(lags)
        .join(a, F.lit(True))
        .join(b, F.col("tb") == F.col("ta") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.sum(F.col("da") * F.col("db")).cast("double").alias("num"),
            F.count("*").cast("long").alias("n_pairs"),
        )
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            F.col("lag").cast("long").alias("lag"),
            "n_pairs",
            F.when(
                F.col("den") > 0, F.round(F.col("num") / F.col("den"), 6)
            ).alias("acf"),
        )
        .orderBy("lag")
    )
