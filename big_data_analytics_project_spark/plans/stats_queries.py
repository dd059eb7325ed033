"""Statistical-inference queries: Welch's t, Spearman's rho, ACF, rolling r.

Round-7 closing batch #1 — the four classical statistics the registry's
stats family (chi-square, KS, Mann-Whitney, Kruskal-Wallis, Gini, OLS)
still lacked:

* ``abtest_welch_ttest`` — the unequal-variance two-sample t (the default
  A/B readout when variances differ);
* ``agg_spearman_rank_corr`` — rank correlation, the nonparametric cousin
  of ``agg_corr_covar``'s Pearson;
* ``timeseries_acf_daily`` — the autocorrelation function over the daily
  event-volume series (the diagnostic behind every seasonality query);
* ``window_rolling_corr`` — a trailing 7-day windowed Pearson between
  event volume and purchase revenue (co-movement drift detection).

Scale design (all four): the corpus is touched by exactly ONE map-side-
combined aggregation each — Welch reduces to a single 6-sum row; Spearman
rolls up to (quantity, price-cents) cells whose cardinality is bounded by
the VALUE DOMAIN (≤ 50 × distinct price cents), constant in corpus size,
so the midrank windows and joins run over dimension-sized tables only;
ACF and rolling-r reduce to the daily grid (one row per day) before any
window/join.  Nothing downstream of the first shuffle scales with rows.

Determinism (docs/determinism.md): all moments are exact integer sums
(cents / doubled tie-midranks / daily counts) carried as BIGINT or
DECIMAL(38,0), converted to double once, then pushed through IDENTICAL
IEEE expression shapes on both engines; outputs round to 6 dp
(low-cardinality statistics rule).  Spearman uses the Mann-Whitney
doubled-midrank trick (2·midrank = 2·cum_before + cnt + 1) so ties stay
integer-exact; the doubling cancels inside rho.  Divisions are guarded
(CASE WHEN) for Spark's ANSI mode.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..registry import query
from ..sources import read_table

# --- Welch's unequal-variance t-test ---------------------------------------
# One scan, six conditional integer sums, one output row.  Variances come
# from exact cent moments (cents ≤ 5.7e4, squares ×n fit BIGINT to sf1000);
# m/v/t/df are computed by the same double expression chain on both engines.

_WELCH_SQL = """
WITH pool AS (
  SELECT CAST(event_type = 'purchase' AS BIGINT) AS g,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
),
s AS (
  SELECT CAST(sum(g) AS BIGINT) AS n1,
         CAST(count(*) - sum(g) AS BIGINT) AS n2,
         CAST(sum(g * cents) AS BIGINT) AS s1,
         CAST(sum((1 - g) * cents) AS BIGINT) AS s2,
         CAST(sum(g * cents * cents) AS BIGINT) AS q1,
         CAST(sum((1 - g) * cents * cents) AS BIGINT) AS q2
  FROM pool
),
m AS (
  SELECT n1, n2,
         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
         CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
         (CAST(q1 AS DOUBLE)
          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
           / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
         (CAST(q2 AS DOUBLE)
          - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
           / (CAST(n2 AS DOUBLE) - 1.0) AS v2
  FROM s WHERE n1 > 1 AND n2 > 1
)
SELECT n1 AS n_purchase, n2 AS n_click,
       round(m1, 6) AS mean_purchase_cents,
       round(m2, 6) AS mean_click_cents,
       round(v1, 6) AS var_purchase_cents,
       round(v2, 6) AS var_click_cents,
       CASE WHEN v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE) > 0.0
            THEN round((m1 - m2)
                       / sqrt(v1 / CAST(n1 AS DOUBLE)
                              + v2 / CAST(n2 AS DOUBLE)), 6)
       END AS t_stat,
       CASE WHEN v1 > 0.0 AND v2 > 0.0
            THEN round((v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE))
                       * (v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE))
                       / ((v1 / CAST(n1 AS DOUBLE))
                          * (v1 / CAST(n1 AS DOUBLE))
                          / (CAST(n1 AS DOUBLE) - 1.0)
                          + (v2 / CAST(n2 AS DOUBLE))
                            * (v2 / CAST(n2 AS DOUBLE))
                            / (CAST(n2 AS DOUBLE) - 1.0)), 6)
       END AS welch_df
FROM m
"""


@query("abtest_welch_ttest", sql=_WELCH_SQL, tags=("funnel", "stats"))
def abtest_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t-test between purchase and click values
    — see module docstring.  One scan, one 6-sum reduction, one row."""
    pool = (
        read_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select(
            (F.col("event_type") == "purchase").cast("long").alias("g"),
            F.floor(F.col("value") * 100.0 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
    )
    s = pool.agg(
        F.sum("g").cast("long").alias("n1"),
        (F.count("*") - F.sum("g")).cast("long").alias("n2"),
        F.sum(F.col("g") * F.col("cents")).cast("long").alias("s1"),
        F.sum((1 - F.col("g")) * F.col("cents")).cast("long").alias("s2"),
        F.sum(F.col("g") * F.col("cents") * F.col("cents"))
        .cast("long")
        .alias("q1"),
        F.sum((1 - F.col("g")) * F.col("cents") * F.col("cents"))
        .cast("long")
        .alias("q2"),
    ).where((F.col("n1") > 1) & (F.col("n2") > 1))
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    m = s.select(
        "n1",
        "n2",
        (F.col("s1").cast("double") / n1d).alias("m1"),
        (F.col("s2").cast("double") / n2d).alias("m2"),
        (
            (
                F.col("q1").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double") / n1d
            )
            / (n1d - F.lit(1.0))
        ).alias("v1"),
        (
            (
                F.col("q2").cast("double")
                - F.col("s2").cast("double") * F.col("s2").cast("double") / n2d
            )
            / (n2d - F.lit(1.0))
        ).alias("v2"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    se2 = F.col("v1") / n1d + F.col("v2") / n2d
    df_den = (F.col("v1") / n1d) * (F.col("v1") / n1d) / (n1d - F.lit(1.0)) + (
        F.col("v2") / n2d
    ) * (F.col("v2") / n2d) / (n2d - F.lit(1.0))
    return m.select(
        F.col("n1").alias("n_purchase"),
        F.col("n2").alias("n_click"),
        F.round("m1", 6).alias("mean_purchase_cents"),
        F.round("m2", 6).alias("mean_click_cents"),
        F.round("v1", 6).alias("var_purchase_cents"),
        F.round("v2", 6).alias("var_click_cents"),
        F.when(se2 > 0.0, F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6))
        .alias("t_stat"),
        F.when(
            (F.col("v1") > 0.0) & (F.col("v2") > 0.0),
            F.round(se2 * se2 / df_den, 6),
        ).alias("welch_df"),
    )


# --- Spearman rank correlation ---------------------------------------------
# The corpus reduces ONCE to (quantity, price-cents) cells; per-column
# doubled tie-midranks (the Mann-Whitney trick) come from re-aggregating
# those cells, so the rank windows and the rank joins all run over value-
# DOMAIN-sized tables (≤ 50 qty × ~1e5 price cents — constant in corpus
# size).  Rank moments are exact DECIMAL(38,0) sums (Spark) mirrored by
# DuckDB's exact HUGEINT sum; both convert to double once for the rho
# expression.  The rank doubling cancels between numerator and
# denominator, so no /2 ever appears.

_SPEARMAN_SQL = """
WITH pairs AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS p,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY q, p
),
qcells AS (
  SELECT q, CAST(sum(c) AS BIGINT) AS cq FROM pairs GROUP BY q
),
qrank AS (
  SELECT q,
         2 * coalesce(sum(cq) OVER (ORDER BY q
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cq + 1 AS rq
  FROM qcells
),
pcells AS (
  SELECT p, CAST(sum(c) AS BIGINT) AS cp FROM pairs GROUP BY p
),
prank AS (
  SELECT p,
         2 * coalesce(sum(cp) OVER (ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cp + 1 AS rp
  FROM pcells
),
mom AS (
  SELECT CAST(sum(pr.c) AS BIGINT) AS n,
         CAST(sum(pr.c * qr.rq) AS DOUBLE) AS sx,
         CAST(sum(pr.c * pk.rp) AS DOUBLE) AS sy,
         CAST(sum(pr.c * qr.rq * qr.rq) AS DOUBLE) AS sxx,
         CAST(sum(pr.c * pk.rp * pk.rp) AS DOUBLE) AS syy,
         CAST(sum(pr.c * qr.rq * pk.rp) AS DOUBLE) AS sxy
  FROM pairs pr
  JOIN qrank qr ON pr.q = qr.q
  JOIN prank pk ON pr.p = pk.p
)
SELECT n AS n_rows,
       (SELECT CAST(count(*) AS BIGINT) FROM qcells) AS n_quantity_values,
       (SELECT CAST(count(*) AS BIGINT) FROM pcells) AS n_price_values,
       CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0.0
             AND CAST(n AS DOUBLE) * syy - sy * sy > 0.0
            THEN round((CAST(n AS DOUBLE) * sxy - sx * sy)
                       / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                              * (CAST(n AS DOUBLE) * syy - sy * sy)), 6)
       END AS spearman_rho
FROM mom
"""


@query("agg_spearman_rank_corr", sql=_SPEARMAN_SQL, tags=("agg", "stats"))
def agg_spearman_rank_corr(spark, sf_dir):
    """Spearman's rho between l_quantity and l_extendedprice — see module
    docstring for the domain-bounded cell design."""
    from ..operators.rank import bucketed_prefix_sum

    li = read_table(spark, sf_dir, "lineitem")
    pairs = li.groupBy(
        F.col("l_quantity").cast("long").alias("q"),
        F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("p"),
    ).agg(F.count("*").cast("long").alias("c"))
    pairs = pairs.persist()

    def doubled_ranks_bucketed(cells, key, cnt):
        # exclusive prefix sum fully in-plan (r16): price cents are
        # domain-capped (TPC-H l_extendedprice < ~105k dollars at every
        # SF → p < ~10.5M), so `p div 100000` is a deterministic
        # monotone bucketing with ~106 buckets of ≤100k cells each —
        # both levels bounded by the DOMAIN, not the corpus.  Replaces
        # the two-pass range-partitioned operator (sampling job +
        # reliable_pin + driver collect = 3 extra Spark actions) with
        # zero extra actions; ranks are identical exact integers.
        cum = bucketed_prefix_sum(
            cells, key, cnt, F.expr(f"{key} div 100000"), out_col="__cb"
        )
        return cum.select(
            key,
            (2 * F.col("__cb") + F.col(cnt) + 1).alias("r"),
        )

    def doubled_ranks_tiny(cells, key, cnt):
        # the quantity domain is <= 50 cells: a plain window is cheaper
        # than the two-pass machinery and can't become a bottleneck
        from pyspark.sql import Window

        w = Window.orderBy(key).rowsBetween(Window.unboundedPreceding, -1)
        return cells.select(
            key,
            (
                2 * F.coalesce(F.sum(cnt).over(w), F.lit(0))
                + F.col(cnt)
                + 1
            ).alias("r"),
        )

    qcells = pairs.groupBy("q").agg(F.sum("c").cast("long").alias("cq"))
    pcells = pairs.groupBy("p").agg(F.sum("c").cast("long").alias("cp"))
    qrank = doubled_ranks_tiny(qcells, "q", "cq").withColumnRenamed("r", "rq")
    prank = doubled_ranks_bucketed(pcells, "p", "cp").withColumnRenamed(
        "r", "rp"
    )

    dec = "decimal(38,0)"
    c = F.col("c").cast(dec)
    rq = F.col("rq").cast(dec)
    rp = F.col("rp").cast(dec)
    # qrank is 50 rows (broadcast); prank is value-DOMAIN-sized (can
    # reach millions of cells) — an ordinary key-shuffled join
    mom = (
        pairs.join(F.broadcast(qrank), "q")
        .join(prank, "p")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(c * rq).cast("double").alias("sx"),
            F.sum(c * rp).cast("double").alias("sy"),
            F.sum(c * rq * rq).cast("double").alias("sxx"),
            F.sum(c * rp * rp).cast("double").alias("syy"),
            F.sum(c * rq * rp).cast("double").alias("sxy"),
        )
    )
    nq = qcells.agg(F.count("*").cast("long").alias("n_quantity_values"))
    np_ = pcells.agg(F.count("*").cast("long").alias("n_price_values"))
    nd = F.col("n").cast("double")
    dx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = nd * F.col("syy") - F.col("sy") * F.col("sy")
    out = (
        mom.crossJoin(F.broadcast(nq))
        .crossJoin(F.broadcast(np_))
        .select(
            F.col("n").alias("n_rows"),
            "n_quantity_values",
            "n_price_values",
            F.when(
                (dx > 0.0) & (dy > 0.0),
                F.round(
                    (nd * F.col("sxy") - F.col("sx") * F.col("sy"))
                    / F.sqrt(dx * dy),
                    6,
                ),
            ).alias("spearman_rho"),
        )
    )
    return out


# --- daily autocorrelation function ----------------------------------------
# The corpus reduces once to the daily grid; lags 1..7 come from a tiny
# grid × grid self-join on day arithmetic (handles calendar gaps, unlike
# a row lag).  Numerator/denominator are assembled from exact BIGINT
# moments through one shared double expression; the denominator is the
# full-series centered sum of squares (the standard ACF estimator).

_ACF_SQL = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY day
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(x * x) AS BIGINT) AS sq
  FROM daily
),
lagk AS (SELECT unnest(generate_series(1, 7)) AS k),
pairs AS (
  SELECT l.k,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(a.x * b.x) AS BIGINT) AS sxy,
         CAST(sum(a.x) AS BIGINT) AS sa,
         CAST(sum(b.x) AS BIGINT) AS sb
  FROM lagk l
  JOIN daily a ON TRUE
  JOIN daily b ON b.day = a.day + l.k
  GROUP BY l.k
)
SELECT p.k AS lag_days, p.n_pairs,
       CASE WHEN CAST(t.sq AS DOUBLE)
                 - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE)
                   / CAST(t.n AS DOUBLE) > 0.0
            THEN round((CAST(p.sxy AS DOUBLE)
                        - CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)
                          * CAST(p.sa AS DOUBLE)
                        - CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)
                          * CAST(p.sb AS DOUBLE)
                        + CAST(p.n_pairs AS DOUBLE)
                          * (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
                          * (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)))
                       / (CAST(t.sq AS DOUBLE)
                          - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE)
                            / CAST(t.n AS DOUBLE)), 6)
       END AS acf
FROM pairs p CROSS JOIN tot t
"""


@query("timeseries_acf_daily", sql=_ACF_SQL, tags=("timeseries", "stats"))
def timeseries_acf_daily(spark, sf_dir):
    """Autocorrelation of the daily event-volume series at lags 1-7 —
    see module docstring."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day")
    ).agg(F.count("*").cast("long").alias("x"))
    daily = daily.persist()
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sq"),
    )
    lagk = spark.range(1, 8).select(F.col("id").alias("k"))
    a = daily.select(F.col("day").alias("a_day"), F.col("x").alias("a_x"))
    b = daily.select(F.col("day").alias("b_day"), F.col("x").alias("b_x"))
    pairs = (
        a.crossJoin(F.broadcast(lagk))
        .join(b, F.col("b_day") == F.col("a_day") + F.col("k"))
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.col("a_x") * F.col("b_x")).cast("long").alias("sxy"),
            F.sum("a_x").cast("long").alias("sa"),
            F.sum("b_x").cast("long").alias("sb"),
        )
    )
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    den = (
        F.col("sq").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
          / F.col("n").cast("double")
    )
    num = (
        F.col("sxy").cast("double")
        - mu * F.col("sa").cast("double")
        - mu * F.col("sb").cast("double")
        + F.col("n_pairs").cast("double") * mu * mu
    )
    return pairs.crossJoin(F.broadcast(tot)).select(
        F.col("k").alias("lag_days"),
        "n_pairs",
        F.when(den > 0.0, F.round(num / den, 6)).alias("acf"),
    )


# --- trailing 7-day rolling correlation ------------------------------------
# Daily grid first (one corpus aggregation), then a RANGE frame over the
# integer day key gives a TRUE calendar window (gap days shrink the frame,
# a ROWS frame would silently span them).  All five frame sums are exact
# BIGINTs over dollar-quantized revenue (dollars, not cents, so squares
# stay in BIGINT to sf1000); one shared double expression computes r.

_ROLLCORR_SQL = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY day
),
roll AS (
  SELECT day, x, y,
         CAST(count(*) OVER w AS BIGINT) AS n,
         CAST(sum(x) OVER w AS BIGINT) AS sx,
         CAST(sum(y) OVER w AS BIGINT) AS sy,
         CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
         CAST(sum(y * y) OVER w AS BIGINT) AS syy,
         CAST(sum(x * y) OVER w AS BIGINT) AS sxy
  FROM daily
  WINDOW w AS (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day, x AS n_events, y AS revenue_dollars, n AS n_window_days,
       CASE WHEN n > 1
             AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
             AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
            THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                       6)
       END AS rolling_corr
FROM roll
"""


@query("window_rolling_corr", sql=_ROLLCORR_SQL, tags=("window", "stats"))
def window_rolling_corr(spark, sf_dir):
    """Trailing 7-day rolling Pearson r between daily event volume and
    daily purchase revenue — see module docstring."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day")
    ).agg(
        F.count("*").cast("long").alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") + F.lit(0.5)).cast("long"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("y"),
    )
    w = Window.orderBy("day").rangeBetween(-6, 0)
    roll = daily.select(
        "day",
        "x",
        "y",
        F.count("*").over(w).cast("long").alias("n"),
        F.sum("x").over(w).cast("long").alias("sx"),
        F.sum("y").over(w).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("long").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    dx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    dy = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    return roll.select(
        "day",
        F.col("x").alias("n_events"),
        F.col("y").alias("revenue_dollars"),
        F.col("n").alias("n_window_days"),
        F.when(
            (F.col("n") > 1) & (dx > 0.0) & (dy > 0.0),
            F.round(num / F.sqrt(dx * dy), 6),
        ).alias("rolling_corr"),
    )


# --- weighted median (revenue-weighted order quantity) ----------------------
# "The quantity at which half the REVENUE sits" — the weighted order
# statistic, exact: the corpus reduces once to (returnflag, quantity)
# cells with BIGINT cent weights; the cumulative window runs over <= 50
# cells per flag, and the lower weighted median is the smallest value
# whose doubled cumulative weight reaches the flag total (integer rule,
# no division, no interpolation — the MAD/winsorize order-statistic
# convention).

_WMEDIAN_SQL = """
WITH cells AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS q,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS w
  FROM lineitem GROUP BY l_returnflag, q
),
cum AS (
  SELECT l_returnflag, q, n_rows, w,
         CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY q
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cw,
         CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot,
         CAST(sum(n_rows) OVER (PARTITION BY l_returnflag) AS BIGINT)
           AS n_flag
  FROM cells
)
SELECT l_returnflag,
       CAST(min(n_flag) AS BIGINT) AS n_rows,
       CAST(min(tot) AS BIGINT) AS total_weight_cents,
       CAST(min(q) AS BIGINT) AS weighted_median_qty
FROM cum WHERE 2 * cw >= tot
GROUP BY l_returnflag
"""


@query("agg_weighted_median", sql=_WMEDIAN_SQL, tags=("agg", "stats"))
def agg_weighted_median(spark, sf_dir):
    """Revenue-weighted median order quantity per return flag — see block
    comment."""
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(
            F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("w"),
    )
    wrun = (
        Window.partitionBy("l_returnflag")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("l_returnflag")
    cum = cells.select(
        "l_returnflag",
        "q",
        "n_rows",
        F.sum("w").over(wrun).cast("long").alias("cw"),
        F.sum("w").over(wall).cast("long").alias("tot"),
        F.sum("n_rows").over(wall).cast("long").alias("n_flag"),
    )
    return (
        cum.where(2 * F.col("cw") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("n_flag").cast("long").alias("n_rows"),
            F.min("tot").cast("long").alias("total_weight_cents"),
            F.min("q").cast("long").alias("weighted_median_qty"),
        )
    )


# --- Theil-Sen robust trend slope -------------------------------------------
# The outlier-proof alternative to regression_daily_revenue_trend's OLS:
# the median of all pairwise day slopes.  The corpus reduces once to the
# daily cent grid; the pair fan-out is grid-squared (bounded by the TIME
# RANGE, not the corpus — ~30 days -> 435 pairs), and the median is an
# exact order statistic (lower median, rank tie-broken by day pair) —
# the selected slope is ONE division of exact integers, so no rounding
# is needed at all.

_THEILSEN_SQL = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY day
),
pairs AS (
  SELECT a.day AS d1, b.day AS d2,
         CAST(b.cents - a.cents AS DOUBLE)
           / CAST(b.day - a.day AS DOUBLE) AS slope
  FROM daily a JOIN daily b ON b.day > a.day
),
ranked AS (
  SELECT slope, row_number() OVER (ORDER BY slope, d1, d2) AS rn,
         count(*) OVER () AS n_pairs
  FROM pairs
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       slope AS theilsen_slope_cents_per_day
FROM ranked WHERE rn = (n_pairs + 1) // 2
"""


@query("timeseries_theilsen_slope", sql=_THEILSEN_SQL, tags=("timeseries", "stats"))
def timeseries_theilsen_slope(spark, sf_dir):
    """Theil-Sen robust slope of daily purchase revenue — see block
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
    daily = daily.persist()
    a = daily.select(F.col("day").alias("d1"), F.col("cents").alias("c1"))
    b = daily.select(F.col("day").alias("d2"), F.col("cents").alias("c2"))
    pairs = a.join(b, F.col("d2") > F.col("d1")).select(
        "d1",
        "d2",
        (
            (F.col("c2") - F.col("c1")).cast("double")
            / (F.col("d2") - F.col("d1")).cast("double")
        ).alias("slope"),
    )
    w = Window.orderBy("slope", "d1", "d2")
    ranked = pairs.select(
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_pairs"),
    )
    n_days = daily.agg(F.count("*").cast("long").alias("n_days"))
    return (
        ranked.where(
            F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2).cast("int")
        )
        .crossJoin(F.broadcast(n_days))
        .select(
            "n_days",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("slope").alias("theilsen_slope_cents_per_day"),
        )
    )


# --- mode with deterministic tie-break --------------------------------------
# The most frequent quantity per return flag — the categorical "average".
# Cells first (domain-bounded), then one rank-1 window per flag ordered
# (count DESC, value ASC): "the" mode is well-defined under ties.

_MODE_SQL = """
WITH cells AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_returnflag, q
),
ranked AS (
  SELECT l_returnflag, q, cnt,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY cnt DESC, q) AS rn,
         CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n_rows
  FROM cells
)
SELECT l_returnflag, q AS mode_quantity, cnt AS mode_count, n_rows
FROM ranked WHERE rn = 1
"""


@query("agg_mode_value", sql=_MODE_SQL, tags=("agg",))
def agg_mode_value(spark, sf_dir):
    """Modal order quantity per return flag (ties broken toward the
    smaller value) — see block comment."""
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    ).agg(F.count("*").cast("long").alias("cnt"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("q")
    )
    wall = Window.partitionBy("l_returnflag")
    return (
        cells.select(
            "l_returnflag",
            "q",
            "cnt",
            F.row_number().over(w).alias("rn"),
            F.sum("cnt").over(wall).cast("long").alias("n_rows"),
        )
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("q").alias("mode_quantity"),
            F.col("cnt").alias("mode_count"),
            "n_rows",
        )
    )


# --- Theil inequality index --------------------------------------------------
# The entropy-based companion to inequality_gini_revenue: T = (1/n) *
# sum_i (x_i/mu) ln(x_i/mu) over per-user purchase revenue — unlike Gini
# it DECOMPOSES across subgroups, which is why pipelines that slice by
# cohort keep both.  Per-user cents are exact BIGINTs; each user's term
# (x/mu)ln(x/mu) quantizes to the 1e-6 grid BEFORE the sum (the
# transcendental rule), so the reduction is an exact integer sum in any
# order — one user rollup, one 3-sum reduction, one output row.

_THEIL_SQL = """
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
  FROM per_user
),
terms AS (
  SELECT CAST(floor((CAST(p.cents AS DOUBLE)
                     / (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)))
                    * ln(CAST(p.cents AS DOUBLE)
                         / (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)))
                    * 1000000.0 + 0.5) AS BIGINT) AS tq,
         t.n, t.s
  FROM per_user p CROSS JOIN tot t WHERE p.cents > 0
)
SELECT CAST(min(n) AS BIGINT) AS n_users,
       round(CAST(min(s) AS DOUBLE) / CAST(min(n) AS DOUBLE), 6)
         AS mean_cents,
       round(CAST(sum(tq) AS DOUBLE) / 1000000.0 / CAST(min(n) AS DOUBLE), 6)
         AS theil_index
FROM terms
"""


@query("inequality_theil_index", sql=_THEIL_SQL, tags=("stats", "analytics"))
def inequality_theil_index(spark, sf_dir):
    """Theil T inequality index of per-user purchase revenue — see block
    comment."""
    ev = read_table(spark, sf_dir, "events")
    per_user = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    tot = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    ratio = F.col("cents").cast("double") / mu
    tq = F.floor(ratio * F.log(ratio) * 1000000.0 + F.lit(0.5)).cast("long")
    terms = (
        per_user.crossJoin(F.broadcast(tot))
        .where(F.col("cents") > 0)
        .select(tq.alias("tq"), "n", "s")
    )
    return terms.agg(
        F.min("n").cast("long").alias("n_users"),
        F.round(
            F.min("s").cast("double") / F.min("n").cast("double"), 6
        ).alias("mean_cents"),
        F.round(
            F.sum("tq").cast("double") / 1000000.0
            / F.min("n").cast("double"),
            6,
        ).alias("theil_index"),
    )


# --- Herfindahl-Hirschman supplier concentration ------------------------------
# "How concentrated is revenue across suppliers?" — HHI = sum of squared
# revenue shares, plus its reciprocal (the effective number of equal
# suppliers).  One supplier rollup (exact cents), squared moments in
# DECIMAL(38,0)/HUGEINT (the wide-sum rule), two guarded divisions.

_HHI_SQL = """
WITH per_s AS (
  SELECT l_suppkey,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem GROUP BY l_suppkey
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s,
         CAST(sum(CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0)))
              AS DOUBLE) AS c2
  FROM per_s
)
SELECT n AS n_suppliers,
       CASE WHEN s > 0
            THEN round(c2 / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)), 6)
       END AS hhi,
       CASE WHEN c2 > 0.0
            THEN round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / c2, 6)
       END AS effective_suppliers
FROM mom
"""


@query("inequality_hhi_supplier", sql=_HHI_SQL, tags=("stats", "analytics"))
def inequality_hhi_supplier(spark, sf_dir):
    """Herfindahl-Hirschman concentration of supplier revenue — see block
    comment."""
    li = read_table(spark, sf_dir, "lineitem")
    per_s = li.groupBy("l_suppkey").agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("cents")
    )
    dec = F.col("cents").cast("decimal(38,0)")
    mom = per_s.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(dec * dec).cast("double").alias("c2"),
    )
    sd = F.col("s").cast("double")
    return mom.select(
        F.col("n").alias("n_suppliers"),
        F.when(F.col("s") > 0, F.round(F.col("c2") / (sd * sd), 6)).alias(
            "hhi"
        ),
        F.when(
            F.col("c2") > 0.0, F.round(sd * sd / F.col("c2"), 6)
        ).alias("effective_suppliers"),
    )


# --- Kendall tau-b via value-domain cells -----------------------------------
# Rank correlation that (unlike agg_spearman_rank_corr's two-pass rank)
# needs PAIR concordance counts — naively O(n²).  Both columns here live
# on tiny discrete domains (l_quantity: 1..50 integers; l_discount: 11
# cent values), so the corpus reduces to a <=550-row (x, y, count) cell
# table in one aggregate; concordant/discordant pair mass is then a
# cell×cell product sum over at most 550² broadcast-sized combinations —
# the same value-domain-reduction trick as the Spearman query, applied
# to a statistic with no rank-sum shortcut.  Pair-mass moments are
# quadratic in n (past 2^63 somewhere beyond 3e9 rows), so they widen as
# Spark DECIMAL(38,0) ↔ DuckDB HUGEINT and emit as one DOUBLE cast
# (round-7 wide-moment rule); tau_b takes one sqrt + one division,
# rounded at 6dp.

_KENDALL_SQL = """
WITH cells AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
),
pairs AS (
  -- one orientation (a.x < b.x) counts each unordered cell pair exactly
  -- once — no halving; pair-mass sums ride DuckDB's native HUGEINT and
  -- convert to DOUBLE once (round-7 wide-moment rule: n² exceeds 2^63
  -- somewhere past 3e9 rows, so the moments are emitted as DOUBLE)
  SELECT CAST(sum(CASE WHEN a.x < b.x AND a.y < b.y
                       THEN a.c * b.c ELSE 0 END) AS DOUBLE) AS conc,
         CAST(sum(CASE WHEN a.x < b.x AND a.y > b.y
                       THEN a.c * b.c ELSE 0 END) AS DOUBLE) AS disc
  FROM cells a CROSS JOIN cells b
),
moments AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         (SELECT CAST(sum(CAST(cx AS HUGEINT) * (cx - 1)) AS DOUBLE) FROM (
            SELECT CAST(sum(c) AS BIGINT) AS cx FROM cells GROUP BY x)) AS tx2,
         (SELECT CAST(sum(CAST(cy AS HUGEINT) * (cy - 1)) AS DOUBLE) FROM (
            SELECT CAST(sum(c) AS BIGINT) AS cy FROM cells GROUP BY y)) AS ty2
  FROM cells
)
SELECT m.n, p.conc AS concordant, p.disc AS discordant,
       round((p.conc - p.disc)
             / sqrt((CAST(m.n AS DOUBLE) * (m.n - 1) / 2.0 - m.tx2 / 2.0)
                    * (CAST(m.n AS DOUBLE) * (m.n - 1) / 2.0 - m.ty2 / 2.0)),
             6) AS tau_b
FROM moments m CROSS JOIN pairs p
"""


@query("stats_kendall_tau_cells", sql=_KENDALL_SQL, tags=("stats", "correlation"))
def stats_kendall_tau_cells(spark, sf_dir):
    """Kendall tau-b between quantity and discount via the value-domain
    cell reduction — see block comment."""
    li = read_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    ).agg(F.count("*").cast("long").alias("c"))
    a = cells.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"), F.col("c").alias("ac")
    )
    b = cells.select(
        F.col("x").alias("bx"), F.col("y").alias("by"), F.col("c").alias("bc")
    )
    # single orientation (ax < bx) counts each unordered pair once (no
    # halving); pair-mass and tie moments widen past BIGINT as
    # DECIMAL(38,0) products, mirrored by DuckDB HUGEINT, both cast to
    # DOUBLE once (round-7 wide-moment rule)
    prod = F.col("ac").cast("decimal(38,0)") * F.col("bc")
    pairs = a.crossJoin(F.broadcast(b)).agg(
        F.sum(
            F.when(
                (F.col("ax") < F.col("bx")) & (F.col("ay") < F.col("by")),
                prod,
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        )
        .cast("double")
        .alias("conc"),
        F.sum(
            F.when(
                (F.col("ax") < F.col("bx")) & (F.col("ay") > F.col("by")),
                prod,
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        )
        .cast("double")
        .alias("disc"),
    )
    per_x = cells.groupBy("x").agg(F.sum("c").cast("long").alias("cx"))
    per_y = cells.groupBy("y").agg(F.sum("c").cast("long").alias("cy"))
    tx2 = per_x.agg(
        F.sum(F.col("cx").cast("decimal(38,0)") * (F.col("cx") - 1))
        .cast("double")
        .alias("tx2")
    )
    ty2 = per_y.agg(
        F.sum(F.col("cy").cast("decimal(38,0)") * (F.col("cy") - 1))
        .cast("double")
        .alias("ty2")
    )
    mom = cells.agg(
        F.sum("c").cast("long").alias("n"),
    )
    nd = F.col("n").cast("double")
    n0 = nd * (F.col("n") - 1) / F.lit(2.0)
    denom_x = n0 - F.col("tx2") / F.lit(2.0)
    denom_y = n0 - F.col("ty2") / F.lit(2.0)
    return (
        mom.crossJoin(F.broadcast(pairs))
        .crossJoin(F.broadcast(tx2))
        .crossJoin(F.broadcast(ty2))
        .select(
            "n",
            F.col("conc").alias("concordant"),
            F.col("disc").alias("discordant"),
            F.round(
                (F.col("conc") - F.col("disc")) / F.sqrt(denom_x * denom_y),
                6,
            ).alias("tau_b"),
        )
    )


# --- Cramér's V (categorical association) -----------------------------------
# Association strength between event type and day-of-week: the chi-square
# statistic over the 5×7 contingency table, normalized to [0,1].  Day of
# week comes from exact integer epoch-day arithmetic ((day + 4) % 7,
# 1970-01-01 being a Thursday) — never an engine dayofweek() (Spark is
# 1=Sunday, DuckDB 0=Sunday).  Expected counts and the chi² terms are a
# handful of IEEE ops per cell and the sum spans 35 cells — the
# low-cardinality regime where round(·, 6) is safe (determinism.md).

_CRAMERS_SQL = """
WITH obs AS (
  SELECT event_type,
         (CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) + 4) % 7 AS dow,
         CAST(count(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
               CAST(count(DISTINCT event_type) AS BIGINT) AS r,
               CAST(count(DISTINCT dow) AS BIGINT) AS k
        FROM obs),
margins AS (
  SELECT o.event_type, o.dow, o.o,
         rm.row_tot, cm.col_tot
  FROM obs o
  JOIN (SELECT event_type, CAST(sum(o) AS BIGINT) AS row_tot
        FROM obs GROUP BY 1) rm ON o.event_type = rm.event_type
  JOIN (SELECT dow, CAST(sum(o) AS BIGINT) AS col_tot
        FROM obs GROUP BY 1) cm ON o.dow = cm.dow
),
chi AS (
  SELECT CAST(sum(
           (CAST(m.o AS DOUBLE)
            - CAST(m.row_tot AS DOUBLE) * CAST(m.col_tot AS DOUBLE)
              / CAST(t.n AS DOUBLE))
           * (CAST(m.o AS DOUBLE)
              - CAST(m.row_tot AS DOUBLE) * CAST(m.col_tot AS DOUBLE)
                / CAST(t.n AS DOUBLE))
           / (CAST(m.row_tot AS DOUBLE) * CAST(m.col_tot AS DOUBLE)
              / CAST(t.n AS DOUBLE))) AS DOUBLE) AS chi2
  FROM margins m CROSS JOIN tot t
)
SELECT t.n, t.r AS n_rows_cat, t.k AS n_cols_cat,
       round(c.chi2, 6) AS chi_square,
       round(sqrt(c.chi2 / (CAST(t.n AS DOUBLE)
                            * CAST(least(t.r, t.k) - 1 AS DOUBLE))), 6)
         AS cramers_v
FROM tot t CROSS JOIN chi c
"""


@query("stats_cramers_v", sql=_CRAMERS_SQL, tags=("stats", "association"))
def stats_cramers_v(spark, sf_dir):
    """Cramér's V between event_type and day-of-week — see block
    comment."""
    ev = read_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type",
        ((F.floor(F.unix_timestamp("ts") / 86400) + 4) % 7)
        .cast("long")
        .alias("dow"),
    ).agg(F.count("*").cast("long").alias("o"))
    tot = obs.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("dow").alias("k"),
    )
    rm = obs.groupBy("event_type").agg(
        F.sum("o").cast("long").alias("row_tot")
    )
    cm = obs.groupBy("dow").agg(F.sum("o").cast("long").alias("col_tot"))
    m = obs.join(F.broadcast(rm), "event_type").join(F.broadcast(cm), "dow")
    mt = m.crossJoin(F.broadcast(tot))
    e = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("n").cast("double")
    )
    chi2 = mt.agg(
        F.sum(
            (F.col("o").cast("double") - e)
            * (F.col("o").cast("double") - e)
            / e
        )
        .cast("double")
        .alias("chi2")
    )
    return (
        tot.crossJoin(F.broadcast(chi2)).select(
            "n",
            F.col("r").alias("n_rows_cat"),
            F.col("k").alias("n_cols_cat"),
            F.round(F.col("chi2"), 6).alias("chi_square"),
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (
                        F.col("n").cast("double")
                        * (F.least("r", "k") - 1).cast("double")
                    )
                ),
                6,
            ).alias("cramers_v"),
        )
    )


# --- one-way ANOVA F (parametric complement to Kruskal-Wallis) --------------
# Between/within variance ratio of order value across the five order
# priorities.  All moments are exact: per-group n and cent sums are
# BIGINT; the squared-cents second moment exceeds 2^63 at fixture scale
# already (cents² ~ 1e15 × rows), so it widens as Spark DECIMAL(38,0) ↔
# DuckDB HUGEINT and converts to DOUBLE once (round-7 rule).  The
# between-groups moment Σ s²/n is a 5-term sum of unequal-magnitude
# doubles — order-sensitive, so it folds in PINNED group-name order on
# both engines (the abtest_kruskal_wallis mirrored-fold rule; a plain
# double SUM drifted at sf0.001).  SSB/SSW then compose through
# identical IEEE expressions; one guarded division pair yields F,
# rounded at 6dp (5-group low-cardinality regime).

_ANOVA_SQL = """
WITH g AS (
  SELECT o_orderpriority AS grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS s,
         -- exact wide second moment: stays HUGEINT until the ONE total sum
         sum(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS HUGEINT)
             * CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS sq,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
           * CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS gterm
  FROM orders GROUP BY 1
),
tot AS (
  -- gb sums the 5 per-group s²/n doubles in a PINNED group-name order
  -- (the mirrored-fold rule: unequal-magnitude double sums are
  -- order-sensitive, so both engines fold the same sequence)
  SELECT CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(s) AS BIGINT) AS s,
         CAST(sum(sq) AS DOUBLE) AS sq,
         list_reduce(list(gterm ORDER BY grp), (a, b) -> a + b) AS gb,
         CAST(count(*) AS BIGINT) AS k
  FROM g
),
parts AS (
  SELECT t.n, t.k,
         t.gb - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE)
                / CAST(t.n AS DOUBLE) AS ssb,
         t.sq - t.gb AS ssw
  FROM tot t
)
SELECT n, k AS k_groups,
       round(ssb / 10000.0, 2) AS ss_between,
       round(ssw / 10000.0, 2) AS ss_within,
       CASE WHEN k > 1 AND n > k AND ssw > 0.0
            THEN round((ssb / (CAST(k AS DOUBLE) - 1.0))
                       / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
       END AS f_stat
FROM parts
"""


@query("stats_anova_oneway", sql=_ANOVA_SQL, tags=("stats", "anova"))
def stats_anova_oneway(spark, sf_dir):
    """One-way ANOVA F of order value across order priorities — see block
    comment."""
    o = read_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    # second moment stays DECIMAL(38,0) (exact) until the one total sum;
    # the 5 per-group s²/n doubles sum via the PINNED group-name-ordered
    # fold (mirrored-fold rule — unequal magnitudes make a plain double
    # sum engine-order-dependent, caught at sf0.001)
    g = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(cents).cast("long").alias("s"),
        F.sum(cents.cast("decimal(38,0)") * cents).alias("sq"),
    ).withColumn(
        "gterm",
        F.col("s").cast("double")
        * F.col("s").cast("double")
        / F.col("n").cast("double"),
    )
    parts = g.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("s").cast("long").alias("s"),
        F.sum("sq").cast("double").alias("sq"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("grp", "gterm"))),
                lambda x: x["gterm"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("gb"),
        F.count("*").cast("long").alias("k"),
    )
    nd, kd = F.col("n").cast("double"), F.col("k").cast("double")
    ssb = F.col("gb") - F.col("s").cast("double") * F.col("s").cast(
        "double"
    ) / nd
    ssw = F.col("sq") - F.col("gb")
    # (sq: exact decimal sum cast to double once; gb: exact decimal sum of
    # 4dp-quantized group terms — both order-free, so ssb/ssw/f compose
    # from identical doubles on both engines)
    return parts.select(
        "n",
        F.col("k").alias("k_groups"),
        F.round(ssb / F.lit(10000.0), 2).alias("ss_between"),
        F.round(ssw / F.lit(10000.0), 2).alias("ss_within"),
        F.when(
            (F.col("k") > 1) & (F.col("n") > F.col("k")) & (ssw > 0.0),
            F.round((ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd)), 6),
        ).alias("f_stat"),
    )


# --- Mann-Kendall monotone trend test ----------------------------------------
# Nonparametric trend detection on the monthly revenue series: S = number
# of concordant minus discordant month pairs, variance with the exact tie
# correction, normal-approximation z.  The fact table reduces ONCE to
# ~n_months exact DECIMAL cells; the pair scan is a broadcast self-join
# over that month-domain-bounded cell table (same bounding argument as
# Kendall tau-b above — at 100 TB the pair stage is months², independent
# of row count).  Everything integer-exact until the final z division:
# sign() on exact decimals, S as BIGINT, Var(S)·18 kept as a BIGINT so no
# engine divides early; sqrt/division are IEEE-identical at the end.

_MK_SQL = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT CAST(sum(CASE WHEN b.rev > a.rev THEN 1
                       WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM monthly a JOIN monthly b ON a.ym < b.ym
),
ties AS (
  SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
           AS tie_term
  FROM (
    SELECT CAST(count(*) AS BIGINT) AS t FROM monthly GROUP BY rev
  ) WHERE t > 1
),
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM monthly
)
SELECT base.n AS n_months,
       pairs.s AS s_stat,
       base.n * (base.n - 1) * (2 * base.n + 5) - ties.tie_term
         AS var_s_x18,
       CASE WHEN base.n * (base.n - 1) * (2 * base.n + 5) - ties.tie_term > 0
            THEN round((CAST(pairs.s AS DOUBLE)
                        - CAST(sign(pairs.s) AS DOUBLE))
                       / sqrt(CAST(base.n * (base.n - 1) * (2 * base.n + 5)
                                   - ties.tie_term AS DOUBLE) / 18.0), 6)
       END AS z_score
FROM base, pairs, ties
"""


@query(
    "stats_mann_kendall_monthly",
    sql=_MK_SQL,
    tags=("stats", "trend", "timeseries"),
)
def stats_mann_kendall_monthly(spark, sf_dir):
    """Mann-Kendall trend test over monthly order revenue — see block
    comment."""
    orders = read_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))

    a = monthly.select(F.col("ym").alias("ym_a"), F.col("rev").alias("rev_a"))
    b = monthly.select(F.col("ym").alias("ym_b"), F.col("rev").alias("rev_b"))
    pairs = (
        a.join(F.broadcast(b), F.col("ym_a") < F.col("ym_b"))
        .agg(
            F.sum(
                F.when(F.col("rev_b") > F.col("rev_a"), 1)
                .when(F.col("rev_b") < F.col("rev_a"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    t = F.col("t")
    ties = (
        monthly.groupBy("rev")
        .agg(F.count("*").cast("long").alias("t"))
        .where(t > 1)
        .agg(
            F.coalesce(F.sum(t * (t - 1) * (2 * t + 5)), F.lit(0))
            .cast("long")
            .alias("tie_term")
        )
    )
    base = monthly.agg(F.count("*").cast("long").alias("n"))
    j = base.crossJoin(F.broadcast(pairs)).crossJoin(F.broadcast(ties))
    n = F.col("n")
    var18 = n * (n - 1) * (2 * n + 5) - F.col("tie_term")
    return j.select(
        n.alias("n_months"),
        F.col("s").alias("s_stat"),
        var18.alias("var_s_x18"),
        F.when(
            var18 > 0,
            F.round(
                (F.col("s").cast("double") - F.signum(F.col("s").cast("double")))
                / F.sqrt(var18.cast("double") / F.lit(18.0)),
                6,
            ),
        ).alias("z_score"),
    )


# --- Wald-Wolfowitz runs test -------------------------------------------------
# Randomness check on the daily revenue series: dichotomize each day
# against the LOWER MEDIAN (an order statistic — no interpolation, so both
# engines pick the identical exact cent value), count sign runs, compare
# to the closed-form run-count moments.  Companion to Mann-Kendall above:
# MK detects monotone drift, the runs test detects clustering /
# oscillation.  All counts integer-exact; mean/variance/z are IEEE-exact
# functions of (n, n1, n0, R) at the end.  The fact table reduces once to
# the bounded day grid; windows run on that grid.

_RUNS_SQL = """
WITH daily AS (
  SELECT CAST(floor(epoch(o_orderdate) / 86400.0) AS BIGINT) AS d,
         CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
med AS (
  SELECT cents AS med_lo FROM (
    SELECT cents, row_number() OVER (ORDER BY cents, d) AS r FROM daily
  ) WHERE r = (SELECT CAST(floor((count(*) + 1) / 2) AS BIGINT) FROM daily)
),
signed AS (
  SELECT d, CASE WHEN cents >= (SELECT med_lo FROM med) THEN 1 ELSE 0 END AS s
  FROM daily
),
runs AS (
  SELECT s,
         lag(s) OVER (ORDER BY d) AS prev_s
  FROM signed
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(s) AS BIGINT) AS n1,
         CAST(count(*) - sum(s) AS BIGINT) AS n0,
         CAST(1 + sum(CASE WHEN prev_s IS NOT NULL AND s <> prev_s
                           THEN 1 ELSE 0 END) AS BIGINT) AS r
  FROM runs
)
SELECT n AS n_days, n1 AS n_above, n0 AS n_below, r AS n_runs,
       CASE WHEN n1 > 0 AND n0 > 0
             AND 2.0 * n1 * n0 * (2.0 * n1 * n0 - n)
                 / (CAST(n AS DOUBLE) * n * (n - 1.0)) > 0.0
            THEN round((CAST(r AS DOUBLE) - (1.0 + 2.0 * n1 * n0 / n))
                       / sqrt(2.0 * n1 * n0 * (2.0 * n1 * n0 - n)
                              / (CAST(n AS DOUBLE) * n * (n - 1.0))), 6)
       END AS z_score
FROM agg
"""


@query("stats_runs_test", sql=_RUNS_SQL, tags=("stats", "randomness"))
def stats_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test over daily revenue — see block comment."""
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
    n_total = daily.agg(F.count("*").cast("long").alias("nn"))
    ranked = daily.select(
        "d",
        "cents",
        F.row_number().over(Window.orderBy("cents", "d")).alias("r"),
    )
    med = (
        ranked.crossJoin(F.broadcast(n_total))
        .where(F.col("r") == F.floor((F.col("nn") + 1) / 2).cast("long"))
        .select(F.col("cents").alias("med_lo"))
    )
    signed = daily.crossJoin(F.broadcast(med)).select(
        "d",
        F.when(F.col("cents") >= F.col("med_lo"), 1).otherwise(0).alias("s"),
    )
    runs = signed.select(
        "s", F.lag("s").over(Window.orderBy("d")).alias("prev_s")
    )
    agg = runs.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("s").cast("long").alias("n1"),
        (F.count("*") - F.sum("s")).cast("long").alias("n0"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("prev_s").isNotNull()
                    & (F.col("s") != F.col("prev_s")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("r"),
    )
    n = F.col("n").cast("double")
    n1 = F.col("n1").cast("double")
    n0 = F.col("n0").cast("double")
    r = F.col("r").cast("double")
    var = (
        F.lit(2.0) * n1 * n0 * (F.lit(2.0) * n1 * n0 - n)
        / (n * n * (n - F.lit(1.0)))
    )
    return agg.select(
        F.col("n").alias("n_days"),
        F.col("n1").alias("n_above"),
        F.col("n0").alias("n_below"),
        F.col("r").alias("n_runs"),
        F.when(
            (F.col("n1") > 0) & (F.col("n0") > 0) & (var > 0.0),
            F.round(
                (r - (F.lit(1.0) + F.lit(2.0) * n1 * n0 / n)) / F.sqrt(var), 6
            ),
        ).alias("z_score"),
    )


# --- Brown-Forsythe (Levene) equality-of-variances test ------------------------
# The guard test BEFORE trusting the ANOVA above: one-way ANOVA F
# recomputed on z = |x - group MEDIAN| (Brown-Forsythe's robust Levene
# variant).  The group median is the LOWER-MEDIAN order statistic
# (rank floor((n+1)/2) with an order-key tie-break — no interpolation,
# so both engines pick the identical exact cent value), which makes z a
# BIGINT and the whole moment pipeline exact; from there the machinery
# is the stats_anova_oneway pattern verbatim (DECIMAL(38,0) ↔ HUGEINT
# wide second moment, PINNED group-order fold for the 5-term s²/n sum).
# Two keyed passes (rank, moments) + one broadcast 5-row median join.

_LEVENE_SQL = """
WITH base AS (
  SELECT o_orderpriority AS grp, o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
ranked AS (
  SELECT grp, cents,
         row_number() OVER (PARTITION BY grp ORDER BY cents, o_orderkey)
           AS r,
         count(*) OVER (PARTITION BY grp) AS ng
  FROM base
),
med AS (
  SELECT grp, cents AS med_lo FROM ranked
  WHERE r = CAST(floor((ng + 1) / 2) AS BIGINT)
),
z AS (
  SELECT b.grp, abs(b.cents - m.med_lo) AS z
  FROM base b JOIN med m ON b.grp = m.grp
),
g AS (
  SELECT grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(z) AS BIGINT) AS s,
         sum(CAST(z AS HUGEINT) * z) AS sq,
         CAST(sum(z) AS DOUBLE) * CAST(sum(z) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS gterm
  FROM z GROUP BY grp
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(s) AS BIGINT) AS s,
         CAST(sum(sq) AS DOUBLE) AS sq,
         list_reduce(list(gterm ORDER BY grp), (a, b) -> a + b) AS gb,
         CAST(count(*) AS BIGINT) AS k
  FROM g
),
parts AS (
  SELECT t.n, t.k,
         t.gb - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE)
                / CAST(t.n AS DOUBLE) AS ssb,
         t.sq - t.gb AS ssw
  FROM tot t
)
SELECT n, k AS k_groups,
       CASE WHEN k > 1 AND n > k AND ssw > 0.0
            THEN round((ssb / (CAST(k AS DOUBLE) - 1.0))
                       / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
       END AS levene_w
FROM parts
"""


@query("stats_levene_variance", sql=_LEVENE_SQL, tags=("stats", "variance"))
def stats_levene_variance(spark, sf_dir):
    """Brown-Forsythe equality-of-variances W across order priorities —
    see block comment."""
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    wr = Window.partitionBy("grp").orderBy("cents", "o_orderkey")
    wc = Window.partitionBy("grp")
    med = (
        base.withColumn("r", F.row_number().over(wr))
        .withColumn("ng", F.count("*").over(wc))
        .where(F.col("r") == F.floor((F.col("ng") + 1) / 2).cast("long"))
        .select("grp", F.col("cents").alias("med_lo"))
    )
    z = base.join(F.broadcast(med), "grp").select(
        "grp", F.abs(F.col("cents") - F.col("med_lo")).alias("z")
    )
    g = z.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("z").cast("long").alias("s"),
        F.sum(F.col("z").cast("decimal(38,0)") * F.col("z")).alias("sq"),
    ).withColumn(
        "gterm",
        F.col("s").cast("double")
        * F.col("s").cast("double")
        / F.col("n").cast("double"),
    )
    parts = g.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("s").cast("long").alias("s"),
        F.sum("sq").cast("double").alias("sq"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("grp", "gterm"))),
                lambda x: x["gterm"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("gb"),
        F.count("*").cast("long").alias("k"),
    )
    nd, kd = F.col("n").cast("double"), F.col("k").cast("double")
    ssb = F.col("gb") - F.col("s").cast("double") * F.col("s").cast(
        "double"
    ) / nd
    ssw = F.col("sq") - F.col("gb")
    return parts.select(
        "n",
        F.col("k").alias("k_groups"),
        F.when(
            (F.col("k") > 1) & (F.col("n") > F.col("k")) & (ssw > 0.0),
            F.round((ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd)), 6),
        ).alias("levene_w"),
    )
