"""Scalar/array function families + pivot + heuristic scoring — the
remaining SURVEY §2 coverage (P15/X5 seeded shuffle, M7 heuristic, pivot
extension, math/conditional/array-explode families).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..registry import query
from ..sources import read_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "math_funcs",
    sql=r"""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_off,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           sqrt(l_extendedprice) AS price_sqrt,
           pow(l_discount, 2) AS disc_sq,
           round(ln(l_extendedprice + 1), 6) AS price_ln,
           round(exp(l_discount), 6) AS disc_exp,
           round(log10(l_extendedprice + 1), 6) AS price_log10,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod
    FROM lineitem
    WHERE l_linenumber = 1
    """,
    tags=("scalar", "math"),
)
def math_funcs(spark, sf_dir):
    """Math scalar family.  sqrt/pow/abs/mod are IEEE-exact across engines;
    transcendentals (ln/exp/log10) are libm-dependent → rounded to 6dp."""
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_off"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.pow("l_discount", 2).alias("disc_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("price_log10"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod"),
    )


@query(
    "conditional_funcs",
    sql=r"""
    SELECT l_orderkey, l_linenumber,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate,
           nullif(l_discount, 0.0) AS disc_or_null,
           coalesce(nullif(l_discount, 0.0), l_tax, 0.0) AS effective_rate,
           CAST(l_discount > l_tax AS BIGINT) AS disc_gt_tax
    FROM lineitem
    WHERE l_orderkey % 10 = 0
    """,
    tags=("scalar", "conditional"),
)
def conditional_funcs(spark, sf_dir):
    """greatest/least/nullif/coalesce conditional family."""
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 10 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_or_null"),
        F.coalesce(
            F.nullif(F.col("l_discount"), F.lit(0.0)), F.col("l_tax"), F.lit(0.0)
        ).alias("effective_rate"),
        (F.col("l_discount") > F.col("l_tax")).cast("long").alias("disc_gt_tax"),
    )


@query(
    "array_explode_tokens",
    sql=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t FROM documents
      WHERE doc_id < 50
    )
    SELECT doc_id, CAST(i AS BIGINT) AS pos, t[i + 1] AS token
    FROM toks, LATERAL (SELECT unnest(range(0, least(len(t), 5)))) u(i)
    """,
    tags=("array", "explode"),
)
def array_explode_tokens(spark, sf_dir):
    """posexplode of a token array (lateral unnest) — first 5 tokens/doc."""
    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    toks = F.split(F.lower("text"), r"\s+")
    return (
        docs.select("doc_id", F.posexplode(F.slice(toks, 1, 5)).alias("pos", "token"))
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "token")
    )


@query(
    "pivot_event_counts",
    sql=r"""
    SELECT user_id,
           count(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
           count(CASE WHEN event_type = 'error'    THEN 1 END) AS error,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           count(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
           count(CASE WHEN event_type = 'view'     THEN 1 END) AS view
    FROM events
    GROUP BY user_id
    """,
    tags=("agg", "pivot"),
)
def pivot_event_counts(spark, sf_dir):
    """PIVOT on event_type (explicit value list → single-pass plan, no
    value-discovery job; the built-in extension SURVEY §2.4 calls out)."""
    ev = read_table(spark, sf_dir, "events")
    out = ev.groupBy("user_id").pivot("event_type", EVENT_TYPES).count().fillna(0)
    return out.select(
        "user_id", *[F.col(t).cast("long").alias(t) for t in EVENT_TYPES]
    )


@query(
    "heuristic_intent_score",
    sql=r"""
    WITH feats AS (
      SELECT user_id,
             count(CASE WHEN event_type = 'view' THEN 1 END) AS view_count,
             count(CASE WHEN event_type = 'click' THEN 1 END) AS click_count,
             count(*) AS total_events
      FROM events GROUP BY user_id
    )
    SELECT user_id, view_count, click_count, total_events,
           CAST(CASE WHEN click_count >= 3 AND view_count >= 5 THEN 0.85
                     WHEN click_count >= 2 THEN 0.60
                     WHEN view_count >= 3 THEN 0.35
                     WHEN total_events >= 5 THEN 0.20
                     ELSE 0.05 END AS DOUBLE) AS intent_score
    FROM feats
    """,
    tags=("ml", "heuristic"),
)
def heuristic_intent_score(spark, sf_dir):
    """M7: the reference's cold-start heuristic predictor
    (``online_model.py:151-159``: fixed probabilities from activity
    thresholds) compiled to a pure column expression — fully in-plan, no
    model call."""
    ev = read_table(spark, sf_dir, "events")
    feats = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("view_count"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("click_count"),
        F.count("*").alias("total_events"),
    )
    score = (
        F.when((F.col("click_count") >= 3) & (F.col("view_count") >= 5), 0.85)
        .when(F.col("click_count") >= 2, 0.60)
        .when(F.col("view_count") >= 3, 0.35)
        .when(F.col("total_events") >= 5, 0.20)
        .otherwise(0.05)
    )
    return feats.select(
        "user_id", "view_count", "click_count", "total_events",
        score.alias("intent_score"),
    )


@query(
    "dedup_subset_keys",
    sql="SELECT DISTINCT user_id, event_type FROM events",
    tags=("dedup", "distinct"),
)
def dedup_subset_keys(spark, sf_dir):
    """dropDuplicates on a key subset, projected to the keys (the surviving
    non-key row is pick-arbitrary in any engine, so only the key set is a
    well-defined result)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.dropDuplicates(["user_id", "event_type"]).select("user_id", "event_type")


@query(
    "agg_percentiles",
    sql=r"""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
           round(median(l_extendedprice), 6) AS med
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (both engines use the standard
    (n-1)p linear interpolation; low group cardinality → 6dp rounding
    absorbs accumulation differences).  The approx_percentile/HLL variants
    are the streaming/100TB path; exact is the oracle-able baseline."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 6).alias("p75"),
        F.round(F.median("l_extendedprice"), 6).alias("med"),
    )


@query(
    "agg_corr_covar",
    sql=r"""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           round(covar_pop(l_quantity, l_extendedprice), 4) AS qty_price_covar_pop
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_corr_covar(spark, sf_dir):
    """Correlation / covariance aggregates (rounded: both engines use
    single-pass co-moment updates with engine-specific ordering)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar_pop"),
    )


@query("shuffle_seeded", sql=None, tags=("sampling", "rand"))
def shuffle_seeded(spark, sf_dir):
    """P15/X5: full shuffle via orderBy(rand(seed)) — returns the first 100
    rows of the shuffled order with their shuffle rank; seeded but
    engine-specific → rows-only."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.rand(42))
        .limit(100)
        .select("event_id", "user_id", "event_type")
    )


@query(
    "agg_approx_percentile_check",
    sql=r"""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.50), 6) AS p50_exact,
           CAST(TRUE AS BOOLEAN) AS approx_within_1pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "percentile", "approx"),
)
def agg_approx_percentile_check(spark, sf_dir):
    """The percentile SCALE path with a tolerance contract:
    approx_percentile (Greenwald-Khanna, mergeable partials — the only
    form that survives 100 TB / streaming, where exact percentile needs
    a global sort) pinned within 1% of the exact interpolated median.
    The sketch value is engine-specific; the bound is deterministic for
    fixed input, so a drifting sketch flips the boolean and fails the
    driver hash (same pattern as agg_approx_distinct)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.50)), 6).alias("p50_exact"),
        (
            F.abs(
                F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000))
                / F.percentile("l_extendedprice", F.lit(0.50))
                - 1.0
            )
            <= 0.01
        ).alias("approx_within_1pct"),
    )


@query(
    "variant_semi_structured",
    sql="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           count(*) FILTER (CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0)
               AS n_even_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 10
    GROUP BY event_type
    """,
    tags=("json", "variant", "agg"),
)
def variant_semi_structured(spark, sf_dir):
    """P11 upgraded to Spark 4's VARIANT type: ``parse_json`` decodes the
    JSON payload ONCE into the binary variant encoding, then every typed
    field access (`variant_get`) is an O(1) binary read — versus
    ``get_json_object``, which re-parses the raw string per extraction.
    At 100 TB with many extracted fields per event that repeated string
    parse is the dominant scan cost; parse-once is the scale idiom
    (same role as the reference's one-shot ``from_json`` schema projection,
    stream_processor.py:146).  All-integer aggregates, so cross-engine
    determinism is exact."""
    ev = read_table(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("pv"))
    k = F.variant_get("pv", "$.k", "long")
    vk = v.select("event_type", k.alias("k")).where(F.col("k") >= 10)
    return vk.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
        F.count_if((F.col("k") % 2) == 0).alias("n_even_k"),
    )


# --- threshold sweep for the heuristic scorer -----------------------------

_SWEEP_THRESHOLDS = "(0.05), (0.20), (0.35), (0.60), (0.85)"

_SWEEP_SQL = rf"""
WITH feats AS (
  SELECT user_id,
         count(CASE WHEN event_type = 'view' THEN 1 END) AS view_count,
         count(CASE WHEN event_type = 'click' THEN 1 END) AS click_count,
         count(*) AS total_events,
         count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases
  FROM events GROUP BY user_id
),
scored AS (
  SELECT user_id,
         CASE WHEN click_count >= 3 AND view_count >= 5 THEN 0.85
              WHEN click_count >= 2 THEN 0.60
              WHEN view_count >= 3 THEN 0.35
              WHEN total_events >= 5 THEN 0.20
              ELSE 0.05 END AS intent_score,
         CAST(purchases > 0 AS BIGINT) AS label
  FROM feats
),
thresholds(threshold) AS (VALUES {_SWEEP_THRESHOLDS}),
conf AS (
  SELECT t.threshold,
         sum(CASE WHEN s.intent_score >= t.threshold AND s.label = 1 THEN 1 ELSE 0 END) AS tp,
         sum(CASE WHEN s.intent_score >= t.threshold AND s.label = 0 THEN 1 ELSE 0 END) AS fp,
         sum(CASE WHEN s.intent_score <  t.threshold AND s.label = 1 THEN 1 ELSE 0 END) AS fn,
         sum(CASE WHEN s.intent_score <  t.threshold AND s.label = 0 THEN 1 ELSE 0 END) AS tn
  FROM scored s CROSS JOIN thresholds t
  GROUP BY t.threshold
)
SELECT CAST(threshold AS DOUBLE) AS threshold,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
       CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall,
       CASE WHEN tp + fp > 0 AND tp + fn > 0
             AND CAST(tp AS DOUBLE) / (tp + fp) + CAST(tp AS DOUBLE) / (tp + fn) > 0
            THEN 2.0 * (CAST(tp AS DOUBLE) / (tp + fp)) * (CAST(tp AS DOUBLE) / (tp + fn))
                 / (CAST(tp AS DOUBLE) / (tp + fp) + CAST(tp AS DOUBLE) / (tp + fn)) END AS f1
FROM conf
"""


@query("ml_threshold_sweep", sql=_SWEEP_SQL, tags=("ml", "eval"))
def ml_threshold_sweep(spark, sf_dir):
    """Operating-point sweep for the cold-start heuristic scorer: the
    full confusion matrix plus precision/recall/F1 at each of the
    scorer's five output levels, against the did-they-purchase label —
    the threshold-picking table a launch review reads.

    Everything is exact integer counts from ONE user rollup crossed with
    a 5-row broadcast threshold table; precision/recall are single IEEE
    divisions and F1 repeats the identical op chain on both engines,
    with every denominator CASE-guarded (empty prediction or positive
    sets yield NULL, never ANSI DIVIDE_BY_ZERO)."""
    ev = read_table(spark, sf_dir, "events")
    feats = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("view_count"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("click_count"),
        F.count("*").alias("total_events"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
    )
    score = (
        F.when((F.col("click_count") >= 3) & (F.col("view_count") >= 5), 0.85)
        .when(F.col("click_count") >= 2, 0.60)
        .when(F.col("view_count") >= 3, 0.35)
        .when(F.col("total_events") >= 5, 0.20)
        .otherwise(0.05)
    )
    scored = feats.select(
        score.alias("intent_score"),
        (F.col("purchases") > 0).cast("long").alias("label"),
    )
    thresholds = spark.createDataFrame(
        [(0.05,), (0.20,), (0.35,), (0.60,), (0.85,)], "threshold double"
    )
    pred = F.col("intent_score") >= F.col("threshold")
    pos, neg = F.col("label") == 1, F.col("label") == 0
    conf = (
        scored.crossJoin(F.broadcast(thresholds))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(pred & pos, 1).otherwise(0)).cast("long").alias("tp"),
            F.sum(F.when(pred & neg, 1).otherwise(0)).cast("long").alias("fp"),
            F.sum(F.when(~pred & pos, 1).otherwise(0)).cast("long").alias("fn"),
            F.sum(F.when(~pred & neg, 1).otherwise(0)).cast("long").alias("tn"),
        )
    )
    prec = F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))
    rec = F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))
    return conf.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(F.col("tp") + F.col("fp") > 0, prec).alias("precision"),
        F.when(F.col("tp") + F.col("fn") > 0, rec).alias("recall"),
        F.when(
            (F.col("tp") + F.col("fp") > 0)
            & (F.col("tp") + F.col("fn") > 0)
            & (prec + rec > 0),
            2.0 * prec * rec / (prec + rec),
        ).alias("f1"),
    )


# --- engagement-calibration curve (does activity predict outcomes?) -------
# The calibration readout behind score-based targeting: bucket users by
# engagement (click count, 5-wide buckets) and report exact per-bucket
# outcome rates — purchases per user and purchase revenue per user — plus
# lift over the population mean.  The fixture's users all convert at
# least once, so the informative calibration target is outcome INTENSITY,
# not a binary label.  One user rollup (the corpus-sized stage), a
# ~5-row bucket aggregate, and broadcast 1-row totals for the lift —
# exact BIGINT counts/cents meeting in single IEEE divisions.

_CALIBRATION_SQL = """
WITH feats AS (
  SELECT user_id,
         count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
         CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
           AS purchases,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev_cents
  FROM events GROUP BY user_id
),
b AS (
  SELECT CAST(least(clicks // 5, 10) AS BIGINT) AS click_bucket,
         purchases, rev_cents
  FROM feats
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_all,
         CAST(sum(purchases) AS BIGINT) AS p_all,
         CAST(sum(rev_cents) AS BIGINT) AS r_all
  FROM b
)
SELECT b.click_bucket,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(b.purchases) AS BIGINT) AS total_purchases,
       CAST(sum(b.rev_cents) AS BIGINT) AS total_rev_cents,
       round(CAST(sum(b.purchases) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS purchases_per_user,
       round(CAST(sum(b.rev_cents) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS rev_cents_per_user,
       round((CAST(sum(b.purchases) AS DOUBLE) / CAST(count(*) AS DOUBLE))
             / (CAST(t.p_all AS DOUBLE) / CAST(t.n_all AS DOUBLE)), 6)
         AS purchase_lift
FROM b CROSS JOIN tot t
GROUP BY b.click_bucket, t.n_all, t.p_all, t.r_all
"""


@query("ml_engagement_calibration", sql=_CALIBRATION_SQL, tags=("ml", "eval"))
def ml_engagement_calibration(spark, sf_dir):
    """Engagement-to-outcome calibration curve: exact purchases/user and
    revenue/user per click-count bucket with lift over the population
    mean — see block comment."""
    ev = read_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    feats = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("purchases"),
        F.sum(
            F.when(F.col("event_type") == "purchase", cents).otherwise(0)
        )
        .cast("long")
        .alias("rev_cents"),
    )
    b = feats.select(
        F.least(F.floor(F.col("clicks") / 5), F.lit(10))
        .cast("long")
        .alias("click_bucket"),
        "purchases",
        "rev_cents",
    )
    tot = b.agg(
        F.count("*").cast("long").alias("n_all"),
        F.sum("purchases").cast("long").alias("p_all"),
        F.sum("rev_cents").cast("long").alias("r_all"),
    )
    ppu = F.sum("purchases").cast("double") / F.count("*").cast("double")
    rpu = F.sum("rev_cents").cast("double") / F.count("*").cast("double")
    base = F.col("p_all").cast("double") / F.col("n_all").cast("double")
    return (
        b.crossJoin(F.broadcast(tot))
        .groupBy("click_bucket", "n_all", "p_all", "r_all")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("purchases").cast("long").alias("total_purchases"),
            F.sum("rev_cents").cast("long").alias("total_rev_cents"),
            F.round(ppu, 6).alias("purchases_per_user"),
            F.round(rpu, 6).alias("rev_cents_per_user"),
            F.round(ppu / base, 6).alias("purchase_lift"),
        )
        .select(
            "click_bucket",
            "n_users",
            "total_purchases",
            "total_rev_cents",
            "purchases_per_user",
            "rev_cents_per_user",
            "purchase_lift",
        )
    )
