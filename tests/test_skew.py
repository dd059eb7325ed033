"""Salted aggregation/join must be result-identical to the plain forms
(skew remedies change the plan, never the answer)."""

import pyspark.sql.functions as F

from big_data_analytics_project_spark.operators.skew import salted_agg, salted_join
from big_data_analytics_project_spark.sources import read_table


def test_salted_agg_matches_plain(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    plain = ev.groupBy("event_type").agg(
        F.count("event_id").alias("n"),
        F.sum("value").alias("total"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    salted = salted_agg(
        ev,
        "event_type",
        {
            "n": ("event_id", "count"),
            "total": ("value", "sum"),
            "first_ts": ("ts", "min"),
            "last_ts": ("ts", "max"),
        },
        n_salts=8,
    )
    p = {r.event_type: (r.n, round(r.total, 6), r.first_ts, r.last_ts) for r in plain.collect()}
    s = {r.event_type: (r.n, round(r.total, 6), r.first_ts, r.last_ts) for r in salted.collect()}
    assert p == s


def test_salted_join_matches_plain(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = o.join(c, "o_custkey").groupBy("c_mktsegment").count()
    salted = salted_join(o, c, "o_custkey", n_salts=4).groupBy("c_mktsegment").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
