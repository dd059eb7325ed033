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


def test_seqpat_cap_inactive_on_fixture(spark, sf_dir, duck, registry):
    """basket_sequential_patterns' per-customer part cap (_SEQ_MAX_PARTS)
    must be INACTIVE at fixture scale: no customer reaches the cap, and
    the capped query equals the uncapped computation row-for-row."""
    from big_data_analytics_project_spark.plans.graph_queries import (
        _SEQ_MAX_PARTS,
        _SEQPAT_SQL,
    )

    max_k = duck.execute(
        """
        SELECT max(k) FROM (
          SELECT o.o_custkey, count(DISTINCT l.l_partkey) AS k
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
          GROUP BY 1)
        """
    ).fetchone()[0]
    assert max_k < _SEQ_MAX_PARTS, "cap would be active — fixture changed"

    uncapped_sql = _SEQPAT_SQL.replace(
        f"pos <= {_SEQ_MAX_PARTS}", "pos <= 1000000000"
    )
    assert uncapped_sql != _SEQPAT_SQL
    got = [
        tuple(r)
        for r in registry["basket_sequential_patterns"]
        .fn(spark, sf_dir)
        .collect()
    ]
    want = [tuple(r) for r in duck.execute(uncapped_sql).fetchall()]
    assert got == want
