"""Runtime bloom-filter join pruning — the big-big join lever at 100 TB.

When a fact-fact join can't broadcast, Spark (3.4+) can build a bloom
filter from the selective side's join keys and push `might_contain` into
the other side's scan, cutting the shuffled volume by the filter's
selectivity.  The fixtures are small enough to broadcast everything, so
the feature never fires in the other tests — these pin that (a) the
session leaves it ENABLED so a real cluster gets it for free, and (b) it
actually injects on the canonical selective-dim-to-fact shape when the
join is a shuffle join.
"""

import pyspark.sql.functions as F

from big_data_analytics_project_spark.sources import read_table


def test_session_leaves_runtime_bloom_filters_enabled(spark):
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )


def test_bloom_filter_injected_on_shuffle_join(spark, sf_dir):
    """Selective orders filter → bloom filter on lineitem's l_orderkey.
    Thresholds are lowered to fixture scale; at production scale the
    defaults (10 MB creation side / 10 GB application side) gate it to
    exactly the joins where it pays."""
    prev_scan = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1b",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = read_table(spark, sf_dir, "lineitem")
        o = read_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
        # the filter must land on the APPLICATION (lineitem) side
        assert "might_contain" in plan.split("Join Inner")[1].split("+- Filter")[0] or (
            "xxhash64(l_orderkey" in plan
        ), plan
        # and the result must equal the unfiltered join (bloom is a
        # may-contain pre-filter, never drops true matches)
        expected = (
            read_table(spark, sf_dir, "lineitem")
            .join(
                read_table(spark, sf_dir, "orders").where(
                    F.col("o_orderpriority") == "1-URGENT"
                ),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert j.count() == expected
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            prev_scan,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
