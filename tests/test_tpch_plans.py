"""Physical-plan pins for the TPC-H suite.

The oracle parity suite proves the ANSWERS right; these tests pin the plan
SHAPES that make the queries viable at 100 TB — a correct plan that
rescans the fact table or global-sorts for a top-k would still pass
parity, so the shapes are asserted explicitly (same idea as
test_flagship_plan_shape_regression).
"""

import pytest


def _plan(registry, spark, sf_dir, name: str) -> str:
    spark.catalog.clearCache()
    df = registry[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_pushes_all_predicates_to_scan(registry, spark, sf_dir):
    """Q6 is the pushdown probe: every predicate and the 3-column
    projection must reach the parquet reader."""
    plan = _plan(registry, spark, sf_dir, "tpch_q6_forecast_revenue")
    # toString truncates the filter list, so assert the head of the pushed
    # list (range filters follow the IsNotNulls) and the pruned schema
    assert (
        "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), "
        "IsNotNull(l_quantity), GreaterThanOrEqual(l_shipda" in plan
    ), plan
    assert (
        "ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_shipdate:timestamp" in plan
    ), plan


def test_q3_topk_stays_in_plan(registry, spark, sf_dir):
    """Q3's LIMIT 10 must be TakeOrderedAndProject — never a global sort
    followed by a limit."""
    plan = _plan(registry, spark, sf_dir, "tpch_q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan, plan


def test_q18_scans_lineitem_once(registry, spark, sf_dir):
    """The single-scan rewrite: the outer GROUP BY contains the order key,
    so one per-order aggregate feeds both the HAVING filter and sum_qty.
    Two scans would mean the rewrite regressed to the spec's naive form."""
    plan = _plan(registry, spark, sf_dir, "tpch_q18_large_volume_customer")
    assert plan.count("lineitem.parquet") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_q5_single_fact_shuffle(registry, spark, sf_dir):
    """Q5's six-way join must move fact data through exactly one exchange
    (lineitem ⋈ orders); customer/supplier/nation/region all broadcast."""
    plan = _plan(registry, spark, sf_dir, "tpch_q5_local_supplier_volume")
    # >=4: the four hinted dims always broadcast; at tiny SF AQE may also
    # broadcast the orders side of the fact join (fine — it is never SMJ)
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "SortMergeJoin" not in plan


def test_q21_is_single_aggregation_not_self_joins(registry, spark, sf_dir):
    """The EXISTS/NOT-EXISTS pair is rewritten as ONE per-order
    aggregation: exactly one lineitem scan (the oracle's three-scan
    self-join form is the cross-check, not the plan)."""
    plan = _plan(registry, spark, sf_dir, "tpch_q21_waiting_supplier")
    assert plan.count("lineitem.parquet") == 1, plan


@pytest.mark.parametrize(
    "name",
    [
        "tpch_q2_min_cost_supplier",
        "tpch_q4_order_priority",
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q9_product_type_profit",
        "tpch_q10_returned_items",
        "tpch_q13_customer_distribution",
        "tpch_q16_supplier_part_count",
        "tpch_q17_small_quantity_revenue",
        "tpch_q19_bracketed_revenue",
        "tpch_q20_part_promotion",
        "tpch_q22_idle_balance",
    ],
)
def test_no_sortmergejoin_anywhere(registry, spark, sf_dir, name):
    """Every dimension in the suite is broadcast-sized; a SortMergeJoin
    appearing means a broadcast hint was dropped in a refactor."""
    plan = _plan(registry, spark, sf_dir, name)
    assert "SortMergeJoin" not in plan, plan
