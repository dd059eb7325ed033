"""Plan auditor: physical-plan quality report for the headline queries.

``python -m big_data_analytics_project_spark.audit [sf_dir]`` prints, per
query: exchange count, broadcast vs sort-merge joins, whether parquet
pushdown engaged, and whole-stage-codegen span count — the properties that
decide 100 TB behavior.  Used manually after operator changes ("is this
still the plan I'd want?") and by tests for the flagship shape.
"""

from __future__ import annotations

import re
import sys


def audit_plan(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": plan.count("Exchange") - plan.count("ReusedExchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "partition_filters": bool(re.search(r"PartitionFilters: \[[^\]]", plan)),
        "in_memory_scans": plan.count("InMemoryTableScan"),
        "python_stages": plan.count("ArrowEvalPython") + plan.count("MapInPandas"),
    }


HEADLINE = [
    "flagship_sessionization",
    "agg_pricing_summary",
    "join_multiway_revenue",
    "join_left_order_items",
    "window_rank_topn_per_group",
    "json_extract_agg",
    "ann_bruteforce_topk",
    "text_quality_scores",
    "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_type_profit",
    "tpch_q18_large_volume_customer",
    "tpch_q21_waiting_supplier",
]


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    from .registry import load_all
    from .session import get_spark

    registry = load_all()
    spark = get_spark("audit")
    spark.sparkContext.setLogLevel("ERROR")
    spark.catalog.clearCache()
    header = f"{'query':34} ex  bj  smj  cg  pushdown"
    print(header)
    print("-" * len(header))
    for name in HEADLINE:
        a = audit_plan(registry[name].fn(spark, sf_dir))
        print(
            f"{name:34} {a['exchanges']:2}  {a['broadcast_joins']:2}  "
            f"{a['sortmerge_joins']:3}  {a['codegen_spans']:2}  "
            f"{'yes' if a['pushed_filters'] else 'no'}"
        )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
