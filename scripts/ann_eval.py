"""ANN method evaluation: recall@k vs the exact brute-force baseline,
plus wall-clock, for every similarity method in the registry.

The registry proves each method matches ITS OWN oracle; this script
measures the quality trade the approximate methods make — recall@k
against ground truth — together with their cost, which is the number a
user picks a method by.  Usage:

    python scripts/ann_eval.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

METHODS = [
    "ann_bruteforce_topk",  # ground truth
    "ann_lsh_topk",
    "ann_lsh_multiprobe_topk",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from big_data_analytics_project_spark.registry import load_all
    from big_data_analytics_project_spark.session import get_spark

    registry = load_all()
    spark = get_spark("ann-eval")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for name in METHODS:
        fn = registry[name].fn
        fn(spark, sf_dir).count()  # warm
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        # normalize to {query_id: [neighbor ids ranked]}
        by_q: dict = {}
        qcol = next(c for c in rows[0].asDict() if "query" in c.lower())
        ncol = next(
            c
            for c in rows[0].asDict()
            if c != qcol and ("id" in c.lower() or "neighbor" in c.lower())
        )
        for r in rows:
            by_q.setdefault(r[qcol], []).append(r[ncol])
        results[name] = {"topk": by_q, "sec": dt, "rows": len(rows)}

    truth = results["ann_bruteforce_topk"]["topk"]
    header = f"{'method':22} {'sec':>7} {'rows':>6} {'recall@k':>9}"
    print(header)
    print("-" * len(header))
    for name in METHODS:
        r = results[name]
        hits = total = 0
        for q, expect in truth.items():
            got = set(r["topk"].get(q, []))
            hits += len(got & set(expect))
            total += len(expect)
        rec = hits / total if total else 0.0
        print(f"{name:22} {r['sec']:>7.2f} {r['rows']:>6} {rec:>9.3f}")


if __name__ == "__main__":
    main()
