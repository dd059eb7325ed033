#!/usr/bin/env python
"""Isolated per-query timing for optimization A/Bs (guide §1.4).

Usage:
    python scripts/ab_time.py <query> [<query> ...] [--n N] [--sf DIR]

Times each named registered query with the SAME methodology as bench.py
(noop sink so every output column materializes, min-of-N over full passes,
one untimed warmup pass, clearCache between runs) but over an arbitrary
query list, so before/after pairs for a single operator are measured
without paying a full 213-query suite run.  Prints one `name: sec` line
per query plus a total.  Not part of the driver bench contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    n = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--n":
            n = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    from big_data_analytics_project_spark.registry import load_all
    from big_data_analytics_project_spark.session import get_spark

    registry = load_all()
    spark = get_spark("ab_time")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmups as bench.py: JVM/codegen + Python worker pool
    registry["sort_by_aggregate"].fn(spark, sf_dir).count()
    spark.range(1000).repartition(64).mapInPandas(lambda it: it, "id long").count()
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    timings = {name: float("inf") for name in names}
    for _ in range(n):
        for name in names:
            spec = registry[name]
            spark.sparkContext.setJobDescription(f"timed: {name}")
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = min(timings[name], time.perf_counter() - t0)
            spark.catalog.clearCache()
    for name in names:
        print(f"{name}: {timings[name]:.3f}")
    print(f"TOTAL: {sum(timings.values()):.3f}")


if __name__ == "__main__":
    main()
