"""Per-query scaling audit: time each headline query at two scale factors
and report the time ratio against the 10× data ratio.

This is the direct local evidence for the question the 100 TB design
keeps asking: *does the plan scale linearly?*  A query whose time grows
slower than the data is overhead-bound (fine); ≈linear is the expected
steady state for scan/shuffle-bound plans; clearly superlinear growth
(time ratio ≫ data ratio) means a join or window is doing quadratic
work and would not survive a 100× scale-up.  Usage:

    python scripts/scaling_curve.py [lo_sf_dir hi_sf_dir]

Each query is warmed once per SF and timed min-of-2.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    lo = sys.argv[1] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    hi = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    data_ratio = 10.0  # sf0.1 / sf0.01

    from bench import HEADLINE

    # SPARK_GRAFT_AUDIT_ONLY=a,b,c audits a subset (splice rows into the
    # doc by hand; full-HEADLINE refreshes stay the per-round batch job)
    only = os.environ.get("SPARK_GRAFT_AUDIT_ONLY")
    if only:
        names = [n for n in only.split(",") if n]
        missing = [n for n in names if n not in HEADLINE]
        assert not missing, f"not in HEADLINE: {missing}"
        HEADLINE = names

    from big_data_analytics_project_spark.registry import load_all
    from big_data_analytics_project_spark.session import get_spark

    registry = load_all()
    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, sf: str) -> float:
        fn = registry[name].fn
        fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return best

    header = f"{'query':34} {'t(sf0.01)':>10} {'t(sf0.1)':>10} {'ratio':>7}  verdict"
    print(header)
    print("-" * len(header))
    for name in HEADLINE:
        t_lo = run(name, lo)
        t_hi = run(name, hi)
        ratio = t_hi / t_lo if t_lo > 0 else float("inf")
        verdict = (
            "overhead-bound"
            if ratio < 3.0
            else "~linear"
            if ratio <= data_ratio * 1.5
            else "SUPERLINEAR"
        )
        print(f"{name:34} {t_lo:>10.3f} {t_hi:>10.3f} {ratio:>7.2f}  {verdict}")


if __name__ == "__main__":
    main()
