"""Two-point measurement: is the band-index APPEND stage O(|wave|)?

`dedup_band_index_incremental_append` claims per-wave cost independent
of index size (new wave signed+banded and landed as a fresh `gen=N`
partition directory — existing files never touched).  The corpus-sf
scaling audit can't isolate that claim because wave and index grow
together there.  This script pins it directly: the SAME wave (sf0.01
documents, doc_id % 3 == 2) is appended to a gen-0 index built from
sf0.01 documents and then to one built from sf0.1 documents (10x the
index), timing ONLY the append stage (sign + band + partition write),
warmed, min-of-3.  Flat times across the two index sizes = the claim.

Usage:  python scripts/append_cost_vs_index_size.py
Output: one line per index size; splice the numbers into
        docs/scaling_audit.md by hand (per-round batch policy).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyspark.sql.functions as F

    from big_data_analytics_project_spark.plans.dedup_queries import (
        _bandidx_banded,
        _bandidx_signed,
    )
    from big_data_analytics_project_spark.session import get_spark
    from big_data_analytics_project_spark.sources import index_scratch_dir
    from big_data_analytics_project_spark.sources.readers import read_table

    spark = get_spark()
    wave = (
        read_table(spark, "/root/testdata/sf0.01", "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") % 3 == 2)
    )
    print(f"fixed wave: {wave.count()} docs (sf0.01, doc_id % 3 == 2)")

    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        gen0 = (
            read_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .where(F.col("doc_id") % 3 == 1)
        )
        idx_path = index_scratch_dir(spark, f"append_cost_{os.path.basename(sf_dir)}")
        (
            _bandidx_banded(_bandidx_signed(gen0))
            .withColumn("gen", F.lit(0))
            .write.partitionBy("gen")
            .mode("overwrite")
            .parquet(idx_path)
        )
        n_idx = spark.read.parquet(idx_path).count()
        times = []
        for i in range(4):  # first run warms the wave-side scan caches
            t0 = time.time()
            (
                _bandidx_banded(_bandidx_signed(wave))
                .withColumn("gen", F.lit(1 + i))  # fresh partition each run
                .write.partitionBy("gen")
                .mode("append")
                .parquet(idx_path)
            )
            times.append(time.time() - t0)
        best = min(times[1:])
        print(
            f"index from {sf_dir}: {n_idx} gen-0 band rows -> "
            f"append stage min-of-3 {best:.3f} s (runs: "
            + ", ".join(f"{t:.3f}" for t in times)
            + ")"
        )


if __name__ == "__main__":
    main()
