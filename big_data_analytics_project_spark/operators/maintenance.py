"""Table-maintenance operators: small-file compaction.

At 100 TB the silent killer is not one slow query but a table that has
accreted millions of small files (streaming micro-batches, per-executor
writes, over-partitioned shuffles): every scan pays file-open overhead,
the driver pays listing time, and row-group statistics lose their
pruning power.  Compaction rewrites a dataset into ``ceil(total_bytes /
target_bytes)`` files of roughly ``target_bytes`` each — the same
maintenance job Delta/Iceberg call OPTIMIZE, expressed as plain
DataFrame ops so it runs anywhere Spark writes parquet.

Scale shape:

- File listing goes through the Hadoop ``FileSystem`` API (works for
  HDFS/S3A/local alike, not ``os.listdir``), so the operator is the same
  code on a laptop and a cluster.
- ``shuffle=True`` (default) bin-packs with ``repartition(n)`` — one
  round-robin shuffle sized at the dataset, the unavoidable cost of
  evenly-sized output.  On a production table you run compaction **per
  hive-partition directory** so each shuffle is partition-sized, never
  table-sized.
- ``sort_by`` switches to ``repartitionByRange + sortWithinPartitions``:
  same file-count contract, but the output is range-clustered so min/max
  row-group statistics keep their data-skipping power (the cheap cousin
  of the z-order rewrite in ``operators/zorder.py``, which this composes
  with).
- ``shuffle=False`` uses ``coalesce(n)`` — shuffle-free, but it only
  *merges* partitions (can't split or balance), so sizes skew; the
  documented trade, not the default.

Complements ``operators/zorder.py`` (layout) and the partition-scoped
keyed delete (GDPR erasure) as the table-maintenance family.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file directly under ``path``, via the
    Hadoop FileSystem API (portable across local/HDFS/S3A).  Skips
    _SUCCESS and other metadata sidecars."""
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith(("_", ".")):
            out.append((str(st.getPath()), int(st.getLen())))
    return out


def plan_output_files(total_bytes: int, target_bytes: int) -> int:
    return max(1, math.ceil(total_bytes / max(1, target_bytes)))


def compact(
    spark: SparkSession,
    src: str,
    dest: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    sort_by: Sequence[str] | None = None,
    shuffle: bool = True,
    mode: str = "error",
) -> dict:
    """Rewrite the parquet dataset at ``src`` into ``dest`` as
    ``ceil(total/target)`` files; returns before/after stats."""
    before = data_files(spark, src)
    bytes_before = sum(sz for _, sz in before)
    n_out = plan_output_files(bytes_before, target_bytes)

    df = spark.read.parquet(src)
    if sort_by:
        out: DataFrame = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(
            *sort_by
        )
    elif shuffle:
        out = df.repartition(n_out)
    else:
        out = df.coalesce(n_out)
    out.write.mode(mode).parquet(dest)

    after = data_files(spark, dest)
    return {
        "files_before": len(before),
        "bytes_before": bytes_before,
        "files_after": len(after),
        "bytes_after": sum(sz for _, sz in after),
        "planned_files": n_out,
        "target_bytes": target_bytes,
    }
