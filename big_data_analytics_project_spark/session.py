"""SparkSession factory with scale-oriented defaults.

The reference creates sessions ad-hoc with static tuning
(``src/spark/preprocessing.py:17-25``: driver 8g, 200 shuffle partitions;
``scripts/create_cluster.sh:40-42``: AQE + Kryo on Dataproc only).  We make
the scale-friendly configuration the default everywhere:

- AQE on (dynamic partition coalescing, skew-join splitting) — at 100 TB a
  static ``shuffle.partitions`` is always wrong for some stage; AQE
  right-sizes post-shuffle partitions from runtime statistics.
- Arrow on for every pandas interchange (vectorized, zero row-at-a-time).
- Kryo serializer.
- UTC session timezone so timestamp semantics are engine-independent
  (the reference's string-vs-timestamp trap, SURVEY §1.4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for the local[32] test harness; on a real cluster these are set by
# the submitter (spark-submit --conf) and AQE re-plans at runtime anyway.
_DEFAULTS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.session.timeZone": "UTC",
    # 128 MiB input splits (default) are right for large parquet; make the
    # shuffle side explicit and AQE-coalescible.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # T8 — streaming lifecycle hygiene (reference stream_processor.py:106-107):
    # finish the in-flight micro-batch on shutdown instead of killing it, and
    # clean up temp checkpoint dirs when a query stops.
    "spark.streaming.stopGracefullyOnShutdown": "true",
    "spark.sql.streaming.forceDeleteTempCheckpointLocation": "true",
    "spark.sql.streaming.stopTimeout": "30000",
    # reliable_pin's cluster branch writes a reliable checkpoint per
    # iteration round (CC/BFS/label-prop); without this static conf Spark
    # never deletes reliable checkpoint data mid-session, so a long
    # cluster session accumulates unbounded scratch (ADVICE r15).  With it
    # the ContextCleaner removes checkpoint files once the pinned RDD is
    # garbage-collected — i.e. as soon as the next round's pin supersedes
    # the previous one.
    "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
    # The generated-code cache defaults to 100 entries (Spark 4.1
    # CODEGEN_CACHE_MAX_ENTRIES) — any application that runs more than a
    # handful of distinct queries per session overflows it and pays full
    # Janino recompilation of every WholeStageCodegen stage on every
    # re-execution.  The cache is per-JVM (driver and executors alike),
    # entries are compiled class handles (KBs each), so a few thousand
    # entries cost tens of MB and save ~50-100 ms of compiler time per
    # stage per query re-run on ANY deployment, local or cluster.
    # Measured r16 (/tmp-scale A/B over a 50-query chain, min-of-2):
    # 54.7 s at 100 → 47.5 s at 8192.
    "spark.sql.codegen.cache.maxEntries": "8192",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "big-data-analytics-project-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine's defaults applied."""
    master = master or os.environ.get("SPARK_MASTER", f"local[{default_parallelism()}]")
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or default_parallelism())
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_for_oracle(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs needed for deterministic cross-engine
    comparison to an externally-provided session (the driver owns the
    session passed to ``__spark_entry__.queries()``)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


# Keys that only make sense on the local test harness and must NOT ride a
# cluster properties file: driver sizing belongs to the submitter, and the
# UI is disabled locally only to keep the 32-thread harness lean.
_LOCAL_ONLY_KEYS = ("spark.driver.memory", "spark.ui.enabled")


def emit_properties(shuffle_partitions: int | None = None) -> str:
    """The engine's defaults as a ``spark-submit --properties-file`` body —
    the single source of truth the U5 submit wrapper
    (``scripts/submit_job.sh``) ships to a cluster, so in-process sessions
    and submitted jobs can never drift apart on Spark-level tuning."""
    conf = {k: v for k, v in _DEFAULTS.items() if k not in _LOCAL_ONLY_KEYS}
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    return "\n".join(f"{k} {v}" for k, v in sorted(conf.items())) + "\n"


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="emit engine Spark conf")
    p.add_argument("--emit-conf", action="store_true", required=True)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    args = p.parse_args()
    print(emit_properties(args.shuffle_partitions), end="")
