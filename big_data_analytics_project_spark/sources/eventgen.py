"""Distributed clickstream event generator — a Spark 4 Python Data Source.

Re-expresses the reference's CSV→Kafka event simulator
(``src/streaming/kafka_producer.py:64-232``: chunked replay of a
clickstream table as rate-limited JSON events) Spark-first: instead of a
single-process driver loop pushing rows one at a time, the generator is a
registered **Python Data Source** (new in Spark 4) whose partitions
synthesize their slice of the event stream independently on the
executors.  That inverts the reference's scale bottleneck — its producer
tops out at one CPU and one NIC; this source generates N partitions in
parallel and feeds either a batch `spark.read` or a Structured Streaming
`spark.readStream` (micro-batched by row offset), so the full streaming
stack is exercisable end-to-end *inside this container* with no Kafka
broker.

Determinism contract (what the tests pin):

- Every field of every row is a pure function of ``(seed, event_id)``
  via a splitmix64-style counter hash — **no stateful RNG** — so the
  dataset is identical for any partition count, any read order, batch or
  stream.  ``partitions=1`` and ``partitions=32`` produce byte-identical
  tables; a stream drained with ``availableNow`` equals the batch read
  of the same options (stream/batch parity).
- Generation is vectorized numpy over uint64 counters and ships to the
  JVM as Arrow record batches — no per-row Python in the hot path.

The schema mirrors the ``events`` fixture table exactly, so generated
data flows through every downstream operator (sessionization, windowed
aggs, funnel) unchanged.

Usage::

    from big_data_analytics_project_spark.sources.eventgen import register
    register(spark)
    df = (spark.read.format("clickstream_gen")
          .option("rows", 100_000).option("seed", 7).load())
    stream = (spark.readStream.format("clickstream_gen")
              .option("rows", 100_000).option("rowsPerBatch", 20_000).load())
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)

# categorical weights mirror the fixture's near-uniform event mix
_EVENT_TYPES = ("view", "click", "purchase", "error", "signup")
_BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch-µs


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer over uint64 counters — the counter-based hash
    that makes every field a pure function of (seed, event_id)."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(salt)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _u01(x: np.ndarray, salt: int) -> np.ndarray:
    return _mix(x, salt).astype(np.float64) / float(2**64)


def _gen_batch(start: int, end: int, seed: int, users: int, step_us: int) -> pa.RecordBatch:
    """Generate rows [start, end) as one Arrow record batch."""
    n = end - start
    ids = np.arange(start, end, dtype=np.uint64)
    with np.errstate(over="ignore"):
        ctr = ids * np.uint64(0x9E3779B97F4A7C15) + np.uint64(seed) * np.uint64(
            0xD1B54A32D192ED03
        )
    ts = (
        _BASE_TS_US
        + ids.astype(np.int64) * step_us
        + (_u01(ctr, 1) * step_us).astype(np.int64)
    )
    user_id = (_mix(ctr, 2) % np.uint64(users)).astype(np.int64)
    etype_idx = (_u01(ctr, 3) * len(_EVENT_TYPES)).astype(np.int64)
    value = np.round(-np.log1p(-_u01(ctr, 4) * (1 - 1e-12)) * 60.0 + 0.01, 2)
    k = (_mix(ctr, 5) % np.uint64(100)).astype(np.int64)

    etype_arr = pa.DictionaryArray.from_arrays(
        pa.array(etype_idx, type=pa.int32()), pa.array(list(_EVENT_TYPES))
    ).cast(pa.string())
    props = pa.compute.binary_join_element_wise(
        '{"k": ', pa.compute.cast(pa.array(k), pa.string()), "}", ""
    )
    return pa.RecordBatch.from_arrays(
        [
            pa.array(ids.astype(np.int64)),
            pa.array(ts, type=pa.timestamp("us")),
            pa.array(user_id),
            etype_arr,
            pa.array(value),
            props,
        ],
        names=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _Opts:
    """Parsed generator options shared by the batch and stream readers."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 10_000))
        self.partitions = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.users = int(options.get("users", 1_000))
        self.step_us = int(options.get("stepus", 100_000))  # 10 events/sec
        self.rows_per_batch = int(options.get("rowsperbatch", self.rows))

    def slices(self, start: int, end: int) -> list[_Slice]:
        """Split [start, end) into ≤``partitions`` even slices."""
        total = end - start
        p = max(1, min(self.partitions, total))
        bounds = [start + (total * i) // p for i in range(p + 1)]
        return [
            _Slice(bounds[i], bounds[i + 1])
            for i in range(p)
            if bounds[i + 1] > bounds[i]
        ]


class ClickstreamGenReader(DataSourceReader):
    def __init__(self, options):
        self.o = _Opts(options)

    def partitions(self):
        return self.o.slices(0, self.o.rows)

    def read(self, partition: _Slice):
        yield _gen_batch(
            partition.start, partition.end, self.o.seed, self.o.users, self.o.step_us
        )


class ClickstreamGenStreamReader(DataSourceStreamReader):
    """Micro-batch reader: the offset is simply the next row index.
    ``latestOffset`` paces admission — each call advertises at most
    ``rowsPerBatch`` more rows (default: everything), up to the bounded
    ``rows`` — while ``partitions(start, end)`` generates ALL of
    ``[start, end)``: pacing lives ONLY in the advertised offset, never
    in the batch planner, or rows the engine believes consumed would be
    silently dropped.  Offsets are plain row counters, so checkpointed
    restarts resume exactly (``end = max(start, latest)`` — an advertised
    offset behind the checkpoint just yields no new batch until the
    advance catches up)."""

    def __init__(self, options):
        self.o = _Opts(options)
        self._advertised = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        self._advertised = min(self._advertised + self.o.rows_per_batch, self.o.rows)
        return {"index": self._advertised}

    def partitions(self, start, end):
        lo, hi = int(start["index"]), int(end["index"])
        # checkpoint-restart guard: a fresh reader instance starts its
        # advertised counter at 0, which can trail the checkpointed start
        # for a few triggers; learning the real position here makes the
        # advertised offset monotone from the first planned batch on.
        self._advertised = max(self._advertised, lo, hi)
        return self.o.slices(lo, hi) or [_Slice(lo, lo)]

    def read(self, partition: _Slice):
        if partition.end <= partition.start:
            return iter(())
        return iter(
            [
                _gen_batch(
                    partition.start,
                    partition.end,
                    self.o.seed,
                    self.o.users,
                    self.o.step_us,
                )
            ]
        )

    def commit(self, end):
        pass


class ClickstreamGenDataSource(DataSource):
    @classmethod
    def name(cls):
        return "clickstream_gen"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return ClickstreamGenReader(self.options)

    def streamReader(self, schema):
        return ClickstreamGenStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on this session."""
    spark.dataSource.register(ClickstreamGenDataSource)
