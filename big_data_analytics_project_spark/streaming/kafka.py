"""Kafka sink / producer half of the streaming pipeline (SURVEY S5).

Reference behavior (``src/streaming/kafka_producer.py:90-96,184-188``):
events are JSON-serialized into the message *value*, the session key is the
message *key* (→ per-session partition affinity, so one session's events
land on one partition in order), and the producer runs with ``acks='all'``
and bounded retries.

Spark-first rebuild: serialization is a pure column projection
(``to_json(struct(...))`` — JVM-side, codegen), and the producer is
``writeStream.format("kafka")`` / ``df.write.format("kafka")`` over that
projection.  The key decision is the same: keying by session/user id gives
per-key ordering at the broker with no extra shuffle — Kafka's partitioner
hashes the key; Spark does NOT need to repartition first.

No broker (or kafka connector jar) exists in the test container, so tests
exercise (a) writer plan construction and (b) a file-sink fallback
roundtrip: the serialized ``value`` payloads are written as JSON-lines text
and read back through the streaming source parser, proving the
serialization path is lossless end-to-end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Kafka producer hardening, mirroring the reference's producer config
# (kafka_producer.py:90-96): full-ISR acks + bounded retries.  Passed to the
# connector as ``kafka.``-prefixed producer properties.
PRODUCER_OPTIONS = {
    "kafka.acks": "all",
    "kafka.retries": "3",
}

# Fixed-width, lexicographically-ordered, microsecond-precision timestamp
# format — roundtrips exactly through the fixtures' µs-aligned values.
TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def serialize_for_kafka(
    df: DataFrame, key_col: str = "user_id", stamp_ingestion_time: bool = False
) -> DataFrame:
    """Project an event frame to the Kafka message contract:
    (key string, value string) with value = JSON of all columns.

    ``stamp_ingestion_time`` mirrors the reference producer's
    processing-time marker (kafka_producer.py:141).  Works identically on
    batch and streaming frames (pure projection, no state)."""
    payload = df
    if stamp_ingestion_time:
        payload = payload.withColumn(
            "ingestion_time", F.date_format(F.current_timestamp(), TS_FORMAT)
        )
    # Format timestamp columns explicitly rather than via to_json's
    # ``timestampFormat`` option: under Spark 4.1 the option is not applied
    # to struct fields, silently truncating µs → ms (data loss).  An explicit
    # date_format projection is engine-version-proof and stays codegen-side.
    ts_types = {"timestamp", "timestamp_ntz"}
    fields = [
        F.date_format(c, TS_FORMAT).alias(c)
        if payload.schema[c].dataType.typeName() in ts_types
        else F.col(c)
        for c in payload.columns
    ]
    value = F.to_json(F.struct(*fields))
    return payload.select(
        F.col(key_col).cast("string").alias("key"), value.alias("value")
    )


def kafka_stream_writer(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    trigger_seconds: int | None = 5,
):
    """S5 streaming form: configured ``DataStreamWriter`` for the Kafka
    sink (caller ``.start()``s it — requires the spark-sql-kafka package +
    a live broker).  Checkpointing makes delivery at-least-once; keying by
    ``key_col`` preserves per-session ordering at the broker."""
    writer = (
        serialize_for_kafka(df, key_col=key_col, stamp_ingestion_time=True)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    for opt, val in PRODUCER_OPTIONS.items():
        writer = writer.option(opt, val)
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer


def kafka_batch_writer(
    df: DataFrame, bootstrap_servers: str, topic: str, key_col: str = "user_id"
):
    """S5 batch form — the thin producer utility (replays a static table
    into a topic, the reference's CSV→Kafka replay use case).  Returns a
    configured ``DataFrameWriter``; caller ``.save()``s it."""
    writer = (
        serialize_for_kafka(df, key_col=key_col, stamp_ingestion_time=True)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
    )
    for opt, val in PRODUCER_OPTIONS.items():
        writer = writer.option(opt, val)
    return writer


def write_values_as_jsonl(df: DataFrame, out_dir: str, n_files: int = 2) -> str:
    """File-sink fallback for broker-less environments/tests: write the
    serialized Kafka ``value`` payloads as JSON-lines text files.  The
    output is byte-identical to what the broker would store per message,
    and is directly replayable through ``read_event_stream`` (executor-side
    distributed write — no driver collect)."""
    df.select("value").repartition(n_files).write.mode("overwrite").text(out_dir)
    return out_dir
