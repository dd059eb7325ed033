"""Kafka sink/producer (S5): serialization contract + broker-less
end-to-end replay through the file-source fallback.

No broker or kafka connector jar exists in the container, so the writer
builders are exercised for plan construction and the value payloads are
proven lossless by writing them as JSON-lines and replaying them through
the streaming source parser.
"""

import shutil

import pyspark.sql.functions as F

from big_data_analytics_project_spark.sources import read_table
from big_data_analytics_project_spark.streaming import kafka as K
from big_data_analytics_project_spark.streaming import processor as P

COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def test_kafka_serialization_roundtrip(spark, sf_dir, tmp_path):
    """to_json value payloads must decode back to the exact event rows
    (timestamps µs-exact, doubles bit-exact, nulls preserved-as-null)."""
    ev = read_table(spark, sf_dir, "events").select(*COLS)
    out = str(tmp_path / "values")
    K.write_values_as_jsonl(K.serialize_for_kafka(ev), out)
    raw = (
        spark.read.schema(
            "event_id LONG, ts STRING, user_id LONG, event_type STRING, "
            "value DOUBLE, props STRING"
        )
        .json(out)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    want = {tuple(r) for r in ev.collect()}
    got = {tuple(r) for r in raw.select(*COLS).collect()}
    assert got == want


def test_kafka_message_contract_and_writer_construction(spark, sf_dir, tmp_path):
    """Message shape is (key string, value string) with key = session/user
    id (per-key partition affinity at the broker); both writer builders
    must construct with the reference's producer hardening options."""
    ev = read_table(spark, sf_dir, "events").limit(10)
    msg = K.serialize_for_kafka(ev, key_col="user_id")
    assert [(f.name, f.dataType.simpleString()) for f in msg.schema.fields] == [
        ("key", "string"),
        ("value", "string"),
    ]
    keys = {r.key for r in msg.collect()}
    users = {str(r.user_id) for r in ev.select("user_id").collect()}
    assert keys == users

    # plan construction only (no broker): builders must not throw
    stream = P.read_event_stream(spark, str(tmp_path), max_files_per_trigger=1)
    K.kafka_stream_writer(
        stream, "localhost:9092", "events", str(tmp_path / "ckpt")
    )
    K.kafka_batch_writer(ev, "localhost:9092", "events")


def test_kafka_values_replay_through_stream_source(spark, sf_dir, tmp_path):
    """End-to-end over the file fallback: serialized value payloads →
    JSON-lines 'topic' → streaming source → windowed agg must equal the
    same aggregation computed in batch over the original table."""
    ev = read_table(spark, sf_dir, "events").select(*COLS)
    topic_dir = str(tmp_path / "topic")
    K.write_values_as_jsonl(K.serialize_for_kafka(ev), topic_dir)
    try:
        stream = P.read_event_stream(spark, topic_dir, max_files_per_trigger=10)
        streamed = P.run_to_completion(
            P.tumbling_features(stream, window="1 hour"), "t_kafka_replay", "complete"
        )
        batch = (
            ev.groupBy(F.window("ts", "1 hour").alias("win"), F.col("user_id"))
            .agg(F.count("*").alias("total_events"))
        )
        got = sorted(
            (r["win"]["start"], r["user_id"], r["total_events"])
            for r in streamed.collect()
        )
        want = sorted(
            (r["win"]["start"], r["user_id"], r["total_events"])
            for r in batch.collect()
        )
        assert got == want
    finally:
        shutil.rmtree(topic_dir, ignore_errors=True)
