"""The clickstream_gen Python Data Source (Spark 4): determinism,
partition invariance, stream/batch parity, and downstream composability.

Re-expression of the reference's CSV→Kafka event simulator
(``src/streaming/kafka_producer.py``) as a distributed source; these
tests pin the determinism contract the module docstring states."""

import tempfile
import time

import pytest

from big_data_analytics_project_spark.sources.eventgen import register


@pytest.fixture(scope="module")
def gen(spark):
    register(spark)
    return spark


def _read(spark, **opts):
    r = spark.read.format("clickstream_gen")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_schema_and_count(gen):
    df = _read(gen, rows=5000, seed=7)
    assert df.count() == 5000
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["ts"] == "timestamp" and types["value"] == "double"


def test_partition_count_invariance(gen):
    a = _read(gen, rows=8000, partitions=1, seed=3)
    b = _read(gen, rows=8000, partitions=13, seed=3)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_seed_determinism(gen):
    a = _read(gen, rows=4000, seed=11).collect()
    b = _read(gen, rows=4000, seed=11).collect()
    c = _read(gen, rows=4000, seed=12)
    assert sorted(a) == sorted(b)
    assert _read(gen, rows=4000, seed=11).exceptAll(c).count() > 0


def test_first_row_pinned(gen):
    """Pin exact generated values so the counter-hash never drifts
    silently between rounds (any change is a deliberate diff here)."""
    r = _read(gen, rows=1, seed=7).collect()[0]
    assert r.event_id == 0
    assert r.user_id == 430
    assert r.event_type == "signup"
    assert r.value == 39.68
    assert r.props == '{"k": 38}'
    assert r.ts.isoformat() == "2024-01-01T00:00:00.087170"


def test_event_mix_near_uniform(gen):
    rows = dict(
        _read(gen, rows=50000, seed=42)
        .groupBy("event_type")
        .count()
        .collect()
    )
    counts = {r: c for r, c in rows.items()}
    assert set(counts) == {"view", "click", "purchase", "error", "signup"}
    assert all(8000 < c < 12000 for c in counts.values())


def test_stream_available_now_parity(gen):
    stream = (
        gen.readStream.format("clickstream_gen")
        .option("rows", 20000)
        .option("seed", 7)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("eventgen_drain")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = gen.table("eventgen_drain")
    batch = _read(gen, rows=20000, seed=7)
    assert got.count() == 20000
    assert got.exceptAll(batch).count() == 0 and batch.exceptAll(got).count() == 0


def test_stream_paced_micro_batches(gen):
    stream = (
        gen.readStream.format("clickstream_gen")
        .option("rows", 12000)
        .option("rowsPerBatch", 4000)
        .option("seed", 9)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("eventgen_paced")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    deadline = time.time() + 90
    while time.time() < deadline and gen.table("eventgen_paced").count() < 12000:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    got = gen.table("eventgen_paced")
    batch = _read(gen, rows=12000, seed=9)
    assert got.count() == 12000
    assert got.exceptAll(batch).count() == 0
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 3


def test_generated_events_compose_downstream(gen):
    """Generated data mirrors the events fixture schema, so the existing
    operator surface consumes it unchanged."""
    import pyspark.sql.functions as F

    df = _read(gen, rows=10000, seed=5)
    out = (
        df.groupBy(F.window("ts", "1 minute"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    assert out.count() > 0
    assert out.agg(F.sum("n")).collect()[0][0] == 10000


def test_stream_agg_query_pinned_values(gen, registry):
    """Pin the registry streaming-PyDS query's exact aggregate (the
    generator's determinism contract makes these stable literals)."""
    rows = {
        r["event_type"]: (r["n_events"], r["total_cents"])
        for r in registry["pyds_clickstream_stream_agg"].fn(gen, "unused").collect()
    }
    assert rows == {
        "click": (4045, 24314109),
        "error": (4058, 24153543),
        "purchase": (3903, 24290491),
        "signup": (4026, 24579762),
        "view": (3968, 23800793),
    }


def test_stream_checkpoint_restart_resumes(gen):
    """Kill a paced stream mid-way, restart from the same checkpoint:
    the file sink must end up holding exactly the batch dataset — no gap
    from the fresh reader instance's advertised-offset counter restarting
    at zero (the partitions() monotonicity guard), no duplicates."""
    import os

    import pyspark.sql.functions as F

    ckpt = tempfile.mkdtemp()
    out_dir = os.path.join(tempfile.mkdtemp(), "sink")

    def run(min_rows, timeout_s=90):
        s = (
            gen.readStream.format("clickstream_gen")
            .option("rows", 16000)
            .option("rowsPerBatch", 4000)
            .option("seed", 21)
            .load()
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="300 milliseconds")
            .start()
        )
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            try:
                if gen.read.parquet(out_dir).count() >= min_rows:
                    break
            except Exception:
                pass
            time.sleep(0.3)
        q.stop()
        q.awaitTermination(30)
        return gen.read.parquet(out_dir)

    first = run(8000)
    n_first = first.count()
    assert 4000 <= n_first
    if n_first < 16000:
        run(16000)
    final = gen.read.parquet(out_dir)
    batch = _read(gen, rows=16000, seed=21)
    assert final.count() == 16000
    assert final.exceptAll(batch).count() == 0
    assert batch.exceptAll(final).count() == 0
