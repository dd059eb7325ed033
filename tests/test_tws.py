"""transformWithState (Spark 4 arbitrary stateful API): plan construction
always; full execution + stream/batch parity when the protobuf-backed
runtime exists in the environment (it does not in this container — the
probe skip is the honest max, same pattern as the Kafka broker gap)."""

import tempfile

import pyspark.sql.functions as F
import pytest

from big_data_analytics_project_spark.streaming.tws import (
    RunningUserTotals,
    is_available,
    running_user_totals,
)

AVAILABLE, REASON = is_available()


def test_plan_constructs_unbounded(spark):
    """The keyed transformWithState plan must build and analyze against a
    real unbounded source (catches schema/arg regressions without needing
    the runtime)."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(F.col("value").alias("user_id"), (F.col("value") * 1.5).alias("value"))
    )
    out = running_user_totals(stream)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id", "n_events", "total_cents",
    ]


def test_processor_accumulates_exactly():
    """The processor's cent arithmetic, unit-level: integer accumulation
    is associative, so any batch slicing yields the same state."""
    import pandas as pd

    class FakeState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    p = RunningUserTotals()
    p._state = FakeState()
    one = list(p.handleInputRows((7,), iter([pd.DataFrame({"value": [1.25, 2.50]})]), None))
    two = list(p.handleInputRows((7,), iter([pd.DataFrame({"value": [0.25]})]), None))
    assert one[0].iloc[0].tolist() == [7, 2, 375]
    assert two[0].iloc[0].tolist() == [7, 3, 400]


@pytest.mark.skipif(not AVAILABLE, reason=REASON or "runtime present")
def test_stream_batch_parity(spark, sf_dir):
    from big_data_analytics_project_spark.plans.streaming_queries import _staged
    from big_data_analytics_project_spark.streaming import processor as P

    json_dir = _staged(spark, sf_dir)
    stream = P.read_event_stream(spark, json_dir, max_files_per_trigger=2)
    out = running_user_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_parity")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    res = spark.table("tws_parity")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = res.withColumn("rn", F.row_number().over(w)).where("rn=1").drop("rn")
    from big_data_analytics_project_spark.sources.readers import read_table

    ev = read_table(spark, sf_dir, "events")
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
    )
    assert final.exceptAll(batch).count() == 0
    assert batch.exceptAll(final).count() == 0
