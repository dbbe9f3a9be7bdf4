"""Custom stateful streaming op + listener tests (W6/W8)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from tweetaggregates_spark.streaming.metrics import ThroughputListener
from tweetaggregates_spark.streaming.stateful import running_entity_totals


def test_running_totals_matches_batch(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = [
        {"user_id": i % 5, "value": float(i)} for i in range(200)
    ]
    # two files => two potential micro-batches; state carries across
    (in_dir / "a.ndjson").write_text(
        "\n".join(json.dumps(r) for r in rows[:120]) + "\n"
    )
    (in_dir / "b.ndjson").write_text(
        "\n".join(json.dumps(r) for r in rows[120:]) + "\n"
    )

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    out: dict[int, tuple[int, float]] = {}

    def _sink(batch_df, batch_id):
        for r in batch_df.collect():
            out[r.user_id] = (r.total_events, r.total_value)

    listener = ThroughputListener()
    spark.streams.addListener(listener)
    try:
        q = (
            running_entity_totals(stream)
            .writeStream.outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .foreachBatch(_sink)
            .trigger(availableNow=True)
            .queryName("stateful_totals")
            .start()
        )
        q.awaitTermination()
        # listener events are async — give queued progress events a
        # moment to land before detaching
        import time

        deadline = time.time() + 10
        while time.time() < deadline and sum(listener.totals.values()) < 200:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)

    batch = (
        spark.read.schema("user_id long, value double")
        .json(str(in_dir))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    )
    expected = {r.user_id: (r.n, r.v) for r in batch}
    assert out == expected
    assert sum(listener.totals.values()) >= 200
