"""Streaming CMS counters == batch CMS counters on the closed-window
prefix, across a micro-batch boundary (maxFilesPerTrigger=1)."""

from __future__ import annotations

import datetime
import json

from pyspark.sql import functions as F

from tweetaggregates_spark.plans.events import _cms_cells
from tweetaggregates_spark.streaming.sketch import streaming_cms_counters

BASE = datetime.datetime(2024, 3, 1, 0, 0, 0)


def _rows(i: int) -> dict:
    # 40 minutes of events, ~4 tumbling 10-min windows; skewed keys
    ts = BASE + datetime.timedelta(seconds=i * 12)
    return {
        "ts": ts.strftime("%Y-%m-%d %H:%M:%S"),
        "user_id": 999 if i % 4 == 0 else i % 37,
    }


def test_stream_counters_match_batch_closed_prefix(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = [_rows(i) for i in range(200)]
    (in_dir / "a.ndjson").write_text(
        "\n".join(json.dumps(r) for r in rows[:130]) + "\n"
    )
    (in_dir / "b.ndjson").write_text(
        "\n".join(json.dumps(r) for r in rows[130:]) + "\n"
    )
    schema = "ts timestamp, user_id long"

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    got: list[tuple] = []

    def _sink(batch_df, batch_id):
        got.extend(tuple(r) for r in batch_df.collect())

    q = (
        streaming_cms_counters(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert got, "no windows closed — watermark never advanced"

    batch_src = spark.read.schema(schema).json(str(in_dir))
    max_ts = batch_src.agg(F.max("ts")).collect()[0][0]
    threshold = max_ts - datetime.timedelta(seconds=5)
    batch = (
        batch_src.select(
            F.col("ts"),
            F.explode(_cms_cells(F.col("user_id").cast("string"))).alias(
                "cell"
            ),
        )
        .groupBy(
            F.window("ts", "10 minutes").alias("w"),
            F.col("cell.r").alias("r"),
            F.col("cell.c").alias("c"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.end").alias("window_time"), "r", "c", "cnt")
        .filter(F.col("window_time") <= F.lit(threshold))
    )
    expected = sorted(tuple(r) for r in batch.collect())
    streamed_closed = sorted(t for t in got if t[0] <= threshold)
    assert streamed_closed == expected
    # appended rows are emit-once: no duplicate (window, r, c) cells
    keys = [(t[0], t[1], t[2]) for t in got]
    assert len(keys) == len(set(keys))
