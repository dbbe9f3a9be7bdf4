"""Session windows in Structured Streaming: the session_window
aggregation with a watermark must reproduce the batch session result
for every session the watermark closed (same parity contract as the
hopping families)."""

from __future__ import annotations

import datetime
import json

from pyspark.sql import functions as F


def test_streaming_sessions_match_batch(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for u in range(4):
        t = base + datetime.timedelta(minutes=u)
        for i in range(30):
            # gaps alternate: mostly short (same session), sometimes > gap
            t += datetime.timedelta(minutes=3 if i % 7 else 45)
            rows.append({"user_id": u, "ts": t.isoformat(sep=" "), "value": float(i)})
    (in_dir / "a.ndjson").write_text("\n".join(json.dumps(r) for r in rows))

    schema = "user_id long, ts timestamp, value double"
    out = []

    def _sink(batch_df, _):
        out.extend(batch_df.collect())

    q = (
        spark.readStream.schema(schema)
        .json(str(in_dir))
        .withWatermark("ts", "5 seconds")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("s"),
            F.col("w.end").alias("e"),
            "n",
        )
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch_df = (
        spark.read.schema(schema)
        .json(str(in_dir))
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("s"),
            F.col("w.end").alias("e"),
            "n",
        )
    )
    max_ts = (
        spark.read.schema(schema).json(str(in_dir)).agg(F.max("ts")).collect()[0][0]
    )
    threshold = max_ts - datetime.timedelta(seconds=5)
    closed = {
        (r.user_id, r.s, r.e, r.n)
        for r in batch_df.filter(F.col("e") <= F.lit(threshold)).collect()
    }
    streamed = {(r.user_id, r.s, r.e, r.n) for r in out}
    assert closed == streamed
    assert closed  # non-vacuous: sessions actually closed
