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


def test_stream_hll_registers_match_batch_closed_prefix(spark, tmp_path):
    """Streaming HLL register blocks == batch registers on the closed
    prefix, and the emitted registers feed the batch estimator to a
    sane cardinality."""
    from tweetaggregates_spark.functions.hashing import hash64
    from tweetaggregates_spark.plans.events import (
        HLL_M,
        _hll_estimate,
        _hll_rho,
    )
    from tweetaggregates_spark.streaming.sketch import (
        streaming_hll_registers,
    )

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
        streaming_hll_registers(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert got, "no windows closed"

    batch_src = spark.read.schema(schema).json(str(in_dir))
    max_ts = batch_src.agg(F.max("ts")).collect()[0][0]
    threshold = max_ts - datetime.timedelta(seconds=5)
    h = hash64(F.col("user_id").cast("string"))
    batch = (
        batch_src.select(F.col("ts"), h.alias("h"))
        .select(
            "ts",
            F.pmod(F.col("h"), F.lit(HLL_M)).alias("bucket"),
            F.expr(f"h DIV {HLL_M}").alias("w"),
        )
        .withColumn("rho", _hll_rho())
        .groupBy(F.window("ts", "10 minutes").alias("win"), "bucket")
        .agg(F.max("rho").alias("reg"))
        .select(F.col("win.end").alias("window_time"), "bucket", "reg")
        .filter(F.col("window_time") <= F.lit(threshold))
    )
    expected = sorted(tuple(r) for r in batch.collect())
    streamed_closed = sorted(t for t in got if t[0] <= threshold)
    assert streamed_closed == expected
    # register blocks are bounded by HLL_M per window, emit-once
    keys = [(t[0], t[1]) for t in got]
    assert len(keys) == len(set(keys))
    per_window: dict = {}
    for t in got:
        per_window[t[0]] = per_window.get(t[0], 0) + 1
    assert all(n <= HLL_M for n in per_window.values())

    # the streamed registers estimate a plausible distinct count for a
    # window with ~37 distinct keys (HLL at m=256 is accurate here)
    regs = spark.createDataFrame(
        [t for t in got if t[0] <= threshold],
        "window_time timestamp, bucket long, reg integer",
    )
    est = {
        r.window_time: r.n_users_hll
        for r in _hll_estimate(regs, "window_time").collect()
    }
    assert est
    for v in est.values():
        assert 20 <= v <= 60, est
