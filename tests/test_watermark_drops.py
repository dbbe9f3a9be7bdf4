"""Late-data accounting: the engine's own watermark-drop counter.

At 100 TB, silently-dropped late rows are an operational incident; the
observability contract is Spark's per-operator
``numRowsDroppedByWatermark`` metric in the streaming progress. This
test replays a stream whose LAST micro-batch is a full hour behind the
watermark and asserts (a) those rows never reach any emitted window and
(b) the drop is VISIBLE in the recorded progress metrics — the signal
a production monitor alerts on.

Two engine subtleties this pins (cost us a debugging session each):
* the late-input filter uses the watermark committed at batch START,
  which trails the emit watermark by one batch — rows only one batch
  late may still be admitted (that is why the late file here arrives
  two batches after its event time);
* the metric counts rows AFTER map-side partial aggregation, so k
  late input rows for one (window, key) surface as one dropped row.
"""

from __future__ import annotations

import datetime
import json
import os
import time

from pyspark.sql import functions as F

BASE = datetime.datetime(2024, 5, 1, 12, 0, 0)


def _line(minutes_offset: float, user: int) -> str:
    ts = BASE + datetime.timedelta(minutes=minutes_offset)
    return json.dumps(
        {"ts": ts.strftime("%Y-%m-%d %H:%M:%S"), "user_id": user}
    )


def test_late_rows_dropped_and_counted(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # batch 0: 60 min of user-1 data  -> watermark lands near minute 60
    # batch 1: fresh user-2 rows      -> watermark now committed
    # batch 2: user-99 rows from minute ~0 — an hour late
    (in_dir / "a.ndjson").write_text(
        "\n".join(_line(i, user=1) for i in range(60)) + "\n"
    )
    (in_dir / "b.ndjson").write_text(
        "\n".join(_line(61 + i, user=2) for i in range(5)) + "\n"
    )
    (in_dir / "c.ndjson").write_text(
        "\n".join(_line(0.5 + i, user=99) for i in range(5)) + "\n"
    )
    # FileStreamSource batches oldest-mtime-first; writes can share an
    # mtime tick, so pin strictly increasing mtimes for a deterministic
    # three-batch order
    now = time.time()
    for i, f in enumerate(("a.ndjson", "b.ndjson", "c.ndjson")):
        os.utime(in_dir / f, (now - 300 + i * 100,) * 2)

    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    agg = (
        stream.withWatermark("ts", "5 seconds")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.end").alias("window_time"), "user_id", "cnt")
    )
    rows: list[tuple] = []

    def _sink(batch_df, batch_id):
        rows.extend(tuple(r) for r in batch_df.collect())

    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = [
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    ]

    users = {r[1] for r in rows}
    assert 99 not in users  # (a) late data never emitted
    assert 1 in users  # on-time data flows normally
    # (b) the drop is observable: >= 1 post-partial-agg row counted
    assert sum(dropped) >= 1
