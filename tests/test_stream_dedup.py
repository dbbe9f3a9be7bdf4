"""Streaming ingest dedup: redelivered events (same event_id, within
the watermark horizon) must reach the sink exactly once."""

from __future__ import annotations

import json
import os

from tweetaggregates_spark.streaming.dedup import dedup_events_stream


def test_stream_dedup_collapses_redelivery(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    mk = lambda i, s: {  # noqa: E731
        "event_id": i,
        "ts": f"2024-01-01 00:{s:02d}:00",
        "user_id": i % 7,
        "event_type": "click",
        "value": float(i),
    }
    first = [mk(i, i % 50) for i in range(200)]
    # redelivery: the second file replays the tail of the first (ids
    # 150-199) plus new events — the replayed rows must NOT reappear
    second = [mk(i, i % 50) for i in range(150, 300)]
    for fi, chunk in enumerate((first, second)):
        p = in_dir / f"{fi}.ndjson"
        p.write_text("\n".join(json.dumps(r) for r in chunk))
        os.utime(p, (1700000000 + fi, 1700000000 + fi))

    got = []

    def _sink(batch_df, _):
        got.extend(r["event_id"] for r in batch_df.collect())

    q = (
        dedup_events_stream(spark, str(in_dir))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert sorted(got) == list(range(300))  # each id exactly once
