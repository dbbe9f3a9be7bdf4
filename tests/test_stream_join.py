"""Stream-stream interval join: the streamed click→purchase attribution
must equal the batch join exactly once drained (watermarks bound state,
never change inner-join results)."""

from __future__ import annotations

import datetime
import json
import random

from tweetaggregates_spark.streaming.joins import (
    batch_click_purchase_join,
    stream_click_purchase_join,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)


def _make_events(n=600, seed=11):
    rng = random.Random(seed)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        rows.append(
            {
                "event_id": i,
                "ts": (
                    base + datetime.timedelta(seconds=rng.randrange(0, 3600))
                ).isoformat(sep=" "),
                "user_id": rng.randrange(0, 25),
                "event_type": rng.choice(["click", "purchase", "view"]),
                "value": round(rng.random() * 10, 3),
            }
        )
    return rows


def test_stream_join_matches_batch(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = _make_events()
    # two files so the drain spans micro-batches; ordered mtimes keep
    # the file-source batch order deterministic
    import os

    for fi, chunk in enumerate((rows[:300], rows[300:])):
        p = in_dir / f"{fi}.ndjson"
        p.write_text("\n".join(json.dumps(r) for r in chunk))
        os.utime(p, (1700000000 + fi, 1700000000 + fi))

    got = []

    def _sink(batch_df, _):
        got.extend(tuple(r) for r in batch_df.collect())

    q = (
        stream_click_purchase_join(spark, str(in_dir))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    events = spark.createDataFrame(
        [
            (
                r["event_id"],
                datetime.datetime.fromisoformat(r["ts"]),
                r["user_id"],
                r["event_type"],
                r["value"],
            )
            for r in rows
        ],
        EVENT_SCHEMA,
    )
    want = {tuple(r) for r in batch_click_purchase_join(events).collect()}
    assert len(want) > 0
    assert set(got) == want and len(got) == len(want)
