"""Stream-static enrichment join: a streaming fact joined to a static
dimension broadcasts the dim into every micro-batch — the standard
enrichment topology (no watermark needed on the static side)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from tweetaggregates_spark.streaming.joins import EVENT_SCHEMA


def test_stream_static_enrichment(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = [
        {
            "event_id": i,
            "ts": f"2024-01-01 00:{i % 60:02d}:00",
            "user_id": i % 10,
            "event_type": "click",
            "value": float(i),
        }
        for i in range(300)
    ]
    for fi in range(2):
        p = in_dir / f"{fi}.ndjson"
        p.write_text(
            "\n".join(json.dumps(r) for r in rows[fi * 150 : (fi + 1) * 150])
        )
        os.utime(p, (1700000000 + fi, 1700000000 + fi))

    dim = spark.createDataFrame(
        [(u, "gold" if u < 3 else "basic") for u in range(10)],
        "user_id long, tier string",
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(in_dir))
    enriched = stream.join(F.broadcast(dim), "user_id", "left")

    got = []

    def _sink(batch_df, _):
        got.extend((r["event_id"], r["tier"]) for r in batch_df.collect())

    q = (
        enriched.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert len(got) == 300
    assert all(
        tier == ("gold" if eid % 10 < 3 else "basic") for eid, tier in got
    )
