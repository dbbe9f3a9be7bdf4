"""S8 parity: Event Hubs-shaped egress (Program.SendToEventHub.cs)
driven against the broker-free file sink."""

from __future__ import annotations

from tests.fixtures import make_tweets, write_tweets_file
from tweetaggregates_spark.streaming.eventsink import (
    FileEventSink,
    decode_frame,
    frame_lines,
    send_to_event_sink,
)


def test_framing_roundtrip_and_bounds(spark):
    lines = make_tweets(300, seed=29)
    df = spark.createDataFrame([(ln,) for ln in lines], ["value"]).coalesce(1)
    frames = frame_lines(df, max_frame_bytes=4096, gzip_compress=True).collect()
    assert len(frames) > 1
    # every frame respects the size bound pre-compression (one line of
    # slack, exactly like the reference's flush-after-append)
    decoded = []
    for fr in frames:
        ls = decode_frame(bytes(fr.payload), gzip_compressed=True)
        decoded.extend(ls)
        raw = sum(len(ln) + 1 for ln in ls)
        assert raw <= 4096 + max(len(ln) + 1 for ln in lines)
        assert fr.n_lines == len(ls)
    assert decoded == lines  # order-preserving, lossless
    # round-robin partition keys
    assert {f.partition_key for f in frames} == set(
        range(min(8, len(frames)))
    )


def test_send_to_event_sink_file_stub(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    n = write_tweets_file(str(in_dir / "t.ndjson"), 500, seed=31)
    sink = FileEventSink(str(tmp_path / "frames"))
    send_to_event_sink(
        spark,
        str(in_dir),
        sink,
        str(tmp_path / "ckpt"),
        max_frame_bytes=8192,
    )
    frames = sink.read_frames(spark).collect()
    assert len(frames) > 1
    total = 0
    for fr in frames:
        ls = decode_frame(bytes(fr.payload))
        assert len(ls) == fr.n_lines
        total += len(ls)
    assert total == n  # every ingested line delivered exactly once


def test_send_bounded_by_minutes(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    write_tweets_file(str(in_dir / "t.ndjson"), 400, seed=37)
    sink = FileEventSink(str(tmp_path / "frames10"))
    send_to_event_sink(
        spark, str(in_dir), sink, str(tmp_path / "ckpt10"), minutes=10
    )
    import json

    frames = sink.read_frames(spark).collect()
    ts = [
        int(json.loads(ln)["timestamp_ms"])
        for fr in frames
        for ln in decode_frame(bytes(fr.payload))
        if "timestamp_ms" in json.loads(ln)
    ]
    assert ts and max(ts) - min(ts) < 10 * 60 * 1000
