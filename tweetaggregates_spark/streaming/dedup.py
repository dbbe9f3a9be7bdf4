"""Streaming ingest deduplication: collapse upstream redeliveries.

The reference's byte pump (S2) is at-least-once — a reconnect replays
the tail of the feed (TweetGateCore/RestartableByteSource semantics).
Downstream-of-source dedup turns that into effectively-once:
``dropDuplicatesWithinWatermark`` keeps per-key state only within the
watermark horizon, so state is bounded by (throughput x watermark), not
by stream length — the requirement for an unbounded feed. Duplicates
separated by more than the watermark fall to the sink's idempotence
(the batch-keyed overwrite in streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tweetaggregates_spark.streaming.joins import EVENT_SCHEMA


def dedup_events_stream(
    spark: SparkSession, in_dir: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Events NDJSON stream with redeliveries collapsed on event_id.
    Returns the unstarted streaming DataFrame."""
    events = (
        spark.readStream.schema(EVENT_SCHEMA)
        .json(in_dir)
        .withWatermark("ts", watermark)
    )
    return events.dropDuplicatesWithinWatermark(["event_id"])
