"""Stream-stream joins: watermark-bounded interval join for
click-to-purchase attribution.

The reference's dataflow has no stream-stream join (its four consumers
are independent aggregations — TweetGateCore/Query.cs); this closes the
gap with the Structured Streaming native capability: two watermarked
streams joined on an equality key plus an event-time interval. The
watermark + the interval bound together let Spark EXPIRE buffered rows
(a click older than watermark - attribution window can never match a
future purchase), so join state is bounded by throughput x window, not
by stream length — the property that matters on an unbounded 100 TB/day
feed.

Both sides read from ONE source stream and filter — at the micro-batch
level Spark plans a self-join of the batch with itself, and the file
source lists each file once per side per batch (bounded); with a Kafka
source each side tracks its own offsets on the shared topic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)


def _attribution_join(
    clicks: DataFrame, purchases: DataFrame, attribution_window: str
) -> DataFrame:
    """Inner interval join: each purchase matched to every click by the
    same user in the preceding ``attribution_window``. Shared between
    the streaming plan and its batch-parity twin."""
    return purchases.join(
        clicks,
        F.expr(
            "p_user_id = c_user_id AND "
            "p_ts >= click_ts AND "
            f"p_ts <= click_ts + INTERVAL {attribution_window}"
        ),
    ).select(
        F.col("purchase_id"),
        F.col("p_user_id").alias("user_id"),
        F.col("p_ts"),
        F.col("click_id"),
        F.col("click_ts"),
        (
            F.col("p_ts").cast("long") - F.col("click_ts").cast("long")
        ).alias("gap_s"),
    )


def _sides(events: DataFrame, watermark: str) -> tuple[DataFrame, DataFrame]:
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    return clicks, purchases


def stream_click_purchase_join(
    spark: SparkSession,
    in_dir: str,
    attribution_window: str = "10 minutes",
    watermark: str = "5 seconds",
) -> DataFrame:
    """Streaming click→purchase attribution over an events NDJSON drop
    dir. Returns the unstarted streaming DataFrame; callers attach the
    sink (tests drain with availableNow + foreachBatch)."""
    events = spark.readStream.schema(EVENT_SCHEMA).json(in_dir)
    clicks, purchases = _sides(events, watermark)
    return _attribution_join(clicks, purchases, attribution_window)


def batch_click_purchase_join(
    events: DataFrame, attribution_window: str = "10 minutes"
) -> DataFrame:
    """Batch twin of ``stream_click_purchase_join`` on an events
    DataFrame — the parity oracle for the streaming test (watermarks
    don't change inner-join RESULTS, only state retention, so a full
    drain must equal this exactly)."""
    clicks, purchases = _sides(events, "0 seconds")
    # withWatermark is a no-op in batch plans; reuse the same builder
    return _attribution_join(clicks, purchases, attribution_window)
