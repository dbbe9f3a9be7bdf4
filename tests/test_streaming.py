"""Batch/stream parity (SURVEY §5 item 2): the same NDJSON replayed
through Structured Streaming (availableNow) must produce exactly the
batch pipeline's aggregates for every window the watermark closed.

Windows with end > (max event time - tolerance) never close in append
mode — the documented drop/late semantics delta (SURVEY §7) — so parity
is asserted on the closed-window prefix.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.fixtures import make_tweets
from tweetaggregates_spark.plans import tweets as tp
from tweetaggregates_spark.streaming.pipeline import run_streaming_aggregates


@pytest.fixture(scope="module")
def stream_outputs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    in_dir = root / "in"
    in_dir.mkdir()
    (in_dir / "tweets.ndjson").write_text(
        "\n".join(make_tweets(1500, seed=11)) + "\n"
    )
    run_streaming_aggregates(
        spark,
        str(in_dir),
        str(root / "store"),
        str(root / "ckpt"),
        available_now=True,
    )
    flat = tp.parse_tweets(spark.read.text(str(in_dir))).persist()
    max_ts = flat.agg(F.max("ts")).collect()[0][0]
    yield spark, str(root / "store"), flat, max_ts
    flat.unpersist()


def _closed(df, max_ts):
    import datetime

    threshold = max_ts - datetime.timedelta(seconds=5)
    return df.filter(F.col("window_time") <= F.lit(threshold))


def _rows(df, key_cols):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple(str(x) for x in t),
    )


def test_counts_parity(stream_outputs):
    spark, store_dir, flat, max_ts = stream_outputs
    streamed = spark.read.parquet(f"{store_dir}/counts").drop("window_date")
    batch = _closed(tp.tumbling_counts(flat), max_ts)
    assert _rows(streamed, None) == _rows(batch, None)


def test_hopping_counts_parity(stream_outputs):
    spark, store_dir, flat, max_ts = stream_outputs
    streamed = spark.read.parquet(f"{store_dir}/hopping_counts").drop("window_date")
    batch = _closed(tp.hopping_counts(flat), max_ts)
    assert _rows(streamed, None) == _rows(batch, None)


def test_mentions_parity(stream_outputs):
    spark, store_dir, flat, max_ts = stream_outputs
    streamed = (
        spark.read.parquet(f"{store_dir}/mentions")
        .drop("window_date")
        .select("window_time", "screen_name", "tweet_count", "follower_count_sum")
    )
    batch = _closed(
        tp.top_entities(flat, "mentions", "screen_name"), max_ts
    ).select("window_time", "screen_name", "tweet_count", "follower_count_sum")
    assert _rows(streamed, None) == _rows(batch, None)


def test_retweets_parity(stream_outputs):
    spark, store_dir, flat, max_ts = stream_outputs
    streamed = (
        spark.read.parquet(f"{store_dir}/retweets")
        .drop("window_date")
        .select("window_time", "id", "tweet_count", "follower_count_sum")
    )
    batch = _closed(tp.top_retweets(flat), max_ts).select(
        "window_time", "id", "tweet_count", "follower_count_sum"
    )
    assert _rows(streamed, None) == _rows(batch, None)
