"""Projections / filters / flatten (SURVEY.md §2.2 P1-P9).

The reference's first operator flattens the nested ``RawTweet`` to the
canonical working record (Query.cs:32-41); everything here is a pure
Column expression so Catalyst pushes the projection and the filters into
the parquet/json scan (nested-schema pruning included).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RETWEET_SENTINEL = -1  # Query.cs:37


def tweet_text() -> Column:
    """P2: 3-way coalesce (GetText, Query.cs:171-184) —
    extended_tweet.full_text ?? retweeted_status.extended_tweet.full_text
    ?? text."""
    return F.coalesce(
        F.col("extended_tweet.full_text"),
        F.col("retweeted_status.extended_tweet.full_text"),
        F.col("text"),
    )


def event_time() -> Column:
    """F1: epoch-ms string -> timestamp (RawTweet.cs:23-37)."""
    return F.timestamp_millis(F.col("timestamp_ms").cast("long"))


def flatten_tweets(raw: DataFrame) -> DataFrame:
    """P1+P2+P3+P4 (Query.cs:32-41 + Program.SaveAggregates.cs:74):
    nested RawTweet rows -> the canonical FLAT_TWEET schema, invalid /
    timestamp-less rows dropped.

    ``entities.hashtags.text`` uses struct-array field extraction — one
    columnar projection, no explode (P7 happens later, per consumer).
    """
    return raw.select(
        F.col("id"),
        event_time().alias("ts"),
        tweet_text().alias("text"),
        F.col("user.screen_name").alias("screen_name"),
        F.coalesce(F.col("user.followers_count"), F.lit(0)).alias("follower_count"),
        F.coalesce(F.col("entities.hashtags.text"), F.array()).alias("hashtags"),
        F.coalesce(
            F.col("entities.user_mentions.screen_name"), F.array()
        ).alias("mentions"),
        # P3: null -> -1 sentinel (Query.cs:37)
        F.coalesce(F.col("retweeted_status.id"), F.lit(RETWEET_SENTINEL)).alias(
            "original_tweet_id"
        ),
    ).filter(F.col("id").isNotNull() & F.col("ts").isNotNull() & (F.col("ts") > F.lit("1970-01-01 00:00:00").cast("timestamp")))


def explode_entities(flat: DataFrame, array_col: str, entity_name: str) -> DataFrame:
    """P5+P7: one row per (tweet, entity); rows with empty arrays drop
    (Query.cs:59-60 mentions, 92-93 hashtags). ``explode`` already skips
    empty arrays, matching the Length>0 guard."""
    return flat.select("*", F.explode(array_col).alias(entity_name)).drop(array_col)


def retweets_only(flat: DataFrame) -> DataFrame:
    """P6+P8: retweet stream keyed by original tweet id (Query.cs:123-124)."""
    return flat.filter(F.col("original_tweet_id") != RETWEET_SENTINEL)
