"""Schemas (SURVEY.md §1).

RAW_TWEET: the reference's only input schema (RawTweet,
TweetGateCore/Serialization/RawTweet.cs:6-60) expressed as a Spark
StructType for ``from_json`` schema-on-read — unknown JSON fields drop,
missing fields become NULL, exactly the Newtonsoft semantics the
reference relies on (Program.SaveAggregates.cs:73).

FLAT_TWEET: the canonical internal schema — the reference's first
projection (Query.cs:32-41) flattened to columns.

Aggregate output schemas mirror AggregatePayloads.cs:5-58.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# retweeted_status is recursive in the reference (RawTweet.cs:19) but only
# depth 1 is ever read (Query.cs:37,178-181) — truncate to one level.
_EXTENDED_TWEET = StructType([StructField("full_text", StringType())])

_USER = StructType(
    [
        StructField("screen_name", StringType()),
        StructField("followers_count", LongType()),
    ]
)

_ENTITIES = StructType(
    [
        StructField(
            "hashtags",
            ArrayType(StructType([StructField("text", StringType())])),
        ),
        StructField(
            "user_mentions",
            ArrayType(StructType([StructField("screen_name", StringType())])),
        ),
    ]
)

_RETWEETED_STATUS = StructType(
    [
        StructField("id", LongType()),
        StructField("extended_tweet", _EXTENDED_TWEET),
        StructField("user", _USER),
    ]
)

RAW_TWEET = StructType(
    [
        StructField("id", LongType()),
        StructField("in_reply_to_status_id", LongType()),
        StructField("text", StringType()),
        StructField("extended_tweet", _EXTENDED_TWEET),
        StructField("entities", _ENTITIES),
        StructField("lang", StringType()),
        StructField("timestamp_ms", StringType()),
        StructField("retweeted_status", _RETWEETED_STATUS),
        StructField("user", _USER),
    ]
)

# Canonical flattened working schema (Query.cs:32-41).
FLAT_TWEET = StructType(
    [
        StructField("id", LongType()),
        StructField("ts", TimestampType()),
        StructField("text", StringType()),
        StructField("screen_name", StringType()),
        StructField("follower_count", LongType()),
        StructField("hashtags", ArrayType(StringType())),
        StructField("mentions", ArrayType(StringType())),
        StructField("original_tweet_id", LongType()),  # -1 sentinel (Query.cs:37)
    ]
)

# TweetDescription (AggregatePayloads.cs:5-13) — elements of top_tweets.
TWEET_DESCRIPTION = StructType(
    [
        StructField("follower_count", LongType()),
        StructField("id", LongType()),
        StructField("text", StringType()),
        StructField("screen_name", StringType()),
        StructField("original_tweet_id", LongType()),
    ]
)

COUNTS = StructType(
    [
        StructField("window_time", TimestampType()),
        StructField("count", LongType()),
    ]
)

AGGREGATE_FAMILIES = ("counts", "hopping_counts", "mentions", "hashtags", "retweets")
