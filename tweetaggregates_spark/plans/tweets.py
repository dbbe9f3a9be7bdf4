"""The reference's full query DAG (Query.SimpleAggregate, Query.cs:21-149)
as a batch/streaming-shared DataFrame pipeline.

Input: a DataFrame of NDJSON lines (column ``value``) or pre-parsed
RAW_TWEET rows. Output: the five aggregate families of
AggregatePayloads.cs:51-58 with the FIXTURES.md §3 schemas.

The reference ``Multicast``s one upstream into 4 consumers
(Query.cs:42,55); here the flattened DataFrame is a shared subplan —
in batch, callers may ``.persist()`` it; in streaming, ``foreachBatch``
computes all five outputs from one cached micro-batch
(streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tweetaggregates_spark.operators.aggregate import (
    NUMBER_OF_AGGREGATES_PER_WINDOW,
    NUMBER_OF_EXAMPLES,
    entity_window_agg,
    top_entities_per_window,
)
from tweetaggregates_spark.operators.project import (
    RETWEET_SENTINEL,
    explode_entities,
    flatten_tweets,
    retweets_only,
)
from tweetaggregates_spark.operators.topk import dedupe_array_keep_first
from tweetaggregates_spark.operators.window import windowed_count
from tweetaggregates_spark.schema import RAW_TWEET

WINDOW_SIZE = "10 minutes"  # Query.cs:12
HOP_SIZE = "1 minute"  # Query.cs:13


def parse_tweets(lines: DataFrame, column: str = "value") -> DataFrame:
    """S4 (Program.SaveAggregates.cs:72-76): NDJSON line -> typed row ->
    canonical flat schema; unparseable / timestamp-less rows drop."""
    raw = lines.select(
        F.from_json(F.col(column), RAW_TWEET).alias("t")
    ).select("t.*")
    return flatten_tweets(raw)


def _tweet_payload() -> list[Column]:
    """TweetDescription payload (AggregatePayloads.cs:5-13); first payload
    field after the weight is the unique tweet id => deterministic struct
    sort."""
    return [
        F.col("id"),
        F.col("text"),
        F.col("screen_name"),
        F.col("original_tweet_id"),
    ]


def _dedupe_and_shape(top: DataFrame, entity_name: str) -> DataFrame:
    """D3 (Query.cs:82-83,115-116): within top_payloads dedupe by
    effective tweet id (original if retweet else own id), keep the
    max-follower-count element; then shape to the output schema."""
    effective_id = lambda x: F.when(  # noqa: E731
        x["original_tweet_id"] == RETWEET_SENTINEL, x["id"]
    ).otherwise(x["original_tweet_id"])
    deduped = top.withColumn(
        "top_payloads", dedupe_array_keep_first(F.col("top_payloads"), effective_id)
    )
    return deduped.select(
        "window_time",
        F.col("entity").alias(entity_name),
        "tweet_count",
        "follower_count_sum",
        F.transform(
            "top_payloads",
            lambda x: F.struct(
                x["id"].alias("id"),
                x["w"].alias("follower_count"),
                x["text"].alias("text"),
                x["screen_name"].alias("screen_name"),
                x["original_tweet_id"].alias("original_tweet_id"),
            ),
        ).alias("top_tweets"),
    )


def tumbling_counts(flat: DataFrame) -> DataFrame:
    """TumblingCounts (Query.cs:45-50)."""
    return windowed_count(flat, "ts", WINDOW_SIZE, None, "cnt")


def hopping_counts(flat: DataFrame) -> DataFrame:
    """HoppingCounts (Query.cs:142-146)."""
    return windowed_count(flat, "ts", WINDOW_SIZE, HOP_SIZE, "cnt")


def top_entities(flat: DataFrame, array_col: str, entity_name: str) -> DataFrame:
    """TopMentions / TopHashTags (Query.cs:58-119): explode the entity
    array (P5/P7), per (hopping window x entity) fuse count + follower
    sum + top-10 example tweets (A2/A3/A5), keep top-10 entities per
    window (A6), dedupe example arrays (D3)."""
    exploded = explode_entities(flat, array_col, "entity")
    stage1 = entity_window_agg(
        exploded,
        "entity",
        "follower_count",
        payload_cols=_tweet_payload(),
        size=WINDOW_SIZE,
        slide=HOP_SIZE,
        k_examples=NUMBER_OF_EXAMPLES,
    )
    top = top_entities_per_window(
        stage1, k=NUMBER_OF_AGGREGATES_PER_WINDOW, tiebreak="entity"
    ).drop("rank")
    return _dedupe_and_shape(top, entity_name)


def top_retweets(flat: DataFrame) -> DataFrame:
    """TopRetweets (Query.cs:122-140): retweets keyed by original tweet
    id; representative text = Max(Text) (Query.cs:127); top users = the
    top-10 retweeters' screen names (Query.cs:130,137)."""
    rts = retweets_only(flat)
    stage1 = rts.groupBy(
        F.window("ts", WINDOW_SIZE, HOP_SIZE).alias("window"),
        F.col("original_tweet_id").alias("entity"),
    ).agg(
        F.max("text").alias("text"),
        F.count(F.lit(1)).alias("tweet_count"),
        F.sum("follower_count").alias("follower_count_sum"),
        F.slice(
            F.sort_array(
                F.collect_list(F.struct("follower_count", "id", "screen_name")),
                asc=False,
            ),
            1,
            NUMBER_OF_EXAMPLES,
        ).alias("top_user_payloads"),
    )
    top = top_entities_per_window(
        stage1, k=NUMBER_OF_AGGREGATES_PER_WINDOW, tiebreak="entity"
    ).drop("rank")
    return top.select(
        "window_time",
        F.col("entity").alias("id"),
        "text",
        "tweet_count",
        "follower_count_sum",
        F.transform("top_user_payloads", lambda x: x["screen_name"]).alias(
            "top_users"
        ),
    )


def tweet_aggregates(flat: DataFrame) -> dict[str, DataFrame]:
    """The full AggregateObservables bundle (AggregatePayloads.cs:51-58)."""
    return {
        "counts": tumbling_counts(flat),
        "hopping_counts": hopping_counts(flat),
        "mentions": top_entities(flat, "mentions", "screen_name"),
        "hashtags": top_entities(flat, "hashtags", "hashtag"),
        "retweets": top_retweets(flat),
    }
