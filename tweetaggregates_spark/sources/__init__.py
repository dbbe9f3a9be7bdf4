from tweetaggregates_spark.sources.tables import load_table, load_tables
from tweetaggregates_spark.sources.tweets import (
    read_tweets_batch,
    read_tweets_stream,
    write_tweets_ndjson,
)

__all__ = [
    "load_table",
    "load_tables",
    "read_tweets_batch",
    "read_tweets_stream",
    "write_tweets_ndjson",
]
