"""Tweet sources/sinks (SURVEY.md §2.1 S1-S6).

The reference's HTTP source (TwitterStream.cs:207-262) is retired API;
the engine ingests newline-delimited JSON from files (the reference's own
offline replay loop, Program.SaveAggregates.cs:31-39) — batch and
streaming share the parse function, which is the idiomatic-Spark shape:
one DataFrame->DataFrame pipeline applied to either ``read`` or
``readStream``.

Backpressure (S2) and line framing (S3) are engine-provided: the ``text``
source is line-framed, and micro-batch admission (``maxFilesPerTrigger``)
replaces the reference's Pipe FlushAsync blocking (TwitterStream.cs:125).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_tweets_batch(spark: SparkSession, path: str) -> DataFrame:
    """S5 file replay, batch: NDJSON lines -> one string column ``value``."""
    return spark.read.text(path)


def read_tweets_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """S1/S2/S3 replacement: streaming line source with admission control."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.text(path)


def read_tweets_socket(spark: SparkSession, host: str, port: int) -> DataFrame:
    """S1 live-stream shape: a TCP line source (``socket``). The
    reference's HTTP source is one long-lived connection delivering
    newline-delimited JSON (TwitterStream.cs:207-262) — byte-identical
    wire format to this source, so everything downstream (parse,
    watermark, five-family foreachBatch) is shared with file replay.
    Spark's socket source has no offset replay (at-most-once on
    reconnect); a production live feed terminates into Kafka/Event Hubs
    first (streaming/eventsink.py) and the engine consumes that."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def write_tweets_ndjson(df: DataFrame, path: str) -> None:
    """S6 ``saveTweets`` equivalent: persist raw NDJSON lines."""
    df.write.mode("overwrite").text(path)


def read_tweets_rate(
    spark: SparkSession,
    rows_per_second: int = 1000,
    n_users: int = 100,
    n_tags: int = 50,
) -> DataFrame:
    """Synthetic sustained-rate tweet source built on Spark's ``rate``
    source: each generated row becomes one deterministic NDJSON tweet
    line (same ``value`` column contract as the file/socket sources, so
    the whole five-family pipeline runs unchanged on top). This is the
    load generator for fixed-cadence soak runs — rows/s is a source
    OPTION, event time is the rate source's own timestamp (so
    watermarks and window finalization behave exactly as with real
    arrivals), and everything derives from ``value`` (no randomness:
    replays are byte-identical).

    Tweet shape mirrors tests/fixtures.make_tweets: zipf-ish entity
    skew via modular stripes, ~30% retweets, one mention + 0-2 hashtags
    per tweet."""
    from pyspark.sql import functions as F

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    v = F.col("value")
    # zipf-ish: low ids get big stripes (user 0 ~ 1/4 of traffic)
    user = F.pmod(F.pmod(v * 2654435761, F.lit(1 << 31)), F.lit(4 * n_users))
    user = F.when(user < 2 * n_users, F.pmod(user, F.lit(10))).otherwise(
        F.pmod(user, F.lit(n_users))
    )
    tag = F.pmod(v * 40503, F.lit(n_tags))
    tweet = F.struct(
        (F.lit(20_000_000) + v).alias("id"),
        F.concat(
            F.lit("rate tweet "),
            v.cast("string"),
            F.lit(" #tag"),
            tag.cast("string"),
        ).alias("text"),
        F.lit("en").alias("lang"),
        (F.unix_millis(F.col("timestamp"))).cast("string").alias(
            "timestamp_ms"
        ),
        F.struct(
            F.concat(F.lit("user_"), user.cast("string")).alias(
                "screen_name"
            ),
            (F.pmod(v * 37, F.lit(5000)) + 1).alias("followers_count"),
        ).alias("user"),
        F.struct(
            F.array(
                F.struct(
                    F.concat(F.lit("tag"), tag.cast("string")).alias("text")
                )
            ).alias("hashtags"),
            F.array(
                F.struct(
                    F.concat(
                        F.lit("user_"),
                        F.pmod(v * 17, F.lit(n_users)).cast("string"),
                    ).alias("screen_name")
                )
            ).alias("user_mentions"),
        ).alias("entities"),
        F.when(
            F.pmod(v, F.lit(10)) < 3,
            F.struct((F.lit(1000) + F.pmod(v, F.lit(30))).alias("id")),
        ).alias("retweeted_status"),
    )
    return rate.select(F.to_json(tweet).alias("value"))
