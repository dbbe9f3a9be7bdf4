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
