"""Structured Streaming wrapper (SURVEY.md §2.4 W1-W7, §3.1, §7 M3).

The reference runs one Trill dataflow with five egress observables
persisting to RocksDB (Program.SaveAggregates.cs:61-107). Here each
aggregate family is a streaming query over the same parsed stream:

* counts / hopping_counts: streaming windowed count, watermark 5 s
  (DisOrderTicks, Query.cs:14), APPEND mode — a window emits exactly
  once, when the watermark passes its end: the Spark equivalent of
  Trill's CoalesceEndEdges interval emission (W7).
* mentions / hashtags / retweets: stage-1 per-entity windowed aggregate
  is the streaming part; the cross-entity top-k (A6) + array dedupe (D3)
  is a batch rank inside foreachBatch — Spark forbids chained streaming
  aggregations (SURVEY §4.3), and append mode guarantees every group of
  a window arrives in the same micro-batch, so the per-window rank is
  complete.

Late-data semantics: Spark DROPS rows later than the watermark; Trill's
DisorderPolicy.Adjust CLAMPS timestamps forward (Query.cs:29). Drop is
the documented default (SURVEY §7); operators.window.clamp_late gives
the Trill behavior inside foreachBatch if byte-parity is required.

State scale: hopping windows put each event in 10 windows (W4); the 5 s
watermark keeps only ~the open window frontier in the state store. For
large entity cardinality switch the state store to RocksDB
(spark.sql.streaming.stateStore.providerClass) — a neat symmetry with
the reference's own store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tweetaggregates_spark.operators.aggregate import (
    NUMBER_OF_AGGREGATES_PER_WINDOW,
    NUMBER_OF_EXAMPLES,
    entity_window_agg,
    top_entities_per_window,
)
from tweetaggregates_spark.operators.project import explode_entities, retweets_only
from tweetaggregates_spark.plans.tweets import (
    HOP_SIZE,
    WINDOW_SIZE,
    _dedupe_and_shape,
    _tweet_payload,
    parse_tweets,
)
from tweetaggregates_spark.store import AggregateStore

DISORDER_TOLERANCE = "5 seconds"  # Query.cs:14


def _write_family(store: AggregateStore, family: str):
    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            store.write(family, batch_df, mode="append")

    return _sink


def _rank_and_write(store: AggregateStore, family: str, entity_name: str):
    """Stage 2 inside foreachBatch: A6 top-k per window + D3 dedupe."""

    def _sink(stage1: DataFrame, batch_id: int) -> None:
        if stage1.isEmpty():
            return
        top = top_entities_per_window(
            stage1, k=NUMBER_OF_AGGREGATES_PER_WINDOW, tiebreak="entity"
        ).drop("rank")
        store.write(family, _dedupe_and_shape(top, entity_name), mode="append")

    return _sink


def run_streaming_aggregates(
    spark: SparkSession,
    input_path: str,
    store_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> list:
    """Run the full five-family pipeline over a stream of NDJSON files.

    available_now=True drains existing files and stops (deterministic
    replay / tests); False runs continuously (micro-batch). Returns the
    list of StreamingQuery handles (already awaited if available_now)."""
    store = AggregateStore(spark, store_dir)

    def _source() -> DataFrame:
        reader = spark.readStream
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        lines = reader.text(input_path)
        return parse_tweets(lines).withWatermark("ts", DISORDER_TOLERANCE)

    queries = []

    def _start(df: DataFrame, name: str, sink) -> None:
        writer = (
            df.writeStream.queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(checkpoint_dir, name))
            .foreachBatch(sink)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        queries.append(writer.start())

    flat = _source()
    # counts families: pure streaming windowed count (append mode emits
    # a window once, after the watermark passes its end)
    counts = (
        flat.groupBy(F.window("ts", WINDOW_SIZE).alias("window"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("window.end").alias("window_time"), "cnt")
    )
    _start(counts, "counts", _write_family(store, "counts"))

    hop_counts = (
        _source()
        .groupBy(F.window("ts", WINDOW_SIZE, HOP_SIZE).alias("window"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("window.end").alias("window_time"), "cnt")
    )
    _start(hop_counts, "hopping_counts", _write_family(store, "hopping_counts"))

    # entity families: streaming stage-1 agg + batch stage-2 in foreachBatch
    for family, array_col, entity_name in (
        ("mentions", "mentions", "screen_name"),
        ("hashtags", "hashtags", "hashtag"),
    ):
        exploded = explode_entities(_source(), array_col, "entity")
        stage1 = entity_window_agg(
            exploded,
            "entity",
            "follower_count",
            payload_cols=_tweet_payload(),
            size=WINDOW_SIZE,
            slide=HOP_SIZE,
            k_examples=NUMBER_OF_EXAMPLES,
        )
        _start(stage1, family, _rank_and_write(store, family, entity_name))

    rts = retweets_only(_source())
    rt_stage1 = rts.groupBy(
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

    def _rt_sink(stage1_df: DataFrame, batch_id: int) -> None:
        if stage1_df.isEmpty():
            return
        top = top_entities_per_window(
            stage1_df, k=NUMBER_OF_AGGREGATES_PER_WINDOW, tiebreak="entity"
        ).drop("rank")
        shaped = top.select(
            "window_time",
            F.col("entity").alias("id"),
            "text",
            "tweet_count",
            "follower_count_sum",
            F.transform("top_user_payloads", lambda x: x["screen_name"]).alias(
                "top_users"
            ),
        )
        store.write("retweets", shaped, mode="append")

    _start(rt_stage1, "retweets", _rt_sink)

    if available_now:
        for q in queries:
            q.awaitTermination()
    return queries
