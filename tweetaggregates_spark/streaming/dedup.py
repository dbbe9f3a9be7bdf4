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


# -- streaming NEAR-dup ingest over the persisted band index ----------------

DOC_SCHEMA = "doc_id BIGINT, text STRING"
_INDEX_SCHEMA = (
    "doc_id BIGINT, band_id INT, band_key STRING, cluster BIGINT"
)


def _latest_index_version(spark: SparkSession, index_path: str, below: int):
    import os
    import re

    if not os.path.isdir(index_path):
        return None
    vs = [
        int(m.group(1))
        for name in os.listdir(index_path)
        if (m := re.fullmatch(r"v=(\d+)", name))
    ]
    vs = [v for v in vs if v < below]
    return max(vs) if vs else None


def run_streaming_near_dedup(
    spark: SparkSession,
    in_dir: str,
    index_path: str,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    max_bucket_size: int | None = None,
):
    """Content NEAR-dup dedup on an ingest stream: each micro-batch of
    documents is deduped against the accumulated corpus via the
    persisted MinHash band index (operators/dedup.dedup_new_batch),
    never recomputing prior batches — the production training-data
    ingest shape (batch analog: build_band_index; the reference's
    incremental-persist analog is RocksDBStore.cs:70-135).

    foreachBatch per trigger: load the latest index version BELOW this
    batch id (replay-safe: a redelivered batch re-reads the same
    pre-batch index and overwrites the same outputs — exactly-once
    downstream), run the delta-graph dedup, write the updated index to
    ``index_path/v=<batch_id>`` and the batch's assignments (doc_id,
    cluster, is_duplicate) to ``out_path/batch_id=<batch_id>``.
    Batching-invariance of the underlying operator makes the final
    index EQUAL to a one-shot build over everything ingested,
    regardless of how the stream chopped it into triggers (pinned in
    tests/test_stream_near_dedup.py). Old index versions are retention
    state — prune all but the last few like any checkpoint dir.

    ``max_bucket_size`` enables the hot-band guard (the long-running
    ingest is exactly where a boilerplate band's bucket grows without
    bound): pair discovery runs through ``dedup_new_batch_capped`` and
    each trigger's oversized buckets land at
    ``<out_path>_quarantine/batch_id=<batch_id>`` (a SIBLING dir — a
    key=value-only tree keeps partition discovery over ``out_path``
    intact) for exact-dedup handling/audit."""
    from tweetaggregates_spark.operators.dedup import (
        dedup_new_batch,
        dedup_new_batch_capped,
    )

    def _process(batch_df, batch_id: int) -> None:
        v = _latest_index_version(spark, index_path, below=batch_id)
        if v is None:
            index = spark.createDataFrame([], _INDEX_SCHEMA)
        else:
            index = spark.read.parquet(f"{index_path}/v={v}")
        if max_bucket_size is None:
            assignments, updated = dedup_new_batch(batch_df, index)
            quarantine = None
        else:
            assignments, updated, quarantine = dedup_new_batch_capped(
                batch_df, index, max_bucket_size=max_bucket_size
            )
        # materialize assignments BEFORE the index write so both see
        # one consistent CC labeling (the CC loop checkpoints, but the
        # two outputs must not recompute the batch pipeline twice)
        assignments = assignments.localCheckpoint(eager=True)
        updated.write.mode("overwrite").parquet(f"{index_path}/v={batch_id}")
        assignments.write.mode("overwrite").parquet(
            f"{out_path}/batch_id={batch_id}"
        )
        if quarantine is not None:
            quarantine.write.mode("overwrite").parquet(
                f"{out_path}_quarantine/batch_id={batch_id}"
            )

    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.json(in_dir)
    writer = (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
