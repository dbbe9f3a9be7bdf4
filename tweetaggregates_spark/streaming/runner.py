"""Shared foreachBatch ingest runner.

Every incremental-index ingest in this package (near-dup band index,
exact-dup hash index, IVF append, RP sketch) is the same Structured
Streaming shape: an NDJSON drop-dir source with optional
``maxFilesPerTrigger`` admission control (the backpressure stand-in
for the reference's byte pump, TweetGateCore semantics), a
``foreachBatch`` body that owns the per-trigger index fold/append,
and a checkpointed writer run either as a drain-everything batch
(``availableNow``) or as a live continuous query. The bodies differ;
the plumbing is this one function."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession


def run_foreach_batch(
    spark: SparkSession,
    in_dir: str,
    schema: str,
    process: Callable,
    checkpoint: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start (and, when ``available_now``, drain) the standard ingest
    query: ``readStream.schema(schema).json(in_dir)`` →
    ``foreachBatch(process)``. Returns the StreamingQuery."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    writer = (
        reader.json(in_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
