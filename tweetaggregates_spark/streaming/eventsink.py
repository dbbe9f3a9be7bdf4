"""S8: Event Hubs-shaped egress (Program.SendToEventHub.cs:22-160).

The reference pumps the tweet stream into size/time-bounded, optionally
gzip-compressed frames and sends each frame to an Event Hubs partition
round-robin with idempotent retries. The Spark-native equivalent:

* ``frame_lines`` — per-partition framing as an Arrow-batched
  ``mapInPandas``: accumulate NDJSON lines until ``max_frame_bytes``
  (SendToEventHub.cs:142 buffer-limit flush), emit one binary frame row
  (payload, n_lines, partition_key). No driver involvement, no shuffle —
  framing is embarrassingly parallel, exactly like the reference's
  single-writer buffer but one per Spark partition.
* ``KafkaEventSink`` — frames to ``format("kafka")`` (key=partition_key
  so the broker partitioner round-robins like
  SendToEventHub.cs:101-105); Kafka's idempotent producer replaces
  EnableIdempotentRetries. Requires the spark-sql-kafka package on the
  classpath + a broker, so CI drives the file stub instead.
* ``FileEventSink`` — broker-free stub with the same contract: each
  frame lands as one parquet row (frame payloads stay executor-side;
  the driver never holds tweet bytes).

``send_to_event_sink`` wires a bounded replay of an NDJSON directory
through framing into either sink inside one ``foreachBatch`` streaming
query (single-pass, same shape as streaming/pipeline.py).
"""

from __future__ import annotations

import gzip as _gzip
import io
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FRAME_SCHEMA = "partition_key int, n_lines long, payload binary"


def frame_lines(
    lines: DataFrame,
    max_frame_bytes: int = 256 * 1024,
    gzip_compress: bool = False,
    n_partition_keys: int = 8,
    value_col: str = "value",
) -> DataFrame:
    """NDJSON lines -> size-bounded binary frames, one row per frame.
    partition_key round-robins per emitted frame (the reference's
    nextPartitionId rotation, SendToEventHub.cs:101-105)."""

    def _frames(batches):
        import pandas as pd

        buf: list[bytes] = []
        size = 0
        frame_idx = 0

        def _emit():
            nonlocal buf, size, frame_idx
            raw = b"".join(buf)
            payload = _gzip.compress(raw) if gzip_compress else raw
            row = pd.DataFrame(
                {
                    "partition_key": [frame_idx % n_partition_keys],
                    "n_lines": [len(buf)],
                    "payload": [payload],
                }
            )
            buf, size = [], 0
            frame_idx += 1
            return row

        for pdf in batches:
            for ln in pdf[value_col]:
                b = (ln + "\n").encode("utf-8")
                buf.append(b)
                size += len(b)
                if size >= max_frame_bytes:
                    yield _emit()
        if buf:
            yield _emit()

    return lines.select(value_col).mapInPandas(_frames, FRAME_SCHEMA)


class FileEventSink:
    """Broker-free Event Hubs stand-in: frames append to a parquet
    directory (executor-side write — frames never visit the driver)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def send(self, frames: DataFrame, batch_id: int) -> None:
        frames.write.mode("overwrite").parquet(
            os.path.join(self.out_dir, f"batch_id={batch_id}")
        )

    def read_frames(self, spark: SparkSession) -> DataFrame:
        df = spark.read.parquet(self.out_dir)
        return df.drop("batch_id") if "batch_id" in df.columns else df


class KafkaEventSink:
    """Kafka/Event Hubs egress (Event Hubs exposes a Kafka endpoint, so
    this covers the reference deployment). Needs spark-sql-kafka on the
    classpath and a reachable broker — construction is cheap, send()
    fails fast without them; CI exercises FileEventSink instead."""

    def __init__(self, bootstrap_servers: str, topic: str):
        self.bootstrap_servers = bootstrap_servers
        self.topic = topic

    def send(self, frames: DataFrame, batch_id: int) -> None:
        (
            frames.select(
                F.col("partition_key").cast("string").alias("key"),
                F.col("payload").alias("value"),
            )
            .write.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("topic", self.topic)
            # idempotent producer = EnableIdempotentRetries parity
            .option("kafka.enable.idempotence", "true")
            .option("kafka.retries", "10")
            .save()
        )


def decode_frame(payload: bytes, gzip_compressed: bool = False) -> list[str]:
    """Inverse of frame_lines for consumers/tests: frame -> lines."""
    raw = _gzip.decompress(payload) if gzip_compressed else payload
    return io.TextIOWrapper(io.BytesIO(raw), encoding="utf-8").read().splitlines()


def send_to_event_sink(
    spark: SparkSession,
    input_path: str,
    sink,
    checkpoint_dir: str,
    minutes: int | None = None,
    max_frame_bytes: int = 256 * 1024,
    gzip_compress: bool = False,
    available_now: bool = True,
) -> list:
    """Replay an NDJSON directory into an event sink as one streaming
    query (single-pass foreachBatch). ``minutes`` bounds the capture by
    event time from the stream's start — the deterministic analog of
    the reference's wall-clock CancellationTokenSource
    (SendToEventHub.cs:33-34), matching cli.save_tweets."""
    bound_ts = None
    if minutes is not None:
        lines0 = spark.read.text(input_path)
        ts = F.to_timestamp(
            F.from_unixtime(
                F.get_json_object("value", "$.timestamp_ms").cast("long") / 1000
            )
        )
        min_ts = lines0.select(ts.alias("ts")).agg(F.min("ts")).collect()[0][0]
        if min_ts is not None:
            import datetime

            bound_ts = min_ts + datetime.timedelta(minutes=minutes)

    def _process(batch_lines: DataFrame, batch_id: int) -> None:
        if bound_ts is not None:
            ts = F.to_timestamp(
                F.from_unixtime(
                    F.get_json_object("value", "$.timestamp_ms").cast("long")
                    / 1000
                )
            )
            batch_lines = batch_lines.filter(ts < F.lit(bound_ts))
        if batch_lines.isEmpty():
            return
        sink.send(
            frame_lines(batch_lines, max_frame_bytes, gzip_compress), batch_id
        )

    writer = (
        spark.readStream.text(input_path)
        .writeStream.queryName("send_to_event_sink")
        .option("checkpointLocation", os.path.join(checkpoint_dir, "event_sink"))
        .foreachBatch(_process)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination()
    return [query]
