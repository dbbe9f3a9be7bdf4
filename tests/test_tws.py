"""transformWithState operator: cross-batch typed state correctness.

Drives streaming/tws.running_user_stats over a two-file drop directory
(maxFilesPerTrigger=1 => state must carry across micro-batches) and
checks the final per-user row against the batch oracle, including the
bounded recent-values ListState buffer, which must hold exactly the
LAST keep_last values in arrival order across the batch boundary.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tweetaggregates_spark.streaming.tws import running_user_stats


def _has_protobuf() -> bool:
    # TWS's state-server protocol needs google.protobuf at RUNTIME
    # (pyspark/sql/streaming/proto/StateMessage_pb2). The operator and
    # its plan are independent of it; only query EXECUTION requires it.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_tws_plan_builds_with_typed_output(spark):
    """Plan construction + output schema — runs even without protobuf:
    the typed-state operator must produce a streaming DataFrame with the
    declared schema before any state machinery starts."""
    stream = (
        spark.readStream.format("rate")
        .load()
        .selectExpr("value % 4 AS user_id", "CAST(value AS DOUBLE) AS value")
    )
    df = running_user_stats(stream)
    assert df.isStreaming
    assert df.schema.simpleString() == (
        "struct<user_id:bigint,n_events:bigint,total_value:double,"
        "min_value:double,max_value:double,recent_values:array<double>>"
    )


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState execution needs google.protobuf, absent "
    "from this container; applyInPandasWithState covers W8 execution "
    "(test_stateful.py) and this e2e activates wherever protobuf exists",
)
def test_tws_running_stats_matches_batch(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = [
        {"user_id": i % 4, "value": float((i * 7) % 23)} for i in range(160)
    ]
    (in_dir / "a.ndjson").write_text(
        "\n".join(json.dumps(r) for r in rows[:100]) + "\n"
    )
    (in_dir / "b.ndjson").write_text(
        "\n".join(json.dumps(r) for r in rows[100:]) + "\n"
    )

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    out: dict[int, tuple] = {}

    def _sink(batch_df, batch_id):
        for r in batch_df.collect():
            out[r.user_id] = (
                r.n_events,
                r.total_value,
                r.min_value,
                r.max_value,
                list(r.recent_values),
            )

    q = (
        running_user_stats(stream, keep_last=3)
        .writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(_sink)
        .trigger(availableNow=True)
        .queryName("tws_stats")
        .start()
    )
    q.awaitTermination()

    batch = (
        spark.read.schema("user_id long, value double")
        .json(str(in_dir))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    )
    expected_tail = {u: [r["value"] for r in rows if r["user_id"] == u][-3:]
                     for u in range(4)}
    for r in batch:
        n, s, mn, mx, recent = out[r.user_id]
        assert (n, s, mn, mx) == (r.n, r.s, r.mn, r.mx)
        assert recent == expected_tail[r.user_id]
