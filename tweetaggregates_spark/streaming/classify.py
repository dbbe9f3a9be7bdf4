"""Streaming model scoring: quality-classifier score-on-ingest.

The curation pipelines' deployment shape for the model-based filter
(Brown et al. 2020 App. A at serving time): the classifier TRAINS
offline on a bounded reference sample (operators/classifier —
driver-side, constant cost) and then SCORES the ingest stream map-only
— the weights ship into every task as one array Literal, so scoring a
micro-batch is a stateless projection: no state store, no shuffle, no
Python. Each trigger appends its scored rows under
``out_path/batch_id=<batch_id>`` (per-batch overwrite = replay-safe,
the house idempotence convention), so a redelivered batch rewrites the
same partition.

Model refresh is a restart with a new weight literal (model-as-config
— the weights are 6 dp-rounded floats, 257 of them; versioning them is
the caller's registry concern, not stream state). At 100 TB/day the
whole pipeline is embarrassingly parallel: admission-controlled source
-> codegen'd projection -> partitioned sink.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from tweetaggregates_spark.streaming.dedup import DOC_SCHEMA


def run_streaming_quality_scores(
    spark: SparkSession,
    in_dir: str,
    out_path: str,
    checkpoint: str,
    weights: list[float],
    n_buckets: int = 256,
    threshold: float = 0.5,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Drain (or run live) the score-on-ingest stream: NDJSON docs ->
    ``logreg_quality_scores`` with the given trained weights ->
    per-batch parquet. Returns the StreamingQuery."""
    from tweetaggregates_spark.operators.classifier import (
        logreg_quality_scores,
    )
    from tweetaggregates_spark.streaming.runner import run_foreach_batch

    def _process(batch_df, batch_id: int) -> None:
        scored = logreg_quality_scores(
            batch_df, weights, n_buckets=n_buckets, threshold=threshold
        ).select("doc_id", "quality_prob", "clf_keep")
        scored.write.mode("overwrite").parquet(
            f"{out_path}/batch_id={batch_id}"
        )

    return run_foreach_batch(
        spark, in_dir, DOC_SCHEMA, _process, checkpoint,
        available_now, max_files_per_trigger,
    )
