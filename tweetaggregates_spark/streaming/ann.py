"""Streaming ANN-index ingest: fold embedding micro-batches into a
persisted IVF-ADC index with the quantizer-drift guard in the loop.

The production shape (faiss ``add`` path, per trigger): an index is
built offline (``similarity.build_ivf_pq_index``); the ingest stream
appends each micro-batch with the EXISTING quantizers — one map pass
over the batch, never the corpus — and evaluates
``IvfPqIndex.needs_rebuild`` against the pre-batch index FIRST, so a
drifting stream is flagged before its vectors crowd mis-fitting
cells. Appends are idempotent under trigger replay (the batch id keys
the code partitions via ``ingest_id``); the drift report is the
monitoring channel an operator watches to schedule the offline
rebuild (the explicit trade documented on ``append_to_ivf_pq_index``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

EMB_SCHEMA = "vec_id BIGINT, embedding ARRAY<DOUBLE>"


def run_streaming_ann_ingest(
    spark: SparkSession,
    in_dir: str,
    index_path: str,
    report_path: str,
    checkpoint: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    drift_factor: float = 2.0,
):
    """Ingest an embedding NDJSON stream into the persisted IVF-ADC
    index at ``index_path`` (built beforehand). Per trigger:

    1. measure the batch's drift against the PRE-batch index
       (``batch_drift``: mean nearest-centroid squared distance, one
       broadcast map pass) and the resulting rebuild recommendation;
    2. append the batch with the existing quantizers
       (``append_to_ivf_pq_index``, ``ingest_id=batch_id`` — replayed
       triggers overwrite their own partitions, never duplicate);
    3. write one report row to ``report_path/batch_id=<id>``:
       (n_vectors, batch_drift, train_avg_dist, needs_rebuild).

    The recommendation is advisory by design: ingest keeps absorbing
    batches (the index stays complete), and the operator schedules
    ``build_ivf_pq_index`` when the report flips — recall on drifted
    regions is quantization-bound until then."""
    from tweetaggregates_spark.operators.similarity import (
        append_to_ivf_pq_index,
        read_ivf_pq_index,
    )

    def _process(batch_df, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)
        n = batch_df.count()
        if n == 0:
            return
        idx = read_ivf_pq_index(spark, index_path)
        drift = idx.batch_drift(batch_df)
        rebuild = (
            idx.avg_assign_dist is not None
            and drift > drift_factor * idx.avg_assign_dist
        )
        # the pre-batch handle's quantizers are exactly what the append
        # would re-read (appends never change them); reusing it and
        # skipping the post-append re-read drops two redundant driver
        # read actions per trigger (r15)
        append_to_ivf_pq_index(
            batch_df, index_path, ingest_id=str(batch_id),
            return_index=False, index=idx,
        )
        spark.createDataFrame(
            [(int(n), float(drift), idx.avg_assign_dist, bool(rebuild))],
            "n_vectors BIGINT, batch_drift DOUBLE, "
            "train_avg_dist DOUBLE, needs_rebuild BOOLEAN",
        ).write.mode("overwrite").parquet(
            f"{report_path}/batch_id={batch_id}"
        )

    from tweetaggregates_spark.streaming.runner import run_foreach_batch

    return run_foreach_batch(
        spark, in_dir, EMB_SCHEMA, _process, checkpoint,
        available_now, max_files_per_trigger,
    )


def run_streaming_rp_ingest(
    spark: SparkSession,
    in_dir: str,
    index_path: str,
    checkpoint: str,
    out_dim: int = 16,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Ingest an embedding NDJSON stream into a persisted RP sketch
    table (similarity.build_rp_index layout, partitioned by ingest):
    per trigger ONE map pass projects the batch's unit vectors through
    the deterministic sign matrix and writes
    ``ingest=<batch_id>`` with dynamic partition overwrite — replayed
    triggers replace their own rows. Because the 'model' is a pure
    function of (i, j), there is NOTHING to retrain and no drift: the
    streamed sketch is row-for-row what a from-scratch rebuild over
    the union would produce (pinned in tests/test_stream_ann_ingest) —
    the property learned quantizers (IVF/PQ) give up for their
    compression. Queries pass the folded sketch to
    ``knn_rp_rescore(sketch=...)``."""
    from pyspark.sql import functions as F

    from tweetaggregates_spark.functions.vectors import as_double, norm
    from tweetaggregates_spark.operators.similarity import random_projection

    def _process(batch_df, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)
        if batch_df.isEmpty():
            # random_projection reads the dim from a first() probe —
            # nothing to project or write for an empty trigger
            return
        unit = (
            batch_df.select(
                F.col("vec_id"), as_double("embedding").alias("_vd")
            )
            .select("vec_id", "_vd", norm(F.col("_vd")).alias("_n"))
            .select(
                "vec_id",
                F.transform("_vd", lambda x: x / F.col("_n")).alias(
                    "embedding"
                ),
            )
        )
        random_projection(unit, out_dim=out_dim).withColumn(
            "ingest", F.lit(str(batch_id))
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("ingest").parquet(index_path)

    from tweetaggregates_spark.streaming.runner import run_foreach_batch

    return run_foreach_batch(
        spark, in_dir, EMB_SCHEMA, _process, checkpoint,
        available_now, max_files_per_trigger,
    )


def read_rp_index(spark: SparkSession, index_path: str):
    """The folded streamed sketch (ingest partition dropped) — pass to
    ``knn_rp_rescore(sketch=...)``."""
    df = spark.read.parquet(index_path)
    return df.drop("ingest") if "ingest" in df.columns else df
