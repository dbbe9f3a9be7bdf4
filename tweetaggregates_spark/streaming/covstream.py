"""Streaming covariance ingest — incremental model state for the
deterministic PCA (round 9), on the shared versioned store.

The PCA fit's only corpus pass is ``operators/pca.cov_term_sums``:
(term_idx, decimal sum, count) rows whose merge is plain per-key
summation — associative and commutative, so per-trigger blocks fold to
EXACTLY the one-shot aggregate regardless of trigger boundaries (the
same batching-invariance argument as the exact-dedup and KLL ingests).
Each trigger therefore appends ONE 2144-row delta (d=64), the folded
index is a tiny read-time groupBy, and compaction rebases to a
CONSTANT-size 2144-row block no matter how many triggers ran — the
streamed model state never grows.

Contrast with re-fitting from raw data: a nightly PCA refresh over a
100 TB corpus re-scans everything; this ingest pays O(batch * d^2)
multiply-adds per trigger and the fit itself is a driver-side O(d^2)
solve from the folded sums. Deletions/decay would need signed deltas
(sums are a group, not just a monoid) — out of scope here, noted for
the design record.

Versioned-store contract (crash-safe single-rename commit, per-version
overwrite = replay idempotence, stale-delta immunity, ``below=``
replay) is the shared ``versioned_store`` module, pinned for this
family in tests/test_versioned_store.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tweetaggregates_spark import versioned_store as vstore
from tweetaggregates_spark.operators.pca import (
    cov_term_sums,
    pca_fit_from_sums,
)

EMB_SCHEMA = "vec_id BIGINT, embedding ARRAY<DOUBLE>"


def run_streaming_cov_ingest(
    spark: SparkSession,
    in_dir: str,
    index_path: str,
    checkpoint: str,
    vec_col: str = "embedding",
    dim: int = 64,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    compact_every: int | None = None,
):
    """Drain an NDJSON drop-dir of (vec_id, embedding) rows into the
    versioned covariance store: per trigger, ONE d(d+3)/2-row delta at
    ``sums/v=<batch_id>``. ``compact_every=N`` rebases inline at the
    start of every Nth trigger (``below=batch_id``: only
    fully-committed triggers fold, so a replayed trigger still sees
    exactly its pre-batch index)."""
    from tweetaggregates_spark.streaming.runner import run_foreach_batch

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if (
            compact_every is not None
            and batch_id > 0
            and batch_id % compact_every == 0
        ):
            compact_cov_index(spark, index_path, below=batch_id)
        sums = cov_term_sums(batch_df, vec_col=vec_col, dim=dim)
        sums.withColumn("ingest", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(f"{index_path}/sums/v={batch_id}")

    return run_foreach_batch(
        spark, in_dir, EMB_SCHEMA, _process, checkpoint,
        available_now, max_files_per_trigger,
    )


def read_cov_index(
    spark: SparkSession, index_path: str, below: int | None = None
) -> DataFrame | None:
    """The folded streamed sums: union of the newest base and later
    deltas, merged by per-key summation (exact — decimal sums).
    Returns None when nothing is committed."""
    b, deltas = vstore.base_and_deltas(
        index_path, "sums_base", "sums", below
    )
    u = vstore.union_all(
        vstore.read_family(
            spark, index_path, "sums_base", "sums", b, deltas
        )
    )
    if u is None:
        return None
    return u.groupBy("_k").agg(
        F.sum("_s").alias("_s"), F.sum("_c").alias("_c")
    )


def compact_cov_index(
    spark: SparkSession, index_path: str, below: int | None = None
) -> None:
    """Rebase: fold base + deltas < ``below`` into one constant-size
    block (d(d+3)/2 rows) and commit via the shared versioned-store
    mechanics. The fold is the exact sum, so the folded fingerprint is
    INVARIANT across compactions (fold_invariant=True in the
    parametrized contract suite)."""
    b, deltas = vstore.base_and_deltas(
        index_path, "sums_base", "sums", below
    )
    if not deltas or (len(deltas) < 2 and b is None):
        return
    newv = max(deltas)
    folded = read_cov_index(spark, index_path, below=newv + 1)
    folded = folded.withColumn("ingest", F.lit(-1))
    vstore.commit_bases(index_path, [("sums_base", folded)], newv)
    vstore.cleanup_after_compact(
        index_path, delta_subs=["sums"], base_subs=["sums_base"],
        newv=newv,
    )


def fit_from_cov_index(
    spark: SparkSession,
    index_path: str,
    dim: int = 64,
    n_components: int = 2,
    iters: int = 10,
    below: int | None = None,
):
    """Fit the PCA model from the folded streamed sums — bit-identical
    to ``pca_power_fit`` over the union of everything ingested (the
    merge is the same exact decimal sum the one-shot aggregate
    computes)."""
    idx = read_cov_index(spark, index_path, below=below)
    if idx is None:
        raise ValueError("fit_from_cov_index: empty index")
    got = idx.collect()
    n = got[0]["_c"]
    sums = {r["_k"]: r["_s"] for r in got}
    return pca_fit_from_sums(
        sums, n, dim=dim, n_components=n_components, iters=iters
    )
