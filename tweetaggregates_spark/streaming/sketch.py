"""Streaming sketches: Count-Min counters as a watermarked streaming
aggregation.

The batch CMS family (plans/events.py) shows the counters are a plain
count over (bucket, row, cell) — which means the STREAMING form is just
the same groupBy under a watermark: append-mode emission yields each
closed window's d x w counter block exactly once, ready to upsert into
a counters table that the batch estimator / rollup reads.

Why this matters at 100 TB: a per-key streaming aggregation
(`groupBy(window, user_id)`) keeps state proportional to the number of
DISTINCT keys in every open window — unbounded on a heavy-tailed key
space. The sketch keeps exactly d x w cells per open window (3 x 512
here: a few KB) NO MATTER the cardinality, and the downstream
heavy-hitter estimate runs as a batch join against candidates
(cms_heavy_hitters_daily's estimator, or operators/heavyhitters.py's
Misra-Gries discovery pass on a sample stream).

Parity contract (tests/test_stream_sketch.py): for every window the
final watermark closed, streamed counters == the batch `_cms_counters`
cells over the same input, row for row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tweetaggregates_spark.plans.events import _cms_cells


def streaming_cms_counters(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window: str = "10 minutes",
    watermark: str = "5 seconds",
) -> DataFrame:
    """Streaming (ts, key, ...) -> append-mode (window_time, r, c, cnt)
    Count-Min counter blocks, one block per closed event-time window.
    State per open window is d x w cells — independent of key
    cardinality."""
    cells = stream.withWatermark(ts_col, watermark).select(
        F.col(ts_col),
        F.explode(_cms_cells(F.col(key_col).cast("string"))).alias("cell"),
    )
    return (
        cells.groupBy(
            F.window(ts_col, window).alias("w"),
            F.col("cell.r").alias("r"),
            F.col("cell.c").alias("c"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.end").alias("window_time"), "r", "c", "cnt")
    )


def streaming_hll_registers(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window: str = "10 minutes",
    watermark: str = "5 seconds",
) -> DataFrame:
    """Streaming (ts, key, ...) -> append-mode (window_time, bucket,
    reg) HyperLogLog register blocks, one block per closed event-time
    window — the distinct-count twin of `streaming_cms_counters`.

    State per open window is at most HLL_M register cells (max-rho per
    bucket) regardless of how many distinct keys the window sees — the
    reason a 100 TB stream can afford per-window cardinality: a naive
    `approx_count_distinct`-per-key or dropDuplicates holds per-KEY
    state. Emitted registers feed the same batch machinery as the daily
    table: `plans.events._hll_estimate` for estimates, lossless max
    merge for rollups.

    Parity contract (tests/test_stream_sketch.py): streamed registers
    for every closed window equal the batch `_hll_registers` blocks
    over the same rows, cell for cell."""
    from tweetaggregates_spark.functions.hashing import hash64
    from tweetaggregates_spark.plans.events import HLL_M, _hll_rho

    h = hash64(F.col(key_col).cast("string"))
    keyed = (
        stream.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), h.alias("h"))
        .select(
            F.col(ts_col),
            F.pmod(F.col("h"), F.lit(HLL_M)).alias("bucket"),
            # integer DIV (h has 60 bits, beyond double's exact range)
            F.expr(f"h DIV {HLL_M}").alias("w"),
        )
        .withColumn("rho", _hll_rho())
    )
    return (
        keyed.groupBy(
            F.window(ts_col, window).alias("win"),
            F.col("bucket"),
        )
        .agg(F.max("rho").alias("reg"))
        .select(F.col("win.end").alias("window_time"), "bucket", "reg")
    )


# -- streaming KLL ingest over the shared versioned store ------------------


def run_streaming_kll_ingest(
    spark,
    in_dir: str,
    index_path: str,
    checkpoint: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window: str = "1 day",
    k: int = 64,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    compact_every: int | None = None,
):
    """Streaming rank-sketch ingest: per trigger, build the batch's
    per-window deterministic-KLL items (``operators/kllsketch`` —
    O(batch) work, sketch-sized output) and append them as ONE
    versioned delta at ``items/v=<batch_id>`` (per-version overwrite =
    replay-idempotent). Because the mergeable state is a weighted-item
    BAG and merge is multiset union — associative and commutative —
    the folded index is independent of trigger boundaries' ORDER, and
    each batch's rank-error bound rides its rows: the fold's total
    bound is the sum of per-batch 2^l*-1 terms (plus ceil(W/k) per
    compaction), bookkept exactly, never estimated.

    ``compact_every=N`` rebases inline at the start of every Nth
    trigger via ``compact_kll_index(below=batch_id)`` — only
    fully-committed triggers fold, so a replayed trigger still sees
    exactly its pre-batch index; the commit mechanics are the shared
    ``versioned_store`` contract (crash-safe single-rename commit,
    stale-delta immunity, retry orphan sweep)."""
    from tweetaggregates_spark.operators.kllsketch import kll_sketch_items
    from tweetaggregates_spark.streaming.joins import EVENT_SCHEMA
    from tweetaggregates_spark.streaming.runner import run_foreach_batch

    def _process(batch_df, batch_id: int) -> None:
        if (
            compact_every is not None
            and batch_id > 0
            and batch_id % compact_every == 0
        ):
            compact_kll_index(
                spark, index_path, k=k, below=batch_id,
                value_col=value_col,
            )
        b = batch_df.select(
            F.window(ts_col, window)["end"].alias("window_time"),
            id_col,
            value_col,
        )
        items = kll_sketch_items(
            b, ["window_time"], value_col, id_col, k=k
        ).withColumn("ingest", F.lit(batch_id))
        items.write.mode("overwrite").parquet(
            f"{index_path}/items/v={batch_id}"
        )

    return run_foreach_batch(
        spark, in_dir, EVENT_SCHEMA, _process, checkpoint,
        available_now, max_files_per_trigger,
    )


def read_kll_index(spark, index_path: str, below: int | None = None):
    """The folded streamed sketch: union of the newest base and later
    deltas (the ``versioned_store`` read contract), with per-group
    totals recomputed from the per-(group, ingest) constants — items
    carry group-total ``_n`` / ``_err`` columns ready for
    ``kllsketch.kll_estimates`` / ``kll_prune``. Returns None when
    nothing is committed."""
    from tweetaggregates_spark import versioned_store as vstore

    b, deltas = vstore.base_and_deltas(
        index_path, "items_base", "items", below
    )
    u = vstore.union_all(
        vstore.read_family(
            spark, index_path, "items_base", "items", b, deltas
        )
    )
    if u is None:
        return None
    meta = (
        u.select("window_time", "ingest", "_n", "_err")
        .distinct()
        .groupBy("window_time")
        .agg(F.sum("_n").alias("_n"), F.sum("_err").alias("_err"))
    )
    return u.drop("_n", "_err").join(F.broadcast(meta), "window_time")


def compact_kll_index(
    spark,
    index_path: str,
    k: int = 64,
    below: int | None = None,
    value_col: str = "value",
):
    """Rebase the streamed rank sketch: fold base + deltas < ``below``,
    PRUNE each group back to <= k+1 items (weight-preserving; adds the
    bookkept ceil(W/k) to the carried bound), and commit as a new base
    via the shared ``versioned_store`` mechanics. Bounds both the fold
    depth and the per-group item count on a long-running ingest."""
    from tweetaggregates_spark import versioned_store as vstore
    from tweetaggregates_spark.operators.kllsketch import kll_prune

    b, deltas = vstore.base_and_deltas(
        index_path, "items_base", "items", below
    )
    if not deltas or (len(deltas) < 2 and b is None):
        return
    newv = max(deltas)
    folded = read_kll_index(spark, index_path, below=newv + 1)
    pruned = kll_prune(
        folded, ["window_time"], value_col, k=k
    ).withColumn("ingest", F.lit(-1))
    vstore.commit_bases(index_path, [("items_base", pruned)], newv)
    vstore.cleanup_after_compact(
        index_path, delta_subs=["items"], base_subs=["items_base"],
        newv=newv,
    )
