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
