"""Distributed (range-partitioned, two-pass) prefix sums.

A global running total is the textbook ordered scan: the naive Spark
form — ``sum().over(Window.orderBy(k))`` with NO partitionBy — funnels
every row through one task (Spark logs `WindowExec: No Partition
Defined`). The classic distributed alternative (two-pass scan, same
shape as parallel prefix in the PRAM literature) is:

  1. bucket rows by range of the order key (explicit quantile cuts, so
     the assignment is deterministic and re-computable);
  2. per-bucket LOCAL running total via a window PARTITIONED by bucket
     (parallel across buckets);
  3. one tiny aggregate of per-bucket totals -> exclusive cumulative
     offsets (driver-side, n_buckets rows — the only collect) ->
     broadcast back as a literal map and added to each local total.

Exact for any associative sum (integers here); result is identical to
the single-task window. At 100 TB this is the only shape that works:
every pass is map-side or a partitioned window, and the driver sees
n_buckets values, never rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partitioned_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_total",
    n_buckets: int = 32,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Append ``out_col`` = cumulative sum of ``value_col`` in
    ``order_col`` order. ``order_col`` must be castable to double
    (numeric / timestamp). Rows equal on ``order_col`` are ordered by
    ``tiebreakers`` within a bucket (they always share a bucket, so
    cross-bucket ties cannot split)."""
    dtype = dict(df.dtypes)[order_col]
    key = F.col(order_col)
    if dtype.startswith("timestamp"):  # incl. timestamp_ntz
        key = key.cast("timestamp")
    key = key.cast("double")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = sorted(
        set(
            df.select(key.alias("__k")).approxQuantile(
                "__k", probs, 1.0 / (4 * n_buckets)
            )
        )
    )
    # NULL order keys take bucket -1 (sorting first, matching the
    # global window's ASC NULLS FIRST); non-null keys get the monotone
    # indicator sum — codegen-friendly, no UDF
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + (key > F.lit(c)).cast("int")
    b = df.withColumn(
        "__b", F.when(key.isNull(), F.lit(-1)).otherwise(bucket)
    )

    from pyspark.sql import Window as W

    order = [F.col(order_col)] + [F.col(t) for t in tiebreakers or []]
    wloc = (
        W.partitionBy("__b")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = b.withColumn("__local", F.sum(value_col).over(wloc))

    totals = b.groupBy("__b").agg(F.sum(value_col).alias("__t")).collect()
    offsets: dict[int, float] = {}
    run = 0
    for row in sorted(totals, key=lambda r: r["__b"]):
        offsets[row["__b"]] = run
        run += row["__t"] or 0
    if offsets:
        omap = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
        off = F.coalesce(omap[F.col("__b")], F.lit(0))
    else:
        off = F.lit(0)
    # result keeps the SUM's natural type (long for integers, double
    # for fractional values) — no silent truncation
    return (
        local.withColumn(out_col, F.col("__local") + off)
        .drop("__b", "__local")
    )
