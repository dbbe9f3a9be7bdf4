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


def grouped_partitioned_rank(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    tiebreakers: list[str] | None = None,
    *,
    ascending: bool = False,
    n_buckets: int = 32,
    rank_name: str = "_rank",
    count_name: str | None = None,
    cuts: list[float] | None = None,
) -> DataFrame:
    """Per-group dense ordinal rank (``row_number`` semantics over
    ``(order_col, tiebreakers)``) WITHOUT a per-group single-task
    window. ``Window.partitionBy(group)`` executes each group in one
    task, so a dominant group (zipf-distributed web domains, say)
    funnels its whole sort through one executor — and AQE cannot help
    (its skew mitigation applies to joins and shuffle reads, not
    WindowExec partitions). Same two-pass shape as
    ``partitioned_prefix_sum``, keyed per group:

      1. bucket rows by range of the order key (quantile cuts — any
         cut choice yields the same final ranks, so approxQuantile's
         merge-order nondeterminism is harmless);
      2. local ``row_number`` over a window partitioned by
         ``(group, bucket)`` — a dominant group splits across
         ``n_buckets`` tasks;
      3. tiny ``(group, bucket) -> count`` aggregate, exclusive
         prefix along the sort direction via a window over that
         aggregate (≤ ``n_buckets`` rows per group partition), joined
         back — rank = offset + local row_number.

    Rows equal on the order key always share a bucket (cuts compare
    strictly), so ``tiebreakers`` never order across buckets; the
    result is identical to the one-window plan. The split helps in
    proportion to order-key distinctness — a group whose key is one
    constant still lands in one bucket (but then its sort is trivial
    anyway). ``count_name`` optionally appends the per-group row count
    (for percent_rank-style normalizations) from the same aggregate —
    no extra scan.

    ``cuts``: explicit bucket boundaries. When the order key has a
    KNOWN range (a [0,1] quality score, a bounded ratio), fixed
    uniform cuts skip the approxQuantile pass entirely — one less scan
    of the input, and since ANY cut choice yields the same final
    ranks, only bucket balance (not correctness) depends on how well
    the fixed cuts match the data."""
    from pyspark.sql import Window as W

    key = F.col(order_col).cast("double")
    if cuts is None:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = df.select(key.alias("__k")).approxQuantile(
            "__k", probs, 1.0 / (4 * n_buckets)
        )
    cuts = sorted(set(cuts))
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + (key > F.lit(c)).cast("int")
    # NULL order keys sort where the one-window plan puts them: ASC
    # NULLS FIRST / DESC NULLS LAST — in BOTH directions that is the
    # low-key end, so bucket -1 (asc(__b) puts it first, desc(__b)
    # puts it last)
    b = df.withColumn(
        "__b", F.when(key.isNull(), F.lit(-1)).otherwise(bucket)
    )

    srt = F.asc(order_col) if ascending else F.desc(order_col)
    order = [srt] + [F.asc(t) for t in tiebreakers or []]
    wloc = W.partitionBy(*group_cols, "__b").orderBy(*order)
    # the per-(group,bucket) count rides the SAME window partitioning
    # as the local rank; a LAZY localCheckpoint then makes this frame
    # physically shared by its two consumers (the offsets aggregate
    # and the join probe). Without the barrier, column pruning
    # specializes the two subtrees (the offsets branch drops the
    # payload columns), the exchanges stop being identical, ReuseExchange
    # never fires, and the scan + corpus shuffle + window execute
    # TWICE — measured 4.6 s -> 2.0 s on the KLL daily rank at sf0.1
    # (round 9; the same two-consumer hazard round 8 fixed in
    # dsir_select, SCALE.md)
    local = b.withColumn("__lr", F.row_number().over(wloc)).withColumn(
        "__c", F.count(F.lit(1)).over(W.partitionBy(*group_cols, "__b"))
    ).localCheckpoint(eager=False)
    counts = local.groupBy(*group_cols, "__b").agg(
        F.max("__c").alias("__c")
    )
    bdir = F.asc("__b") if ascending else F.desc("__b")
    woff = (
        W.partitionBy(*group_cols)
        .orderBy(bdir)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offs = counts.withColumn(
        "__off", F.coalesce(F.sum("__c").over(woff), F.lit(0))
    )
    if count_name is not None:
        wtot = W.partitionBy(*group_cols)
        offs = offs.withColumn(count_name, F.sum("__c").over(wtot))
    offs = offs.drop("__c")

    # the offset table is |groups| x n_buckets rows — AQE broadcasts
    # it when small; at worst a skew-free equi-join on (group, bucket)
    joined = local.join(offs, [*group_cols, "__b"])
    return joined.withColumn(
        rank_name, (F.col("__off") + F.col("__lr")).cast("int")
    ).drop("__b", "__lr", "__off", "__c")
