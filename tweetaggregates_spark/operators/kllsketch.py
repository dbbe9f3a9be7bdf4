"""Deterministic KLL-style mergeable rank sketch (VERDICT r7 #6).

Public lineage: the compactor cascade of KLL (Karnin, Lang & Liberty
2016) run in its derandomized batch form, and the PRUNE coarsening of
Agarwal et al., "Mergeable Summaries" (PODS 2012). The repo's sketch
conventions demand cross-engine determinism (a DuckDB twin must replay
the sketch bit-for-bit), which rules out KLL's random coin flips — so
every choice here is a pure function of the input multiset:

**Batch build (per group).** Sort the group's n items by
``(value, tiebreak-hash)``, positions p = 1..n. Feeding them through a
capacity-k compactor cascade bottom-up — each overfull level sorts,
promotes the items at even positions to the next level, discards the
odd ones, and (odd count) leaves its largest item behind — has a
CLOSED FORM on the sorted batch: level l holds exactly the positions
divisible by 2^l, so with

    l* = smallest l with floor(n / 2^l) <= k

the finished sketch is
  * every position p ≡ 0 (mod 2^l*) at weight 2^l*, plus
  * for each level l < l* with floor(n/2^l) odd, the remainder item
    p = 2^l * floor(n/2^l) at weight 2^l (equivalently: p's 2-adic
    valuation v = v2(p) < l* and p = 2^v * floor(n/2^v)).

Total weight is exactly n (compaction is weight-preserving), and the
classic deterministic compactor argument bounds the rank error: one
compaction at level l perturbs any rank by at most 2^l, one compaction
happens per level below l*, so

    |est_rank(v) - true_rank(v)| <= sum_{l<l*} 2^l = 2^l* - 1 < 2n/k

— the O(n/k) regime (vs O(n/sqrt(k)) for the bottom-k row sample the
older ``value_quantile_sketch_*`` family uses), carried EXACTLY in the
output as ``err_bound_ranks``.

**Merge.** The mergeable state is the bag of weighted items; merging
is multiset UNION — associative and commutative by construction (the
property pinned in tests), with rank errors adding: err(∪ S_d) <=
Σ err(S_d). A rollup that must re-emit a bounded-size sketch finishes
with one deterministic PRUNE to k items (sort by (value, hash),
cumulative weight, keep the first item crossing each multiple of
step = ceil(W/k), force-keep the last item, re-weight each kept item
by the weight since the previous kept one) — weight-preserving, adds
at most ``step`` rank error, also bookkept exactly.

**Estimation.** Nearest-rank on cumulative weights: est(q) = the
smallest value whose cumulative weight >= ceil(q * W). No
interpolation, so both engines agree bit-for-bit.

Scale shape: the build's per-group global position comes from
``prefix.grouped_partitioned_rank`` (bucket-split, no single-task
per-group window); everything after the rank is a map-only keep
predicate in exact integer arithmetic, one tiny per-group window over
the <= k + log2(n) kept rows, and a tiny aggregate. The driver never
sees a row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tweetaggregates_spark.functions.hashing import hash64
from tweetaggregates_spark.operators.prefix import grouped_partitioned_rank

MAX_LEVELS = 32  # 2^32 rows per group bounds the cascade depth


def _lstar(n: Column, k: int) -> Column:
    """Smallest l with floor(n / 2^l) <= k, as a 32-term indicator sum
    (exact integer arithmetic — no float log2 edge cases, and the
    identical expression runs in the SQL twin)."""
    expr = F.lit(0)
    for level in range(MAX_LEVELS):
        expr = expr + (
            (F.floor(n / F.lit(2 ** level)) > k).cast("int")
        )
    return expr


def kll_sketch_items(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group deterministic-KLL sketch ITEMS: one row per kept item
    with columns ``group_cols + [value_col, _h, _w]`` plus the
    per-group ``_n`` (true count, = total kept weight) and
    ``_err`` (2^l* - 1, the deterministic rank-error bound)."""
    base = df.withColumn("_h", hash64(F.col(id_col).cast("string")))
    ranked = grouped_partitioned_rank(
        base,
        group_cols,
        value_col,
        ["_h"],
        ascending=True,
        rank_name="_p",
        count_name="_n",
    )
    # FILTER FIRST, derive weights on survivors (r11 plan-quality fix).
    # The former build computed the full keep expression inside the
    # keep/filter pair, and whole-stage codegen inlines that tree into
    # the consume chain WITHOUT cross-expression CSE — the lstar/v2
    # subtrees evaluated ~8x per input row, 5.5x slower than the
    # interpreted path (which CSEs them), and at 32 indicator terms the
    # duplicated tree also blew janino's 64 KB method limit, silently
    # dropping the stage to interpreted execution (the r10 bench
    # instability on the KLL entries). The algebra below makes the
    # per-input-row work ONE lstar evaluation plus a few bit ops:
    #
    #   low = p & -p = 2^v2(p);  tz = bit_count(low - 1) = v2(p)
    #   final level:  p % 2^l* == 0      <=> tz >= l*
    #   remainder:    p == 2^v*floor(n/2^v) (v = v2(p) < l*)
    #                                     <=> p == n - n % low
    #
    # so KEEP <=> tz >= l* OR p == n - n % low, and the weight/err
    # projection (2^l* via shiftleft, low, the carried bound) runs
    # only on the <= k + log2(n) survivors per group.
    p, n = F.col("_p"), F.col("_n")
    low = p.bitwiseAND(-p)
    lstar = _lstar(n, k)
    kept = ranked.filter(
        (F.bit_count(low - F.lit(1)) >= lstar) | (p == n - n % low)
    )
    pow_l = F.pow(F.lit(2.0), lstar).cast("long")
    w = F.when(F.bit_count(low - F.lit(1)) >= lstar, pow_l).otherwise(low)
    return kept.select(
        *group_cols, value_col, "_h",
        w.alias("_w"),
        "_n",
        (pow_l - 1).alias("_err"),
    )


def kll_estimates(
    items: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: dict[str, float],
    n_col: str = "_n",
) -> DataFrame:
    """Nearest-rank quantile estimates from weighted sketch items: for
    each q, the smallest value whose per-group cumulative weight
    reaches ceil(q * n). One tiny window over the <= k + log2(n) items
    per group, then one aggregate."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(value_col).asc(), F.col("_h").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = items.withColumn("_cw", F.sum("_w").over(w))
    aggs = [
        F.count(F.lit(1)).alias("sketch_size"),
        F.max(n_col).alias("n_events"),
        F.max("_err").alias("err_bound_ranks"),
    ]
    for name, q in quantiles.items():
        target = F.ceil(F.lit(q) * F.col(n_col))
        aggs.append(
            F.round(
                F.min(
                    F.when(F.col("_cw") >= target, F.col(value_col))
                ),
                6,
            ).alias(name)
        )
    return cum.groupBy(*group_cols).agg(*aggs)


def kll_prune(
    items: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
    n_col: str = "_n",
    err_col: str = "_err",
) -> DataFrame:
    """Deterministic PRUNE (Agarwal et al. 2012) of a merged weighted
    sketch back to <= k+1 items per group: sort by (value, hash),
    cumulative weight cw, keep each first item crossing a multiple of
    step = ceil(W/k) (and always the last item), re-weight kept items
    by the weight since the previous kept one — weight-preserving, and
    adds at most ``step`` to the carried rank-error bound."""
    wordr = Window.partitionBy(*group_cols).orderBy(
        F.col(value_col).asc(), F.col("_h").asc()
    )
    cum = items.withColumn(
        "_cw",
        F.sum("_w").over(
            wordr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    step = F.ceil(F.col(n_col) / F.lit(k))
    prev_cw = F.lag("_cw", 1, 0).over(wordr)
    crossed = F.ceil(F.col("_cw") / step) > F.ceil(prev_cw / step)
    kept = cum.withColumn(
        "_keep", crossed | (F.col("_cw") == F.col(n_col))
    ).filter("_keep")
    # re-weight: cw minus the previous KEPT row's cw
    prev_kept_cw = F.lag("_cw", 1, 0).over(wordr)
    return (
        kept.withColumn("_w", F.col("_cw") - prev_kept_cw)
        .withColumn(err_col, F.col(err_col) + step)
        .select(*group_cols, value_col, "_h", "_w", n_col, err_col)
    )
