"""Range (point-in-interval) join: assign each fact row the interval
containing its value — the third member of the non-equi join family
next to as-of (operators/asof.py) and the watermark-bounded
stream-stream interval join (streaming/joins.py).

The reference has no joins at all (SURVEY §2.3); this is engine
surface a user expects from an analytics engine: irregular-boundary
histograms, rate-card/tier lookup, calendar alignment.

Scale (100 TB): the intervals side is a broadcast by constructionn —
interval tables (tiers, calendars, quantile boundaries) are small.
With an equi key alongside the range predicate, Catalyst plans a
BroadcastHashJoin on the key and evaluates the range as the join's
residual condition — the non-equi part never degrades the join to a
nested loop over the fact table, and the fact side never shuffles.
Without an equi key it is a BroadcastNestedLoopJoin, which is still
scan-shaped (facts stream past the broadcast intervals once) but pay
|intervals| comparisons per row — keep intervals small or add a key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    low_col: str = "lo",
    high_col: str = "hi",
    equi_keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to the interval(s) with lo <= value < hi,
    optionally also matching on ``equi_keys`` (columns present on both
    sides). The intervals side broadcasts."""
    # explicit aliases: interval tables are routinely DERIVED from the
    # fact table (quantile_intervals below), and a self-lineage join
    # would otherwise resolve both key sides to the same attribute
    f, iv = facts.alias("__rj_f"), intervals.alias("__rj_iv")
    cond: Column = (
        F.col(f"__rj_f.{value_col}") >= F.col(f"__rj_iv.{low_col}")
    ) & (F.col(f"__rj_f.{value_col}") < F.col(f"__rj_iv.{high_col}"))
    for k in equi_keys or []:
        cond = (F.col(f"__rj_f.{k}") == F.col(f"__rj_iv.{k}")) & cond
    joined = f.join(F.broadcast(iv), cond, how)
    if equi_keys:
        # drop the duplicate key columns from the broadcast side
        joined = joined.drop(*[iv[k] for k in equi_keys])
    return joined


def quantile_intervals(
    df: DataFrame,
    value_col: str,
    key_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Per-key irregular histogram boundaries: exact interpolated
    quantiles (rounded 6 so both engines agree on the cut points)
    expanded into (bucket, lo, hi) interval rows covering (-inf, inf).
    One aggregate over the keyed data; the output is |keys| x
    (len(probs)+1) rows — broadcast material."""
    bounds = F.array(
        F.lit(float("-inf")),
        *[
            F.round(F.expr(f"percentile({value_col}, {p})"), 6)
            for p in probs
        ],
        F.lit(float("inf")),
    )
    agg = df.groupBy(key_col).agg(bounds.alias("bounds"))
    n = len(probs) + 1
    return agg.select(
        key_col,
        F.expr(
            f"explode(transform(sequence(1, {n}), "
            "i -> struct(i as bucket, bounds[i-1] as lo, bounds[i] as hi)))"
        ).alias("iv"),
    ).select(key_col, "iv.bucket", "iv.lo", "iv.hi")
