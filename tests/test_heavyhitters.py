"""Misra-Gries guarantees, partitioning-independent.

The operator's contract (operators/heavyhitters.py): on ANY input
partitioning, (1) every key with true count > n/(k+1) appears in the
candidates, (2) est_low <= true count <= est_high for every candidate,
(3) state stays bounded — candidate rows <= k x n_partitions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetaggregates_spark.operators.heavyhitters import (
    heavy_hitter_candidates,
)

K = 64
N = 50_000


def _skewed(spark, n_parts: int):
    # planted heavy key 999 on 20% of rows; the rest spread over 500
    # uniform keys (~80 each, far below the n/(k+1) = 769 threshold)
    return (
        spark.range(0, N, 1, n_parts)
        .select(
            F.when(F.col("id") % 5 == 0, F.lit(999))
            .otherwise(F.col("id") % 500)
            .alias("user_id")
        )
    )


def test_mg_guarantees_hold(spark):
    for n_parts in (4, 17):  # two partitionings, same guarantees
        df = _skewed(spark, n_parts)
        cand = heavy_hitter_candidates(df, "user_id", k=K)
        exact = df.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
        joined = cand.join(exact, "user_id").collect()

        keys = {r.user_id for r in joined}
        assert 999 in keys  # true count 10k > n/(k+1) = 769: must survive
        for r in joined:
            assert r.est_low <= r.true_cnt <= r.est_high, r
        assert cand.count() <= K * n_parts


def test_mg_bounded_output_and_exactness_when_under_k(spark):
    """Fewer distinct keys than k: MG never decrements, so est_low is
    the EXACT count and est_high == est_low (err_total = 0)."""
    df = spark.range(0, 5_000, 1, 8).select(
        (F.col("id") % 10).alias("user_id")
    )
    cand = heavy_hitter_candidates(df, "user_id", k=K).collect()
    assert len(cand) == 10
    for r in cand:
        assert r.est_low == 500 and r.est_high == 500
