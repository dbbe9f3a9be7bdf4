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


def test_mg_partial_properties_hypothesis():
    """The per-partition MG summary is a pure function — drive it with
    hypothesis directly (no Spark): for ANY stream and ANY batch split,
    (a) counters hold <= k keys, (b) cnt(key) <= true(key) <=
    cnt(key) + err for surviving keys and true(key) <= err for dropped
    keys, (c) err <= n/(k+1)."""
    import pandas as pd
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tweetaggregates_spark.operators.heavyhitters import _mg_partial

    @settings(max_examples=200, deadline=None)
    @given(
        stream=st.lists(st.integers(min_value=0, max_value=30), max_size=300),
        k=st.integers(min_value=1, max_value=8),
        cut=st.integers(min_value=0, max_value=300),
    )
    def run(stream, k, cut):
        cut = min(cut, len(stream))
        batches = [
            pd.DataFrame({"user_id": part})
            for part in (stream[:cut], stream[cut:])
            if part
        ]
        out = pd.concat(list(_mg_partial("user_id", k)(iter(batches))))
        err = int(out[out["user_id"].isna()]["err"].iloc[0])
        counters = {
            int(r["user_id"]): int(r["cnt"])
            for _, r in out[out["user_id"].notna()].iterrows()
        }
        true = Counter(stream)
        assert len(counters) <= k
        assert err <= len(stream) // (k + 1)
        for key, cnt in counters.items():
            assert cnt <= true[key] <= cnt + err
        for key, t in true.items():
            if key not in counters:
                assert t <= err

    run()


def test_mg_candidates_feed_cms_estimator(spark):
    """The documented production composition: Misra-Gries discovers a
    bounded candidate set, the Count-Min counters estimate each
    candidate's frequency (plans/events._cms_estimate). Every estimate
    must bracket within CMS's one-sided error: exact <= est, and the
    planted heavy key must come out on top of the estimates."""
    from pyspark.sql import functions as F2

    from tweetaggregates_spark.plans.events import (
        _cms_counters,
        _cms_estimate,
    )

    df = _skewed(spark, 8)
    cand = heavy_hitter_candidates(df, "user_id", k=K).withColumn(
        "grp", F.lit("all")
    )
    counters = _cms_counters(df, F2.lit("all"))
    est = _cms_estimate(cand.select("grp", "user_id"), counters, "grp")
    exact = df.groupBy("user_id").agg(F2.count(F2.lit(1)).alias("true_cnt"))
    rows = est.join(exact, "user_id").collect()
    assert rows
    for r in rows:
        assert r.est_cnt >= r.true_cnt  # CMS overestimates only
    top = max(rows, key=lambda r: (r.est_cnt, r.user_id))
    assert top.user_id == 999


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


def test_mg_string_keys(spark):
    """ADVICE r3: the output schema derives the key type from the input
    column — string keys (the common heavy-hitter domain: URLs, user
    names) must work, not just longs."""
    rows = [("alpha",)] * 50 + [("beta",)] * 30 + [("gamma",)] * 5
    df = spark.createDataFrame(rows, "name string").repartition(4)
    out = heavy_hitter_candidates(df, "name", k=8)
    assert dict(out.dtypes)["name"] == "string"
    est = {r.name: (r.est_low, r.est_high) for r in out.collect()}
    for key, true in (("alpha", 50), ("beta", 30), ("gamma", 5)):
        assert key in est
        lo, hi = est[key]
        assert lo <= true <= hi
