"""Property tests (hypothesis) for the round-8 algorithmic cores:
the grouped bucket-split rank and the deterministic-KLL sketch /
prune, each checked against a pure reference on random inputs
(duplicate order keys, NULLs, skewed groups, both sort directions,
random capacities)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tweetaggregates_spark.operators.kllsketch import (
    kll_prune,
    kll_sketch_items,
)
from tweetaggregates_spark.operators.prefix import grouped_partitioned_rank


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # group (0 heavily reused -> skew)
            st.one_of(st.none(), st.integers(-4, 4)),  # order key w/ dups
        ),
        min_size=1,
        max_size=80,
    ),
    n_buckets=st.sampled_from([2, 4, 16]),
    ascending=st.booleans(),
)
def test_grouped_rank_equals_one_window(spark, rows, n_buckets, ascending):
    df = spark.createDataFrame(
        [
            (f"g{g}", float(v) if v is not None else None, i)
            for i, (g, v) in enumerate(rows)
        ],
        "grp STRING, key DOUBLE, rid LONG",
    ).repartition(4)
    got = grouped_partitioned_rank(
        df,
        ["grp"],
        "key",
        ["rid"],
        ascending=ascending,
        n_buckets=n_buckets,
        rank_name="rnk",
        count_name="n",
    )
    order = F.asc("key") if ascending else F.desc("key")
    w = W.partitionBy("grp").orderBy(order, F.asc("rid"))
    want = df.withColumn("rnk", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(W.partitionBy("grp"))
    )
    cols = ["grp", "rid", "rnk", "n"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )


@settings(max_examples=6, deadline=None)
@given(
    n=st.integers(1, 400),
    k=st.sampled_from([1, 2, 5, 16]),
    seed=st.integers(0, 10_000),
)
def test_kll_weight_and_bound_property(spark, n, k, seed):
    """For random (n, k): total kept weight == n exactly, and for every
    corpus value the sketch's rank estimate is within the carried
    2^l* - 1 bound."""
    vals = [float((i * 2654435761 + seed) % 997) / 13.0 for i in range(n)]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)],
        "event_id BIGINT, grp STRING, value DOUBLE",
    ).repartition(4)
    rows = kll_sketch_items(df, ["grp"], "value", "event_id", k=k).collect()
    assert sum(r._w for r in rows) == n
    err = rows[0]._err
    sk = sorted((r.value, r._w) for r in rows)
    svals = sorted(vals)
    # spot-check every ~10th rank plus the extremes (full scan is slow
    # driver-side at n=400 x examples)
    for q_idx in {1, n, *range(1, n + 1, max(1, n // 10))}:
        v = svals[q_idx - 1]
        est = sum(w for (sv, w) in sk if sv <= v)
        true = sum(1 for x in vals if x <= v)
        assert abs(est - true) <= err, (n, k, q_idx, est, true, err)


@settings(max_examples=6, deadline=None)
@given(
    items=st.lists(
        st.tuples(
            st.integers(-50, 50),  # value (dups likely)
            st.integers(1, 64),  # weight
        ),
        min_size=1,
        max_size=60,
    ),
    k=st.sampled_from([1, 4, 8]),
)
def test_kll_prune_property(spark, items, k):
    """PRUNE on an arbitrary weighted bag: weight preserved exactly,
    <= k+1 survivors, and every survivor's cumulative weight equals
    the pre-prune cumulative at the same (value, h) position — the
    property the +step error bound rests on."""
    total = sum(w for _, w in items)
    df = spark.createDataFrame(
        [
            ("g", float(v), hash((i, v)) % (1 << 40), w, total, 7)
            for i, (v, w) in enumerate(items)
        ],
        "grp STRING, value DOUBLE, _h BIGINT, _w BIGINT, _n BIGINT, _err BIGINT",
    )
    pruned = kll_prune(df, ["grp"], "value", k=k).collect()
    assert len(pruned) <= k + 1
    assert sum(r._w for r in pruned) == total
    assert all(r._err == 7 + math.ceil(total / k) for r in pruned)
    # cumulative consistency
    pre = sorted(
        ((r["value"], r["_h"]), r["_w"])
        for r in df.collect()
    )
    cum, cum_at = 0, {}
    for key, w in pre:
        cum += w
        cum_at[key] = cum
    run = 0
    for r in sorted(pruned, key=lambda r: (r.value, r._h)):
        run += r._w
        assert run == cum_at[(r.value, r._h)]
    assert run == total
