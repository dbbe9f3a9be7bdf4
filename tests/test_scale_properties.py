"""Scale-behavior assertions (SCALE.md claims must be visible in plans)
and hypothesis property tests for the core operators."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.fixtures import make_tweets
from tweetaggregates_spark.plans import tweets as tp
from tweetaggregates_spark.store import AggregateStore


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("prune")
    p = root / "t.ndjson"
    p.write_text("\n".join(make_tweets(600, seed=9)) + "\n")
    flat = tp.parse_tweets(spark.read.text(str(p)))
    st_ = AggregateStore(spark, str(root / "agg"))
    st_.write("counts", tp.tumbling_counts(flat))
    return st_


def test_range_scan_prunes_partitions(store):
    """The window_date partition filter must appear in the physical plan
    — the parquet analog of the reference's key-ordered seek."""
    df = store.get_counts("2024-01-01 00:00:00", "2024-01-01 00:30:00")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the pushed filter on window_time reaches the scan too
    assert "window_time" in plan


def test_topk_is_take_ordered(store):
    plan = store.get_recent("counts", 3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


@st.composite
def event_rows(draw):
    n = draw(st.integers(5, 40))
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                base + datetime.timedelta(seconds=draw(st.integers(0, 3600))),
                draw(st.integers(0, 4)),
                float(draw(st.integers(0, 1000))),
            )
        )
    return rows


@settings(max_examples=10, deadline=None)
@given(rows=event_rows())
def test_hopping_window_multiplicity(spark, rows):
    """Every event lands in exactly size/slide hopping windows, whatever
    the data: sum(hopping counts) == 10 * #events."""
    df = spark.createDataFrame(rows, "id long, ts timestamp, k long, v double")
    total = (
        df.groupBy(F.window("ts", "10 minutes", "1 minute"))
        .count()
        .agg(F.sum("count"))
        .collect()[0][0]
    )
    assert total == 10 * len(rows)


@settings(max_examples=10, deadline=None)
@given(rows=event_rows())
def test_rank_topk_bounded_and_ordered(spark, rows):
    from tweetaggregates_spark.operators.topk import rank_topk

    df = spark.createDataFrame(rows, "id long, ts timestamp, k long, v double")
    out = rank_topk(df, ["k"], "v", ["id"], 3, rank_name="r", keep_rank=True)
    got = out.collect()
    by_k = {}
    for r in got:
        by_k.setdefault(r.k, []).append(r)
    for k, rs in by_k.items():
        assert len(rs) <= 3
        rs.sort(key=lambda r: r.r)
        vs = [r.v for r in rs]
        assert vs == sorted(vs, reverse=True)
        # rank_topk output must be the true top by (v desc, id asc)
        all_k = sorted(
            [r for r in rows if r[2] == k],
            key=lambda t: (-t[3], t[0]),
        )[: len(rs)]
        assert [(r.id, r.v) for r in rs] == [(t[0], t[3]) for t in all_k]


@st.composite
def doc_corpus(draw):
    """Small random corpora with word-salad texts including planted
    near-identical pairs."""
    vocab = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta",
             "theta", "iota", "kappa"]
    n = draw(st.integers(4, 16))
    rows = []
    for i in range(n):
        words = draw(
            st.lists(st.sampled_from(vocab), min_size=1, max_size=12)
        )
        rows.append((i, " ".join(words)))
        if draw(st.booleans()):
            rows.append((i + 1000, " ".join(words + ["tail"])))
    return rows


@given(doc_corpus())
@settings(max_examples=8, deadline=None)
def test_simhash_banding_pigeonhole_property(spark, corpus):
    """Property: for ANY corpus and max_hamming, banded pair generation
    equals the all-pairs join exactly (the pigeonhole guarantee is
    data-independent)."""
    from tweetaggregates_spark.operators import dedup

    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    banded = {
        tuple(r)
        for r in dedup.simhash_pairs_banded(df, max_hamming=3).collect()
    }
    allp = {
        tuple(r) for r in dedup.simhash_pairs(df, max_hamming=3).collect()
    }
    assert banded == allp
