"""E2E test of the reference pipeline (Query.SimpleAggregate shape) on a
deterministic NDJSON fixture — the reference's own offline replay loop
(Readme.Md:27-30)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tests.fixtures import make_tweets
from tweetaggregates_spark.plans import tweets as tp


@pytest.fixture(scope="module")
def fixture_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("tweets") / "tweets.ndjson"
    p.write_text("\n".join(make_tweets(2000, seed=42)) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def flat(spark, fixture_path):
    df = tp.parse_tweets(spark.read.text(fixture_path)).persist()
    df.count()
    yield df
    df.unpersist()


def _expected_valid_count(lines):
    n = 0
    for line in lines:
        try:
            t = json.loads(line)
        except json.JSONDecodeError:
            continue
        if not isinstance(t, dict) or not isinstance(t.get("id"), int):
            continue
        if t.get("timestamp_ms"):
            n += 1
    return n


def test_parse_drops_invalid(flat):
    lines = make_tweets(2000, seed=42)
    assert flat.count() == _expected_valid_count(lines)


def test_counts_partition_input(flat):
    total = flat.count()
    counts = tp.tumbling_counts(flat)
    assert counts.agg(F.sum("cnt")).collect()[0][0] == total
    # every event lands in exactly 10 hopping windows (10min/1min)
    hop = tp.hopping_counts(flat)
    assert hop.agg(F.sum("cnt")).collect()[0][0] == total * 10


def test_text_coalesce(flat):
    # ~20% of tweets have extended_tweet -> text comes from full_text
    ext = flat.filter(F.col("text").startswith("extended text")).count()
    assert ext > 0
    # retweets without own extended_tweet get the original's full_text
    orig = flat.filter(F.col("text").startswith("original ")).count()
    assert orig > 0


def test_top_mentions_shape(flat):
    m = tp.top_entities(flat, "mentions", "screen_name")
    rows = m.collect()
    assert rows
    per_window = {}
    for r in rows:
        per_window.setdefault(r.window_time, 0)
        per_window[r.window_time] += 1
        assert 1 <= len(r.top_tweets) <= 10
        # D3: no duplicate effective ids inside top_tweets
        eff = [
            t.id if t.original_tweet_id == -1 else t.original_tweet_id
            for t in r.top_tweets
        ]
        assert len(eff) == len(set(eff))
        # examples sorted by follower_count desc
        fcs = [t.follower_count for t in r.top_tweets]
        assert fcs == sorted(fcs, reverse=True)
    assert max(per_window.values()) <= 10


def test_top_retweets_shape(flat):
    r = tp.top_retweets(flat)
    rows = r.collect()
    assert rows
    for row in rows:
        assert 1000 <= row.id < 1030  # only pool originals
        assert 1 <= len(row.top_users) <= 10
        assert row.tweet_count >= len(set(row.top_users)) - 0  # sanity


def test_aggregate_bundle_keys(flat):
    bundle = tp.tweet_aggregates(flat)
    assert set(bundle) == {
        "counts",
        "hopping_counts",
        "mentions",
        "hashtags",
        "retweets",
    }
