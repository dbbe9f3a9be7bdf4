"""Store sink + read surface tests (SURVEY §2.1 S7, §2.8 Q1-Q7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.fixtures import make_tweets
from tweetaggregates_spark.plans import tweets as tp
from tweetaggregates_spark.store import AggregateStore


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("store")
    lines_path = p / "tweets.ndjson"
    lines_path.write_text("\n".join(make_tweets(1000, seed=7)) + "\n")
    flat = tp.parse_tweets(spark.read.text(str(lines_path))).persist()
    st = AggregateStore(spark, str(p / "agg"))
    bundle = tp.tweet_aggregates(flat)
    for fam, df in bundle.items():
        st.write(fam, df)
    flat.unpersist()
    return st


def test_roundtrip_counts(store):
    counts = store.read("counts")
    assert counts.count() > 0
    assert set(counts.columns) == {"window_time", "cnt"}


def test_summary(store):
    row = store.get_summary().collect()[0]
    assert row.min_date <= row.max_date
    assert row.number_of_tweets > 0
    assert row.window_count > 0


def test_range_scan_half_open(store):
    counts = store.read("counts").orderBy("window_time").collect()
    start, end = counts[0].window_time, counts[-1].window_time
    got = store.get_counts(str(start), str(end)).collect()
    # half-open: excludes the last window
    assert len(got) == len(counts) - 1
    assert [r.window_time for r in got] == [r.window_time for r in counts[:-1]]


def test_recent_n(store):
    rec = store.get_recent("hopping_counts", 3).collect()
    assert len(rec) == 3
    times = [r.window_time for r in rec]
    assert times == sorted(times, reverse=True)


def test_top_entity_filter(store):
    m = store.read("mentions")
    some = m.select("screen_name").first().screen_name
    span = m.agg(F.min("window_time"), F.max("window_time")).collect()[0]
    got = store.get_top(
        "mentions", str(span[0]), str(span[1] + __import__("datetime").timedelta(minutes=1)), entity=some
    )
    rows = got.collect()
    assert rows
    assert all(r.screen_name == some for r in rows)


def test_print_db(store):
    out = store.print_db(2)
    assert "summary" in out and "counts" in out


def test_prefix_seek_quirk(store):
    """The quirk variant returns the intended rows PLUS later-keyed
    entities of the seek window (RocksDBStore.cs:242-245)."""
    m = store.read("mentions").orderBy("window_time").collect()
    w0 = m[0].window_time
    names_in_w0 = sorted(r.screen_name for r in m if r.window_time == w0)
    if len(names_in_w0) < 2:
        import pytest

        pytest.skip("need >=2 entities in first window")
    pivot = names_in_w0[1]
    end = str(m[-1].window_time)
    got = store.get_top_prefix_seek("mentions", str(w0), end, pivot).collect()
    got_w0 = sorted(r.screen_name for r in got if r.window_time == w0)
    # seek starts at (w0, pivot): names before pivot in w0 excluded
    assert got_w0 == [n for n in names_in_w0 if n >= pivot]
    # but later windows are NOT filtered by entity (the quirk)
    later = {r.window_time for r in got if r.window_time != w0}
    expected_later = {r.window_time for r in m if r.window_time not in (w0, m[-1].window_time)}
    assert expected_later <= later | {m[-1].window_time}
