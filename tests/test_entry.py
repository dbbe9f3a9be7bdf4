"""Smoke tests for the driver contract (__spark_entry__)."""

from __future__ import annotations

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "window_time",
        "entity",
        "tweet_count",
        "follower_count_sum",
        "rank",
    }


def test_queries_and_oracles_aligned(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "queries() must not be empty"
    for name in oracles:
        assert name in qs, f"oracle {name} has no query"


def test_flagship_topk_bounded(spark):
    df = entry_mod.queries()["top_users_hopping"](spark, SF)
    import pyspark.sql.functions as F

    per_window = df.groupBy("window_time").count().agg(F.max("count")).collect()[0][0]
    assert per_window <= 10
