"""Tests for beyond-reference extensions: session windows, approx
distinct accuracy, set ops, late-data clamp (Trill Adjust emulation)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from tweetaggregates_spark.operators.window import clamp_late
from tweetaggregates_spark.plans import events as ev

SF = "/root/testdata/sf0.001"


def test_session_window_gap_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 1, 0, 0)),
            (1, datetime.datetime(2024, 1, 1, 2, 0)),   # same session
            (1, datetime.datetime(2024, 1, 1, 9, 0)),   # 7h gap -> new
            (2, datetime.datetime(2024, 1, 1, 0, 0)),
        ],
        "user_id long, ts timestamp",
    ).withColumn("value", F.lit(1.0)).withColumn("props", F.lit("x"))
    out = (
        df.groupBy(F.session_window("ts", "6 hours").alias("w"), "user_id")
        .count()
        .select("user_id", F.col("w.start").alias("s"), F.col("w.end").alias("e"))
        .collect()
    )
    u1 = sorted([r for r in out if r.user_id == 1], key=lambda r: r.s)
    assert len(u1) == 2
    # session end = last event + gap
    assert u1[0].e == datetime.datetime(2024, 1, 1, 8, 0)


def test_approx_distinct_close_to_exact(spark):
    exact = {
        r.window_time: r.n_users
        for r in ev.distinct_users_daily(spark, SF).collect()
    }
    approx = {
        r.window_time: r.n_users_approx
        for r in ev.approx_users_daily(spark, SF).collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(2, 0.1 * exact[k])


def test_clamp_late_adjusts_forward(spark):
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base - datetime.timedelta(seconds=3)),   # within tolerance
            (3, base - datetime.timedelta(seconds=60)),  # beyond -> clamped
        ],
        "id long, ts timestamp",
    )
    out = {r.id: r.ts for r in clamp_late(df, "ts").collect()}
    assert out[1] == base
    assert out[2] == base - datetime.timedelta(seconds=3)
    # Trill DisorderPolicy.Adjust: clamp to (max_seen - tolerance)
    assert out[3] == base - datetime.timedelta(seconds=5)


def test_except_day_scoped(spark):
    rows = ev.clickers_without_purchase(spark, SF).collect()
    # result is a set of user ids, no duplicates
    ids = [r.user_id for r in rows]
    assert len(ids) == len(set(ids))


def _formatted_plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_pushdown_plan(spark):
    """Q6's predicates must reach the parquet scan and the scan must
    read only the referenced columns — the pushdown/pruning contract
    that makes scan-side queries scale with selectivity, not table
    size."""
    from tweetaggregates_spark.plans import star

    plan = _formatted_plan(star.q6_revenue_change(spark, "/root/testdata/sf0.001"))
    assert "GreaterThanOrEqual(l_shipdate" in plan  # range pushed
    assert "LessThan(l_quantity" in plan
    scan_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    assert "l_orderkey" not in scan_schema  # pruned
    assert "l_returnflag" not in scan_schema
    assert "l_extendedprice" in scan_schema


def test_q18_aggregates_before_join(spark):
    """Q18 groups the fact table BEFORE joining back to orders/customer
    — the HAVING survivors (~1%) are what shuffles into the joins."""
    from tweetaggregates_spark.plans import star

    plan = _formatted_plan(star.q18_large_orders(spark, "/root/testdata/sf0.001"))
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1


def test_kmv_estimate_accuracy(spark):
    """KMV(k=64) must land within ~4 sigma (sigma ~ 1/sqrt(k-2) ~ 13%)
    of the exact distinct count on every day window."""
    from tweetaggregates_spark.plans.events import kmv_users_daily

    rows = kmv_users_daily(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        exact, est = r["n_users_exact"], r["n_users_kmv"]
        assert abs(est - exact) <= max(0.5 * exact, 5), (exact, est)
