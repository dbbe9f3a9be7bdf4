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


def test_hll_deterministic_accuracy(spark):
    """From-scratch deterministic HLL (512 registers, sigma ~4.6%):
    daily and register-merged monthly estimates must land within ~3
    sigma of exact, and the monthly registers must equal a direct
    whole-month sketch (max-merge is lossless)."""
    from tweetaggregates_spark.plans.events import (
        hll_users_daily,
        hll_users_monthly_rollup,
    )

    sf = "/root/testdata/sf0.01"
    daily = hll_users_daily(spark, sf).collect()
    assert daily
    for r in daily:
        exact, est = r["n_users_exact"], r["n_users_hll"]
        assert abs(est - exact) <= max(0.15 * exact, 5), (exact, est)
    monthly = hll_users_monthly_rollup(spark, sf).collect()
    assert monthly
    for r in monthly:
        exact, est = r["n_users_exact"], r["n_users_hll"]
        assert abs(est - exact) <= max(0.15 * exact, 5), (exact, est)


def test_quantile_sketch_accuracy(spark):
    """Bottom-k row sample (k=256): the estimated p50/p90 must land
    within the exact p40-p60 / p85-p95 rank windows on every day —
    rank error ~ 1/sqrt(k) ~ 6%."""
    from pyspark.sql import functions as F

    from tweetaggregates_spark.plans.events import (
        value_quantile_sketch_daily,
    )
    from tweetaggregates_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    est = {
        r["window_time"]: (r["p50_est"], r["p90_est"])
        for r in value_quantile_sketch_daily(spark, sf).collect()
    }
    ev = load_table(spark, sf, "events")
    bounds = {
        r["window_time"]: r
        for r in ev.groupBy(
            F.window("ts", "1 day").alias("w")
        )
        .agg(
            *[
                F.expr(f"percentile(value, {q})").alias(f"q{int(q*100)}")
                for q in (0.40, 0.60, 0.85, 0.95)
            ]
        )
        .select(F.col("w.end").alias("window_time"), "q40", "q60", "q85", "q95")
        .collect()
    }
    assert est
    for wt, (p50, p90) in est.items():
        b = bounds[wt]
        assert b["q40"] <= p50 <= b["q60"], (wt, p50, b["q40"], b["q60"])
        assert b["q85"] <= p90 <= b["q95"], (wt, p90, b["q85"], b["q95"])


def test_quantile_sketch_merges_exactly(spark):
    """The defining property: the monthly rollup of per-day bottom-k
    sketches must equal the bottom-k sketch built DIRECTLY from the
    month's raw rows — merging loses nothing (unlike kll/t-digest)."""
    from pyspark.sql import functions as F

    from tweetaggregates_spark.functions.hashing import hash64
    from tweetaggregates_spark.plans.events import (
        RANK_SKETCH_K,
        value_quantile_sketch_monthly,
    )
    from tweetaggregates_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rolled = value_quantile_sketch_monthly(spark, sf).collect()
    ev = load_table(spark, sf, "events")
    direct = (
        ev.select(
            F.date_trunc(
                "month",
                F.window("ts", "1 day")["end"]
                - F.expr("INTERVAL 1 SECOND"),
            ).alias("month"),
            hash64(F.col("event_id").cast("string")).alias("h"),
            "value",
        )
        .groupBy("month")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("h", "value"))),
                1,
                RANK_SKETCH_K,
            ).alias("sk"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "month",
            "n_events",
            F.size("sk").alias("sketch_size"),
            F.round(
                F.element_at(
                    F.array_sort(
                        F.transform("sk", lambda x: x["value"])
                    ),
                    F.greatest(
                        F.lit(1),
                        F.ceil(F.lit(0.5) * F.size("sk")).cast("int"),
                    ),
                ),
                6,
            ).alias("p50_est"),
            F.round(
                F.element_at(
                    F.array_sort(
                        F.transform("sk", lambda x: x["value"])
                    ),
                    F.greatest(
                        F.lit(1),
                        F.ceil(F.lit(0.9) * F.size("sk")).cast("int"),
                    ),
                ),
                6,
            ).alias("p90_est"),
        )
        .collect()
    )
    assert sorted(map(tuple, rolled)) == sorted(map(tuple, direct))
