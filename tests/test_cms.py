"""Count-Min Sketch invariants: one-sided error and exact mergeability.

CMS (Cormode & Muthukrishnan, J.Alg'05) guarantees est >= exact for
every key (counters only ever over-count, by hash collision), and the
sketch merges by element-wise counter addition. Both properties are the
reason it is the frequency sketch a 100 TB rollup pipeline wants:
daily counters sum into exact monthly counters without rescanning
events. The cross-engine ESTIMATE equality is covered by the oracle
gate (cms_heavy_hitters_daily / _monthly_rollup); these tests pin the
sketch-theoretic invariants the oracle cannot express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetaggregates_spark.plans import events as ev

SF_DIR = "/root/testdata/sf0.001"


def test_cms_estimate_never_underestimates(spark):
    out = ev.cms_heavy_hitters_daily(spark, SF_DIR)
    bad = out.filter(F.col("est_cnt") < F.col("exact_cnt")).count()
    assert bad == 0


def test_cms_monthly_rollup_overestimates_and_ranks(spark):
    out = ev.cms_heavy_hitters_monthly_rollup(spark, SF_DIR).collect()
    assert out, "monthly rollup produced no rows"
    for row in out:
        assert row.est_cnt >= row.exact_cnt
    # ranks are 1..k without gaps per month (deterministic tiebreaks)
    by_month: dict = {}
    for row in out:
        by_month.setdefault(row.month, []).append(row.rnk)
    for ranks in by_month.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_cms_merge_is_exact(spark):
    """Merged daily counters == from-scratch monthly counters,
    cell-for-cell: the merge adds NOTHING beyond counter addition, so a
    rollup can run forever without drift."""
    from tweetaggregates_spark.sources.tables import load_table

    events = load_table(spark, SF_DIR, "events")
    day = F.window("ts", "1 day")["end"]
    month_of = F.date_trunc("month", day - F.expr("INTERVAL 1 SECOND"))

    daily = ev._cms_counters(events, day)
    merged = (
        daily.select(
            F.date_trunc(
                "month", F.col("bucket") - F.expr("INTERVAL 1 SECOND")
            ).alias("bucket"),
            "r",
            "c",
            "cnt",
        )
        .groupBy("bucket", "r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )
    scratch = ev._cms_counters(events, month_of)
    assert merged.exceptAll(scratch).count() == 0
    assert scratch.exceptAll(merged).count() == 0
