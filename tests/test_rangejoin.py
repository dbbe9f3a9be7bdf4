"""Range (point-in-interval) join operator (operators/rangejoin.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetaggregates_spark.operators.rangejoin import (
    point_in_interval_join,
    quantile_intervals,
)
from tweetaggregates_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_range_join_is_broadcast_hash_with_residual(spark):
    """With an equi key the range join must plan as BroadcastHashJoin
    (range predicate as residual), never a nested loop over the fact
    table — the property that makes it scan-shaped at 100 TB."""
    from tweetaggregates_spark.plans.sequence import value_bucket_histogram

    plan = _plan(value_bucket_histogram(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_quantile_intervals_partition_completely(spark):
    """The interval table covers (-inf, inf) per key with no gaps or
    overlaps: every fact row lands in exactly one bucket, so the
    bucket counts sum to the table count."""
    ev = load_table(spark, SF, "events").select("event_type", "value")
    iv = quantile_intervals(ev, "value", "event_type")
    j = point_in_interval_join(ev, iv, "value", equi_keys=["event_type"])
    assert j.count() == ev.count()
    # exactly one bucket per row
    per_row = (
        j.groupBy("event_type", "value").count().filter("count > 4").count()
    )
    assert per_row == 0


def test_range_join_tier_lookup(spark):
    """Classic rate-card shape: a hand-built global tier table (no equi
    key) assigns each order its price tier."""
    orders = load_table(spark, SF, "orders")
    spark_df = spark.createDataFrame(
        [(1, 0.0, 50_000.0), (2, 50_000.0, 150_000.0),
         (3, 150_000.0, float("inf"))],
        "tier int, lo double, hi double",
    )
    j = point_in_interval_join(orders, spark_df, "o_totalprice")
    assert j.count() == orders.filter(F.col("o_totalprice") >= 0).count()
    assert j.groupBy("tier").count().count() >= 2
