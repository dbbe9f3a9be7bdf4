"""Pane-based hopping aggregation must be exactly equivalent to the
naive explode-x10 plan (it's an execution-strategy choice, not a
semantics change)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetaggregates_spark.operators.window import hopping_paned, windowed_count
from tweetaggregates_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_paned_counts_equal_naive(spark):
    ev = load_table(spark, SF, "events")
    naive = sorted(
        (r.window_time, r.cnt)
        for r in windowed_count(ev, "ts", "10 minutes", "1 minute", "cnt").collect()
    )
    paned = sorted(
        (r.window_time, r.cnt)
        for r in hopping_paned(
            ev, "ts", [], {"cnt": (F.count(F.lit(1)), F.sum)}
        ).collect()
    )
    assert naive == paned


def test_paned_entity_sums_equal_naive(spark):
    ev = load_table(spark, SF, "events").withColumn(
        "v", F.col("value").cast("decimal(18,6)")
    )
    naive = sorted(
        (r.window_time, r.user_id, r.cnt, r.s)
        for r in (
            ev.groupBy(
                F.window("ts", "10 minutes", "1 minute").alias("w"), "user_id"
            )
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("s"))
            .select(F.col("w.end").alias("window_time"), "user_id", "cnt", "s")
        ).collect()
    )
    paned = sorted(
        (r.window_time, r.user_id, r.cnt, r.s)
        for r in hopping_paned(
            ev,
            "ts",
            ["user_id"],
            {"cnt": (F.count(F.lit(1)), F.sum), "s": (F.sum("v"), F.sum)},
        ).collect()
    )
    assert naive == paned
