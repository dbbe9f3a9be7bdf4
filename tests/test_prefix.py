"""Range-partitioned two-pass prefix sum == single-task global window,
exactly, on every input shape (operators/prefix.py)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tweetaggregates_spark.operators.prefix import partitioned_prefix_sum


def _reference(df, order_col, value_col, tiebreakers=()):
    w = (
        W.orderBy(order_col, *tiebreakers)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return df.withColumn("running_total", F.sum(value_col).over(w))


def test_prefix_sum_matches_global_window(spark):
    df = spark.range(0, 5000, 1, 16).select(
        (F.col("id") * 37 % 991).alias("k"),
        (F.col("id") % 13 + 1).alias("v"),
        F.col("id"),
    )
    got = partitioned_prefix_sum(
        df, "k", "v", n_buckets=8, tiebreakers=["id"]
    )
    want = _reference(df, "k", "v", ("id",))
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in want.collect())
    assert a == b


def test_prefix_sum_duplicate_keys_stay_in_one_bucket(spark):
    # heavy duplication: only 3 distinct keys across 8 requested buckets
    df = spark.range(0, 300, 1, 8).select(
        (F.col("id") % 3).alias("k"), F.lit(1).alias("v"), F.col("id")
    )
    got = partitioned_prefix_sum(
        df, "k", "v", n_buckets=8, tiebreakers=["id"]
    )
    want = _reference(df, "k", "v", ("id",))
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want.collect()
    )


def test_prefix_sum_single_row_and_plan_partitioned(spark):
    df = spark.range(1).select(F.lit(5.0).alias("k"), F.lit(7).alias("v"))
    row = partitioned_prefix_sum(df, "k", "v").collect()[0]
    assert row.running_total == 7
    # the window in the plan is partitioned (no single-task global sort)
    big = spark.range(0, 1000, 1, 8).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    plan = partitioned_prefix_sum(
        big, "k", "v", n_buckets=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "partitionBy" not in plan  # sanity: string form differs
    assert "Window" in plan
    # every Window operator's partition spec is non-empty: Spark prints
    # `Window [...], [__b...]` with the partition columns second
    for line in plan.splitlines():
        if "Window [" in line:
            assert "__b" in line, line


def test_prefix_sum_null_keys_and_double_values(spark):
    """Review r4 fixes: NULL order keys sort first (matching the global
    window's ASC NULLS FIRST) without crashing the offset collect, and
    fractional values keep their natural double type — no silent
    truncation to long."""
    df = spark.createDataFrame(
        [(None, 0.5, 0), (1.0, 0.7, 1), (2.0, 0.25, 2), (None, 1.0, 3)],
        "k double, v double, rid long",
    )
    got = partitioned_prefix_sum(
        df, "k", "v", n_buckets=2, tiebreakers=["rid"]
    )
    assert dict(got.dtypes)["running_total"] == "double"
    want = _reference(df, "k", "v", ("rid",))
    from collections import Counter

    assert Counter(map(tuple, got.collect())) == Counter(
        map(tuple, want.collect())
    )
