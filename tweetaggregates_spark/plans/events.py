"""Reference-shaped queries over the driver ``events`` table
(FIXTURES.md §2 mapping: ts=event time, user_id/event_type=entity,
value=weight, struct(event_id,...)=payload).

Every query here has a DuckDB oracle twin in ``__spark_entry__.py``.
Determinism rules (SURVEY §7):
  * every top-k / rank carries a unique tiebreaker;
  * double sums go through DECIMAL(18,6) so the aggregation is exact and
    engine/order independent, then one final cast back to double;
  * window_time is always the window END (Query.cs:50,164).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tweetaggregates_spark.operators.aggregate import (
    db_summary,
    entity_window_agg,
    top_entities_per_window,
)
from tweetaggregates_spark.operators.topk import dedupe_array_keep_first
from tweetaggregates_spark.operators.window import windowed_count
from tweetaggregates_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _dec(col):
    """Deterministic double aggregation: exact decimal addend."""
    return F.col(col).cast("decimal(18,6)") if isinstance(col, str) else col.cast("decimal(18,6)")


def tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/W3: count per 10-min tumbling window (TumblingCounts,
    Query.cs:45-50)."""
    return windowed_count(_events(spark, sf_dir), "ts", "10 minutes", None, "cnt")


def hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/W4: count per 10-min/1-min hopping window (HoppingCounts,
    Query.cs:142-146)."""
    return windowed_count(
        _events(spark, sf_dir), "ts", "10 minutes", "1 minute", "cnt"
    )


def top_users_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP (A2+A6 shape, Query.cs:54-88 with user_id as the entity
    and value as the follower-count weight): per 10-min/1-min hopping
    window, the top-10 user_ids by sum(value), with event counts.

    Scalar output (no arrays) so the DuckDB twin hash-compares exactly:
    window_time, entity, tweet_count, follower_count_sum, rank.
    """
    ev = _events(spark, sf_dir).withColumn("value", _dec("value"))
    stage1 = entity_window_agg(ev, "user_id", "value", payload_cols=None)
    out = top_entities_per_window(stage1, k=10, tiebreak="entity")
    return out.select(
        "window_time",
        "entity",
        "tweet_count",
        F.col("follower_count_sum").cast("double").alias("follower_count_sum"),
        "rank",
    )


def top_event_types_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 shape with event_type as the entity over tumbling windows:
    per 10-min window, top-5 event types by sum(value)."""
    ev = _events(spark, sf_dir).withColumn("value", _dec("value"))
    stage1 = entity_window_agg(
        ev, "event_type", "value", payload_cols=None, slide=None, size="10 minutes"
    )
    out = top_entities_per_window(stage1, k=5, tiebreak="entity")
    return out.select(
        "window_time",
        "entity",
        "tweet_count",
        F.col("follower_count_sum").cast("double").alias("follower_count_sum"),
        "rank",
    )


def top_users_with_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A5+D3+A6 full shape (TopMentions, Query.cs:58-88): per hopping
    window, top-10 users by sum(value), each with its top-3 max-value
    example events, deduped by event_type keeping the max-value example
    (the D3 array-local dedupe, Query.cs:82-83).

    Exploded to scalar rows (window_time, entity, rank, example_rank,
    event_id, example_value) so the oracle can hash-compare it.
    """
    ev = _events(spark, sf_dir).withColumn("valued", _dec("value"))
    stage1 = entity_window_agg(
        ev,
        "user_id",
        "valued",
        payload_cols=[F.col("event_id"), F.col("event_type")],
        k_examples=3,
    )
    top = top_entities_per_window(stage1, k=10, tiebreak="entity")
    # D3: dedupe the example array by event_type, keep max (w, event_id)
    deduped = top.withColumn(
        "top_payloads",
        dedupe_array_keep_first(F.col("top_payloads"), lambda x: x["event_type"]),
    )
    return deduped.select(
        "window_time",
        "entity",
        "rank",
        F.posexplode("top_payloads").alias("pos", "ex"),
    ).select(
        "window_time",
        "entity",
        "rank",
        (F.col("pos") + 1).alias("example_rank"),
        F.col("ex.event_id").alias("event_id"),
        F.col("ex.w").cast("double").alias("example_value"),
    )


def events_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/Q1 (DbSummary) applied to the tumbling counts family."""
    counts = tumbling_counts(spark, sf_dir)
    return db_summary(counts, "window_time", "cnt")
