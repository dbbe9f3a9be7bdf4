"""The bounded (pre-ranked) entity aggregation must produce exactly the
fused collect_list version's output — same counts, sums, and example
arrays in the same order."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.fixtures import make_tweets
from tweetaggregates_spark.operators.aggregate import (
    entity_window_agg,
    entity_window_agg_bounded,
)
from tweetaggregates_spark.operators.project import explode_entities
from tweetaggregates_spark.plans import tweets as tp


def test_bounded_equals_fused(spark, tmp_path):
    p = tmp_path / "tweets.ndjson"
    p.write_text("\n".join(make_tweets(1200, seed=5)) + "\n")
    flat = tp.parse_tweets(spark.read.text(str(p))).persist()
    exploded = explode_entities(flat, "mentions", "entity").persist()
    payload = [F.col("id"), F.col("text")]

    fused = entity_window_agg(
        exploded, "entity", "follower_count", payload_cols=payload, k_examples=5
    )
    bounded = entity_window_agg_bounded(
        exploded, "entity", "follower_count", payload_cols=payload, k_examples=5
    )

    def norm(df):
        return sorted(
            [
                (
                    r.window.end,
                    r.entity,
                    r.tweet_count,
                    r.follower_count_sum,
                    tuple((p.w, p.id) for p in r.top_payloads),
                )
                for r in df.collect()
            ]
        )

    assert norm(fused) == norm(bounded)
    flat.unpersist()
    exploded.unpersist()
