"""Cross-engine check of the reference tweet DAG itself: the same NDJSON
fixture parsed by DuckDB's read_json must reproduce the Spark pipeline's
counts and per-entity aggregates (SURVEY §5 strategy item 1 applied to
the tweets surface, not just the testdata shapes)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.fixtures import make_tweets
from tweetaggregates_spark.plans import tweets as tp


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("oracle") / "tweets.ndjson"
    p.write_text("\n".join(make_tweets(1500, seed=21)) + "\n")
    flat = tp.parse_tweets(spark.read.text(str(p))).persist()
    con = duckdb.connect()
    # schema-on-read mirroring RAW_TWEET; garbage lines dropped like
    # from_json -> null (ignore_errors)
    con.sql(
        f"""
        CREATE VIEW flat AS
        SELECT id,
               CAST(to_timestamp(CAST(timestamp_ms AS BIGINT) / 1000.0)
                    AS TIMESTAMP) AS ts,
               coalesce(extended_tweet.full_text,
                        retweeted_status.extended_tweet.full_text,
                        text) AS text,
               usr.screen_name AS screen_name,
               coalesce(usr.followers_count, 0) AS follower_count,
               coalesce([h.text for h in entities.hashtags], []) AS hashtags,
               coalesce([m.screen_name for m in entities.user_mentions], [])
                 AS mentions,
               coalesce(retweeted_status.id, -1) AS original_tweet_id
        FROM read_json('{p}', format='newline_delimited', ignore_errors=true,
          columns={{
            'id': 'BIGINT', 'text': 'VARCHAR', 'timestamp_ms': 'VARCHAR',
            'extended_tweet': 'STRUCT(full_text VARCHAR)',
            'entities': 'STRUCT(hashtags STRUCT(text VARCHAR)[],
                                user_mentions STRUCT(screen_name VARCHAR)[])',
            'usr': 'STRUCT(screen_name VARCHAR, followers_count BIGINT)',
            'retweeted_status': 'STRUCT(id BIGINT,
                                 extended_tweet STRUCT(full_text VARCHAR))'
          }})
        WHERE id IS NOT NULL AND timestamp_ms IS NOT NULL
          AND timestamp_ms <> ''
        """.replace("'usr'", "'user'").replace("usr.", '"user".')
    )
    yield flat, con
    flat.unpersist()


def test_tumbling_counts_match(setup):
    flat, con = setup
    spark_counts = {
        (r.window_time, r.cnt) for r in tp.tumbling_counts(flat).collect()
    }
    duck_counts = set(
        con.sql(
            """
        SELECT time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes',
               count(*) FROM flat GROUP BY 1
        """
        ).fetchall()
    )
    assert spark_counts == duck_counts


def test_retweet_aggregates_match(setup):
    flat, con = setup
    spark_rows = {
        (r.window_time, r.id, r.tweet_count, r.follower_count_sum)
        for r in tp.top_retweets(flat)
        .select("window_time", "id", "tweet_count", "follower_count_sum")
        .collect()
    }
    duck_rows = set(
        con.sql(
            """
        WITH rt AS (
          SELECT * FROM flat WHERE original_tweet_id <> -1
        ),
        hop AS (
          SELECT date_trunc('minute', ts) - (g.k * INTERVAL '1 minute')
                   + INTERVAL '10 minutes' AS window_time,
                 original_tweet_id, follower_count
          FROM rt CROSS JOIN (SELECT unnest(range(10)) AS k) g
        ),
        s1 AS (
          SELECT window_time, original_tweet_id AS id,
                 count(*) AS tweet_count,
                 CAST(sum(follower_count) AS BIGINT) AS fcs
          FROM hop GROUP BY 1, 2
        )
        SELECT window_time, id, tweet_count, fcs
        FROM s1
        QUALIFY row_number() OVER (
          PARTITION BY window_time ORDER BY fcs DESC, id ASC) <= 10
        """
        ).fetchall()
    )
    assert spark_rows == duck_rows


def test_mention_aggregates_match(setup):
    flat, con = setup
    spark_rows = {
        (r.window_time, r.entity, r.tweet_count, r.follower_count_sum)
        for r in (
            tp.top_entities(flat, "mentions", "screen_name")
            .select(
                "window_time",
                F.col("screen_name").alias("entity"),
                "tweet_count",
                "follower_count_sum",
            )
            .collect()
        )
    }
    duck_rows = set(
        con.sql(
            """
        WITH ex AS (
          SELECT time_bucket(INTERVAL '1 minute', ts) AS bkt, ts,
                 unnest(mentions) AS entity, follower_count
          FROM flat WHERE len(mentions) > 0
        ),
        hop AS (
          SELECT date_trunc('minute', ts) - (g.k * INTERVAL '1 minute')
                   + INTERVAL '10 minutes' AS window_time,
                 entity, follower_count
          FROM ex CROSS JOIN (SELECT unnest(range(10)) AS k) g
        ),
        s1 AS (
          SELECT window_time, entity, count(*) AS tweet_count,
                 CAST(sum(follower_count) AS BIGINT) AS fcs
          FROM hop GROUP BY 1, 2
        )
        SELECT window_time, entity, tweet_count, fcs
        FROM s1
        QUALIFY row_number() OVER (
          PARTITION BY window_time ORDER BY fcs DESC, entity ASC) <= 10
        """
        ).fetchall()
    )
    assert spark_rows == duck_rows
