"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()[name](spark, sf_dir)`` and ``oracle_sql()[name]`` are the
per-operator correctness pairs the driver hash-compares at sf0.01
(row count + schema + order-insensitive value hash).

Determinism conventions shared by every pair (SURVEY.md §7):
  * top-k / rank always carries a unique tiebreaker;
  * double sums aggregate via DECIMAL(18,6) (exact, order-independent),
    with one final cast back to DOUBLE in both engines;
  * count()/sum(bigint) cast to BIGINT in DuckDB (avoids HUGEINT);
  * row_number cast to INTEGER in DuckDB (matches Spark IntegerType);
  * window_time = window END (Query.cs:50,164); windows epoch-aligned in
    both engines (Spark ``window()`` and DuckDB ``time_bucket``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tweetaggregates_spark.plans import events as ev

SF0001 = "/root/testdata/sf0.001"

# DuckDB fragment: explode each event into the 10 hopping windows
# (10 min size / 1 min hop) covering it; window_time = window end.
_HOP = """
  SELECT e.*, date_trunc('minute', e.ts) - (g.k * INTERVAL '1 minute')
              + INTERVAL '10 minutes' AS window_time
  FROM events e CROSS JOIN (SELECT unnest(range(10)) AS k) g
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per 10-min/1-min hopping window, top-10 user_ids by
    sum(value) with counts (SURVEY §7 M0)."""
    return ev.top_users_hopping(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tumbling_counts": ev.tumbling_counts,
        "hopping_counts": ev.hopping_counts,
        "top_users_hopping": ev.top_users_hopping,
        "top_event_types_tumbling": ev.top_event_types_tumbling,
        "top_users_with_examples": ev.top_users_with_examples,
        "events_summary": ev.events_summary,
        "counts_range": ev.counts_range,
        "top_users_for_entity": ev.top_users_for_entity,
        "recent_counts": ev.recent_counts,
        "running_total_counts": ev.running_total_counts,
        "top_retweets_shape": ev.top_retweets_shape,
        "json_props_daily": ev.json_props_daily,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tumbling_counts": """
            SELECT time_bucket(INTERVAL '10 minutes', ts)
                     + INTERVAL '10 minutes' AS window_time,
                   count(*) AS cnt
            FROM events GROUP BY 1
        """,
        "hopping_counts": f"""
            WITH hop AS ({_HOP})
            SELECT window_time, count(*) AS cnt FROM hop GROUP BY 1
        """,
        "top_users_hopping": f"""
            WITH hop AS ({_HOP}),
            s1 AS (
              SELECT window_time, user_id AS entity,
                     count(*) AS tweet_count,
                     sum(CAST(value AS DECIMAL(18,6))) AS vs
              FROM hop GROUP BY 1, 2
            ),
            r AS (
              SELECT *, row_number() OVER (
                       PARTITION BY window_time
                       ORDER BY vs DESC, entity ASC) AS rnk
              FROM s1
            )
            SELECT window_time, entity, tweet_count,
                   CAST(vs AS DOUBLE) AS follower_count_sum,
                   CAST(rnk AS INTEGER) AS rank
            FROM r WHERE rnk <= 10
        """,
        "top_event_types_tumbling": """
            WITH s1 AS (
              SELECT time_bucket(INTERVAL '10 minutes', ts)
                       + INTERVAL '10 minutes' AS window_time,
                     event_type AS entity,
                     count(*) AS tweet_count,
                     sum(CAST(value AS DECIMAL(18,6))) AS vs
              FROM events GROUP BY 1, 2
            ),
            r AS (
              SELECT *, row_number() OVER (
                       PARTITION BY window_time
                       ORDER BY vs DESC, entity ASC) AS rnk
              FROM s1
            )
            SELECT window_time, entity, tweet_count,
                   CAST(vs AS DOUBLE) AS follower_count_sum,
                   CAST(rnk AS INTEGER) AS rank
            FROM r WHERE rnk <= 5
        """,
        "top_users_with_examples": f"""
            WITH hop AS ({_HOP}),
            s1 AS (
              SELECT window_time, user_id AS entity,
                     sum(CAST(value AS DECIMAL(18,6))) AS vs
              FROM hop GROUP BY 1, 2
            ),
            top AS (
              SELECT window_time, entity,
                     CAST(row_number() OVER (
                       PARTITION BY window_time
                       ORDER BY vs DESC, entity ASC) AS INTEGER) AS rank
              FROM s1 QUALIFY rank <= 10
            ),
            -- per (window, user): rank examples by value desc, event_id desc
            ex AS (
              SELECT window_time, user_id AS entity, event_id, event_type,
                     CAST(value AS DECIMAL(18,6)) AS w,
                     row_number() OVER (
                       PARTITION BY window_time, user_id
                       ORDER BY CAST(value AS DECIMAL(18,6)) DESC,
                                event_id DESC) AS ex_rnk
              FROM hop QUALIFY ex_rnk <= 3
            ),
            -- D3 dedupe: within the k examples keep first per event_type
            dd AS (
              SELECT *, row_number() OVER (
                       PARTITION BY window_time, entity, event_type
                       ORDER BY ex_rnk ASC) AS dd_rnk
              FROM ex QUALIFY dd_rnk = 1
            ),
            renum AS (
              SELECT window_time, entity, event_id, w,
                     CAST(row_number() OVER (
                       PARTITION BY window_time, entity
                       ORDER BY ex_rnk ASC) AS INTEGER) AS example_rank
              FROM dd
            )
            SELECT t.window_time, t.entity, t.rank, r.example_rank,
                   r.event_id, CAST(r.w AS DOUBLE) AS example_value
            FROM top t JOIN renum r
              ON t.window_time = r.window_time AND t.entity = r.entity
        """,
        "events_summary": """
            WITH counts AS (
              SELECT time_bucket(INTERVAL '10 minutes', ts)
                       + INTERVAL '10 minutes' AS window_time,
                     count(*) AS cnt
              FROM events GROUP BY 1
            )
            SELECT min(window_time) AS min_date, max(window_time) AS max_date,
                   count(*) AS window_count,
                   CAST(sum(cnt) AS BIGINT) AS number_of_tweets
            FROM counts
        """,
        "counts_range": """
            SELECT time_bucket(INTERVAL '10 minutes', ts)
                     + INTERVAL '10 minutes' AS window_time,
                   count(*) AS cnt
            FROM events GROUP BY 1
            HAVING window_time >= TIMESTAMP '2024-01-05 00:00:00'
               AND window_time <  TIMESTAMP '2024-01-12 00:00:00'
        """,
        "top_users_for_entity": f"""
            WITH hop AS ({_HOP})
            SELECT window_time, user_id AS entity,
                   count(*) AS tweet_count,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     AS follower_count_sum
            FROM hop WHERE user_id = 0
            GROUP BY 1, 2
            HAVING window_time >= TIMESTAMP '2024-01-05 00:00:00'
               AND window_time <  TIMESTAMP '2024-01-12 00:00:00'
        """,
        "recent_counts": """
            SELECT time_bucket(INTERVAL '10 minutes', ts)
                     + INTERVAL '10 minutes' AS window_time,
                   count(*) AS cnt
            FROM events GROUP BY 1
            ORDER BY window_time DESC LIMIT 5
        """,
        "running_total_counts": """
            WITH counts AS (
              SELECT time_bucket(INTERVAL '10 minutes', ts)
                       + INTERVAL '10 minutes' AS window_time,
                     count(*) AS cnt
              FROM events GROUP BY 1
            )
            SELECT window_time, cnt,
                   CAST(sum(cnt) OVER (ORDER BY window_time
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS running_total
            FROM counts
        """,
        "top_retweets_shape": f"""
            WITH hop AS ({_HOP}),
            s1 AS (
              SELECT window_time, event_type AS entity,
                     max(props) AS representative,
                     count(*) AS tweet_count,
                     sum(CAST(value AS DECIMAL(18,6))) AS vs
              FROM hop GROUP BY 1, 2
            ),
            top AS (
              SELECT window_time, entity, representative, tweet_count,
                     CAST(vs AS DOUBLE) AS follower_count_sum,
                     CAST(row_number() OVER (
                       PARTITION BY window_time
                       ORDER BY vs DESC, entity ASC) AS INTEGER) AS rank
              FROM s1 QUALIFY rank <= 3
            ),
            users AS (
              SELECT window_time, event_type AS entity, user_id,
                     CAST(row_number() OVER (
                       PARTITION BY window_time, event_type
                       ORDER BY CAST(value AS DECIMAL(18,6)) DESC,
                                event_id DESC) AS INTEGER) AS user_rank
              FROM hop QUALIFY user_rank <= 3
            )
            SELECT t.window_time, t.entity, t.rank, t.representative,
                   t.tweet_count, t.follower_count_sum,
                   u.user_rank, u.user_id
            FROM top t JOIN users u
              ON t.window_time = u.window_time AND t.entity = u.entity
        """,
        "json_props_daily": """
            SELECT time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day'
                     AS window_time,
                   event_type,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                     AS BIGINT) AS k_sum,
                   count(*) AS cnt
            FROM events GROUP BY 1, 2
        """,
    }
