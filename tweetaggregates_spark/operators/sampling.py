"""Deterministic sampling, splitting, shuffling and sequence packing
for training-data pipelines.

Everything here is HASH-driven, not RNG-driven: membership of a row in
a sample / split / shuffle position is a pure function of (salt, key),
so results are reproducible across runs, engines, cluster sizes and
partitionings — the property training pipelines need (the same doc
always lands in the same split; re-running a job cannot leak test docs
into train). The hash is the portable 60-bit md5 hash
(functions/hashing.py), so the DuckDB oracle reproduces every query
bit-for-bit.

Scale design:
* sample / split / stratify are MAP-ONLY — a filter or projection on a
  hash expression, no shuffle at all; they compose with partition
  pruning and pushdown untouched.
* ``shuffle_order`` (deterministic global shuffle) avoids the classic
  single-partition ``row_number() OVER (ORDER BY ...)`` scale-killer:
  rows hash into ``n_buckets`` ordered buckets; position = in-bucket
  rank (a per-bucket window, parallel across buckets) + bucket offset
  (a cumulative sum over the tiny n_buckets-row count table). Two
  narrow shuffles, no global window. Same two-pass shape as
  ``repartitionByRange`` + per-partition offsets.
* ``pack_sequences`` reuses the same bucketed order for the global
  token cumsum, so greedy contiguous packing is also two-pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tweetaggregates_spark.functions.hashing import hash64

BUCKETS = 1_000_000  # hash buckets for fraction thresholds (ppm)


def sample_bucket(key: Column, salt: str) -> Column:
    """Uniform deterministic bucket in [0, BUCKETS) for a key: the salt
    picks an independent 'randomness stream' per use-site (sampling with
    salt A is independent of splitting with salt B)."""
    return hash64(F.concat(F.lit(f"{salt}:"), key.cast("string"))) % BUCKETS


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen deterministically by key hash.
    Map-only: a single filter, no shuffle, pushdown-friendly."""
    return df.filter(
        sample_bucket(F.col(key_col), salt) < int(fraction * BUCKETS)
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling — the 'data mixture' op of
    training pipelines (e.g. keep 50% of en, 20% of the rest). Still
    map-only; the per-stratum threshold is a CASE expression."""
    thresh = F.lit(int(default_fraction * BUCKETS))
    for value, frac in fractions.items():
        thresh = (
            F.when(F.col(strata_col) == value, F.lit(int(frac * BUCKETS)))
            .otherwise(thresh)
        )
    return df.filter(sample_bucket(F.col(key_col), salt) < thresh)


def split_assign(
    df: DataFrame,
    key_col: str,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split`` column.
    Hash-keyed, so membership is stable under re-runs, repartitioning
    and incremental appends — new data never moves old docs across
    splits (the leakage guarantee fraction-based randomSplit lacks)."""
    b = sample_bucket(F.col(key_col), salt)
    t_val = int(val_fraction * BUCKETS)
    t_test = t_val + int(test_fraction * BUCKETS)
    return df.withColumn(
        "split",
        F.when(b < t_val, F.lit("val"))
        .when(b < t_test, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def frozen_split_for_batch(
    assignments: DataFrame,
    prior_routes: DataFrame | None = None,
    remap_delta: DataFrame | None = None,
    id_col: str = "doc_id",
    cluster_col: str = "cluster",
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    salt: str = "split",
) -> tuple[DataFrame, DataFrame]:
    """Cluster-level split routing that is STABLE under incremental
    ingest (VERDICT r13 #2): a doc's split is assigned exactly once —
    at its first ingest — and never changes, even when a later batch
    merges its near-dup cluster with another. ``cluster_split_docs``
    routes by hash(cluster label); labels are component-min ids, so a
    merge renames one side's label and a label-hash re-route would
    FLIP previously-assigned docs between train and test across corpus
    versions — the versioned-corpus contamination hole one level above
    per-doc splitting.

    The freeze: existing docs are never re-emitted (their first-ingest
    split row is the permanent record); NEW members of a merged
    cluster route by the merged cluster's EXISTING assignment. Tie
    policy (documented, deterministic): when several previously-
    assigned clusters merge into one component, new members follow the
    SMALLEST route key among them — route keys are original cluster
    ids, so the policy is a pure function of the ingested corpus, not
    of batch arrival order within the merge.

    Inputs per ingest:
    * ``assignments`` — the batch's (id_col, cluster_col) rows with
      POST-merge labels (``dedup.dedup_new_batch_delta`` output; for
      the initial batch, ``cluster.assign_clusters`` labels).
    * ``prior_routes`` — the persisted routing table: one
      (cluster_id, route_key) row per cluster whose routing hash key
      differs from its CURRENT label. Identity routes are implicit
      (a cluster that never merged routes by its own label hash), so
      the table is O(accumulated merges) — not O(clusters) — and
      broadcasts at any corpus size.
    * ``remap_delta`` — this batch's (old_cluster -> new_cluster)
      merge log (the band-index remap entries), which folds prior
      routes onto the new labels.

    Returns ``(splits, routes)``: the batch docs'
    (doc_id, cluster_id, split) and the UPDATED non-identity routing
    table to persist for the next ingest (the split-routing analog of
    ``append_band_index_delta``'s remap log).

    Scale: the routing table and remap are merge-sized; both sides of
    every join against them broadcast, so the cost over the plain
    hash split is one broadcast join on the O(batch) assignments."""
    spark = assignments.sparkSession
    empty = spark.createDataFrame(
        [], "cluster_id BIGINT, route_key BIGINT"
    )
    routes = prior_routes if prior_routes is not None else empty
    a = assignments.select(
        F.col(id_col).alias("doc_id"),
        F.col(cluster_col).alias("cluster_id"),
    )
    if remap_delta is not None:
        # merged components: candidates are every previously-assigned
        # cluster now labeled new_cluster — the renamed ones from the
        # remap log, plus the label-keeping one (new_cluster itself)
        # when that label is an OLD cluster rather than a new batch
        # doc (the component min is always one or the other; a new
        # doc's id is NOT a previously-assigned cluster and must not
        # win the tie)
        renamed = remap_delta.select(
            F.col("new_cluster").alias("cluster_id"),
            F.col("old_cluster").alias("member"),
        )
        kept_label = (
            remap_delta.select(
                F.col("new_cluster").alias("cluster_id")
            )
            .distinct()
            .join(
                a.select(F.col("doc_id").alias("cluster_id")),
                "cluster_id",
                "left_anti",
            )
            .select("cluster_id", F.col("cluster_id").alias("member"))
        )
        cand = (
            renamed.unionByName(kept_label)
            .join(
                F.broadcast(
                    routes.withColumnRenamed("cluster_id", "member")
                ),
                "member",
                "left",
            )
            .select(
                "cluster_id",
                F.coalesce("route_key", F.col("member")).alias(
                    "route_key"
                ),
            )
        )
        merged = cand.groupBy("cluster_id").agg(
            F.min("route_key").alias("route_key")
        )
        surviving = routes.join(
            F.broadcast(
                remap_delta.select(
                    F.col("old_cluster").alias("cluster_id")
                )
            ),
            "cluster_id",
            "left_anti",
        )
        routes = (
            surviving.unionByName(merged)
            .groupBy("cluster_id")
            .agg(F.min("route_key").alias("route_key"))
            .filter(F.col("route_key") != F.col("cluster_id"))
        )
    routed = a.join(F.broadcast(routes), "cluster_id", "left").withColumn(
        "route_key", F.coalesce("route_key", F.col("cluster_id"))
    )
    splits = split_assign(
        routed, "route_key", val_fraction, test_fraction, salt
    ).select("doc_id", "cluster_id", "split")
    return splits, routes


def shuffle_order(
    df: DataFrame,
    key_col: str,
    salt: str = "shuffle",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic global shuffle: adds ``pos`` — the row's position
    (0-based, a permutation of 0..n-1) in the hash-shuffled total order
    (bucket, hash, key). Training pipelines use this to fix an epoch's
    data order reproducibly.

    Two-pass, no global window: per-bucket row_number runs parallel
    across ``n_buckets`` partitions; bucket offsets come from the
    n_buckets-row count table (its cumsum window is over counts, not
    data). At 100 TB raise n_buckets to O(partitions); each bucket's
    window state is n/n_buckets rows."""
    h = hash64(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    hashed = df.withColumn("_h", h).withColumn(
        "_bucket", F.col("_h") % n_buckets
    )
    w = Window.partitionBy("_bucket").orderBy("_h", key_col)
    ranked = hashed.withColumn("_rn", F.row_number().over(w))
    offsets = (
        hashed.groupBy("_bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    # constant-but-unfoldable partition key: |buckets|
                    # rows, the single-partition prefix sum is intended
                    Window.partitionBy(F.pmod(F.col("_bucket"), F.lit(1)))
                    .orderBy("_bucket")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_bucket", "_offset")
    )
    return (
        ranked.join(F.broadcast(offsets), "_bucket")
        .withColumn("pos", (F.col("_offset") + F.col("_rn") - 1).cast("long"))
        .drop("_h", "_bucket", "_rn", "_offset")
    )


def pack_sequences(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    salt: str = "pack",
    n_buckets: int = 64,
) -> DataFrame:
    """Greedy contiguous sequence packing: walk the docs in the
    deterministic shuffled order and assign chunk ids by cumulative
    token count — doc d goes to chunk floor(tokens_before_d / budget)
    (the streaming concat-then-cut packing most LLM data loaders use; a
    doc may straddle its chunk boundary and spill into the next, exactly
    like token-level concatenation does).

    Adds ``start_offset`` (global token offset of the doc) and
    ``chunk_id``. Same two-pass bucketed shape as ``shuffle_order`` but
    the offsets carry token totals instead of row counts."""
    h = hash64(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    hashed = df.withColumn("_h", h).withColumn(
        "_bucket", F.col("_h") % n_buckets
    )
    w = (
        Window.partitionBy("_bucket")
        .orderBy("_h", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = hashed.withColumn(
        "_local_cum", F.coalesce(F.sum(token_col).over(w), F.lit(0))
    )
    offsets = (
        hashed.groupBy("_bucket")
        .agg(F.sum(token_col).alias("_tok"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_tok").over(
                    Window.partitionBy(F.pmod(F.col("_bucket"), F.lit(1)))
                    .orderBy("_bucket")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_bucket", "_offset")
    )
    return (
        ranked.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            "start_offset",
            (F.col("_offset") + F.col("_local_cum")).cast("long"),
        )
        .withColumn(
            "chunk_id", F.floor(F.col("start_offset") / budget).cast("long")
        )
        .drop("_h", "_bucket", "_local_cum", "_offset", "_tok")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    base_rate: float = 1.0,
    salt: str = "wsample",
) -> DataFrame:
    """Importance sampling: keep each row with probability
    weight * base_rate, where the weight is a per-ROW column (e.g. a
    quality score) — the up/down-weighting op of data curation, as
    opposed to ``stratified_sample``'s fixed per-stratum table.

    Still deterministic and map-only: the keep decision compares the
    key's uniform hash bucket against the row's own threshold, so the
    same doc is kept or dropped identically across runs, engines and
    partitionings, and re-scoring only changes membership where the
    weight actually crossed the row's bucket."""
    return df.filter(
        sample_bucket(F.col(key_col), salt).cast("double")
        < F.col(weight_col) * base_rate * BUCKETS
    )


def mixture_plan(
    df: DataFrame,
    strata_col: str,
    size_col: str,
    budget_fraction: float = 0.5,
) -> DataFrame:
    """Mixture planning: given per-stratum sizes (tokens/chars), compute
    the per-stratum sampling rate that fills ``budget_fraction`` of the
    corpus with an EQUAL share per stratum — the arithmetic a domain-
    reweighting pass runs before the actual (weighted_sample /
    stratified_sample) pass executes the plan.

    rate_d = min(1, budget_share / size_d): strata smaller than their
    share keep everything (rate 1) and the remainder under-fills
    rather than silently rebalancing — the plan reports expected_size
    so the caller sees exactly that. Two tiny aggregates; the 1-row
    budget scalar broadcasts."""
    per = df.groupBy(strata_col).agg(
        F.sum(F.col(size_col).cast("decimal(18,0)"))
        .cast("double")
        .alias("stratum_size")
    )
    scalar = per.agg(
        F.sum(F.col("stratum_size").cast("decimal(18,0)"))
        .cast("double")
        .alias("total_size"),
        F.count(F.lit(1)).alias("n_strata"),
    )
    share = (
        F.col("total_size") * budget_fraction / F.col("n_strata")
    )
    rate = F.round(F.least(F.lit(1.0), share / F.col("stratum_size")), 6)
    return per.join(F.broadcast(scalar)).select(
        strata_col,
        "stratum_size",
        rate.alias("planned_rate"),
        F.round(rate * F.col("stratum_size"), 6).alias("expected_size"),
    )


def mixture_temperature(
    df: DataFrame,
    strata_col: str,
    size_col: str,
    alpha: float = 0.5,
    budget_fraction: float = 0.5,
) -> DataFrame:
    """Temperature-weighted mixture planning: per-stratum target share
    proportional to size^alpha — the standard multilingual/domain
    rebalancing rule (alpha=1 keeps natural proportions, alpha->0
    approaches mixture_plan's equal share; pretraining corpora
    typically run alpha in [0.3, 0.7] to up-sample small domains
    without flattening everything).

    rate_d = min(1, budget * total * (size_d^alpha / sum size^alpha)
    / size_d). Only alpha=0.5 is offered cross-engine-deterministic
    (sqrt is IEEE-correctly-rounded; general pow is not) — other
    alphas compute but are excluded from oracle-gated plans. Same
    two-tiny-aggregate shape as mixture_plan."""
    assert alpha == 0.5, (
        "only alpha=0.5 (sqrt) is cross-engine deterministic; "
        "general pow is not correctly rounded"
    )
    per = df.groupBy(strata_col).agg(
        F.sum(F.col(size_col).cast("decimal(18,0)"))
        .cast("double")
        .alias("stratum_size")
    )
    per = per.withColumn("_w", F.sqrt(F.col("stratum_size")))
    scalar = per.agg(
        F.sum(F.col("stratum_size").cast("decimal(18,0)"))
        .cast("double")
        .alias("total_size"),
        F.sum(F.col("_w").cast("decimal(28,12)"))
        .cast("double")
        .alias("sum_w"),
    )
    rate = F.round(
        F.least(
            F.lit(1.0),
            F.lit(budget_fraction)
            * F.col("total_size")
            * F.col("_w")
            / F.col("sum_w")
            / F.col("stratum_size"),
        ),
        6,
    )
    return per.join(F.broadcast(scalar)).select(
        strata_col,
        "stratum_size",
        rate.alias("planned_rate"),
        F.round(rate * F.col("stratum_size"), 6).alias("expected_size"),
    )


def dsir_log_weights(
    df: DataFrame,
    target: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    smoothing: float = 1.0,
    target_predicate: Column | None = None,
) -> DataFrame:
    """DSIR-style hashed n-gram importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling" —
    public): score every raw-corpus doc by how target-like its hashed
    n-gram distribution is, the standard domain-matching curation
    operator.

    Model: features are unigrams + word bigrams hashed into
    ``n_buckets`` (the portable md5-based ``hash64``, so a SQL twin
    can replay the hashing); target p and raw q are Laplace-smoothed
    bag-of-buckets frequencies; per doc,
    ``log_weight = sum_f (ln p[b(f)] - ln q[b(f)])`` over its feature
    OCCURRENCES (repeats count).

    Plan shape at 100 TB: two bucket-count aggregates (B-key shuffles,
    map-side combined; the target pass scans only the target sample),
    an O(n_buckets) driver collect — model metadata, same class as
    the k-means centroid collect — and then ONE map-only projection:
    the per-bucket log-ratios ship as a literal array and each doc
    folds its own feature buckets through ``F.aggregate``, no explode
    or join of the corpus. Determinism: ratios round to 9 dp (ln ulp
    noise absorbed, zipf-twin convention) and the per-doc fold sums
    DECIMAL(29,9) — order-free and engine-exact."""
    import math

    from tweetaggregates_spark.functions.textstats import (
        tokens,
        word_shingles,
    )

    def _feat_buckets(frame: DataFrame):
        toks = tokens(F.col(text_col))
        # coalesce to an empty array: for a NULL text, tokens() is
        # NULL and concat(NULL, ...) is NULL, which would make the
        # scoring fold (and so log_weight) NULL — dsir_select would
        # silently DROP the doc while the DuckDB twin's LEFT JOIN +
        # coalesce keeps it at keep_prob 1.0. NULL text scores 0.0,
        # exactly like an empty doc.
        feats = F.coalesce(
            F.concat(toks, word_shingles(toks, 2)),
            F.array().cast("array<string>"),
        )
        return frame.withColumn(
            "_fb",
            F.transform(
                feats,
                lambda t: F.pmod(hash64(t), F.lit(n_buckets)).cast("int"),
            ),
        )

    def _counts(frame: DataFrame) -> dict[int, int]:
        # explode_OUTER, then drop the null rows: a plain explode makes
        # InferFiltersFromGenerate add `size(_fb) > 0` — a filter that
        # predicate-pushdown sinks all the way into the parquet scan,
        # re-running the whole per-feature md5 pipeline inside the
        # scan's (few, unsplittable) tasks just to test non-emptiness
        # (measured 85 s -> 8 s per pass at sf1). The outer variant
        # infers nothing; empty docs surface one null row filtered
        # AFTER the generate.
        rows = (
            _feat_buckets(frame)
            .select(F.explode_outer("_fb").alias("_b"))
            .filter(F.col("_b").isNotNull())
            .groupBy("_b")
            .agg(F.count(F.lit(1)).alias("_c"))
            .collect()
        )
        return {r["_b"]: r["_c"] for r in rows}

    if target_predicate is not None:
        # the common production case: the reference set IS a predicate
        # over the raw corpus (a language, a source, a label). ONE
        # pass then computes BOTH bucket-count tables — the md5
        # feature hashing (the dominant cost of the two _counts
        # passes) runs once per doc instead of twice; the math and
        # the oracle twin are unchanged. Measured ~3.1 -> ~2.8 s warm at
        # sf0.1 on the registered query.
        rows = (
            _feat_buckets(df)
            .select(
                F.explode_outer("_fb").alias("_b"),
                target_predicate.cast("int").alias("_t"),
            )
            .filter(F.col("_b").isNotNull())
            .groupBy("_b")
            .agg(
                F.count(F.lit(1)).alias("_c"),
                F.sum("_t").alias("_tc"),
            )
            .collect()
        )
        rc = {r["_b"]: r["_c"] for r in rows}
        tc = {r["_b"]: r["_tc"] for r in rows if r["_tc"]}
    else:
        if target is None:
            raise ValueError(
                "dsir_log_weights: pass target or target_predicate"
            )
        tc = _counts(target)
        rc = _counts(df)
    t_tot = sum(tc.values())
    r_tot = sum(rc.values())
    s = smoothing
    ratios = [
        round(
            math.log((tc.get(b, 0) + s) / (t_tot + s * n_buckets))
            - math.log((rc.get(b, 0) + s) / (r_tot + s * n_buckets)),
            9,
        )
        for b in range(n_buckets)
    ]
    # ONE array Literal (F.lit of the list), not F.array of 1024 lits:
    # CreateArray is re-evaluated per row in codegen, a true Literal is
    # a constant — measured 2.2x on the scoring pass
    arr = F.lit(ratios)
    zero = F.lit(0).cast("decimal(29,9)")
    lw = F.aggregate(
        F.col("_fb"),
        zero,
        lambda acc, b: (
            acc + F.element_at(arr, b + 1).cast("decimal(20,9)")
        ).cast("decimal(29,9)"),
    )
    return (
        _feat_buckets(df)
        .withColumn("log_weight", lw.cast("double"))
        .drop("_fb")
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    base_rate: float = 1.0,
    salt: str = "dsir",
    target_predicate: Column | None = None,
) -> DataFrame:
    """The EXECUTED DSIR keep: score with ``dsir_log_weights``, then
    keep each doc with probability min(1, e^log_weight) * base_rate
    via the deterministic ``weighted_sample`` hash rule — the
    importance-resampling step as a map-only filter (the keep
    probability rounds to 6 dp so the threshold comparison is
    engine-exact)."""
    scored = dsir_log_weights(
        df, target, text_col=text_col, id_col=id_col,
        n_buckets=n_buckets, target_predicate=target_predicate,
    )
    # Materialize the scored frame ONCE (lazy checkpoint) before the
    # keep: without a physical barrier, Catalyst inlines the whole
    # per-feature scoring fold into every consumer — predicate
    # pushdown sinks the keep filter (fold and all) into the parquet
    # scan's few unsplittable tasks, and CollapseProject duplicates
    # the fold into keep_prob (measured 3x total at sf0.1; optimizer
    # barriers via nondeterministic columns don't survive
    # ColumnPruning). With the checkpoint, scoring runs exactly once;
    # the materialization is what a production pipeline does anyway
    # before resampling (weights are reused across mixtures).
    scored = scored.localCheckpoint(eager=False)
    scored = scored.withColumn(
        "keep_prob",
        F.round(F.exp(F.least(F.col("log_weight"), F.lit(0.0))), 6),
    )
    return weighted_sample(
        scored, id_col, "keep_prob", base_rate=base_rate, salt=salt
    )


def unimax_plan(
    df: DataFrame,
    group_col: str = "lang",
    size_col: str = "n_chars",
    budget_fraction: float = 1.5,
    max_epochs: int = 2,
) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining" — public): waterfill a total training
    budget B = budget_fraction * corpus chars across groups, capping
    every group at ``max_epochs`` passes over its own data — the
    closed-form alternative to temperature sampling that never
    over-epochs a low-resource language.

    Closed form: with groups sorted ASCENDING by cap_g = c_g *
    max_epochs, group j is CAPPED iff cap_j * (n - j + 1) <= B -
    cum_{j-1} (prefix-monotone, so the capped set is exactly that
    ascending prefix); every uncapped group gets the equal share
    theta = (B - sum of capped caps) / n_uncapped. Everything up to
    theta is exact BIGINT/double-on-integers arithmetic (chars < 2^53
    — at a true 100 TB corpus switch size_col to a per-group count of
    1e6-char units); theta and the epoch ratios round to 6 dp.

    Plan shape: one per-group aggregate over the corpus (the only
    corpus-sized pass), then windows over the |groups|-row allocation
    table — model-sized, like the prefix machinery's offset table.

    Output: (group_col, n_chars, cap_chars, alloc_chars, epochs).
    """
    per = df.groupBy(group_col).agg(
        F.sum(size_col).cast("bigint").alias("n_chars")
    )
    cap = (F.col("n_chars") * F.lit(int(max_epochs))).cast("bigint")
    per = per.withColumn("cap_chars", cap)
    w = Window.orderBy("cap_chars", group_col)
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy()
    per = (
        per.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_cum_prev",
            F.coalesce(F.sum("cap_chars").over(wprev), F.lit(0)),
        )
        .withColumn("_n", F.count(F.lit(1)).over(wall))
        .withColumn(
            "_b",
            F.lit(float(budget_fraction))
            * F.sum("n_chars").over(wall),
        )
    )
    capped = (
        F.col("cap_chars") * (F.col("_n") - F.col("_rn") + 1)
        <= F.col("_b") - F.col("_cum_prev")
    )
    per = per.withColumn("_capped", capped)
    scalar = per.groupBy().agg(
        F.sum(F.when(F.col("_capped"), F.col("cap_chars"))
              .otherwise(F.lit(0))).alias("_capsum"),
        F.sum(F.col("_capped").cast("int")).alias("_m"),
        F.max("_n").alias("_nn"),
        F.max("_b").alias("_bb"),
    )
    theta = F.round(
        (F.col("_bb") - F.col("_capsum"))
        / (F.col("_nn") - F.col("_m")),
        6,
    )
    alloc = F.when(
        F.col("_capped") | (F.col("_m") == F.col("_nn")),
        F.col("cap_chars").cast("double"),
    ).otherwise(theta)
    return (
        per.join(F.broadcast(scalar))
        .withColumn("alloc_chars", F.round(alloc, 6))
        .withColumn(
            "epochs",
            F.round(F.col("alloc_chars") / F.col("n_chars"), 6),
        )
        .select(
            group_col, "n_chars", "cap_chars", "alloc_chars", "epochs"
        )
    )


def unimax_sample(
    df: DataFrame,
    group_col: str = "lang",
    size_col: str = "n_chars",
    id_col: str = "doc_id",
    budget_fraction: float = 1.5,
    max_epochs: int = 2,
    salt: str = "unimax",
) -> DataFrame:
    """The EXECUTED UniMax keep (the repo convention: every allocation
    plan ships with its executed sampler — temperature_sample,
    dsir_select, weighted_sample): per group with allocation e =
    epochs from ``unimax_plan``, emit floor(e) full copies of every
    doc (epoch = 1..floor(e)) plus one fractional epoch containing a
    deterministic hash-sample of the group at rate frac(e) — exactly
    the "repeat low-resource languages up to the cap, downsample the
    head" training mix UniMax prescribes.

    ONE corpus pass after the plan: the |groups|-row plan broadcasts
    onto the corpus and each row explodes its own epoch ARRAY —
    sequence(1, floor(e)), plus floor(e)+1 when the doc passes the
    ``sample_bucket`` hash rule at rate frac(e). (A full-copies UNION
    ALL fractional-branch formulation would scan the corpus twice —
    the round-9 two-consumer lesson, avoided structurally here.)
    Output: (id_col, group_col, epoch)."""
    plan = unimax_plan(
        df,
        group_col=group_col,
        size_col=size_col,
        budget_fraction=budget_fraction,
        max_epochs=max_epochs,
    )
    joined = df.select(id_col, group_col).join(
        F.broadcast(plan.select(group_col, "epochs")), group_col
    )
    whole = F.floor(F.col("epochs")).cast("int")
    frac = F.round(F.col("epochs") - F.floor(F.col("epochs")), 6)
    sampled = (
        sample_bucket(F.col(id_col), salt).cast("double")
        < frac * F.lit(float(BUCKETS))
    )
    base = F.when(whole >= 1, F.sequence(F.lit(1), whole)).otherwise(
        F.array().cast("array<int>")
    )
    epochs_arr = F.when(
        sampled, F.concat(base, F.array(whole + 1))
    ).otherwise(base)
    return joined.select(
        id_col, group_col, F.explode(epochs_arr).alias("epoch")
    )
