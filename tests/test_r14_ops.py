"""Round-14 pins.

First block: the ADVICE r13 tombstone-ordering fixes in
operators/similarity.py — numeric-ingest enforcement on delete, the
newer-than-any-tombstone rule for uuid-keyed appends, and the
legacy-non-numeric-tombstone carry in partial compaction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tweetaggregates_spark.operators.similarity import (
    append_to_ivf_pq_index,
    build_ivf_pq_index,
    compact_ivf_pq_index,
    delete_from_ivf_pq_index,
    read_ivf_pq_index,
)


def _mini_corpus(spark, n=64, d=8):
    import math

    rows = [
        (i, [round(math.sin(0.1 * i * (j + 1)), 6) for j in range(d)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


def _codes_ids(idx):
    return {r.neighbor_id for r in idx.codes.select("neighbor_id").collect()}


def _build(spark, tmp_path):
    emb = _mini_corpus(spark)
    root = str(tmp_path / "idx")
    build_ivf_pq_index(
        emb, root, n_cells=4, m_subvectors=2, k_codes=8,
        coarse_iters=0, pq_iters=0, encode_residuals=False,
    )
    return emb, root


def test_delete_requires_numeric_ingest(spark, tmp_path):
    """ADVICE r13 (high): the default-args path used to write a uuid
    tombstone that no-oped at read time. Both the None default and an
    explicit non-numeric id must now raise at WRITE time."""
    emb, root = _build(spark, tmp_path)
    gone = spark.createDataFrame([(3,)], "vec_id LONG")
    with pytest.raises(ValueError, match="NUMERIC ingest_id"):
        delete_from_ivf_pq_index(gone, root)
    with pytest.raises(ValueError, match="NUMERIC ingest_id"):
        delete_from_ivf_pq_index(gone, root, ingest_id="deadbeef1234")
    # nothing was written: the index is untouched
    assert len(_codes_ids(read_ivf_pq_index(spark, root))) == 64


def test_uuid_append_survives_numeric_tombstone(spark, tmp_path):
    """ADVICE r13 (medium): codes appended under the documented uuid
    default have no numeric version; they must read as NEWER than any
    tombstone — delete at ingest 1 then uuid-keyed re-insert keeps the
    live row instead of NULL-comparing it away."""
    emb, root = _build(spark, tmp_path)
    gone = spark.createDataFrame([(5,)], "vec_id LONG")
    delete_from_ivf_pq_index(gone, root, ingest_id="1")
    changed = emb.filter(F.col("vec_id") == 5).withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    append_to_ivf_pq_index(changed, root)  # ingest_id=None -> uuid
    ids = _codes_ids(read_ivf_pq_index(spark, root))
    assert 5 in ids


def test_partial_compact_carries_legacy_nonnumeric_tombstone(
    spark, tmp_path
):
    """ADVICE r13 (high): compact(below=N) must not LOSE a legacy
    non-numeric tombstone — it fails both `cast < N` and the negation
    (NULL), so without the explicit isNull arm it landed in neither
    folding nor carried and resurrected its vectors after the old
    tombs dir was pruned. It must be carried unchanged (mirroring the
    codes-side predicate), alongside the numeric one that folds."""
    import os

    emb, root = _build(spark, tmp_path)
    gone = spark.createDataFrame([(11,)], "vec_id LONG")
    delete_from_ivf_pq_index(gone, root, ingest_id="0")
    # simulate a legacy pre-enforcement tombstone written under a
    # non-numeric ingest id, directly into the build's tombs dir
    meta = spark.read.parquet(f"{root}/meta").first()
    spark.createDataFrame(
        [(23, "legacyuuid00")], "vec_id LONG, ingest STRING"
    ).write.mode("append").partitionBy("ingest").parquet(
        f"{root}/tombs_{meta.build_id}"
    )
    compact_ivf_pq_index(spark, root, below=1)
    # the numeric ingest-0 tombstone folded: vec 11 physically gone
    idx = read_ivf_pq_index(spark, root)
    assert 11 not in _codes_ids(idx)
    # the legacy tombstone was carried, not lost with the pruned dir
    tomb_dirs = [d for d in os.listdir(root) if d.startswith("tombs")]
    assert len(tomb_dirs) == 1
    carried = spark.read.parquet(f"{root}/{tomb_dirs[0]}")
    rows = carried.select("vec_id", "ingest").collect()
    assert [(r.vec_id, r.ingest) for r in rows] == [(23, "legacyuuid00")]


# -- frozen cluster-split routing (VERDICT r13 #2) ---------------------------


from tweetaggregates_spark.operators import sampling


def _splits(df):
    return {r.doc_id: r.split for r in df.collect()}


def test_frozen_split_merge_never_flips(spark):
    """A merge-inducing second batch changes NO existing doc's split:
    batch-1 docs are never re-emitted, and the bridge doc inherits the
    SMALLEST previously-assigned cluster's split (the tie policy)."""
    a1 = spark.createDataFrame(
        [(10, 10), (11, 10), (20, 20), (21, 20), (30, 30)],
        "doc_id LONG, cluster LONG",
    )
    s1, routes = sampling.frozen_split_for_batch(a1)
    base = _splits(s1)
    # initial routing table is empty: every cluster routes by its own
    # label hash (identity routes are implicit)
    assert routes.count() == 0
    # doc 5 bridges clusters 10 and 20; the component min (5) is a NEW
    # doc id, so the label changes for both sides
    a2 = spark.createDataFrame([(5, 5)], "doc_id LONG, cluster LONG")
    remap = spark.createDataFrame(
        [(10, 5), (20, 5)], "old_cluster LONG, new_cluster LONG"
    )
    s2, routes2 = sampling.frozen_split_for_batch(a2, routes, remap)
    out2 = _splits(s2)
    # only the batch's docs are (re)emitted — the freeze
    assert set(out2) == {5}
    # tie policy: min(10, 20) = 10 — NOT the new label 5's own hash
    assert out2[5] == base[10]
    # the merged component's non-identity route persists for later
    # ingests
    assert {(r.cluster_id, r.route_key) for r in routes2.collect()} == {
        (5, 10)
    }
    # batch 3: doc 4 renames the merged component again (5 -> 4); the
    # prior NON-identity route must fold through the remap chain
    a3 = spark.createDataFrame([(4, 4)], "doc_id LONG, cluster LONG")
    remap3 = spark.createDataFrame(
        [(5, 4)], "old_cluster LONG, new_cluster LONG"
    )
    s3, routes3 = sampling.frozen_split_for_batch(a3, routes2, remap3)
    assert _splits(s3)[4] == base[10]
    assert {(r.cluster_id, r.route_key) for r in routes3.collect()} == {
        (4, 10)
    }


def test_frozen_split_kept_label_wins_tie(spark):
    """When the merged component KEEPS one side's label (the component
    min is an old cluster, not a new doc), that label competes in the
    tie: min(3, 10) = 3, the route is identity, and the routing table
    stays empty."""
    a1 = spark.createDataFrame(
        [(3, 3), (7, 3), (10, 10), (12, 10)], "doc_id LONG, cluster LONG"
    )
    s1, routes = sampling.frozen_split_for_batch(a1)
    base = _splits(s1)
    a2 = spark.createDataFrame([(8, 3)], "doc_id LONG, cluster LONG")
    remap = spark.createDataFrame(
        [(10, 3)], "old_cluster LONG, new_cluster LONG"
    )
    s2, routes2 = sampling.frozen_split_for_batch(a2, routes, remap)
    assert _splits(s2)[8] == base[3]
    assert routes2.count() == 0  # identity route stays implicit


def test_frozen_split_new_cluster_routes_by_own_label(spark):
    """A batch-2 doc that matches nothing forms a new cluster and
    hash-routes on its own label — identical to split_assign, so the
    one-shot and incremental paths agree on never-merged clusters."""
    a2 = spark.createDataFrame([(99, 99)], "doc_id LONG, cluster LONG")
    s2, _ = sampling.frozen_split_for_batch(a2)
    expected = _splits(
        sampling.split_assign(
            a2.selectExpr("doc_id", "cluster AS cluster_id"), "cluster_id"
        )
    )
    assert _splits(s2) == expected


# -- banded containment verify (VERDICT r13 #4) -------------------------------


from tweetaggregates_spark.operators import dedup


def test_containment_verified_matches_truth_on_neardups(spark):
    """High-Jaccard near-dups (the shape MinHash banding targets):
    banded discovery + exact verify returns exactly the brute-force
    containment pairs."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base + " extra"),          # near-dup of 1 (high Jaccard)
        (3, "totally different words here about other topics entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    truth = sorted(
        map(tuple, dedup.ngram_containment_pairs(docs, k=3,
                                                 threshold=0.8).collect())
    )
    banded = sorted(
        map(tuple, dedup.containment_verified_pairs(docs, k=3,
                                                    threshold=0.8).collect())
    )
    assert truth == banded and len(truth) > 0


def test_containment_banding_misses_extreme_ratio_pair(spark):
    """The documented recall trade: a SHORT doc verbatim inside a much
    longer one has containment 1.0 but tiny Jaccard, so Jaccard-tuned
    MinHash bands miss it — the reason ngram_containment_pairs (the
    brute-force truth) and the ExactSubstr chunk index stay in the
    toolbox. This pins the miss so the trade stays visible."""
    short = "one two three four five"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(80))
    docs = spark.createDataFrame(
        [(1, short), (2, filler + " " + short + " " + filler)],
        "doc_id LONG, text STRING",
    )
    truth = dedup.ngram_containment_pairs(docs, k=3, threshold=0.8)
    assert [(r.doc_contained, r.doc_container, r.containment)
            for r in truth.collect()] == [(1, 2, 1.0)]
    banded = dedup.containment_verified_pairs(docs, k=3, threshold=0.8)
    assert banded.count() == 0


# -- pane-path density probe (VERDICT r13 #5) ---------------------------------


import datetime

from tweetaggregates_spark.operators import window as win


def test_choose_hopping_path_density_probe(spark):
    """The SCALE.md density rule as code: dense cells (many events per
    pane x group) pick the pane path; sparse keyed cells (~1 event per
    cell) stay on the plain explode."""
    t0 = datetime.datetime(2024, 1, 1)
    # dense: 200 events, 1 user, all inside two 1-min panes
    dense = spark.createDataFrame(
        [(t0 + datetime.timedelta(seconds=i % 120), 1) for i in range(200)],
        "ts TIMESTAMP, user_id LONG",
    )
    assert win.choose_hopping_path(dense, "ts", ["user_id"]) == "paned"
    assert win.pane_density(dense, "ts", ["user_id"]) > 50
    # sparse: 60 events, 60 users, one per pane-cell
    sparse = spark.createDataFrame(
        [(t0 + datetime.timedelta(minutes=i), i) for i in range(60)],
        "ts TIMESTAMP, user_id LONG",
    )
    assert win.choose_hopping_path(sparse, "ts", ["user_id"]) == "plain"
    # ungrouped, the same sparse stream is DENSE per pane (group_cols
    # change the verdict, not just the data) — the keyed-shape rule
    dense_ungrouped = spark.createDataFrame(
        [
            (t0 + datetime.timedelta(seconds=i % 300), i)
            for i in range(600)
        ],
        "ts TIMESTAMP, user_id LONG",
    )
    assert win.choose_hopping_path(dense_ungrouped, "ts", []) == "paned"
    assert (
        win.choose_hopping_path(dense_ungrouped, "ts", ["user_id"])
        == "plain"
    )


def test_paned_keyed_equals_plain(spark):
    """Keyed pane rollup == plain keyed hopping on a synthetic stream
    (count + decimal sum partials)."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (t0 + datetime.timedelta(seconds=37 * i % 3600), i % 5,
         float(i % 7))
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows, "ts TIMESTAMP, user_id LONG, value DOUBLE"
    ).withColumn("value", F.col("value").cast("decimal(18,6)"))
    paned = win.hopping_paned(
        df, "ts", ["user_id"],
        {"cnt": (F.count(F.lit(1)), F.sum),
         "vsum": (F.sum("value"), F.sum)},
        size_minutes=10, slide_minutes=1,
    ).select("window_time", "user_id", "cnt",
             F.col("vsum").cast("double").alias("vsum"))
    plain = (
        df.groupBy(
            F.window("ts", "10 minutes", "1 minute").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum("value").alias("vsum"))
        .select(F.col("w.end").alias("window_time"), "user_id", "cnt",
                F.col("vsum").cast("double").alias("vsum"))
    )
    assert sorted(map(tuple, paned.collect())) == sorted(
        map(tuple, plain.collect())
    )


# -- quantizer refresh on compact (VERDICT r13 #6) ----------------------------


from tweetaggregates_spark.operators.similarity import (  # noqa: E402
    ann_recall,
    knn_bruteforce_l2,
    knn_ivf_pq,
)


def _mean_recall(spark, corpus, index):
    q = corpus.filter(F.col("vec_id") % 10 == 0)
    exact = knn_bruteforce_l2(corpus, q, k=5)
    approx = knn_ivf_pq(None, q, k=5, n_probe=1, index=index)
    return (
        ann_recall(exact, approx, k=5)
        .agg(F.avg("recall").alias("r"))
        .first()
        .r
    )


def test_refresh_recovers_recall_after_distribution_shift(
    spark, tmp_path
):
    """A REAL drift case (the synthetic negation churn in the gate
    entry is distribution-preserving, so refresh is recall-neutral
    there — measured in SCALE.md): v2 lives in a value range v1's PQ
    codebook never saw, every v2 vector encodes to the same saturated
    codes, ADC ranking degenerates and recall collapses; retraining
    on the survivors restores it."""
    import math

    def mk(ids, centers):
        rows = [
            (
                i,
                [
                    round(
                        centers[i % len(centers)]
                        + math.sin(1.7 * i * (j + 1)),
                        6,
                    )
                    for j in range(4)
                ],
            )
            for i in ids
        ]
        return spark.createDataFrame(
            rows, "vec_id LONG, embedding ARRAY<DOUBLE>"
        )

    v1 = mk(range(80), [0.0, 10.0])
    v2 = mk(range(100, 180), [100.0, 200.0])
    root = str(tmp_path / "idx")
    build_ivf_pq_index(
        v1, root, n_cells=2, m_subvectors=2, k_codes=4,
        coarse_iters=2, pq_iters=2, encode_residuals=False,
    )
    delete_from_ivf_pq_index(
        v1.select("vec_id"), root, ingest_id="1"
    )
    append_to_ivf_pq_index(v2, root, ingest_id="1")
    stale = compact_ivf_pq_index(spark, root)
    r_stale = _mean_recall(spark, v2, stale)
    refreshed = compact_ivf_pq_index(
        spark, root, retrain_corpus=v2, coarse_iters=2, pq_iters=2
    )
    r_refreshed = _mean_recall(spark, v2, refreshed)
    # the pin is the DELTA (refresh recovers a meaningful margin), not
    # an absolute bar — n_probe=1 of 2 cells with a 4-code PQ caps the
    # ceiling well below 1.0 even freshly trained
    assert r_refreshed > r_stale + 0.1
    assert r_refreshed >= 0.4


def test_refresh_equals_init_build_over_survivors(spark, tmp_path):
    """The rewrite contract the gate twin relies on: refresh ==
    init-only build_ivf_pq_index over the surviving corpus (same
    seeds, same structural params), probe-for-probe."""
    emb = _mini_corpus(spark)
    root = str(tmp_path / "idx")
    build_ivf_pq_index(
        emb, root, n_cells=4, m_subvectors=2, k_codes=8,
        coarse_iters=0, pq_iters=0, encode_residuals=False,
    )
    gone = spark.createDataFrame([(3,), (17,), (40,)], "vec_id LONG")
    delete_from_ivf_pq_index(gone, root, ingest_id="1")
    refreshed = compact_ivf_pq_index(
        spark, root, retrain_corpus=emb, coarse_iters=0, pq_iters=0
    )
    # survivor restriction applied: deleted ids are not re-admitted
    # even though retrain_corpus still contains them
    assert _codes_ids(refreshed) == set(range(64)) - {3, 17, 40}
    survivors = emb.filter(~F.col("vec_id").isin(3, 17, 40))
    root2 = str(tmp_path / "idx2")
    init = build_ivf_pq_index(
        survivors, root2, n_cells=4, m_subvectors=2, k_codes=8,
        coarse_iters=0, pq_iters=0, encode_residuals=False,
    )
    q = survivors.filter(F.col("vec_id") < 5)
    a = knn_ivf_pq(None, q, k=3, n_probe=2, index=refreshed)
    b = knn_ivf_pq(None, q, k=3, n_probe=2, index=init)
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )


def test_refresh_rejects_below(spark, tmp_path):
    """Carried later-ingest codes would be bit-garbage under new
    quantizers, so retrain + below is a contract violation. Explicit
    ValueError, not assert (ADVICE r14): the contract must hold under
    python -O too."""
    emb, root = _build(spark, tmp_path)
    with pytest.raises(ValueError, match="folds the whole committed"):
        compact_ivf_pq_index(spark, root, below=1, retrain_corpus=emb)


# -- streaming frozen split routing (round-14 lifecycle) ----------------------


def test_streaming_split_routing_lifecycle(spark, tmp_path):
    """3-trigger drop-dir replay: each doc's split record is written
    exactly once (the freeze), later joiners inherit the cluster's
    original route across repeated renames (route chain folds through
    the per-trigger snapshots), and the routes snapshots hold exactly
    the non-identity entries."""
    import json
    import os

    from tweetaggregates_spark.operators.dedup import (
        _apply_remap,
        read_band_index_parts,
    )
    from tweetaggregates_spark.operators.sampling import split_assign
    from tweetaggregates_spark.streaming.dedup import (
        run_streaming_split_routing,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten eleven"
    batches = [
        [(10, text), (11, text), (40, other)],
        [(5, text)],   # joins {10,11}: rename 10 -> 5
        [(3, text)],   # joins again: rename 5 -> 3
    ]
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, rows in enumerate(batches):
        p = os.path.join(in_dir, f"{i}.ndjson")
        with open(p, "w") as fh:
            fh.write("\n".join(
                json.dumps({"doc_id": d, "text": t}) for d, t in rows
            ))
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    index_path = str(tmp_path / "index")
    out_path = str(tmp_path / "out")
    run_streaming_split_routing(
        spark, in_dir, index_path, out_path,
        str(tmp_path / "ckpt"), available_now=True,
        max_files_per_trigger=1,
    )
    out = spark.read.parquet(out_path)
    per_batch = {
        int(r.batch_id): set()
        for r in out.select("batch_id").distinct().collect()
    }
    for r in out.collect():
        per_batch[int(r.batch_id)].add(r.doc_id)
    # emitted exactly once, at first ingest
    assert per_batch == {0: {10, 11, 40}, 1: {5}, 2: {3}}
    sp = {r.doc_id: r.split for r in out.collect()}
    # batch-0 docs routed by their own first-seen labels
    base10 = _splits(split_assign(
        spark.createDataFrame([(10,)], "doc_id LONG").selectExpr(
            "doc_id", "doc_id AS cluster_id"), "cluster_id"))[10]
    assert sp[10] == sp[11] == base10
    # joiners inherit the ORIGINAL route (10) across both renames
    assert sp[5] == base10 and sp[3] == base10
    # routes snapshots: exactly the folded non-identity entry
    r1 = spark.read.parquet(f"{index_path}/routes/v=1").collect()
    r2 = spark.read.parquet(f"{index_path}/routes/v=2").collect()
    assert {(r.cluster_id, r.route_key) for r in r1} == {(5, 10)}
    assert {(r.cluster_id, r.route_key) for r in r2} == {(3, 10)}
    # read contract: remap-folded cluster ids converge to the final
    # label without touching the frozen split column
    _parts, resolved = read_band_index_parts(spark, index_path)
    folded = _apply_remap(out, resolved, "cluster_id")
    got = {r.doc_id: (r.cluster_id, r.split) for r in folded.collect()}
    assert {d: c for d, (c, _s) in got.items() if d != 40} == {
        10: 3, 11: 3, 5: 3, 3: 3
    }
    assert all(got[d][1] == sp[d] for d in sp)


def test_drift_policy_closes_the_loop(spark, tmp_path):
    """refresh_ivf_pq_if_drifted: the shifted batch trips
    needs_rebuild -> refresh fires -> the SAME batch no longer trips
    it (retrained quantizers fit); an in-distribution batch never
    triggers a rebuild in the first place."""
    import math

    from tweetaggregates_spark.operators.similarity import (
        append_to_ivf_pq_index,
        refresh_ivf_pq_if_drifted,
    )

    def mk(ids, center):
        rows = [
            (
                i,
                [
                    round(center + math.sin(1.7 * i * (j + 1)), 6)
                    for j in range(4)
                ],
            )
            for i in ids
        ]
        return spark.createDataFrame(
            rows, "vec_id LONG, embedding ARRAY<DOUBLE>"
        )

    v1 = mk(range(60), 0.0)
    root = str(tmp_path / "idx")
    build_ivf_pq_index(
        v1, root, n_cells=2, m_subvectors=2, k_codes=4,
        coarse_iters=2, pq_iters=2, encode_residuals=False,
    )
    # in-distribution batch: no refresh
    calm = mk(range(100, 120), 0.0)
    assert not refresh_ivf_pq_if_drifted(
        spark, root, v1, calm, coarse_iters=2, pq_iters=2
    )
    # shifted batch: detector fires, refresh retrains on the corpus
    # INCLUDING the appended shift
    shifted = mk(range(200, 240), 50.0)
    append_to_ivf_pq_index(shifted, root, ingest_id="1")
    corpus = v1.unionByName(shifted)
    assert refresh_ivf_pq_if_drifted(
        spark, root, corpus, shifted, coarse_iters=2, pq_iters=2
    )
    # loop closed: the same batch no longer trips the detector
    assert not refresh_ivf_pq_if_drifted(
        spark, root, corpus, shifted, coarse_iters=2, pq_iters=2
    )
