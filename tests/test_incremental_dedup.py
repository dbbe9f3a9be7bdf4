"""Incremental (cross-run) dedup: the persisted MinHash band index
must make new-batch dedup EQUAL to a full recompute on the combined
corpus (batching-invariance of connected components under
component-contraction), including the cluster-merge path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tweetaggregates_spark.operators import dedup
from tweetaggregates_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = load_table(spark, SF, "documents").select("doc_id", "text").persist()
    d.count()
    yield d
    d.unpersist()


def _index_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _clusters(df):
    return dict(
        df.select("doc_id", "cluster").distinct().rdd.map(tuple).collect()
    )


def test_incremental_equals_full_recompute(spark, docs, tmp_path):
    """Index(batch1) + dedup_new_batch(batch2) == build_band_index(all),
    through a parquet round trip of the index."""
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "band_index")
    dedup.write_band_index(dedup.build_band_index(b1), path)
    index = dedup.read_band_index(spark, path)
    assignments, updated = dedup.dedup_new_batch(b2, index)

    full = dedup.build_band_index(docs)
    assert _index_rows(updated) == _index_rows(full)

    # per-doc cluster assignment for the new batch matches the full
    # recompute's component labels
    full_clusters = _clusters(full)
    for row in assignments.collect():
        # docs with no bands (too short) are singletons in both
        assert full_clusters.get(row.doc_id, row.doc_id) == row.cluster
        assert row.is_duplicate == (row.cluster != row.doc_id)

    # sanity: the corpus has planted near-dups, so the batch boundary
    # is actually exercised (some cross-batch duplicate exists)
    cross = assignments.filter(
        F.col("is_duplicate") & (F.col("cluster") % 2 == 0)
    ).count()
    assert cross > 0, "expected cross-batch duplicates in testdata"


def test_new_exact_duplicate_joins_existing_cluster(spark):
    b1 = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),
         (20, "one two three four five six seven")],
        ["doc_id", "text"],
    )
    b2 = spark.createDataFrame(
        [(30, "alpha beta gamma delta epsilon zeta"),  # dup of 10
         (40, "totally different content words here")],
        ["doc_id", "text"],
    )
    index = dedup.build_band_index(b1)
    assignments, updated = dedup.dedup_new_batch(b2, index)
    asg = _clusters(assignments)
    assert asg[30] == 10 and asg[40] == 40
    # batching-invariance on the crafted corpus too
    assert _index_rows(updated) == _index_rows(
        dedup.build_band_index(b1.unionByName(b2))
    )


def test_smaller_new_doc_takes_over_cluster_label(spark):
    """A new doc with a SMALLER id than its duplicate's existing
    cluster becomes the new canonical — old index rows remap."""
    b1 = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    b2 = spark.createDataFrame(
        [(3, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    assignments, updated = dedup.dedup_new_batch(
        b2, dedup.build_band_index(b1)
    )
    assert _clusters(assignments) == {3: 3}
    # every band row of doc 10 now carries cluster 3
    assert _clusters(updated) == {3: 3, 10: 3}


def test_exact_dedup_new_batch_matches_full_recompute(spark, docs):
    """The content-hash index fold is batching-invariant (min/sum are
    associative+commutative): two-batch == one-shot exact_dedup."""
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    assignments, updated = dedup.exact_dedup_new_batch(
        b2, dedup.exact_dedup(b1)
    )
    assert _index_rows(updated) == _index_rows(dedup.exact_dedup(docs))
    assert assignments.count() == b2.count()
    full = {
        r.content_hash: r.canonical_id
        for r in dedup.exact_dedup(docs).collect()
    }
    for row in assignments.collect():
        assert row.is_duplicate == (row.doc_id != row.canonical_id)
        assert row.canonical_id in full.values()


def test_exact_dedup_new_batch_smaller_id_takeover(spark):
    b1 = spark.createDataFrame([(10, "same text here")], ["doc_id", "text"])
    b2 = spark.createDataFrame([(3, "same text here")], ["doc_id", "text"])
    assignments, updated = dedup.exact_dedup_new_batch(
        b2, dedup.exact_dedup(b1)
    )
    [u] = updated.collect()
    assert (u.canonical_id, u.n_copies) == (3, 2)
    [a] = assignments.collect()
    assert (a.doc_id, a.canonical_id, a.is_duplicate) == (3, 3, False)


def test_three_batch_history_with_label_takeover(spark):
    """Three successive batches: growth of existing clusters, an
    unrelated cluster left untouched, then a smaller-id arrival that
    remaps a grown cluster's every index row — the accumulated index
    must equal the one-shot recompute at each step."""
    t1 = "apple banana cherry date elderberry fig grape honeydew"
    t2 = "kiwi lemon mango nectarine orange papaya quince raspberry"
    b1 = spark.createDataFrame([(10, t1), (20, t2)], ["doc_id", "text"])
    index = dedup.build_band_index(b1)
    assert _clusters(index) == {10: 10, 20: 20}
    b2 = spark.createDataFrame([(31, t1), (32, t2)], ["doc_id", "text"])
    assignments, updated = dedup.dedup_new_batch(b2, index)
    assert _clusters(assignments) == {31: 10, 32: 20}
    assert _clusters(updated) == {10: 10, 20: 20, 31: 10, 32: 20}
    # smaller-id arrival: cluster {10, 31} relabels to 5 everywhere,
    # cluster 20 untouched
    b3 = spark.createDataFrame([(5, t1)], ["doc_id", "text"])
    assignments3, updated3 = dedup.dedup_new_batch(b3, updated)
    assert _clusters(assignments3) == {5: 5}
    assert _clusters(updated3) == {5: 5, 10: 5, 31: 5, 20: 20, 32: 20}
    # the whole three-batch history equals one-shot recompute
    assert _index_rows(updated3) == _index_rows(
        dedup.build_band_index(b1.unionByName(b2).unionByName(b3))
    )


def test_bucketed_index_joins_without_index_shuffle(spark, docs):
    """The 100 TB index layout: with the band index written as a
    catalog table bucketed on (band_id, band_key), the discovery
    join's index side must plan with NO Exchange — its bucket layout
    satisfies the join's distribution; only the new batch shuffles.
    And the edges must equal the plain-parquet path's."""
    import contextlib
    import io
    import uuid

    table = f"band_index_{uuid.uuid4().hex[:8]}"
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    dedup.write_band_index_bucketed(dedup.build_band_index(b1), table, 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path so the assertion is about the
        # bucket layout, not about broadcast hiding the exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        index = spark.table(table)
        new_bands = dedup.lsh_bands(dedup.minhash_signatures(b2))
        edges = dedup.new_vs_index_edges(new_bands, index)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            edges.explain("formatted")
        plan = buf.getvalue()
        # the join's RIGHT branch (the index scan) must have no
        # Exchange: in the formatted tree, left-branch lines carry the
        # ':' continuation marker, right-branch lines are bare '+-'
        lines = plan.splitlines()
        ji = next(
            i
            for i, l in enumerate(lines)
            if "ShuffledHashJoin" in l or "SortMergeJoin" in l
        )
        si = next(
            i
            for i, l in enumerate(lines)
            if "Scan parquet spark_catalog" in l
        )
        assert ji < si, f"catalog scan not under the join:\n{plan}"

        # walk the ancestor chain from the index scan up to the join
        # (each ancestor's branch marker sits at a smaller column);
        # none of them may be an Exchange
        def _col(line):
            p = line.find("+-")
            return p if p >= 0 else line.find(":-")

        col = _col(lines[si])
        for i in range(si - 1, ji, -1):
            c = _col(lines[i])
            if 0 <= c < col:
                assert "Exchange" not in lines[i], (
                    f"index side shuffled:\n{plan}"
                )
                col = c

        plain = dedup.new_vs_index_edges(
            new_bands,
            dedup.build_band_index(b1),
        )
        assert _index_rows(edges) == _index_rows(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_capped_incremental_dedup(spark):
    """Hot-band guard: a boilerplate band shared by many docs is
    quarantined (no pair explosion through it), docs still cluster
    through their other, cool bands, and with no oversized bucket the
    capped variant EQUALS dedup_new_batch exactly."""
    t1 = "apple banana cherry date elderberry fig grape honeydew"
    t2 = "kiwi lemon mango nectarine orange papaya quince raspberry"
    b1 = spark.createDataFrame([(10, t1), (20, t2)], ["doc_id", "text"])
    index = dedup.build_band_index(b1)

    b2 = spark.createDataFrame([(31, t1), (32, t2)], ["doc_id", "text"])
    # no hot bucket at cap 100: identical to the uncapped fold
    a_cap, u_cap, q = dedup.dedup_new_batch_capped(
        b2, index, max_bucket_size=100
    )
    a_ref, u_ref = dedup.dedup_new_batch(b2, index)
    assert q.count() == 0
    assert _index_rows(a_cap) == _index_rows(a_ref)
    assert _index_rows(u_cap) == _index_rows(u_ref)

    # cap 1: EVERY shared bucket (size >= 2 combined) is hot, so no
    # pairs are discovered — new docs become singletons — but their
    # band rows still land in the index, and the quarantine reports
    # the oversized buckets with the member sample
    a1, u1, q1 = dedup.dedup_new_batch_capped(b2, index, max_bucket_size=1)
    assert _clusters(a1) == {31: 31, 32: 32}
    assert u1.filter(F.col("doc_id") == 31).count() == u_ref.filter(
        F.col("doc_id") == 31
    ).count()
    qs = q1.collect()
    assert qs and all(r.bucket_size >= 2 for r in qs)
    members = {d for r in qs for d in r.example_doc_ids}
    assert members <= {10, 20, 31, 32}


def test_bandless_batch_folds_cleanly(spark):
    """Docs too short to emit any band (< k tokens) are implicit
    singletons: the delta graph is empty, assignments still cover the
    batch, and the index gains no band rows for them."""
    b1 = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    index = dedup.build_band_index(b1)
    short = spark.createDataFrame([(50, "hi there")], ["doc_id", "text"])
    assignments, updated = dedup.dedup_new_batch(short, index)
    assert _clusters(assignments) == {50: 50}
    [a] = assignments.collect()
    assert a.is_duplicate is False
    assert updated.filter(F.col("doc_id") == 50).count() == 0
    assert _index_rows(updated) == _index_rows(index)


def test_delta_fold_equals_full_rewrite_across_four_batches(
    spark, tmp_path
):
    """The append-only maintenance path (VERDICT r5 #1): per-ingest
    band appends + a chain-forming remap log, folded at read, must
    equal both the full-rewrite chain and the one-shot build — and
    each append's bytes must be O(batch + merged clusters)."""
    import os

    t1 = "apple banana cherry date elderberry fig grape honeydew"
    t2 = "kiwi lemon mango nectarine orange papaya quince raspberry"
    path = str(tmp_path / "band_index")
    b1 = spark.createDataFrame([(10, t1), (20, t2)], ["doc_id", "text"])
    first = dedup.build_band_index(b1)
    dedup.append_band_index_delta(
        first,
        spark.createDataFrame([], dedup.REMAP_SCHEMA),
        path,
        0,
    )
    batches = {
        1: [(31, t1), (32, t2)],   # joins clusters 10 and 20, no remap
        2: [(5, t1)],              # takes over cluster 10 -> 5
        3: [(2, t1)],              # takes over cluster 5 -> 2 (CHAIN)
    }
    all_docs = b1
    for v, rows in batches.items():
        batch = spark.createDataFrame(rows, ["doc_id", "text"])
        index = dedup.read_band_index(spark, path)
        assignments, new_rows, remap = dedup.dedup_new_batch_delta(
            batch, index
        )
        dedup.append_band_index_delta(new_rows, remap, path, v)
        all_docs = all_docs.unionByName(batch)

    folded = dedup.read_band_index(spark, path)
    one_shot = dedup.build_band_index(all_docs)
    assert _index_rows(folded) == _index_rows(one_shot)
    # chain actually formed and folds transitively: v=2 logged 10->5,
    # v=3 logged 5->2, and every band row of docs {2,5,10,31} reads
    # back as cluster 2
    r2 = {
        (r.old_cluster, r.new_cluster)
        for r in spark.read.parquet(f"{path}/remap/v=2").collect()
    }
    r3 = {
        (r.old_cluster, r.new_cluster)
        for r in spark.read.parquet(f"{path}/remap/v=3").collect()
    }
    assert r2 == {(10, 5)} and r3 == {(5, 2)}
    assert _clusters(folded) == {2: 2, 5: 2, 10: 2, 31: 2, 20: 20, 32: 20}
    # O(batch) appends: each bands/v=N holds only that batch's rows
    n_bands_per_doc = dedup.N_BANDS
    for v, rows in batches.items():
        cnt = spark.read.parquet(f"{path}/bands/v={v}").count()
        assert cnt == n_bands_per_doc * len(rows)
    # replay contract: below=N reproduces the pre-batch index
    pre3 = dedup.read_band_index(spark, path, below=3)
    assert _clusters(pre3) == {5: 5, 10: 5, 31: 5, 20: 20, 32: 20}


def test_compact_band_index_rebases_and_appends_continue(
    spark, tmp_path
):
    """Compaction materializes the fold as a crash-safe base, clears
    the log, and later appends stack on top of the base."""
    import os

    t1 = "apple banana cherry date elderberry fig grape honeydew"
    t2 = "kiwi lemon mango nectarine orange papaya quince raspberry"
    path = str(tmp_path / "band_index")
    b1 = spark.createDataFrame([(10, t1), (20, t2)], ["doc_id", "text"])
    dedup.append_band_index_delta(
        dedup.build_band_index(b1),
        spark.createDataFrame([], dedup.REMAP_SCHEMA),
        path,
        0,
    )
    b2 = spark.createDataFrame([(5, t1)], ["doc_id", "text"])
    _, new_rows, remap = dedup.dedup_new_batch_delta(
        b2, dedup.read_band_index(spark, path)
    )
    dedup.append_band_index_delta(new_rows, remap, path, 1)

    compacted = dedup.compact_band_index(spark, path)
    assert os.path.isdir(f"{path}/base/v=1")
    assert not any(
        d.startswith("v=") for d in os.listdir(f"{path}/bands")
    )
    assert not any(
        d.startswith("v=") for d in os.listdir(f"{path}/remap")
    )
    expect12 = dedup.build_band_index(b1.unionByName(b2))
    assert _index_rows(compacted) == _index_rows(expect12)
    assert _index_rows(dedup.read_band_index(spark, path)) == _index_rows(
        expect12
    )
    # appends continue on top of the base
    b3 = spark.createDataFrame([(3, t2)], ["doc_id", "text"])
    _, new_rows3, remap3 = dedup.dedup_new_batch_delta(
        b3, dedup.read_band_index(spark, path)
    )
    dedup.append_band_index_delta(new_rows3, remap3, path, 2)
    folded = dedup.read_band_index(spark, path)
    assert _index_rows(folded) == _index_rows(
        dedup.build_band_index(
            b1.unionByName(b2).unionByName(b3)
        )
    )


def test_compaction_readmits_cooled_quarantine_buckets(spark, tmp_path):
    """Quarantine re-admission (VERDICT r5 #8): ingests capped at
    max_bucket_size=1 quarantine every shared bucket (docs stay
    singletons), but the index keeps every band row — compacting with
    a big-enough cap replays the skipped discovery, merges the
    clusters, and the result equals the UNCAPPED one-shot build. The
    quarantine trees merge into one compacted dir holding only
    still-hot buckets (none here)."""
    import os

    t1 = "apple banana cherry date elderberry fig grape honeydew"
    t2 = "kiwi lemon mango nectarine orange papaya quince raspberry"
    path = str(tmp_path / "band_index")
    qpath = str(tmp_path / "quarantine")
    batches = {0: [(10, t1), (20, t2)], 1: [(31, t1)], 2: [(5, t1)]}
    all_rows = [r for rows in batches.values() for r in rows]
    for v, rows in batches.items():
        batch = spark.createDataFrame(rows, ["doc_id", "text"])
        index = dedup.read_band_index(spark, path, below=v)
        asg, new_rows, remap, quarantine = (
            dedup.dedup_new_batch_capped_delta(
                batch, index, max_bucket_size=1
            )
        )
        dedup.append_band_index_delta(new_rows, remap, path, v)
        quarantine.write.mode("overwrite").parquet(
            f"{qpath}/batch_id={v}"
        )
    # capped ingest left everything singleton
    capped = dedup.read_band_index(spark, path)
    assert _clusters(capped) == {10: 10, 20: 20, 31: 31, 5: 5}
    assert spark.read.parquet(qpath).count() > 0

    compacted = dedup.compact_band_index(
        spark, path, quarantine_path=qpath, max_bucket_size=100
    )
    expect = dedup.build_band_index(
        spark.createDataFrame(all_rows, ["doc_id", "text"])
    )
    assert _index_rows(compacted) == _index_rows(expect)
    assert _clusters(compacted) == {5: 5, 10: 5, 31: 5, 20: 20}
    # quarantine merged to ONE compacted dir, and no still-hot buckets
    # survive the raised cap
    dirs = [d for d in os.listdir(qpath) if d.startswith("batch_id=")]
    assert len(dirs) == 1
    assert spark.read.parquet(qpath).count() == 0


def test_compaction_keeps_still_hot_buckets_quarantined(spark, tmp_path):
    """Buckets still over the cap at compaction time stay quarantined
    (merged, re-counted) and their pairs stay undiscovered."""
    t1 = "apple banana cherry date elderberry fig grape honeydew"
    path = str(tmp_path / "band_index")
    qpath = str(tmp_path / "quarantine")
    batches = {0: [(10, t1), (20, t1)], 1: [(31, t1), (32, t1)]}
    for v, rows in batches.items():
        batch = spark.createDataFrame(rows, ["doc_id", "text"])
        index = dedup.read_band_index(spark, path, below=v)
        asg, new_rows, remap, quarantine = (
            dedup.dedup_new_batch_capped_delta(
                batch, index, max_bucket_size=1
            )
        )
        dedup.append_band_index_delta(new_rows, remap, path, v)
        quarantine.write.mode("overwrite").parquet(
            f"{qpath}/batch_id={v}"
        )
    # cap=3 at compaction: the 4-doc bucket is STILL hot
    compacted = dedup.compact_band_index(
        spark, path, quarantine_path=qpath, max_bucket_size=3
    )
    assert _clusters(compacted) == {10: 10, 20: 20, 31: 31, 32: 32}
    q = spark.read.parquet(qpath)
    rows = q.collect()
    assert rows and all(r.bucket_size == 4 for r in rows)
    members = {d for r in rows for d in r.example_doc_ids}
    assert members == {10, 20, 31, 32}


def _assert_index_side_unshuffled(plan: str) -> None:
    """Walk the formatted plan: the catalog (bucketed) scan's ancestor
    chain up to the join must contain no Exchange."""
    lines = plan.splitlines()
    ji = next(
        i
        for i, l in enumerate(lines)
        if "ShuffledHashJoin" in l or "SortMergeJoin" in l
    )
    si = next(
        i for i, l in enumerate(lines) if "Scan parquet spark_catalog" in l
    )
    assert ji < si, f"catalog scan not under the join:\n{plan}"

    def _col(line):
        p = line.find("+-")
        return p if p >= 0 else line.find(":-")

    col = _col(lines[si])
    for i in range(si - 1, ji, -1):
        c = _col(lines[i])
        if 0 <= c < col:
            assert "Exchange" not in lines[i], f"index side shuffled:\n{plan}"
            col = c


def test_bucketed_base_mirror_discovery_without_base_shuffle(
    spark, docs, tmp_path
):
    """The 100 TB shape for the VERSIONED index (round 6): compaction
    mirrors the base into a bucketed catalog table; subsequent ingests
    join the parts separately (dedup_new_batch_delta(index_parts=...))
    with the post-base remap folded onto the edge OUTPUT — results
    equal the folded-union path exactly, and the bucketed base side
    of the discovery join plans with ZERO Exchange even while deltas
    and remaps exist on top of it."""
    import contextlib
    import io
    import uuid

    t1 = "apple banana cherry date elderberry fig grape honeydew"
    t2 = "kiwi lemon mango nectarine orange papaya quince raspberry"
    path = str(tmp_path / "band_index")
    table = f"band_base_{uuid.uuid4().hex[:8]}"
    try:
        b1 = spark.createDataFrame(
            [(10, t1), (20, t2)], ["doc_id", "text"]
        )
        dedup.append_band_index_delta(
            dedup.build_band_index(b1),
            spark.createDataFrame([], dedup.REMAP_SCHEMA),
            path,
            0,
        )
        dedup.compact_band_index(spark, path, bucketed_table=table, n_buckets=8)
        # post-base delta WITH a remap: doc 5 takes over cluster 10 —
        # the mirrored base's as-written labels are now stale
        b2 = spark.createDataFrame([(5, t1)], ["doc_id", "text"])
        _, nr, rm = dedup.dedup_new_batch_delta(
            b2, dedup.read_band_index(spark, path)
        )
        dedup.append_band_index_delta(nr, rm, path, 1)
        assert {(r.old_cluster, r.new_cluster) for r in rm.collect()} == {
            (10, 5)
        }

        # batch 3 via the parts path vs the folded-union path
        b3 = spark.createDataFrame([(7, t1), (8, t2)], ["doc_id", "text"])
        parts, remap = dedup.read_band_index_parts(
            spark, path, base_table=table
        )
        assert len(parts) == 2 and remap is not None
        a_parts, nr_p, rm_p = dedup.dedup_new_batch_delta(
            b3, None, index_parts=parts, index_remap=remap
        )
        a_fold, nr_f, rm_f = dedup.dedup_new_batch_delta(
            b3, dedup.read_band_index(spark, path)
        )
        assert _index_rows(a_parts) == _index_rows(a_fold)
        assert _index_rows(nr_p) == _index_rows(nr_f)
        assert _index_rows(rm_p) == _index_rows(rm_f)
        # the stale base label 10 resolved through the remap: docs 5,
        # 7 all land in cluster 5
        assert _clusters(a_parts) == {7: 5, 8: 8}

        # the bucketed base side of the discovery join: NO Exchange
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            new_bands = dedup.lsh_bands(dedup.minhash_signatures(b3))
            edges = dedup.new_vs_index_edges(new_bands, parts[0])
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                edges.explain("formatted")
            _assert_index_side_unshuffled(buf.getvalue())
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_maintained_bucket_counts_match_recount(spark, tmp_path):
    """The maintained counts side table: per-version count deltas sum
    to exactly the folded index's bucket sizes across appends AND a
    compaction; the counts-driven capped fold produces identical
    assignments/new-rows/remaps and identical hot-bucket keys+sizes
    to the corpus re-count path (examples narrow to batch docs)."""
    t1 = "apple banana cherry date elderberry fig grape honeydew"
    t2 = "kiwi lemon mango nectarine orange papaya quince raspberry"
    path = str(tmp_path / "band_index")
    b1 = spark.createDataFrame(
        [(10, t1), (20, t2), (11, t1)], ["doc_id", "text"]
    )
    dedup.append_band_index_delta(
        dedup.build_band_index(b1),
        spark.createDataFrame([], dedup.REMAP_SCHEMA),
        path,
        0,
    )
    b2 = spark.createDataFrame([(31, t1)], ["doc_id", "text"])
    _, nr, rm = dedup.dedup_new_batch_delta(
        b2, dedup.read_band_index(spark, path)
    )
    dedup.append_band_index_delta(nr, rm, path, 1)

    def _counts_equal():
        counts = dedup.read_bucket_counts(spark, path)
        assert counts is not None
        maintained = sorted(map(tuple, counts.collect()))
        recount = sorted(
            map(
                tuple,
                dedup.bucket_counts(
                    dedup.read_band_index(spark, path)
                ).collect(),
            )
        )
        assert maintained == recount

    _counts_equal()
    dedup.compact_band_index(spark, path)
    _counts_equal()

    # counts-driven capped fold == recount-driven (pair outputs)
    index = dedup.read_band_index(spark, path)
    counts = dedup.read_bucket_counts(spark, path)
    b3 = spark.createDataFrame([(47, t1), (48, t2)], ["doc_id", "text"])
    a_c, nr_c, rm_c, q_c = dedup.dedup_new_batch_capped_delta(
        b3, index, max_bucket_size=3, index_counts=counts
    )
    a_r, nr_r, rm_r, q_r = dedup.dedup_new_batch_capped_delta(
        b3, index, max_bucket_size=3
    )
    assert _index_rows(a_c) == _index_rows(a_r)
    assert _index_rows(nr_c) == _index_rows(nr_r)
    assert _index_rows(rm_c) == _index_rows(rm_r)
    kc = {
        (r.band_id, r.band_key, r.bucket_size) for r in q_c.collect()
    }
    kr = {
        (r.band_id, r.band_key, r.bucket_size) for r in q_r.collect()
    }
    # both paths agree on every batch-touched hot bucket; the recount
    # path may additionally re-list hot buckets the batch never
    # touches (none exist in this fixture, so the sets coincide)
    assert kc  # the guard actually fired
    assert kc <= kr
    # counts-path examples come from the batch
    for r in q_c.collect():
        assert set(r.example_doc_ids) <= {47, 48}
    # cluster outcome: doc 47 quarantined away from t1's hot bucket
    # (10, 11, 31 + batch > cap) -> singleton; doc 48 joins t2's cool
    # cluster 20
    assert _clusters(a_c)[47] == 47 and _clusters(a_c)[48] == 20

    # a missing counts version forces the None fallback
    import shutil

    shutil.rmtree(f"{path}/counts", ignore_errors=True)
    assert dedup.read_bucket_counts(spark, path) is None
