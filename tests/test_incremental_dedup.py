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
