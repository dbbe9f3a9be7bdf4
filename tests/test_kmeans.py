"""Distributed Lloyd k-means + SemDeDup semantic dedup
(operators/cluster.kmeans, semantic_dup_pairs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetaggregates_spark.operators.cluster import (
    kmeans,
    semantic_dup_pairs,
)
from tweetaggregates_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_kmeans_partitions_all_vectors_deterministically(spark):
    emb = load_table(spark, SF, "embeddings")
    n = emb.count()
    a1, c1 = kmeans(emb, k=4, iters=2)
    rows1 = sorted(tuple(r) for r in a1.collect())
    assert len(rows1) == n  # every vector assigned exactly once
    clusters = {r[1] for r in rows1}
    assert clusters <= set(range(4)) and len(clusters) >= 2
    # pure function of the data: identical on recomputation
    a2, _ = kmeans(emb, k=4, iters=2)
    assert sorted(tuple(r) for r in a2.collect()) == rows1
    # centroids have the vector dimensionality
    cent = c1.collect()
    dim = len(emb.select("embedding").first()[0])
    assert all(len(r.centroid) == dim for r in cent)


def test_kmeans_iterations_do_not_increase_inertia(spark):
    """Lloyd's guarantee: mean squared distance to the assigned
    centroid is non-increasing in the iteration count (up to the 1e-6
    centroid rounding both engines share)."""
    emb = load_table(spark, SF, "embeddings")

    def inertia(iters):
        a, _ = kmeans(emb, k=4, iters=iters)
        return a.agg(F.sum("dist")).collect()[0][0]

    i1, i3 = inertia(1), inertia(3)
    assert i3 <= i1 * (1 + 1e-6), (i1, i3)


def test_semantic_dup_pairs_are_cluster_local_and_thresholded(spark):
    emb = load_table(spark, SF, "embeddings")
    pairs = semantic_dup_pairs(emb, k=4, iters=2, threshold=0.4)
    a, _ = kmeans(emb, k=4, iters=2)
    cl = {r.vec_id: r.cluster for r in a.collect()}
    rows = pairs.collect()
    assert rows, "expected planted near-dups to share clusters"
    for r in rows:
        assert r.cos_sim >= 0.4
        assert cl[r.vec_a] == cl[r.vec_b] == r.cluster


def test_semantic_dup_adaptive_k_bounds_cluster_size(spark):
    """k=None derives k from target_cluster_size so no cluster exceeds
    ~2x the target (kmeans balance is approximate) — the rule that
    keeps the pair join linear at scale."""
    from tweetaggregates_spark.operators.cluster import kmeans
    import math

    emb = load_table(spark, SF, "embeddings")
    n = emb.count()
    target = 100
    k = max(2, math.ceil(n / target))
    a, _ = kmeans(emb, k=k, iters=2)
    sizes = [r["count"] for r in a.groupBy("cluster").count().collect()]
    assert max(sizes) <= 3 * target, sorted(sizes, reverse=True)[:5]
    # and the pairs path accepts k=None end to end
    pairs = semantic_dup_pairs(
        emb, k=None, iters=2, threshold=0.4, target_cluster_size=100
    )
    assert pairs.count() >= 0
