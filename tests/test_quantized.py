"""int8 quantization family (operators/similarity.py round-2 additions)."""

from __future__ import annotations

from tweetaggregates_spark.operators import similarity
from tweetaggregates_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_quantization_bounds_and_scale(spark):
    """Quantized components stay within int8 range and the scale is the
    max-abs component (so at least one component hits +/-127)."""
    emb = load_table(spark, SF, "embeddings")
    q = similarity.quantize_embeddings(emb)
    rows = q.collect()
    assert rows
    for r in rows:
        assert -127 <= r["q_min"] <= r["q_max"] <= 127
        assert max(abs(r["q_min"]), abs(r["q_max"])) == 127


def test_quantized_knn_recall_vs_bruteforce(spark):
    """The compressed-domain shortlist (3x over-fetch) must recover
    nearly all exact top-5 neighbors; int8 on 64-dim unit-scale vectors
    loses ~0.4% similarity resolution, far below typical neighbor
    gaps."""
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter("vec_id < 20")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_bruteforce(emb, queries, k=5).collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_quantized_rescore(emb, queries, k=5).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.95, recall


def test_embedding_health_clean_corpus(spark):
    """The driver corpus is clean: no NaNs, fixed dim, positive norms."""
    emb = load_table(spark, SF, "embeddings")
    rows = similarity.embedding_health_stats(emb).collect()
    assert rows
    for r in rows:
        assert r["min_dim"] == r["max_dim"] == 64
        assert r["total_nan"] == 0
        assert r["avg_l2_norm"] > 0
