"""The vectorized (numpy/Arrow) KNN must agree with the exact codegen
fold — identical neighbor sets at rounded-6 similarity (ties aside)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetaggregates_spark.operators.similarity import (
    knn_bruteforce,
    knn_bruteforce_vectorized,
)
from tweetaggregates_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_vectorized_matches_exact(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id, r.cos_sim)
        for r in knn_bruteforce(emb, queries, k=5).collect()
    }
    fast = {
        (r.query_id, r.neighbor_id, r.cos_sim)
        for r in knn_bruteforce_vectorized(emb, queries, k=5).collect()
    }
    assert exact == fast
