"""Round-11 operator tests: sampled-truth LSH audit (VERDICT r10 #4)
and related scale-path variants."""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"


def test_lsh_recall_sampled_restricts_both_sides(spark):
    """Every doc participating in the sampled audit (either side of
    any truth or candidate pair) must be in the deterministic
    'lshaudit' hash-sample, and the one-row metric frame must be
    internally consistent."""
    from tweetaggregates_spark.operators import dedup, sampling
    from tweetaggregates_spark.plans import llm

    docs = llm._docs(spark, SF).select("doc_id", "text")
    sampled_ids = {
        r["doc_id"]
        for r in sampling.hash_sample(
            docs, "doc_id", 0.2, salt="lshaudit"
        ).collect()
    }
    # roughly 20% (deterministic, so exact per corpus)
    n_docs = docs.count()
    assert 0.1 * n_docs < len(sampled_ids) < 0.3 * n_docs

    sampled = sampling.hash_sample(docs, "doc_id", 0.2, salt="lshaudit")
    truth = dedup.ngram_jaccard_pairs(sampled, threshold=0.3)
    cand = dedup.minhash_lsh_pairs(sampled)
    for pairs in (truth, cand):
        for r in pairs.select("doc_a", "doc_b").collect():
            assert r["doc_a"] in sampled_ids
            assert r["doc_b"] in sampled_ids

    row = llm.lsh_recall_sampled_docs(spark, SF).collect()[0]
    assert row["n_hit"] <= min(row["n_truth"], row["n_cand"])
    assert 0.0 <= row["recall"] <= 1.0
    assert 0.0 <= row["precision"] <= 1.0
    # non-vacuous at sf0.01: the duplicated band yields sampled truth
    assert row["n_truth"] >= 1


def test_lsh_recall_sampled_candidates_match_full_restriction(spark):
    """Banding a doc pair depends only on the two docs' signatures, so
    candidates(sample) == candidates(full corpus) restricted to
    sampled x sampled — the property that makes the sampled audit an
    unbiased estimator."""
    from tweetaggregates_spark.operators import dedup, sampling
    from tweetaggregates_spark.plans import llm

    docs = llm._docs(spark, SF).select("doc_id", "text")
    sampled = sampling.hash_sample(docs, "doc_id", 0.2, salt="lshaudit")
    sampled_ids = {r["doc_id"] for r in sampled.select("doc_id").collect()}
    from_sample = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(sampled)
        .select("doc_a", "doc_b")
        .collect()
    }
    from_full = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(docs)
        .select("doc_a", "doc_b")
        .collect()
        if r["doc_a"] in sampled_ids and r["doc_b"] in sampled_ids
    }
    assert from_sample == from_full
