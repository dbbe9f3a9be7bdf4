"""Round-10 operator tests: the sampled-training quality classifier
(the production shape — VERDICT r9 #1) and its relationship to the
full-batch determinism baseline."""

from __future__ import annotations

import pyspark.sql.functions as F

from tweetaggregates_spark.operators import sampling
from tweetaggregates_spark.plans import llm

SF = "/root/testdata/sf0.001"


class TestSampledClassifier:
    def test_scores_every_doc_despite_sampled_training(self, spark):
        full = llm.quality_classifier_docs(spark, SF)
        samp = llm.quality_classifier_sampled_docs(spark, SF)
        assert samp.columns == full.columns
        n_docs = full.count()
        assert samp.count() == n_docs  # scoring covers the FULL corpus
        assert samp.filter(F.col("quality_prob").isNull()).count() == 0

    def test_sample_is_the_hash_sample(self, spark):
        # the training subset is exactly operators/sampling.hash_sample
        # with the registered salt/fraction — a pure function of doc_id
        from tweetaggregates_spark.sources.tables import load_table

        docs = load_table(spark, SF, "documents")
        tr = sampling.hash_sample(
            docs, "doc_id", llm.CLF_SAMPLE_FRACTION, salt=llm.CLF_SAMPLE_SALT
        )
        n, k = docs.count(), tr.count()
        assert 0 < k < n  # a real proper subset at sf0.001
        # deterministic: same call, same membership
        ids1 = {r.doc_id for r in tr.select("doc_id").collect()}
        ids2 = {
            r.doc_id
            for r in sampling.hash_sample(
                docs, "doc_id", llm.CLF_SAMPLE_FRACTION,
                salt=llm.CLF_SAMPLE_SALT,
            ).select("doc_id").collect()
        }
        assert ids1 == ids2

    def test_local_trainer_bit_identical_to_distributed(self, spark):
        # the driver-side trainer must replay the distributed decimal
        # arithmetic exactly — weights equal, float for float
        from tweetaggregates_spark.operators import classifier, sampling
        from tweetaggregates_spark.sources.tables import load_table

        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            docs = load_table(spark, sf, "documents")
            labeled = llm._clf_labeled(docs)
            train = sampling.hash_sample(
                labeled, "doc_id", llm.CLF_SAMPLE_FRACTION,
                salt=llm.CLF_SAMPLE_SALT,
            )
            w_dist = classifier.logreg_quality_train(
                train, "label", n_buckets=256, iters=8, lr=500.0
            )
            w_local = classifier.logreg_quality_train_local(
                train, "label", n_buckets=256, iters=8, lr=500.0
            )
            assert w_local == w_dist, sf

    def test_local_trainer_max_rows_guard(self, spark):
        import pytest

        from tweetaggregates_spark.operators import classifier
        from tweetaggregates_spark.sources.tables import load_table

        docs = llm._clf_labeled(load_table(spark, SF, "documents"))
        with pytest.raises(ValueError, match="max_rows"):
            classifier.logreg_quality_train_local(
                docs, "label", iters=1, max_rows=3
            )

    def test_sampled_model_still_separates(self, spark):
        # the sampled-trained boundary should agree with the heuristic
        # label on a large majority of docs (the full-batch baseline
        # reaches ~the same agreement; exact equality is not expected)
        samp = llm.quality_classifier_sampled_docs(spark, SF)
        agree = samp.filter(
            (F.col("label") == 1) == F.col("clf_keep")
        ).count()
        total = samp.count()
        assert agree / total >= 0.8
