"""Round-8 operator pins: DSIR importance weights (VERDICT r7 #5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetaggregates_spark.operators.sampling import (
    dsir_log_weights,
    dsir_select,
)
from tweetaggregates_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


class TestDsir:
    def _frames(self, spark):
        docs = load_table(spark, SF, "documents").select(
            "doc_id", "lang", "text"
        )
        return docs, docs.filter(F.col("lang") == "en")

    def test_target_docs_score_higher(self, spark):
        """The defining DSIR property: target-domain docs get higher
        importance weights than off-domain docs on average (here the
        en/non-en token distributions differ by construction)."""
        docs, target = self._frames(spark)
        scored = dsir_log_weights(docs, target)
        means = dict(
            scored.withColumn("is_t", F.col("lang") == "en")
            .groupBy("is_t")
            .agg(F.avg("log_weight").alias("m"))
            .collect()
        )
        assert means[True] > means[False]

    def test_empty_doc_scores_zero(self, spark):
        docs = spark.createDataFrame(
            [(1, "en", "spark rows"), (2, "xx", ""), (3, "xx", "!!!")],
            "doc_id BIGINT, lang STRING, text STRING",
        )
        scored = dsir_log_weights(docs, docs.filter("lang = 'en'"))
        got = {r.doc_id: r.log_weight for r in scored.collect()}
        assert got[2] == 0.0 and got[3] == 0.0

    def test_scoring_pass_is_map_only(self, spark):
        """After the two count aggregates (driven at build time), the
        scoring projection itself has no exchange, join, or generate:
        the ratios ship as a literal array and each doc folds its own
        features."""
        docs, target = self._frames(spark)
        scored = dsir_log_weights(docs, target)
        plan = scored._jdf.queryExecution().executedPlan().toString()
        # load_table's round-robin repartition of the tiny testdata is
        # the one permitted exchange; the scoring adds none of its own
        for line in plan.splitlines():
            if "Exchange" in line:
                assert "RoundRobinPartitioning" in line, line
            for op in ("Join", "Generate"):
                assert op not in line, line

    def test_select_keep_matches_rule(self, spark):
        """dsir_select == filter(sample_bucket < keep_prob * BUCKETS)
        applied to the scored frame (weighted_sample equivalence)."""
        from tweetaggregates_spark.operators.sampling import (
            BUCKETS,
            sample_bucket,
        )

        docs, target = self._frames(spark)
        kept = {r.doc_id for r in dsir_select(docs, target).collect()}
        scored = dsir_log_weights(docs, target).withColumn(
            "keep_prob",
            F.round(F.exp(F.least(F.col("log_weight"), F.lit(0.0))), 6),
        )
        want = {
            r.doc_id
            for r in scored.filter(
                sample_bucket(F.col("doc_id"), "dsir").cast("double")
                < F.col("keep_prob") * BUCKETS
            ).collect()
        }
        assert kept == want
        assert 0 < len(kept) < docs.count()
