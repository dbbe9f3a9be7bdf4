"""Observed filtering (operators/observe.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetaggregates_spark.operators.observe import filter_with_audit
from tweetaggregates_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_filter_audit_counts_match_in_one_pass(spark):
    docs = load_table(spark, SF, "documents")
    kept, obs = filter_with_audit(
        docs, F.col("lang") == "en", "lang_audit"
    )
    n_kept_action = kept.count()
    m = obs.get
    assert m["n_kept"] == n_kept_action
    assert m["n_input"] == docs.count()
    assert m["n_input"] == m["n_kept"] + m["n_dropped"]
    assert m["n_dropped"] > 0  # corpus is multi-language
