"""PageRank operator (operators/cluster.py round-2 addition)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetaggregates_spark.operators.cluster import pagerank

SF = "/root/testdata/sf0.001"


def _edges(spark):
    rows = [
        ("a", "b", 1.0),
        ("b", "c", 0.5),
        ("b", "a", 0.5),
        ("c", "a", 1.0),
    ]
    return spark.createDataFrame(rows, "src string, dst string, weight double")


def test_pagerank_is_probability_distribution(spark):
    """Row-stochastic edges + teleport => ranks stay a distribution."""
    pr = pagerank(_edges(spark), iterations=10)
    total = pr.agg(F.sum("pagerank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-4


def test_pagerank_orders_by_in_link_mass(spark):
    """'a' receives links from both b (half) and c (all) — it must
    outrank 'c', which only receives half of b's rank."""
    pr = {r["node"]: r["pagerank"] for r in pagerank(_edges(spark)).collect()}
    assert pr["a"] > pr["b"] > pr["c"]


def test_pagerank_normalize_matches_prenormalized(spark):
    """normalize=True on RAW (unnormalized) weights must reproduce the
    ranks of the caller-normalized edge list — misuse-proofing for the
    row-stochastic weight contract."""
    raw = spark.createDataFrame(
        [
            ("a", "b", 6.0),
            ("b", "c", 2.0),
            ("b", "a", 2.0),
            ("c", "a", 9.0),
        ],
        "src string, dst string, weight double",
    )
    got = {
        r["node"]: r["pagerank"]
        for r in pagerank(raw, normalize=True).collect()
    }
    want = {
        r["node"]: r["pagerank"] for r in pagerank(_edges(spark)).collect()
    }
    assert got == want


def test_pagerank_event_graph_matches_unrolled(spark):
    """The engine query over the real transition graph emits exactly
    one rank per event type, all positive."""
    from tweetaggregates_spark.plans.sequence import event_type_pagerank

    rows = event_type_pagerank(spark, SF).collect()
    assert len(rows) == 5
    assert all(r["pagerank"] > 0 for r in rows)
