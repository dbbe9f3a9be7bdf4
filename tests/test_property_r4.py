"""Property tests (hypothesis) for the round-4 algorithmic cores:
the range-partitioned prefix sum and cross-document substring dedup,
each checked against an exhaustive pure-Python oracle on random
inputs."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tweetaggregates_spark.operators.dedup import substring_dup_pairs
from tweetaggregates_spark.operators.prefix import partitioned_prefix_sum


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(-5, 5), st.integers(-10, 10)),
        min_size=1,
        max_size=60,
    ),
    n_buckets=st.sampled_from([2, 3, 8]),
)
def test_prefix_sum_equals_global_window(spark, rows, n_buckets):
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)],
        "k long, v long, rid long",
    ).repartition(4)
    got = partitioned_prefix_sum(
        df, "k", "v", n_buckets=n_buckets, tiebreakers=["rid"]
    )
    w = W.orderBy("k", "rid").rowsBetween(W.unboundedPreceding, W.currentRow)
    want = df.withColumn("running_total", F.sum("v").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _expected_substring_pairs(texts: dict[int, str], L: int):
    sh = {
        d: [
            (i, tuple(toks[i : i + L]))
            for i in range(len(toks) - L + 1)
        ]
        for d, toks in ((d, _tokens(t)) for d, t in texts.items())
    }
    out = {}
    docs = sorted(sh)
    for ai in range(len(docs)):
        for bi in range(ai + 1, len(docs)):
            a, b = docs[ai], docs[bi]
            matches = [
                (pa, pb)
                for pa, sa in sh[a]
                for pb, sb in sh[b]
                if sa == sb
            ]
            if not matches:
                continue
            by_diag: dict[int, list[int]] = {}
            for pa, pb in matches:
                by_diag.setdefault(pa - pb, []).append(pa)
            max_run = 0
            for pas in by_diag.values():
                cur = best = 1
                for x, y in zip(sorted(pas), sorted(pas)[1:]):
                    cur = cur + 1 if y == x + 1 else 1
                    best = max(best, cur)
                max_run = max(max_run, best)
            out[(a, b)] = (len(matches), max_run + L - 1)
    return out


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abc"), min_size=0, max_size=14),
        min_size=2,
        max_size=6,
    )
)
def test_substring_pairs_match_bruteforce(spark, docs):
    texts = {i: " ".join(toks) for i, toks in enumerate(docs)}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): (r.n_shared_shingles, r.max_span_tokens)
        for r in substring_dup_pairs(df, span_tokens=3).collect()
    }
    want = _expected_substring_pairs(texts, 3)
    assert got == want
