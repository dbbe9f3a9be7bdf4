"""Property tests (hypothesis) for the round-9 algorithmic cores:
UniMax waterfilling (budget conservation / cap dominance / theta
uniformity against a pure-python reference), corpus line dedup
(reference equality + idempotence at a fixed threshold), and the PCA
covariance sums' mergeability (the streaming-ingest invariant)."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tweetaggregates_spark.operators.pca import cov_term_sums
from tweetaggregates_spark.operators.sampling import unimax_plan
from tweetaggregates_spark.operators.text import line_dedup


@settings(max_examples=10, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 10_000), min_size=1, max_size=8),
    frac=st.sampled_from([0.25, 0.8, 1.0, 1.5, 3.0]),
    epochs=st.sampled_from([1, 2, 4]),
)
def test_unimax_waterfill_properties(spark, sizes, frac, epochs):
    rows = [(f"l{i}", s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, ["lang", "n_chars"])
    out = {
        r.lang: r
        for r in unimax_plan(
            df, "lang", "n_chars", budget_fraction=frac, max_epochs=epochs
        ).collect()
    }
    total = sum(sizes)
    b = frac * total
    caps = {f"l{i}": s * epochs for i, s in enumerate(sizes)}
    # every allocation respects its cap (to output rounding)
    for lang, r in out.items():
        assert r.alloc_chars <= caps[lang] + 1e-6
        assert r.epochs <= epochs + 1e-6
    alloc_sum = sum(r.alloc_chars for r in out.values())
    if b >= sum(caps.values()):
        # budget exceeds all caps: everything capped, budget NOT filled
        assert alloc_sum == sum(caps.values())
    else:
        # waterfilling fills the budget exactly (theta rounds to 6dp,
        # so the sum can be off by n_uncapped * 5e-7)
        assert abs(alloc_sum - b) <= 1e-6 * len(sizes) + 1e-6
        # uncapped groups share one theta, and theta dominates every
        # capped group's cap (the waterline is above every capped cap)
        uncapped = [
            r.alloc_chars
            for lang, r in out.items()
            if r.alloc_chars < caps[lang] - 1e-6
        ]
        capped = [
            caps[lang]
            for lang, r in out.items()
            if r.alloc_chars >= caps[lang] - 1e-6
        ]
        if uncapped:
            assert max(uncapped) - min(uncapped) <= 1e-6
            if capped:
                assert min(uncapped) >= max(capped) - 1e-6


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.integers(0, 9), min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    ),
    max_occ=st.sampled_from([1, 2]),
)
def test_line_dedup_matches_reference_and_is_idempotent(
    spark, docs, max_occ
):
    # line vocabulary of 10 short lines — collisions guaranteed
    rows = [
        (i, "\n".join(f"line {v}" for v in lines))
        for i, lines in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in line_dedup(df, max_occurrences=max_occ).collect()}
    # pure-python reference
    from collections import Counter

    counts = Counter(v for lines in docs for v in lines)
    for i, lines in enumerate(docs):
        kept = [f"line {v}" for v in lines if counts[v] <= max_occ]
        assert out[i].text == "\n".join(kept)
        assert out[i].n_lines == len(lines)
        assert out[i].n_lines_kept == len(kept)
    # idempotence: a kept line's occurrences were ALL kept, so its
    # corpus count is unchanged and a second pass drops nothing
    survivors = [(i, r.text) for i, r in out.items() if r.text != ""]
    if survivors:
        again = spark.createDataFrame(
            survivors, "doc_id LONG, text STRING"
        )
        out2 = {
            r.doc_id: r.text
            for r in line_dedup(again, max_occurrences=max_occ).collect()
        }
        for i, t in out2.items():
            assert t == out[i].text


@settings(max_examples=6, deadline=None)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-2, 2, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=12,
    ),
    cut=st.integers(1, 11),
)
def test_cov_sums_merge_to_the_whole(spark, vecs, cut):
    """The streaming-ingest invariant: per-batch covariance sums merge
    by per-key summation to EXACTLY the one-shot aggregate."""
    cut = min(cut, len(vecs) - 1)
    mk = lambda vs, off: spark.createDataFrame(
        [(off + i, [float(x) for x in v]) for i, v in enumerate(vs)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    whole = {
        r["_k"]: (r["_s"], r["_c"])
        for r in cov_term_sums(mk(vecs, 0), dim=3).collect()
    }
    a = {
        r["_k"]: (r["_s"], r["_c"])
        for r in cov_term_sums(mk(vecs[:cut], 0), dim=3).collect()
    }
    b = {
        r["_k"]: (r["_s"], r["_c"])
        for r in cov_term_sums(mk(vecs[cut:], cut), dim=3).collect()
    }
    for k, (s, c) in whole.items():
        sa, ca = a.get(k, (Decimal(0), 0))
        sb, cb = b.get(k, (Decimal(0), 0))
        assert sa + sb == s and ca + cb == c, k
