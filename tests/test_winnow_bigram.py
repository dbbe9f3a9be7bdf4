"""Winnowing fingerprints, bigram-LM quality scores, pair_recall.

Winnowing reference: Schleimer, Wilkerson & Aiken, "Winnowing: Local
Algorithms for Document Fingerprinting", SIGMOD 2003. The key contract
pinned here is the paper's detection guarantee: with shingle size k and
window size w, any shared token run of length >= w + k - 1 produces at
least one shared fingerprint (basic winnowing, content-local
rightmost-min tie-break).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetaggregates_spark.operators.dedup import (
    pair_recall,
    winnow_dup_pairs,
    winnow_fingerprints,
)
from tweetaggregates_spark.operators.text import bigram_logprob_scores

K, W = 4, 4
GUARANTEE = W + K - 1  # shared runs of >= 7 tokens are always detected


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_winnow_hand_trace(spark):
    """4 tokens -> exactly one shingle -> one window short of w=4 =>
    no fingerprint; 7 tokens -> 4 shingles -> exactly one full window
    => exactly one fingerprint."""
    df = _docs(spark, ["a b c d", "p q r s t u v"])
    fps = winnow_fingerprints(df, k=K, w=W).collect()
    assert all(r.doc_id == 2 for r in fps)
    assert len(fps) == 1
    assert 0 <= fps[0].fp_pos <= 3


def test_winnow_shared_run_guarantee(spark):
    """Planted shared run of GUARANTEE tokens inside otherwise
    disjoint documents => at least one shared fp_hash."""
    run = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    assert len(run.split()) == GUARANTEE
    df = _docs(
        spark,
        [
            f"one two three four five six {run} seven eight nine ten",
            f"red orange yellow green blue {run} indigo violet pink gray",
        ],
    )
    fps = winnow_fingerprints(df, k=K, w=W)
    shared = (
        fps.groupBy("fp_hash")
        .agg(F.countDistinct("doc_id").alias("n"))
        .where("n = 2")
        .count()
    )
    assert shared >= 1


def test_winnow_rightmost_min_tiebreak(spark):
    """A document whose shingle hashes tie inside a window must select
    the RIGHTMOST minimal position — pinned indirectly: a doc of one
    repeated token has all-equal shingle hashes, so each window selects
    its last row; fingerprints = positions w-1 .. n_shingles-1."""
    df = _docs(spark, ["x " * 12])  # 12 tokens -> 9 shingles, pos 0..8
    fps = winnow_fingerprints(df, k=K, w=W)
    got = sorted(r.fp_pos for r in fps.collect())
    assert got == list(range(W - 1, 9))  # [3..8]


def test_winnow_dup_pairs_and_cap(spark):
    boiler = "terms of service apply to all users of this site"
    a = f"{boiler} unique alpha content one two three four"
    b = f"{boiler} different beta words five six seven eight"
    c = "completely unrelated text about gardening and tomato plants today"
    pairs = winnow_dup_pairs(
        _docs(spark, [a, b, c]), k=K, w=W, threshold=0.2
    ).collect()
    assert [(p.doc_a, p.doc_b) for p in pairs] == [(1, 2)]
    assert 0 < pairs[0].overlap <= 1.0
    # capping at max_fp_freq=1 drops every fingerprint the pair shares
    # (shared fps have doc-frequency 2) => the boilerplate pair vanishes
    capped = winnow_dup_pairs(
        _docs(spark, [a, b, c]), k=K, w=W, threshold=0.2, max_fp_freq=1
    )
    assert capped.count() == 0


def test_winnow_null_and_short_docs_yield_no_fps(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "too short")],
        "doc_id long, text string",
    )
    assert winnow_fingerprints(df, k=K, w=W).count() == 0


def test_bigram_scores_hand_check(spark):
    """Single-doc corpus where the doc IS the reference slice:
    bigrams of 'a b a b a' are 'a b' x2 and 'b a' x2; both contexts
    appear twice and V=2, so every bigram scores
    lp = ln((2+1)/(2+2)) = ln(3/4)."""
    # doc_id=13: hash64('bigram-ref:13') % 100 < 20 => in the slice
    df = spark.createDataFrame([(13, "a b a b a")], "doc_id long, text string")
    import math

    out = bigram_logprob_scores(df, train_pct=20).collect()[0]
    assert out.is_ref
    assert out.n_bigrams == 4
    want = round(round(math.log(3 / 4), 9), 6)
    assert out.avg_logprob == want
    assert out.ppl == round(math.exp(-want), 6)


def test_bigram_short_docs_stay_visible(spark):
    # doc 13 sits inside the reference slice, so the model is non-empty
    df = spark.createDataFrame(
        [(13, "a b a b a"), (2, "solo"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bigram_logprob_scores(df).collect()}
    assert set(rows) == {13, 2, 3, 4}
    for d in (2, 3, 4):
        assert rows[d].n_bigrams == 0
        assert rows[d].avg_logprob is None and rows[d].ppl is None


def test_bigram_ref_slice_is_deterministic_hash(spark):
    from tweetaggregates_spark.functions.hashing import hash64

    df = spark.createDataFrame(
        [(i, "w x y z") for i in range(1, 51)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.is_ref for r in bigram_logprob_scores(df).collect()
    }
    want = {
        r.doc_id: r.ref
        for r in df.select(
            "doc_id",
            (
                F.pmod(
                    hash64(F.concat(F.lit("bigram-ref:"), F.col("doc_id").cast("string"))),
                    F.lit(100),
                )
                < 20
            ).alias("ref"),
        ).collect()
    }
    assert got == want
    assert 0 < sum(want.values()) < 50  # slice is non-trivial both ways


def test_pair_recall_arithmetic(spark):
    truth = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "doc_a long, doc_b long"
    )
    cand = spark.createDataFrame(
        [(1, 2), (5, 6), (7, 8), (9, 10)], "doc_a long, doc_b long"
    )
    r = pair_recall(truth, cand).collect()[0]
    assert (r.n_truth, r.n_cand, r.n_hit) == (3, 4, 2)
    assert r.recall == round(2 / 3, 6)
    assert r.precision == 0.5


def test_pair_recall_empty_inputs(spark):
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    cand = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    r = pair_recall(empty, cand).collect()[0]
    assert (r.n_truth, r.n_cand, r.n_hit) == (0, 1, 0)
    assert r.recall == 0.0 and r.precision == 0.0


def test_winnow_guarantee_property(spark):
    """Hypothesis form of the SIGMOD'03 detection guarantee: for random
    surrounding text and a random planted run of exactly w + k - 1
    tokens, the two docs always share a fingerprint."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(
        "cat dog sun moon tree rock bird fish leaf rain snow wind".split()
    )

    @settings(max_examples=6, deadline=None)
    @given(
        run=st.lists(word, min_size=GUARANTEE, max_size=GUARANTEE),
        pre_a=st.lists(word, min_size=0, max_size=6),
        post_a=st.lists(word, min_size=0, max_size=6),
        pre_b=st.lists(word, min_size=0, max_size=6),
        post_b=st.lists(word, min_size=0, max_size=6),
    )
    def check(run, pre_a, post_a, pre_b, post_b):
        a = " ".join(pre_a + run + post_a)
        b = " ".join(pre_b + run + post_b)
        fps = winnow_fingerprints(_docs(spark, [a, b]), k=K, w=W)
        shared = (
            fps.groupBy("fp_hash")
            .agg(F.countDistinct("doc_id").alias("n"))
            .where("n = 2")
            .count()
        )
        assert shared >= 1, (a, b)

    check()


def test_curated_corpus_pipeline_stages(spark):
    """End-to-end pipeline pin at sf0.001: every stage does real work
    (filter drops docs, dedup collapses the planted +1e6 duplicates,
    decontamination removes eval-overlapping docs) and the output
    carries only canonical, clean, non-eval-aligned ids."""
    from tweetaggregates_spark.plans.llm import (
        _docs,
        curated_corpus_docs,
    )

    sf = "/root/testdata/sf0.001"
    out = curated_corpus_docs(spark, sf)
    rows = out.collect()
    ids = {r.doc_id for r in rows}
    n_docs = _docs(spark, sf).count()
    # filter stage dropped something, pipeline is non-vacuous
    assert 0 < len(rows) < n_docs
    # dedup stage: no shifted duplicate (id >= 1e6) survives — its
    # canonical original always has the smaller id
    assert all(i < 1_000_000 for i in ids)
    # content hashes are unique post-dedup
    hashes = [r.content_hash for r in rows]
    assert len(hashes) == len(set(hashes))
    # decontamination honored the train split
    assert all(i % 50 != 0 for i in ids)


def test_ppl_buckets_terciles_and_unscored(spark):
    from tweetaggregates_spark.operators.text import ppl_buckets

    # 10 scoreable docs with graded repetitiveness + 2 unscorable;
    # ids 4..13 include doc 13, so the 20% reference slice is non-empty
    texts = [(i, ("common words here " * (i - 3)) + "rare" + str(i) * i)
             for i in range(4, 14)]
    texts += [(100, "solo"), (101, None)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = ppl_buckets(df).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.ppl_bucket, []).append(r)
    # rank-based terciles: floor(10/3)=3 head, 3 middle, 4 tail
    assert len(by_bucket["head"]) == 3
    assert len(by_bucket["middle"]) == 3
    assert len(by_bucket["tail"]) == 4
    assert {r.doc_id for r in by_bucket["unscored"]} == {100, 101}
    assert all(r.ppl_rank is None for r in by_bucket["unscored"])
    # bucket order respects perplexity: max(head) <= min(middle) etc.
    assert max(r.ppl for r in by_bucket["head"]) <= min(
        r.ppl for r in by_bucket["middle"]
    )
    assert max(r.ppl for r in by_bucket["middle"]) <= min(
        r.ppl for r in by_bucket["tail"]
    )
    # ranks are the permutation 1..10
    ranks = sorted(r.ppl_rank for r in out if r.ppl_rank is not None)
    assert ranks == list(range(1, 11))


def test_bigram_empty_reference_slice_yields_null_scores(spark):
    """No doc in the 20% hash slice => no model => NULL avg/ppl for
    every doc (not a divide-by-zero crash under ANSI mode), and
    ppl_buckets routes everything to 'unscored'."""
    from tweetaggregates_spark.operators.text import ppl_buckets

    # ids 1..5 are all outside the bigram-ref slice
    df = spark.createDataFrame(
        [(i, "some words repeated here") for i in range(1, 6)],
        "doc_id long, text string",
    )
    rows = bigram_logprob_scores(df).collect()
    assert len(rows) == 5
    assert all(r.avg_logprob is None and r.ppl is None for r in rows)
    assert all(r.n_bigrams == 3 for r in rows)
    buckets = {r.ppl_bucket for r in ppl_buckets(df).collect()}
    assert buckets == {"unscored"}


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_new_ops_plan_shapes(spark):
    """Plan contracts for the continuation-session operators:
    * winnowing's sliding window shuffles by doc_id (doc-bounded
      state, never a global sort) and stays pure JVM;
    * ppl_buckets' corpus-sized rank shuffles on the range bucket
      (`hashpartitioning(__b`) — the two-pass form; the only
      SinglePartition exchange is the <= n_buckets-row offsets fold,
      never the corpus — and the corpus never hits a global sort;
    * the curated pipeline and both winnow ops plan Python-free with
      no cartesian product."""
    from tweetaggregates_spark.operators.dedup import winnow_fingerprints
    from tweetaggregates_spark.operators.text import ppl_buckets
    from tweetaggregates_spark.plans.llm import _docs, curated_corpus_docs

    sf = "/root/testdata/sf0.001"
    docs = _docs(spark, sf)

    p = _plan(winnow_fingerprints(docs))
    assert "Python" not in p and "CartesianProduct" not in p
    assert "hashpartitioning(doc_id" in p  # window keyed by doc_id

    p = _plan(ppl_buckets(docs))
    assert "Python" not in p and "CartesianProduct" not in p
    assert "hashpartitioning(__b" in p  # bucketed two-pass rank
    # the corpus never funnels through a global sort: no rangepartitioning
    assert "rangepartitioning" not in p

    p = _plan(curated_corpus_docs(spark, sf))
    assert "Python" not in p and "CartesianProduct" not in p
    assert "hashpartitioning(content_hash" in p  # the one dedup shuffle


def _h64(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_cdc(toks, k=4, divisor=8):
    """Pure-python reference: cut after token t when the k-gram ending
    at t hashes to 0 mod divisor; returns [(start, end)] spans."""
    spans, start = [], 0
    for t in range(len(toks)):
        cut = t >= k - 1 and _h64(" ".join(toks[t - k + 1 : t + 1])) % divisor == 0
        if cut:
            spans.append((start, t))
            start = t + 1
    if start < len(toks):
        spans.append((start, len(toks) - 1))
    return spans


def test_cdc_chunks_match_reference_and_partition(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tweetaggregates_spark.operators.dedup import cdc_chunks

    word = st.sampled_from("aa bb cc dd ee ff gg hh".split())

    @settings(max_examples=6, deadline=None)
    @given(docs=st.lists(st.lists(word, min_size=0, max_size=40),
                         min_size=1, max_size=4))
    def check(docs):
        rows = [(i + 1, " ".join(ts)) for i, ts in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {}
        for r in cdc_chunks(df, k=4, divisor=8).collect():
            got.setdefault(r.doc_id, []).append(
                (r.start_pos, r.end_pos, r.chunk_hash, r.n_tokens_chunk)
            )
        for i, ts in enumerate(docs):
            want = _ref_cdc(ts, 4, 8)
            have = sorted(got.get(i + 1, []))
            assert [(a, b) for a, b, _, _ in have] == want, (ts, have)
            # partition property: tiles cover exactly [0, n-1]
            assert sum(n for _, _, _, n in have) == len(ts)
            # chunk hashes are the portable hash of the span
            for a, b, h, _ in have:
                assert h == _h64(" ".join(ts[a : b + 1]))

    check()


def test_cdc_short_and_empty_docs(spark):
    from tweetaggregates_spark.operators.dedup import cdc_chunks

    df = spark.createDataFrame(
        [(1, "one two three"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    rows = cdc_chunks(df, k=4, divisor=8).collect()
    # doc 1 (< k tokens): ONE whole-doc chunk; empty/NULL: none
    assert len(rows) == 1 and rows[0].doc_id == 1
    assert (rows[0].start_pos, rows[0].end_pos, rows[0].n_tokens_chunk) == (0, 2, 3)


def test_cdc_dup_chunks_finds_planted_copy(spark):
    from tweetaggregates_spark.operators.dedup import cdc_dup_chunks

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "entirely different content here")],
        "doc_id long, text string",
    )
    dups = cdc_dup_chunks(df, k=4, divisor=8).collect()
    assert len(dups) >= 1
    assert all(r.n_docs == 2 and r.canonical_id == 1 for r in dups)


def test_cdc_trim_copy_doc_empties_and_original_roundtrips(spark):
    from tweetaggregates_spark.operators.dedup import cdc_trim

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "tiny doc")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in cdc_trim(df, k=4, divisor=8).collect()}
    # original doc keeps everything and reassembles to its token stream
    toks1 = [t for t in base.lower().split() if t]
    assert rows[1].n_chunks_kept == rows[1].n_chunks
    assert rows[1].text_deduped == " ".join(toks1)
    assert rows[1].n_tokens_kept == len(toks1)
    # the exact copy loses every chunk but stays visible
    assert rows[2].n_chunks == rows[1].n_chunks
    assert rows[2].n_chunks_kept == 0
    assert rows[2].text_deduped == ""
    # the short unique doc (one whole-doc chunk) survives untouched
    assert rows[3].n_chunks == rows[3].n_chunks_kept == 1
    assert rows[3].text_deduped == "tiny doc"


def test_cdc_trim_matches_reference(spark):
    """Hypothesis: trim output equals a pure-python replay (first
    occurrence by (doc_id, seg_id) wins, docs reassembled in order)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tweetaggregates_spark.operators.dedup import cdc_trim

    word = st.sampled_from("aa bb cc dd ee".split())

    @settings(max_examples=5, deadline=None)
    @given(docs=st.lists(st.lists(word, min_size=0, max_size=30),
                         min_size=1, max_size=4))
    def check(docs):
        rows = [(i + 1, " ".join(ts)) for i, ts in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in cdc_trim(df, k=4, divisor=8).collect()}
        seen = {}
        for i, ts in enumerate(docs):
            for seg, (a, b) in enumerate(_ref_cdc(ts, 4, 8)):
                h = _h64(" ".join(ts[a : b + 1]))
                seen.setdefault(h, (i + 1, seg))
        for i, ts in enumerate(docs):
            spans = _ref_cdc(ts, 4, 8)
            kept = [
                (a, b)
                for seg, (a, b) in enumerate(spans)
                if seen[_h64(" ".join(ts[a : b + 1]))] == (i + 1, seg)
            ]
            r = got[i + 1]
            assert r.n_chunks == len(spans)
            assert r.n_chunks_kept == len(kept)
            assert r.text_deduped == " ".join(
                " ".join(ts[a : b + 1]) for a, b in kept
            )

    check()
