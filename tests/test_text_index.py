"""Text-index family (operators/text.py vocab/tfidf/inverted-index),
label centroids, and the CDC latest-snapshot compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetaggregates_spark.operators import similarity, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_stats_counts_and_rank(spark):
    df = _docs(
        spark,
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple"),
        ],
    )
    out = {r["token"]: r for r in text.vocab_stats(df, top_n=10).collect()}
    assert out["apple"]["term_count"] == 3
    assert out["apple"]["doc_count"] == 2
    assert out["banana"]["term_count"] == 2
    assert out["banana"]["doc_count"] == 2
    assert out["cherry"]["doc_count"] == 1
    # rank: apple(3) then banana(2) then cherry(1)
    assert (out["apple"]["rank"], out["banana"]["rank"], out["cherry"]["rank"]) == (1, 2, 3)


def test_vocab_stats_top_n_truncates(spark):
    df = _docs(spark, [(1, "a b c d e f g h")])
    assert text.vocab_stats(df, top_n=3).count() == 3


def test_tfidf_rare_term_outranks_common(spark):
    # "zebra" appears twice in doc 1 only; "the" twice in every doc —
    # equal tf, so the lower doc_freq must win the rank tiebreak
    df = _docs(
        spark,
        [
            (1, "the the zebra zebra"),
            (2, "the the cat"),
            (3, "the the dog"),
        ],
    )
    out = text.tfidf_top_terms(df, k=1, min_tf=2).collect()
    doc1 = {r["doc_id"]: r for r in out}[1]
    assert doc1["token"] == "zebra"
    assert doc1["tfidf"] > 0
    # "the" is in every doc: idf = ln(4/4) = 0
    all_rows = text.tfidf_top_terms(df, k=5, min_tf=2).collect()
    the_rows = [r for r in all_rows if r["token"] == "the"]
    assert the_rows and all(r["tfidf"] == 0.0 for r in the_rows)


def test_inverted_index_caps_postings_not_doc_freq(spark):
    rows = [(i, "hot common") for i in range(1, 9)] + [(9, "rare common")]
    df = _docs(spark, rows)
    out = {
        r["token"]: r
        for r in text.inverted_index(df, max_postings=3, min_doc_freq=2).collect()
    }
    hot = out["hot"]
    assert hot["doc_freq"] == 8  # full count survives the cap
    assert hot["postings"] == "1,2,3"  # lowest 3 doc ids, ascending
    assert out["common"]["doc_freq"] == 9
    assert "rare" not in out  # below min_doc_freq


def test_label_centroids_exact_mean(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [3.0, 6.0]), (2, [5.0, 5.0])],
        "label int, embedding array<float>",
    )
    out = {
        (r["label"], r["dim"]): r
        for r in similarity.label_centroids(df).collect()
    }
    assert out[(1, 0)]["centroid"] == 2.0
    assert out[(1, 1)]["centroid"] == 4.0
    assert out[(1, 0)]["n_vectors"] == 2
    assert out[(2, 1)]["centroid"] == 5.0
    assert out[(2, 0)]["n_vectors"] == 1


def test_latest_snapshot_last_write_wins(spark):
    from tweetaggregates_spark.plans import events as ev

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, "click", 1.0),
            (2, "2024-01-01 00:00:05", 7, "click", 2.0),
            # same ts as event 2: higher event_id must win the tie
            (3, "2024-01-01 00:00:05", 7, "click", 3.0),
            (4, "2024-01-01 00:00:01", 7, "view", 9.0),
        ],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    import tweetaggregates_spark.plans.events as evmod

    orig = evmod._events
    evmod._events = lambda spark, sf_dir: df
    try:
        out = {
            (r["user_id"], r["event_type"]): r
            for r in ev.latest_events_snapshot(spark, "unused").collect()
        }
    finally:
        evmod._events = orig
    click = out[(7, "click")]
    assert click["last_event_id"] == 3
    assert click["last_value"] == 3.0
    assert click["n_versions"] == 3
    assert out[(7, "view")]["n_versions"] == 1


def test_unigram_lm_scores_common_below_rare(spark):
    """The LM quality filter's defining property: a document made of
    corpus-typical tokens has lower perplexity than one made of rare
    tokens; smoothing keeps every score finite."""
    from tweetaggregates_spark.operators.text import (
        unigram_logprob_scores,
    )

    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    rows.append((100, "the quick brown fox"))          # all common
    rows.append((101, "zyzzyva quokka axolotl warbler"))  # all rare
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in unigram_logprob_scores(df).collect()}
    assert out[100].ppl < out[101].ppl
    assert out[100].avg_logprob > out[101].avg_logprob
    assert all(r.ppl >= 1.0 and r.n_tokens > 0 for r in out.values())


def test_bpe_merge_candidates_counts_and_rank(spark):
    """Hand-computable corpus: pair counts are word-frequency weighted
    and the rank-1 pair is BPE's first merge."""
    from tweetaggregates_spark.operators.text import bpe_merge_candidates

    # "ab" x3, "abc" x1 -> pair "a b": 4, "b c": 1; single chars ignored
    df = _docs(
        spark,
        [(1, "ab ab abc"), (2, "ab x y z")],
    )
    rows = {r.pair: r for r in bpe_merge_candidates(df, top_n=10).collect()}
    assert rows["a b"].pair_count == 4
    assert rows["a b"].rank == 1
    assert rows["b c"].pair_count == 1
    assert "x" not in {p.split()[0] for p in rows}  # 1-char words drop


def _python_bpe(word_freqs, n_merges):
    """Reference BPE (Sennrich'16) with (count desc, pair asc) ties and
    greedy left-to-right non-overlapping merge application."""
    table = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, syms in table.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_freqs[w]
        if not counts:
            break
        (a, b), _ = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        for w, syms in table.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            table[w] = out
    return merges, table


def test_bpe_train_matches_reference(spark):
    """The distributed trainer must reproduce the reference BPE's merge
    sequence AND final segmentation exactly, including the repeated-
    symbol greedy case ('aaaa' + (a,a) -> [aa, aa])."""
    from tweetaggregates_spark.operators.text import bpe_train

    docs = [
        (1, "lower lower lower newest newest widest"),
        (2, "low low low lower newest aaaa"),
        (3, "newest newest widest low aaaa aaaa"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    word_freqs = {}
    for _, t in docs:
        for w in t.split():
            word_freqs[w] = word_freqs.get(w, 0) + 1
    want_merges, want_table = _python_bpe(word_freqs, 6)

    merges, table = bpe_train(df, n_merges=6)
    assert merges == want_merges
    got_table = {
        "".join(r.syms): (r.wc, list(r.syms)) for r in table.collect()
    }
    for w, syms in want_table.items():
        assert got_table["".join(syms)] == (word_freqs[w], syms), w


def test_bpe_token_counts_match_reference_segmentation(spark):
    """Applying the trained tokenizer: per-doc BPE token counts equal
    the reference segmentation's symbol counts; OOV words fall back to
    character count."""
    from tweetaggregates_spark.operators.text import (
        bpe_token_counts,
        bpe_train,
    )

    train_docs = [
        (1, "lower lower lower newest newest widest"),
        (2, "low low low lower newest aaaa"),
    ]
    df = spark.createDataFrame(train_docs, "doc_id long, text string")
    word_freqs = {}
    for _, t in train_docs:
        for w in t.split():
            word_freqs[w] = word_freqs.get(w, 0) + 1
    merges, table = bpe_train(df, n_merges=5)
    _, want_table = _python_bpe(word_freqs, 5)

    # score the training docs plus one doc with an OOV word
    score_docs = train_docs + [(3, "lower unseenword")]
    sdf = spark.createDataFrame(score_docs, "doc_id long, text string")
    out = {r.doc_id: r for r in bpe_token_counts(sdf, table).collect()}
    for doc_id, t in train_docs:
        want = sum(len(want_table[w]) for w in t.split())
        assert out[doc_id].n_bpe_tokens == want, doc_id
        assert out[doc_id].n_words == len(t.split())
    # OOV falls back to char count
    assert out[3].n_bpe_tokens == len(want_table["lower"]) + len(
        "unseenword"
    )
