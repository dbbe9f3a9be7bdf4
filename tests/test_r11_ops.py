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


class TestIncrementalCdcIndex:
    """VERDICT r10 #5: incremental chunk-level dedup lifecycle."""

    def _docs(self, spark, lo, hi):
        rows = [
            (
                i,
                " ".join(
                    f"tok{(i * 7 + j) % 23}" for j in range(30)
                )
                + (" shared run of tokens common to many docs" * (i % 3)),
            )
            for i in range(lo, hi)
        ]
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_batching_invariance_and_lifecycle(self, spark, tmp_path):
        from tweetaggregates_spark.operators import dedup as dd

        path = str(tmp_path / "cdc_index")
        b1 = self._docs(spark, 0, 40)
        b2 = self._docs(spark, 40, 80)
        b3 = self._docs(spark, 80, 120)
        full = b1.unionByName(b2).unionByName(b3)

        # ingest 0: base index from batch 1
        dd.append_cdc_index_delta(dd.cdc_chunk_index(b1), path, 0)
        # ingest 1: trim batch 2 vs the read index, persist its delta
        idx = dd.read_cdc_index(spark, path)
        _, delta2 = dd.cdc_trim_new_batch(b2, idx)
        dd.append_cdc_index_delta(delta2, path, 1)

        # folded index == one-shot index over batches 1+2
        folded = {
            r["chunk_hash"]: (
                r["keeper_doc_id"], r["keeper_seg_id"], r["n_occurrences"]
            )
            for r in dd.read_cdc_index(spark, path).collect()
        }
        oneshot = {
            r["chunk_hash"]: (
                r["keeper_doc_id"], r["keeper_seg_id"], r["n_occurrences"]
            )
            for r in dd.cdc_chunk_index(b1.unionByName(b2)).collect()
        }
        assert folded == oneshot

        # ingest 2: trim batch 3 against history == one-shot trim over
        # the full corpus restricted to batch-3 docs
        trimmed3, delta3 = dd.cdc_trim_new_batch(
            b3, dd.read_cdc_index(spark, path)
        )
        inc = sorted(map(tuple, trimmed3.collect()))
        oneshot_trim = sorted(
            map(
                tuple,
                dd.cdc_trim(full).filter("doc_id >= 80").collect(),
            )
        )
        assert inc == oneshot_trim

        # O(batch) persistence: the delta has at most one row per
        # distinct batch chunk hash — batch-bounded, never corpus-sized
        n_batch_chunks = dd.cdc_chunks(b3).count()
        assert delta3.count() <= n_batch_chunks
        dd.append_cdc_index_delta(delta3, path, 2)

        # idempotent replay: re-appending version 2 changes nothing
        before = folded_all = {
            r["chunk_hash"]: (
                r["keeper_doc_id"], r["keeper_seg_id"], r["n_occurrences"]
            )
            for r in dd.read_cdc_index(spark, path).collect()
        }
        dd.append_cdc_index_delta(delta3, path, 2)
        after = {
            r["chunk_hash"]: (
                r["keeper_doc_id"], r["keeper_seg_id"], r["n_occurrences"]
            )
            for r in dd.read_cdc_index(spark, path).collect()
        }
        assert before == after

        # compaction: one base, deltas swept, fold unchanged
        dd.compact_cdc_index(spark, path)
        from tweetaggregates_spark import versioned_store as vstore

        assert vstore.versions(f"{path}/chunks") == []
        assert len(vstore.versions(f"{path}/base")) == 1
        compacted = {
            r["chunk_hash"]: (
                r["keeper_doc_id"], r["keeper_seg_id"], r["n_occurrences"]
            )
            for r in dd.read_cdc_index(spark, path).collect()
        }
        assert compacted == folded_all
        assert compacted == {
            r["chunk_hash"]: (
                r["keeper_doc_id"], r["keeper_seg_id"], r["n_occurrences"]
            )
            for r in dd.cdc_chunk_index(full).collect()
        }


def test_bigram_broadcast_model_plan_shape(spark):
    """VERDICT r10 #6 pin: with model_join='broadcast' the two model
    joins are BroadcastHashJoin and the exploded bigram rows never
    cross a shuffle — the only scoring-side exchange left is the
    per-doc partial aggregate. The shuffle_hash form exchanges the
    exploded rows on the model keys (bigram/ctx)."""
    from tweetaggregates_spark.operators.text import bigram_logprob_scores
    from tweetaggregates_spark.plans.llm import _docs

    docs = _docs(spark, "/root/testdata/sf0.001")

    def plan(mj):
        df = bigram_logprob_scores(docs, model_join=mj)
        df.write.mode("overwrite").format("noop").save()
        return df._jdf.queryExecution().executedPlan().toString()

    bc = plan("broadcast")
    sh = plan("shuffle_hash")
    assert bc.count("BroadcastHashJoin") >= 2
    assert "ShuffledHashJoin" not in bc
    # the model-BUILD aggregates still exchange the reference slice
    # (one hashpartitioning per model key), but the scoring side's
    # exploded rows don't: exactly one exchange per model key in the
    # broadcast plan vs two (model agg + big probe side) in the
    # shuffle form
    assert bc.count("hashpartitioning(bigram") == 1
    assert bc.count("hashpartitioning(ctx") == 1
    assert sh.count("hashpartitioning(bigram") >= 2
    assert sh.count("hashpartitioning(ctx") >= 2
    # identical values
    a = sorted(map(tuple, bigram_logprob_scores(docs, model_join="broadcast").collect()))
    b = sorted(map(tuple, bigram_logprob_scores(docs).collect()))
    assert a == b


def test_curated_neardup_collapses_clusters(spark):
    """VERDICT r10 #7: the composed pipeline keeps one canonical
    member per near-dup cluster of the curated corpus — strictly
    fewer rows than the exact-dedup-only pipeline when near-dup
    clusters exist, each kept doc the min id of its cluster."""
    from tweetaggregates_spark.plans import llm

    cur = llm.curated_corpus_docs(spark, SF).collect()
    near = llm.curated_corpus_neardup_docs(spark, SF).collect()
    assert len(near) <= len(cur)
    # non-vacuous on this corpus: at least one multi-member cluster
    assert any(r["n_members"] > 1 for r in near)
    # members accounting: cluster sizes sum to the curated corpus size
    assert sum(r["n_members"] for r in near) == len(cur)
    kept_ids = {r["doc_id"] for r in near}
    assert kept_ids <= {r["doc_id"] for r in cur}


def test_cdc_incremental_batching_invariance_property(spark):
    """Hypothesis property (the claim the oracle checks on one split):
    for ARBITRARY corpora and ARBITRARY 2-way batch splits — including
    splits where the second batch holds SMALLER doc ids than the
    index's — cdc_trim_new_batch(batch2, index(batch1)) equals the
    one-shot cdc_trim over the union restricted to batch-2 docs,
    because the combined keeper is the associative min."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tweetaggregates_spark.operators import dedup as dd

    word = st.sampled_from("aa bb cc dd ee".split())
    doc = st.lists(word, min_size=0, max_size=25).map(" ".join)

    @settings(max_examples=6, deadline=None)
    @given(
        docs=st.lists(doc, min_size=2, max_size=10),
        mask=st.integers(min_value=1, max_value=2**10 - 2),
    )
    def prop(docs, mask):
        rows = [(i, t) for i, t in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        in2 = {i for i, _ in rows if (mask >> (i % 10)) & 1}
        if not in2 or len(in2) == len(rows):
            return
        b1 = df.filter(~F.col("doc_id").isin(list(in2)))
        b2 = df.filter(F.col("doc_id").isin(list(in2)))
        trimmed, _ = dd.cdc_trim_new_batch(b2, dd.cdc_chunk_index(b1))
        inc = sorted(map(tuple, trimmed.collect()))
        ref = sorted(
            map(
                tuple,
                dd.cdc_trim(df)
                .filter(F.col("doc_id").isin(list(in2)))
                .collect(),
            )
        )
        assert inc == ref

    prop()


def test_stream_cdc_trim_lifecycle(spark, tmp_path):
    """Streaming CDC-trim: 4 one-file triggers with inline compaction
    every 2; each trigger's output equals the one-shot cdc_trim over
    everything-ingested-so-far restricted to the trigger's docs; a
    full re-delivery over a fresh checkpoint leaves outputs and index
    identical (per-version overwrite idempotence)."""
    import json as _json
    import os

    from tweetaggregates_spark.operators import dedup as dd
    from tweetaggregates_spark.streaming.dedup import run_streaming_cdc_trim

    docs = [
        (i, " ".join(f"w{(i * 5 + j) % 17}" for j in range(24))
         + (" a shared boilerplate run of tokens" * (i % 2)))
        for i in range(40)
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for b in range(4):
        p = in_dir / f"{b}.ndjson"
        p.write_text(
            "\n".join(
                _json.dumps({"doc_id": i, "text": t})
                for i, t in docs[b * 10 : (b + 1) * 10]
            )
        )
        os.utime(p, (1_700_000_000 + b,) * 2)

    def run(ckpt):
        run_streaming_cdc_trim(
            spark,
            str(in_dir),
            str(tmp_path / "index"),
            str(tmp_path / "out"),
            str(tmp_path / ckpt),
            available_now=True,
            max_files_per_trigger=1,
            compact_every=2,
        )
        return {
            b: sorted(
                map(
                    tuple,
                    spark.read.parquet(
                        str(tmp_path / "out" / f"batch_id={b}")
                    ).collect(),
                )
            )
            for b in range(4)
        }

    got = run("ckpt_a")
    full = spark.createDataFrame(docs, "doc_id bigint, text string")
    for b in range(4):
        sofar = full.filter(F.col("doc_id") < (b + 1) * 10)
        want = sorted(
            map(
                tuple,
                dd.cdc_trim(sofar)
                .filter(
                    (F.col("doc_id") >= b * 10)
                    & (F.col("doc_id") < (b + 1) * 10)
                )
                .collect(),
            )
        )
        assert got[b] == want, b

    # compaction actually ran: a base version exists
    from tweetaggregates_spark import versioned_store as vstore

    assert vstore.versions(str(tmp_path / "index" / "base"))

    # replay: fresh checkpoint, same store — identical outputs + index
    idx_before = sorted(
        map(tuple, dd.read_cdc_index(spark, str(tmp_path / "index")).collect())
    )
    assert run("ckpt_b") == got
    idx_after = sorted(
        map(tuple, dd.read_cdc_index(spark, str(tmp_path / "index")).collect())
    )
    assert idx_after == idx_before


def test_html_main_text_boilerplate_and_plan(spark):
    """HTML extraction pins: script payload stripped, nav dropped by
    link density (long enough to pass the length rule), footer/title/
    related-links dropped, content preserved verbatim after whitespace
    normalization; short docs extract to empty. Plan: map-only (zero
    Exchange), pure JVM."""
    from tweetaggregates_spark.operators.text import (
        attach_synth_html,
        html_main_text,
    )

    docs = spark.createDataFrame(
        [
            (3, "this is the real content of the document with many words"),
            (1, "short"),
            (2, None),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in html_main_text(attach_synth_html(docs)).collect()
    }
    body = out[3]["extracted_text"]
    assert body == "this is the real content of the document with many words"
    for boiler in ("home", "related", "terms", "var trk", "doc 3"):
        assert boiler not in body
    # nav text is 21 chars (>= the 20-char rule) — dropped ONLY by the
    # link-density rule, so that branch is exercised
    assert len("home tags about login") >= 20
    assert out[1]["extracted_text"] == ""
    assert out[1]["n_blocks"] > 0
    assert out[2]["extracted_text"] == ""

    plan = (
        html_main_text(attach_synth_html(docs))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan
