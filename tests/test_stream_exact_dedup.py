"""Streaming exact-dup ingest over the versioned hash index + bloom
sidecar: however the stream chops the corpus into triggers, the folded
index must equal a one-shot exact_dedup — and every ingested doc gets
exactly one assignment row with the global-min canonical."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from tweetaggregates_spark.operators import dedup
from tweetaggregates_spark.operators.dedup import (
    HASH_INDEX_SCHEMA,
    exact_dedup_new_batch_bloom,
    fold_hash_index,
)
from tweetaggregates_spark.sources.tables import load_table
from tweetaggregates_spark.streaming.dedup import run_streaming_exact_dedup

SF = "/root/testdata/sf0.001"


def _corpus_with_redeliveries(spark):
    """Docs plus cross-batch redeliveries: every 4th doc is re-sent
    with a higher id (same text) in a LATER batch."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    redel = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return docs.unionAll(redel)


def test_stream_exact_dedup_matches_one_shot(spark, tmp_path):
    corpus = _corpus_with_redeliveries(spark)
    rows = sorted(corpus.collect(), key=lambda r: r.doc_id)
    n = len(rows)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        p = in_dir / f"{i}.ndjson"
        p.write_text(
            "\n".join(
                json.dumps({"doc_id": r.doc_id, "text": r.text})
                for r in rows[cuts[i] : cuts[i + 1]]
            )
        )
        os.utime(p, (1700000000 + i, 1700000000 + i))

    index_path = str(tmp_path / "index")
    out_path = str(tmp_path / "out")
    run_streaming_exact_dedup(
        spark,
        str(in_dir),
        index_path,
        out_path,
        str(tmp_path / "ckpt"),
        available_now=True,
        max_files_per_trigger=1,
    )

    # O(batch) appends: one hashes delta + one bloom delta per trigger
    hash_versions = sorted(
        int(d.split("=")[1])
        for d in os.listdir(f"{index_path}/hashes")
        if d.startswith("v=")
    )
    assert hash_versions == [0, 1, 2]
    assert sorted(
        int(d.split("=")[1])
        for d in os.listdir(f"{index_path}/blooms")
        if d.startswith("v=")
    ) == hash_versions
    # per-version row counts track the BATCH, not the accumulated corpus
    for v, (lo, hi) in zip(hash_versions, zip(cuts, cuts[1:])):
        nv = spark.read.parquet(f"{index_path}/hashes/v={v}").count()
        assert nv <= hi - lo

    # folded index == one-shot exact_dedup over everything ingested
    folded = fold_hash_index(
        spark.read.schema(HASH_INDEX_SCHEMA + ", v INT").parquet(
            f"{index_path}/hashes"
        ).drop("v")
    )
    expect = dedup.exact_dedup(corpus)
    key = ["content_hash", "canonical_id", "n_copies"]
    assert sorted(map(tuple, folded.select(*key).collect())) == sorted(
        map(tuple, expect.select(*key).collect())
    )

    # every doc assigned once, with the global-min canonical for its text
    out = spark.read.parquet(out_path)
    assert out.count() == n
    want = corpus.groupBy("text").agg(F.min("doc_id").alias("c"))
    joined = (
        corpus.join(want, "text")
        .select("doc_id", F.col("c").alias("want_c"))
        .join(out, "doc_id")
    )
    bad = joined.filter(F.col("canonical_id") != F.col("want_c")).count()
    assert bad == 0
    # is_duplicate flags exactly the non-canonical copies
    n_dup = out.filter("is_duplicate").count()
    n_uniq = corpus.select("text").distinct().count()
    assert n_dup == n - n_uniq


def test_exact_dedup_bloom_path_equals_no_bloom(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1).unionAll(
        hist.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    index = dedup.exact_dedup(hist)
    from tweetaggregates_spark.operators.dedup import bloom_build

    bloom = bloom_build(
        index.select("content_hash"), "content_hash", 1 << 16, 5
    )
    a1, n1 = exact_dedup_new_batch_bloom(
        batch, index, bloom, n_bits=1 << 16, n_hashes=5
    )
    a2, n2 = exact_dedup_new_batch_bloom(batch, index, None)
    key = ["doc_id", "canonical_id", "is_duplicate"]
    assert sorted(map(tuple, a1.select(*key).collect())) == sorted(
        map(tuple, a2.select(*key).collect())
    )
    k2 = ["content_hash", "canonical_id", "n_copies"]
    assert sorted(map(tuple, n1.select(*k2).collect())) == sorted(
        map(tuple, n2.select(*k2).collect())
    )
    # a forced-FP tiny bloom stays exact too
    tiny = bloom_build(index.select("content_hash"), "content_hash", 64, 2)
    a3, _ = exact_dedup_new_batch_bloom(
        batch, index, tiny, n_bits=64, n_hashes=2
    )
    assert sorted(map(tuple, a3.select(*key).collect())) == sorted(
        map(tuple, a2.select(*key).collect())
    )


def test_stream_exact_dedup_inline_compaction(spark, tmp_path):
    import shutil

    from tweetaggregates_spark.streaming.dedup import (
        compact_hash_index,
        read_hash_index_parts,
    )

    corpus = _corpus_with_redeliveries(spark)
    rows = sorted(corpus.collect(), key=lambda r: r.doc_id)
    n = len(rows)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    for i in range(4):
        p = in_dir / f"{i}.ndjson"
        p.write_text(
            "\n".join(
                json.dumps({"doc_id": r.doc_id, "text": r.text})
                for r in rows[cuts[i] : cuts[i + 1]]
            )
        )
        os.utime(p, (1700000000 + i, 1700000000 + i))
    index_path = str(tmp_path / "index")
    run_streaming_exact_dedup(
        spark,
        str(in_dir),
        index_path,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        available_now=True,
        max_files_per_trigger=1,
        compact_every=2,
    )
    # trigger 2 rebased v=0,1 into a base; deltas 2,3 remain
    bases = sorted(os.listdir(f"{index_path}/hashes_base"))
    assert bases == ["v=1"]
    deltas = sorted(os.listdir(f"{index_path}/hashes"))
    assert deltas == ["v=2", "v=3"]

    # folded view == one-shot exact dedup over everything
    def folded_matches():
        idx, bloom = read_hash_index_parts(spark, index_path, below=10)
        expect = dedup.exact_dedup(corpus)
        key = ["content_hash", "canonical_id", "n_copies"]
        assert sorted(map(tuple, idx.select(*key).collect())) == sorted(
            map(tuple, expect.select(*key).collect())
        )
        assert bloom is not None

    folded_matches()
    # final full compaction: one base, no deltas, same fold
    compact_hash_index(spark, index_path)
    assert sorted(os.listdir(f"{index_path}/hashes_base")) == ["v=3"]
    assert sorted(os.listdir(f"{index_path}/hashes")) == []
    folded_matches()
    # a stale delta AT OR BELOW the base version is ignored, not
    # double-counted (the crash window between base commit and delta
    # cleanup): plant a copy of the base as a fake old delta
    shutil.copytree(
        f"{index_path}/hashes_base/v=3", f"{index_path}/hashes/v=3"
    )
    shutil.copytree(
        f"{index_path}/blooms_base/v=3", f"{index_path}/blooms/v=3"
    )
    folded_matches()
