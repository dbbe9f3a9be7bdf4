"""Persisted retrieval-index lifecycle (VERDICT r13 #3):
build/append/compact/read for the BM25 token index, with the
batching-invariance and replay-idempotence pins every other index
family carries."""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetaggregates_spark.operators import text


def _corpus(spark, n=40):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = [
        (
            i,
            " ".join(
                words[(i * (j + 1)) % len(words)] for j in range(3 + i % 5)
            ),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _queries(spark):
    return spark.createDataFrame(
        [(100, "alpha gamma"), (101, "zeta epsilon beta")],
        "query_id LONG, text STRING",
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_two_batch_ingest_equals_one_shot(spark, tmp_path):
    """Batching invariance: build(evens) + append(odds) + compact
    reads back stats identical to a one-shot build over everything —
    and the indexed scorer is bit-equal to the scan-per-call scorer
    over the full corpus."""
    docs = _corpus(spark)
    root = str(tmp_path / "tok")
    text.build_token_index(docs.filter(F.col("doc_id") % 2 == 0), root)
    text.append_token_index_delta(
        docs.filter(F.col("doc_id") % 2 == 1), root, ingest_id=1
    )
    idx = text.read_token_index(spark, root)
    oneshot_root = str(tmp_path / "tok1")
    text.build_token_index(docs, oneshot_root)
    one = text.read_token_index(spark, oneshot_root)
    assert _rows(idx.tf) == _rows(one.tf)
    assert _rows(idx.dl) == _rows(one.dl)
    assert _rows(idx.dft) == _rows(one.dft)
    assert _rows(idx.stats) == _rows(one.stats)
    # scoring: indexed == scan-per-call, before AND after compaction
    q = _queries(spark)
    direct = _rows(text.bm25_topk(docs, q, k=5))
    assert _rows(text.bm25_topk_indexed(idx, q, k=5)) == direct
    text.compact_token_index(spark, root)
    folded = text.read_token_index(spark, root)
    assert _rows(text.bm25_topk_indexed(folded, q, k=5)) == direct


def test_compact_rebases_families(spark, tmp_path):
    """Compaction clears the delta dirs, commits one base per family
    at the newest folded version, and is a read no-op."""
    import os

    docs = _corpus(spark)
    root = str(tmp_path / "tok")
    text.build_token_index(docs.filter(F.col("doc_id") < 20), root)
    text.append_token_index_delta(
        docs.filter(F.col("doc_id") >= 20), root, ingest_id=3
    )
    before = _rows(text.read_token_index(spark, root).dft)
    text.compact_token_index(spark, root)
    for sub in ("tf", "dl", "df", "stats"):
        assert os.listdir(f"{root}/{sub}") == []
        assert os.listdir(f"{root}/{sub}_base") == ["v=3"]
    assert _rows(text.read_token_index(spark, root).dft) == before
    # no deltas -> compact is a no-op, not an error
    text.compact_token_index(spark, root)


def test_below_read_hides_later_ingests(spark, tmp_path):
    """Replay contract: read_token_index(below=N) sees exactly the
    pre-batch index, and a re-delivered append overwrites its own
    version instead of double-counting."""
    docs = _corpus(spark)
    root = str(tmp_path / "tok")
    b1 = docs.filter(F.col("doc_id") < 20)
    b2 = docs.filter(F.col("doc_id") >= 20)
    text.build_token_index(b1, root)
    pre = _rows(text.read_token_index(spark, root).stats)
    text.append_token_index_delta(b2, root, ingest_id=1)
    assert _rows(text.read_token_index(spark, root, below=1).stats) == pre
    full = _rows(text.read_token_index(spark, root).stats)
    # replayed ingest: same version, same rows — idempotent
    text.append_token_index_delta(b2, root, ingest_id=1)
    assert _rows(text.read_token_index(spark, root).stats) == full
