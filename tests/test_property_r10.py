"""Property tests (hypothesis) for the round-10 cores.

* batched k-center == sequential k-center over RANDOM corpora with
  deliberately planted duplicates and varied batch sizes — the exact
  divergence class the round-9 ADVICE high found (the mid-loop
  zero-min-dist endgame only fired on specific duplicate layouts the
  example tests missed).
* image-header roundtrip: for arbitrary dimensions and body bytes, the
  built PNG / GIF / JPEG headers parse back exactly; corrupting the
  magic makes them unrecognizable.
* driver-side classifier trainer == distributed trainer over random
  tiny corpora (the bit-identity contract, beyond the fixed sf pins).
* ann_recall bounds and exact-self-recall (recall of a result against
  itself is 1.0).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tweetaggregates_spark.operators.cluster import (
    kcenter_coreset,
    kcenter_coreset_batched,
)
from tweetaggregates_spark.operators.multimodal import parse_image_dims


@settings(max_examples=8, deadline=None)
@given(
    data=st.data(),
    n=st.integers(3, 10),
    k=st.integers(2, 8),
    batch=st.integers(1, 6),
    dup_share=st.sampled_from([0.0, 0.3, 0.6]),
)
def test_kcenter_batched_equals_sequential(spark, data, n, k, batch, dup_share):
    base = [
        [
            float(data.draw(st.integers(0, 8), label=f"x{i}")),
            float(data.draw(st.integers(0, 8), label=f"y{i}")),
        ]
        for i in range(n)
    ]
    # plant duplicates: the last dup_share of points copy earlier ones
    n_dup = int(n * dup_share)
    for j in range(n_dup):
        base[n - 1 - j] = list(base[j % (n - n_dup) if n > n_dup else 0])
    rows = [(i + 1, v) for i, v in enumerate(base)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    seq = [
        (r.center_rank, r.vec_id, r.min_dist)
        for r in sorted(
            kcenter_coreset(df, k=k).collect(), key=lambda r: r.center_rank
        )
    ]
    bat = [
        (r.center_rank, r.vec_id, r.min_dist)
        for r in sorted(
            kcenter_coreset_batched(df, k=k, batch=batch).collect(),
            key=lambda r: r.center_rank,
        )
    ]
    assert bat == seq, (rows, k, batch)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 65535),
    h=st.integers(1, 65535),
    body=st.binary(min_size=0, max_size=40),
    kind=st.sampled_from(["png", "gif", "jpeg"]),
)
def test_header_roundtrip(w, h, body, kind):
    if kind == "png":
        blob = (
            b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR"
            + w.to_bytes(4, "big")
            + h.to_bytes(4, "big")
            + b"\x08\x06\x00\x00\x00\x00\x00\x00\x00"
            + body
        )
        expect = ("image/png", w, h)
    elif kind == "gif":
        blob = (
            b"GIF89a"
            + w.to_bytes(2, "little")
            + h.to_bytes(2, "little")
            + b"\xf7\x00\x00"
            + body
        )
        expect = ("image/gif", w, h)
    else:
        blob = (
            b"\xff\xd8"
            b"\xff\xe0\x00\x10JFIF\x00\x01\x02\x00\x00\x48\x00\x48\x00\x00"
            b"\xff\xc0\x00\x11\x08"
            + h.to_bytes(2, "big")
            + w.to_bytes(2, "big")
            + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
            + body
        )
        expect = ("image/jpeg", w, h)
    assert parse_image_dims(blob) == expect
    # corrupting the first magic byte makes it unrecognizable (0xFF
    # would fake a JPEG SOI second byte; any other flip breaks all
    # three magics)
    corrupted = bytes([blob[0] ^ 0x01]) + blob[1:]
    got = parse_image_dims(corrupted)
    assert got is None or got[0] != expect[0]


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet="abcdefg hij",
            min_size=0,
            max_size=40,
        ),
        min_size=2,
        max_size=8,
    ),
    iters=st.sampled_from([1, 3]),
)
def test_local_trainer_matches_distributed_on_random_corpora(
    spark, texts, iters
):
    from pyspark.sql import functions as F

    from tweetaggregates_spark.operators.classifier import (
        logreg_quality_train,
        logreg_quality_train_local,
    )

    rows = [(i + 1, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    labeled = df.withColumn(
        "label", (F.length(F.coalesce("text", F.lit(""))) % 2).cast("int")
    )
    kw = dict(n_buckets=16, iters=iters, lr=50.0)
    assert logreg_quality_train_local(labeled, "label", **kw) == (
        logreg_quality_train(labeled, "label", **kw)
    )


def test_ann_recall_self_is_one(spark):
    from tweetaggregates_spark.operators.similarity import (
        ann_recall,
        knn_bruteforce_l2,
    )
    from tweetaggregates_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = knn_bruteforce_l2(emb, emb.filter("vec_id < 4"), k=3)
    out = ann_recall(exact, exact, k=3).collect()
    assert all(r.recall == 1.0 and r.n_hits == 3 for r in out)
