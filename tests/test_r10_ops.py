"""Round-10 operator tests: the sampled-training quality classifier
(the production shape — VERDICT r9 #1) and its relationship to the
full-batch determinism baseline."""

from __future__ import annotations

import pyspark.sql.functions as F

from tweetaggregates_spark.operators import sampling
from tweetaggregates_spark.operators.multimodal import (
    attach_synth_media,
    extract_media_meta,
    parse_image_dims,
)
from tweetaggregates_spark.plans import llm

SF = "/root/testdata/sf0.001"


def _png(w: int, h: int, body: bytes = b"x") -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00" + b"\x00\x00\x00\x00" + body
    )


class TestImageHeaderParsing:
    def test_png(self):
        assert parse_image_dims(_png(640, 480)) == ("image/png", 640, 480)

    def test_png_requires_ihdr(self):
        bad = b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dXXXX" + b"\0" * 16
        assert parse_image_dims(bad) is None

    def test_gif_both_versions(self):
        for ver in (b"GIF87a", b"GIF89a"):
            blob = ver + (300).to_bytes(2, "little") + (200).to_bytes(
                2, "little"
            ) + b"\xf7\x00\x00"
            assert parse_image_dims(blob) == ("image/gif", 300, 200)

    def test_jpeg_walks_arbitrary_segments(self):
        # SOF behind APP1 (Exif) and a COM segment of odd lengths —
        # layouts the fixed-offset DuckDB twin never sees
        app1 = b"\xff\xe1" + (2 + 11).to_bytes(2, "big") + b"Exif\x00\x00hello"
        com = b"\xff\xfe" + (2 + 3).to_bytes(2, "big") + b"abc"
        sof2 = (  # progressive
            b"\xff\xc2\x00\x11\x08"
            + (768).to_bytes(2, "big")
            + (1024).to_bytes(2, "big")
            + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
        )
        blob = b"\xff\xd8" + app1 + com + sof2 + b"payload"
        assert parse_image_dims(blob) == ("image/jpeg", 1024, 768)

    def test_jpeg_without_sof_is_unrecognized(self):
        blob = b"\xff\xd8\xff\xd9"  # SOI then EOI
        assert parse_image_dims(blob) is None

    def test_truncated_and_raw_payloads(self):
        assert parse_image_dims(None) is None
        assert parse_image_dims(b"") is None
        assert parse_image_dims(b"\x89PNG\r\n\x1a\n\x00") is None
        assert parse_image_dims(b"plain text payload") is None

    def test_synth_media_roundtrip(self, spark):
        # builder writes real headers; parser reads the dims back
        from tweetaggregates_spark.operators.multimodal import (
            synth_height,
            synth_width,
        )

        df = spark.createDataFrame(
            [(i, "body text %d" % i) for i in range(8, 16)],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in extract_media_meta(attach_synth_media(df)).collect()
        }
        for i in range(8, 16):
            r = out[i]
            expect_type = {
                0: "image/png", 1: "image/jpeg", 2: "image/gif",
                3: "image/fake",
            }[i % 4]
            assert r.media_type == expect_type, i
            if expect_type != "image/fake":
                assert r.width == (i * 7) % 1920 + 16
                assert r.height == (i * 13) % 1080 + 16


class TestSampledClassifier:
    def test_scores_every_doc_despite_sampled_training(self, spark):
        full = llm.quality_classifier_docs(spark, SF)
        samp = llm.quality_classifier_sampled_docs(spark, SF)
        assert samp.columns == full.columns
        n_docs = full.count()
        assert samp.count() == n_docs  # scoring covers the FULL corpus
        assert samp.filter(F.col("quality_prob").isNull()).count() == 0

    def test_sample_is_the_hash_sample(self, spark):
        # the training subset is exactly operators/sampling.hash_sample
        # with the registered salt/fraction — a pure function of doc_id
        from tweetaggregates_spark.sources.tables import load_table

        docs = load_table(spark, SF, "documents")
        tr = sampling.hash_sample(
            docs, "doc_id", llm.CLF_SAMPLE_FRACTION, salt=llm.CLF_SAMPLE_SALT
        )
        n, k = docs.count(), tr.count()
        assert 0 < k < n  # a real proper subset at sf0.001
        # deterministic: same call, same membership
        ids1 = {r.doc_id for r in tr.select("doc_id").collect()}
        ids2 = {
            r.doc_id
            for r in sampling.hash_sample(
                docs, "doc_id", llm.CLF_SAMPLE_FRACTION,
                salt=llm.CLF_SAMPLE_SALT,
            ).select("doc_id").collect()
        }
        assert ids1 == ids2

    def test_local_trainer_bit_identical_to_distributed(self, spark):
        # the driver-side trainer must replay the distributed decimal
        # arithmetic exactly — weights equal, float for float
        from tweetaggregates_spark.operators import classifier, sampling
        from tweetaggregates_spark.sources.tables import load_table

        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            docs = load_table(spark, sf, "documents")
            labeled = llm._clf_labeled(docs)
            train = sampling.hash_sample(
                labeled, "doc_id", llm.CLF_SAMPLE_FRACTION,
                salt=llm.CLF_SAMPLE_SALT,
            )
            w_dist = classifier.logreg_quality_train(
                train, "label", n_buckets=256, iters=8, lr=500.0
            )
            w_local = classifier.logreg_quality_train_local(
                train, "label", n_buckets=256, iters=8, lr=500.0
            )
            assert w_local == w_dist, sf

    def test_local_trainer_max_rows_guard(self, spark):
        import pytest

        from tweetaggregates_spark.operators import classifier
        from tweetaggregates_spark.sources.tables import load_table

        docs = llm._clf_labeled(load_table(spark, SF, "documents"))
        with pytest.raises(ValueError, match="max_rows"):
            classifier.logreg_quality_train_local(
                docs, "label", iters=1, max_rows=3
            )

    def test_bottomk_trains_on_exactly_k_and_scores_all(self, spark):
        # the fixed-size variant: training set is the bottom-K docs by
        # salted hash — a corpus-size-independent constant — while
        # scoring still covers every doc
        import pyspark.sql.functions as F2

        from tweetaggregates_spark.functions.hashing import hash64
        from tweetaggregates_spark.sources.tables import load_table

        sf01 = "/root/testdata/sf0.01"
        out = llm.quality_classifier_bottomk_docs(spark, sf01)
        docs = load_table(spark, sf01, "documents")
        assert out.count() == docs.count()
        # the selection is TakeOrderedAndProject-shaped and exactly K
        h = hash64(
            F2.concat(
                F2.lit(f"{llm.CLF_FIXED_SALT}:"),
                F2.col("doc_id").cast("string"),
            )
        )
        train_ids = [
            r.doc_id
            for r in docs.orderBy(h.asc(), F2.col("doc_id").asc())
            .limit(llm.CLF_FIXED_K)
            .select("doc_id")
            .collect()
        ]
        assert len(train_ids) == min(llm.CLF_FIXED_K, docs.count())
        # deterministic: a second selection is identical
        train_ids2 = [
            r.doc_id
            for r in docs.orderBy(h.asc(), F2.col("doc_id").asc())
            .limit(llm.CLF_FIXED_K)
            .select("doc_id")
            .collect()
        ]
        assert train_ids == train_ids2

    def test_sampled_model_still_separates(self, spark):
        # the sampled-trained boundary should agree with the heuristic
        # label on a large majority of docs (the full-batch baseline
        # reaches ~the same agreement; exact equality is not expected)
        samp = llm.quality_classifier_sampled_docs(spark, SF)
        agree = samp.filter(
            (F.col("label") == 1) == F.col("clf_keep")
        ).count()
        total = samp.count()
        assert agree / total >= 0.8


class TestStreamingQualityScores:
    def test_drain_equals_batch_scores_and_replay_idempotent(
        self, spark, tmp_path
    ):
        import json as _json
        import os
        import time as _time

        from tweetaggregates_spark.operators import classifier
        from tweetaggregates_spark.sources.tables import load_table
        from tweetaggregates_spark.streaming.classify import (
            run_streaming_quality_scores,
        )

        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        labeled = llm._clf_labeled(docs)
        w = classifier.logreg_quality_train_local(
            labeled.limit(50), "label", iters=2, lr=500.0
        )
        batch = {
            r.doc_id: (r.quality_prob, r.clf_keep)
            for r in classifier.logreg_quality_scores(docs, w)
            .select("doc_id", "quality_prob", "clf_keep")
            .collect()
        }
        rows = sorted(docs.collect(), key=lambda r: r.doc_id)
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        half = len(rows) // 2
        now = _time.time()
        for i, chunk in enumerate((rows[:half], rows[half:])):
            p = in_dir / f"{i}.ndjson"
            p.write_text(
                "\n".join(
                    _json.dumps({"doc_id": r.doc_id, "text": r.text})
                    for r in chunk
                )
            )
            os.utime(p, (now - 60 + i, now - 60 + i))
        out = str(tmp_path / "out")
        for ckpt in ("c1", "c2"):  # second pass = full redelivery
            run_streaming_quality_scores(
                spark, str(in_dir), out, str(tmp_path / ckpt),
                weights=w, available_now=True, max_files_per_trigger=1,
            )
        got = {
            r.doc_id: (r.quality_prob, r.clf_keep)
            for r in spark.read.parquet(out).collect()
        }
        assert got == batch


class TestAnnRecall:
    def test_ann_recall_unit(self, spark):
        from tweetaggregates_spark.operators.similarity import ann_recall

        exact = spark.createDataFrame(
            [(1, 10), (1, 11), (2, 20), (2, 21)],
            "query_id int, neighbor_id int",
        )
        approx = spark.createDataFrame(
            [(1, 10), (1, 99), (2, 20), (2, 21)],
            "query_id int, neighbor_id int",
        )
        got = {
            r.query_id: (r.n_hits, r.recall)
            for r in ann_recall(exact, approx, k=2).collect()
        }
        assert got == {1: (1, 0.5), 2: (2, 1.0)}
        # a query whose approx found nothing still reports 0.0
        approx_none = spark.createDataFrame(
            [(1, 99)], "query_id int, neighbor_id int"
        )
        got0 = {
            r.query_id: r.recall
            for r in ann_recall(exact, approx_none, k=2).collect()
        }
        assert got0 == {1: 0.0, 2: 0.0}

    def test_exact_l2_ground_truth_and_ivf_recall_beats_random(self, spark):
        from tweetaggregates_spark.operators.similarity import (
            knn_bruteforce_l2,
        )
        from tweetaggregates_spark.sources.tables import load_table

        emb = load_table(spark, SF, "embeddings")
        n = emb.count()
        exact = knn_bruteforce_l2(
            emb, emb.filter(F.col("vec_id") < 5), k=5
        )
        per_q = {
            r.query_id: r["cnt"]
            for r in exact.groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        assert all(v == 5 for v in per_q.values())
        recalls = [
            r.recall
            for r in llm.ann_recall_ivf_embeddings(spark, SF).collect()
        ]
        assert all(0.0 <= x <= 1.0 for x in recalls)
        # the index must do far better than random candidate picking
        assert sum(recalls) / len(recalls) > 5.0 / n * 5
