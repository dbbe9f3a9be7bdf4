"""Streaming ANN ingest (streaming/ann.py): per-trigger faiss-add
appends into the persisted IVF-ADC index with the drift guard in the
loop — an in-distribution trigger appends without flagging, a planted
drifted trigger flips the rebuild recommendation, and the final index
holds every ingested vector's codes exactly once."""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import functions as F

from tweetaggregates_spark.operators import similarity
from tweetaggregates_spark.streaming.ann import run_streaming_ann_ingest


def test_stream_ann_ingest_appends_and_flags_drift(spark, tmp_path):
    rng = np.random.default_rng(31)
    centers = rng.normal(0.0, 10.0, size=(4, 16))

    def _draw(center, vid):
        v = center + rng.normal(0.0, 0.5, size=16)
        return {"vec_id": vid, "embedding": [float(x) for x in v]}

    base_rows = [
        _draw(centers[ci], ci * 100 + j) for ci in range(4) for j in range(25)
    ]
    base = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in base_rows],
        ["vec_id", "embedding"],
    )
    index_path = str(tmp_path / "ivfpq")
    similarity.build_ivf_pq_index(
        base, index_path, n_cells=4, m_subvectors=4, k_codes=16,
        coarse_iters=2, pq_iters=2, encode_residuals=True,
    )

    # trigger 0: in-distribution; trigger 1: planted far-off cluster
    far = rng.normal(60.0, 1.0, size=16)
    t0 = [_draw(centers[j % 4], 1000 + j) for j in range(12)]
    t1 = [_draw(far, 2000 + j) for j in range(12)]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate((t0, t1)):
        p = in_dir / f"{i}.ndjson"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (1700000000 + i, 1700000000 + i))

    report_path = str(tmp_path / "report")
    run_streaming_ann_ingest(
        spark,
        str(in_dir),
        index_path,
        report_path,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        drift_factor=2.0,
    )

    reports = {
        int(d.split("=")[1]): spark.read.parquet(
            f"{report_path}/{d}"
        ).first()
        for d in os.listdir(report_path)
        if d.startswith("batch_id=")
    }
    assert set(reports) == {0, 1}
    assert reports[0].needs_rebuild is False
    assert reports[1].needs_rebuild is True
    assert reports[1].batch_drift > reports[0].batch_drift

    # every ingested vector encoded exactly once (m=4 code rows), on
    # top of the untouched base
    idx = similarity.read_ivf_pq_index(spark, index_path)
    per_vec = idx.codes.groupBy("neighbor_id").count()
    assert per_vec.filter(F.col("count") != 4).count() == 0
    assert idx.codes.count() == 4 * (len(base_rows) + 24)
    ingested = {
        r.neighbor_id for r in idx.codes.select("neighbor_id").distinct().collect()
    }
    assert {r["vec_id"] for r in t0 + t1} <= ingested


def test_stream_rp_ingest_matches_one_shot_sketch(spark, tmp_path):
    from tweetaggregates_spark.operators.similarity import (
        build_rp_index,
        knn_rp_rescore,
    )
    from tweetaggregates_spark.sources.tables import load_table
    from tweetaggregates_spark.streaming.ann import (
        read_rp_index,
        run_streaming_rp_ingest,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        p = in_dir / f"{i}.ndjson"
        p.write_text(
            "\n".join(
                json.dumps({"vec_id": r.vec_id, "embedding": list(r.embedding)})
                for r in chunk
            )
        )
        os.utime(p, (1700000000 + i, 1700000000 + i))
    index_path = str(tmp_path / "rp_stream")
    run_streaming_rp_ingest(
        spark,
        str(in_dir),
        index_path,
        str(tmp_path / "ckpt"),
        out_dim=16,
        available_now=True,
        max_files_per_trigger=1,
    )
    # two ingest partitions, one per trigger
    parts = sorted(
        d for d in os.listdir(index_path) if d.startswith("ingest=")
    )
    assert parts == ["ingest=0", "ingest=1"]
    streamed = read_rp_index(spark, index_path)
    # NOTHING to retrain: the streamed sketch is row-for-row what a
    # from-scratch one-shot build over the union produces
    oneshot = build_rp_index(emb, str(tmp_path / "rp_oneshot"), out_dim=16)
    cols = streamed.columns
    assert sorted(map(tuple, streamed.select(*cols).collect())) == sorted(
        map(tuple, oneshot.select(*cols).collect())
    )
    # and the folded sketch answers queries identically to direct RP
    queries = emb.filter(F.col("vec_id") < 5)
    got = knn_rp_rescore(
        emb, queries, k=5, out_dim=16, shortlist_size=50, sketch=streamed
    )
    want = knn_rp_rescore(emb, queries, k=5, out_dim=16, shortlist_size=50)
    kc = ["query_id", "neighbor_id", "cos_sim", "knn_rank"]
    assert sorted(map(tuple, got.select(*kc).collect())) == sorted(
        map(tuple, want.select(*kc).collect())
    )
