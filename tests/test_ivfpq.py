"""IVF-ADC composed index (similarity.knn_ivf_pq): full-probe
equivalence to plain PQ/ADC (no pruning => identical output), cell
containment under pruning, and trained-quantizer recall vs exact L2."""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetaggregates_spark.operators import similarity
from tweetaggregates_spark.operators.cluster import kmeans
from tweetaggregates_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_full_probe_equals_knn_pq(spark):
    """n_probe == n_cells probes every inverted list, so IVF prunes
    nothing and the output must EQUAL knn_pq on the same codebook
    parameters — the standard IVF sanity invariant."""
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 6)
    ivf = similarity.knn_ivf_pq(
        emb, queries, k=5, n_cells=4, n_probe=4,
        m_subvectors=4, k_codes=16, coarse_iters=0, pq_iters=0,
    )
    flat = similarity.knn_pq(
        emb, queries, k=5, m_subvectors=4, k_codes=16, iters=0,
        normalize=False,
    )
    assert _rows(ivf) == _rows(flat)


def test_pruned_neighbors_come_from_probed_cells(spark):
    """With n_probe=1 every returned neighbor must live in the query's
    single nearest cell — the structural pruning guarantee."""
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 6)
    out = similarity.knn_ivf_pq(
        emb, queries, k=5, n_cells=4, n_probe=1,
        m_subvectors=4, k_codes=16, coarse_iters=1, pq_iters=0,
    )
    assigned, _ = kmeans(emb, k=4, iters=1)
    cell = {r.vec_id: r.cluster for r in assigned.collect()}
    for r in out.collect():
        assert cell[r.neighbor_id] == cell[r.query_id], (
            f"neighbor {r.neighbor_id} (cell {cell[r.neighbor_id]}) "
            f"outside query {r.query_id}'s probed cell {cell[r.query_id]}"
        )
    # ranks are contiguous 1..k' per query
    per = out.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("knn_rank").alias("mx")
    )
    for r in per.collect():
        assert r.n == r.mx


def test_trained_ivfpq_recall_vs_exact(spark):
    """Trained quantizers (coarse_iters=2, pq_iters=2), half the cells
    probed: recall@10 against EXACT squared-L2 top-10 must clear the
    floor — the end-to-end quality pin for the composed index. The
    testdata embeddings are near-random (no cluster structure), the
    hardest case for PQ: recall is quantization-error-bound (~0.48 at
    m=16/k=16 here, measured deterministic), and is NOT monotone in
    n_probe — extra candidates with underestimated ADC distances can
    displace true neighbors, the documented PQ trade (Jegou TPAMI'11
    §V.A). The floor guards machinery breakage, not ANN quality on
    adversarially unclusterable data."""
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    k = 10
    out = similarity.knn_ivf_pq(
        emb, queries, k=k, n_cells=4, n_probe=2,
        m_subvectors=16, k_codes=16, coarse_iters=2, pq_iters=2,
    )
    approx = {(r.query_id, r.neighbor_id) for r in out.collect()}

    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cv"),
    )
    d = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) ** 2),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy("d", "neighbor_id")
    exact = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", d.alias("d"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    truth = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recall = len(approx & truth) / len(truth)
    assert recall >= 0.4, f"recall@{k} = {recall:.2f}"


def test_residual_encoding_beats_raw_pq_on_clustered_data(spark):
    """Canonical IVFADC (TPAMI'11 §V.B): encoding within-cell
    residuals spends the codebook on the noise, not the cluster
    layout — on a planted-cluster corpus, recall@10 must beat the
    raw-vector encoding (and clear a floor). Deterministic fixture:
    4 well-separated centers, 50 points each, seeded noise."""
    import numpy as np

    rng = np.random.default_rng(17)
    centers = rng.normal(0.0, 10.0, size=(4, 64))
    rows = []
    vid = 0
    for ci in range(4):
        for _ in range(50):
            v = centers[ci] + rng.normal(0.0, 0.5, size=64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.filter(F.col("vec_id").isin([0, 50, 100, 150]))
    k = 10

    from pyspark.sql import Window as W

    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
    )
    d = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) ** 2),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    w = W.partitionBy("query_id").orderBy("d", "neighbor_id")
    exact = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", d.alias("d"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    truth = {(r.query_id, r.neighbor_id) for r in exact.collect()}

    def _recall(residuals: bool) -> float:
        out = similarity.knn_ivf_pq(
            emb, queries, k=k, n_cells=4, n_probe=2,
            m_subvectors=16, k_codes=16, coarse_iters=2, pq_iters=2,
            encode_residuals=residuals,
        )
        got = {(r.query_id, r.neighbor_id) for r in out.collect()}
        return len(got & truth) / len(truth)

    r_raw, r_res = _recall(False), _recall(True)
    assert r_res >= r_raw, f"residual {r_res:.2f} < raw {r_raw:.2f}"
    assert r_res >= 0.5, f"residual recall@{k} = {r_res:.2f}"


def test_persisted_index_prunes_partitions_and_matches_direct(
    spark, tmp_path
):
    """'Index once, query many': build_ivf_pq_index persists codes
    partitioned by cell; querying through the index must (a) return
    exactly what the direct one-shot path returns and (b) plan the
    code scan with dynamic partition pruning, so unprobed cells never
    leave storage."""
    import contextlib
    import io

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    params = dict(
        n_cells=4, m_subvectors=4, k_codes=16,
        coarse_iters=1, pq_iters=1, encode_residuals=True,
    )
    idx = similarity.build_ivf_pq_index(
        emb, str(tmp_path / "ivfpq"), **params
    )
    via_index = similarity.knn_ivf_pq(
        None, queries, k=5, n_probe=2, index=idx
    )
    direct = similarity.knn_ivf_pq(
        emb, queries, k=5, n_probe=2, **params
    )
    assert _rows(via_index) == _rows(direct)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        via_index.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruning" in plan.lower(), (
        f"no dynamic partition pruning on the code scan:\n{plan}"
    )


def test_rescore_refine_lifts_recall(spark):
    """faiss IVFPQ+Refine: exact-L2 rescoring an ADC shortlist of
    depth d >= k can only improve recall@k over ADC order (it picks
    the exact-best k of the same candidates) — and on the near-random
    testdata it must lift it substantially."""
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    k = 10
    common = dict(
        n_cells=4, n_probe=2, m_subvectors=16, k_codes=16,
        coarse_iters=2, pq_iters=2,
    )
    adc = similarity.knn_ivf_pq(emb, queries, k=k, **common)
    ref = similarity.knn_ivf_pq(
        emb, queries, k=k, rescore_depth=60, **common
    )

    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cv"),
    )
    d = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) ** 2),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy("d", "neighbor_id")
    exact = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", d.alias("d"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    truth = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    r_adc = len(
        {(r.query_id, r.neighbor_id) for r in adc.collect()} & truth
    ) / len(truth)
    r_ref = len(
        {(r.query_id, r.neighbor_id) for r in ref.collect()} & truth
    ) / len(truth)
    assert r_ref >= r_adc, f"refine {r_ref:.2f} < ADC {r_adc:.2f}"
    assert r_ref >= 0.7, f"refined recall@{k} = {r_ref:.2f}"


def test_append_to_index_without_retraining(spark, tmp_path):
    """The faiss `add` path: new vectors fold into the persisted index
    using the EXISTING quantizers — appended codes are bit-identical
    to a from-scratch encode with the same codebook, queries see
    neighbors from both ingests, and the build-half codes are
    untouched."""
    emb = load_table(spark, SF, "embeddings")
    b1 = emb.filter(F.col("vec_id") % 2 == 0)
    b2 = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivfpq")
    idx0 = similarity.build_ivf_pq_index(
        b1, path, n_cells=4, m_subvectors=4, k_codes=16,
        coarse_iters=1, pq_iters=1, encode_residuals=True,
    )
    codes_before = {
        (r.neighbor_id, r.subspace): (r.code, r.cell)
        for r in idx0.codes.collect()
    }
    idx1 = similarity.append_to_ivf_pq_index(b2, path)
    codes_after = {
        (r.neighbor_id, r.subspace): (r.code, r.cell)
        for r in idx1.codes.collect()
    }
    # build-half codes untouched; every new vector encoded (4 codes)
    for key, val in codes_before.items():
        assert codes_after[key] == val
    n2 = b2.count()
    assert len(codes_after) == len(codes_before) + 4 * n2

    # appended codes == from-scratch encode with the same quantizers
    # (residual-aware: subtract the assigned cell's centroid first)
    from tweetaggregates_spark.operators.similarity import (
        _pq_source,
        pq_encode,
    )
    from pyspark.sql import Window as W

    cents = idx0.centroids
    bd = b2.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("_v"),
    ).crossJoin(F.broadcast(cents))
    cdist = F.aggregate(
        F.zip_with("_v", "carr", lambda x, c: (x - c) ** 2),
        F.lit(0.0).cast("double"),
        lambda acc, d: acc + d,
    )
    aw = W.partitionBy("vec_id").orderBy("_cd", "cluster")
    assigned = (
        bd.select("vec_id", "cluster", cdist.alias("_cd"))
        .withColumn("_r", F.row_number().over(aw))
        .filter(F.col("_r") == 1)
        .select("vec_id", "cluster")
    )
    expect = pq_encode(
        _pq_source(b2, assigned, cents, "vec_id", "embedding", True),
        idx0.codebook,
    )
    for r in expect.collect():
        assert codes_after[(r.vec_id, r.subspace)][0] == r.code

    # a query from the appended half finds neighbors across BOTH halves
    queries = b2.filter(F.col("vec_id") < 12)
    out = similarity.knn_ivf_pq(None, queries, k=8, n_probe=4, index=idx1)
    neigh = {r.neighbor_id for r in out.collect()}
    assert any(n % 2 == 0 for n in neigh) and any(n % 2 == 1 for n in neigh)


def test_failed_rebuild_leaves_readable_consistent_index(spark, tmp_path):
    """Crash-safe rebuild (ADVICE r5): subtrees are build-id suffixed
    and the meta pointer commits LAST — a rebuild that dies after
    writing codes must leave readers on the PREVIOUS complete build,
    never on new codes paired with stale quantizers."""
    import os

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "ivfpq")
    idx0 = similarity.build_ivf_pq_index(
        emb, path, n_cells=4, m_subvectors=4, k_codes=16,
        coarse_iters=1, pq_iters=1, encode_residuals=True,
    )
    before = sorted(
        (r.neighbor_id, r.subspace, r.code, r.cell)
        for r in idx0.codes.collect()
    )
    # simulate a rebuild that crashed after the codes write but before
    # the meta commit: a fresh suffixed codes dir with different rows
    idx0.codes.limit(3).withColumn("ingest", F.lit("base")).write.mode(
        "overwrite"
    ).partitionBy("ingest", "cell").parquet(f"{path}/codes_deadbeef0000")
    idx1 = similarity.read_ivf_pq_index(spark, path)
    after = sorted(
        (r.neighbor_id, r.subspace, r.code, r.cell)
        for r in idx1.codes.collect()
    )
    assert after == before  # the orphan build is invisible
    # a completed rebuild prunes the orphan and re-points meta
    idx2 = similarity.build_ivf_pq_index(
        emb, path, n_cells=4, m_subvectors=4, k_codes=16,
        coarse_iters=1, pq_iters=1, encode_residuals=True,
    )
    assert "codes_deadbeef0000" not in os.listdir(path)
    assert sorted(
        (r.neighbor_id, r.subspace, r.code, r.cell)
        for r in idx2.codes.collect()
    ) == before


def test_append_retry_with_same_ingest_id_is_idempotent(spark, tmp_path):
    """ADVICE r5: a redelivered append batch must not duplicate code
    rows — same ingest_id overwrites its own partitions."""
    emb = load_table(spark, SF, "embeddings")
    b1 = emb.filter(F.col("vec_id") % 2 == 0)
    b2 = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivfpq")
    similarity.build_ivf_pq_index(
        b1, path, n_cells=4, m_subvectors=4, k_codes=16,
        coarse_iters=1, pq_iters=1, encode_residuals=True,
    )
    idx1 = similarity.append_to_ivf_pq_index(b2, path, ingest_id="batch-7")
    rows1 = sorted(
        (r.neighbor_id, r.subspace, r.code, r.cell)
        for r in idx1.codes.collect()
    )
    idx2 = similarity.append_to_ivf_pq_index(b2, path, ingest_id="batch-7")
    rows2 = sorted(
        (r.neighbor_id, r.subspace, r.code, r.cell)
        for r in idx2.codes.collect()
    )
    assert rows2 == rows1  # retry replaced, not duplicated
    # and each appended vector still has exactly m code rows
    per_vec = idx2.codes.groupBy("neighbor_id").count().collect()
    assert all(r["count"] == 4 for r in per_vec)


def test_drift_detection_recommends_rebuild(spark, tmp_path):
    """Quantizer-drift wiring (VERDICT r5 #4): an in-distribution batch
    does NOT flip the rebuild recommendation; a planted drifted batch
    (far off the training manifold) DOES. The appended-but-drifted
    index still clears a recall floor (ADC finds the drifted docs via
    their crowded nearest cell), and a rebuild restores recall to at
    least the drifted level."""
    import numpy as np

    rng = np.random.default_rng(23)
    centers = rng.normal(0.0, 10.0, size=(4, 16))
    rows = []
    vid = 0
    for ci in range(4):
        for _ in range(30):
            v = centers[ci] + rng.normal(0.0, 0.5, size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    path = str(tmp_path / "ivfpq")
    idx = similarity.build_ivf_pq_index(
        emb, path, n_cells=4, m_subvectors=4, k_codes=16,
        coarse_iters=2, pq_iters=2, encode_residuals=True,
    )
    assert idx.avg_assign_dist is not None and idx.avg_assign_dist > 0

    # in-distribution batch: fresh draws around the SAME centers
    ok_rows = []
    for ci in range(4):
        for j in range(10):
            v = centers[ci] + rng.normal(0.0, 0.5, size=16)
            ok_rows.append((1000 + ci * 10 + j, [float(x) for x in v]))
    ok_batch = spark.createDataFrame(ok_rows, ["vec_id", "embedding"])
    assert idx.needs_rebuild(ok_batch) is False

    # drifted batch: a NEW far-away center the quantizers never saw
    far = rng.normal(60.0, 1.0, size=16)
    dr_rows = [
        (2000 + j, [float(x) for x in far + rng.normal(0.0, 0.5, size=16)])
        for j in range(20)
    ]
    drifted = spark.createDataFrame(dr_rows, ["vec_id", "embedding"])
    assert idx.needs_rebuild(drifted) is True

    # appended-but-drifted recall floor, and rebuild restores it
    idx_app = similarity.append_to_ivf_pq_index(
        drifted, path, ingest_id="drift-1"
    )
    queries = drifted.filter(F.col("vec_id") < 2004)
    truth = {
        (q, 2000 + j)
        for q in range(2000, 2004)
        for j in range(20)
        if 2000 + j != q
    }

    def _recall(index) -> float:
        out = similarity.knn_ivf_pq(
            None, queries, k=10, n_probe=2, index=index
        )
        got = {(r.query_id, r.neighbor_id) for r in out.collect()}
        inter = {
            (q, n) for (q, n) in got if (q, n) in truth
        }
        return len(inter) / (4 * 10)

    r_app = _recall(idx_app)
    assert r_app >= 0.3, f"appended-drifted recall {r_app:.2f}"
    idx_re = similarity.build_ivf_pq_index(
        emb.unionByName(drifted), path, n_cells=5, m_subvectors=4,
        k_codes=16, coarse_iters=2, pq_iters=2, encode_residuals=True,
    )
    r_re = _recall(idx_re)
    assert r_re >= r_app, f"rebuild {r_re:.2f} < drifted {r_app:.2f}"
