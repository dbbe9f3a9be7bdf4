"""Pins for the deterministic power-iteration PCA (round 9).

The oracle gate proves cross-engine equality; these pins prove the
math is RIGHT (against numpy's exact eigensolver) and the plan is the
one the docstring promises (one wide aggregate, map-only projection).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tweetaggregates_spark.operators.pca import (
    _rnd,
    pca_fit_project,
    pca_power_fit,
    pca_project,
)
from tweetaggregates_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


def test_planted_gap_matches_numpy_eigh(spark):
    """Algorithm correctness on data WITH a spectral gap: plant two
    dominant directions and the fixed-iteration components align with
    numpy's exact top eigenvectors to |cos| > 0.999."""
    rng = np.random.RandomState(7)
    n, d = 400, 16
    base = rng.randn(n, d) * 0.05
    u1 = np.zeros(d); u1[0] = 1.0
    u2 = np.zeros(d); u2[3] = 1.0
    x = base + np.outer(rng.randn(n) * 2.0, u1) + np.outer(
        rng.randn(n) * 1.0, u2
    )
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        ["vec_id", "embedding"],
    )
    mu, comps, lams, _ = pca_power_fit(
        df, dim=d, n_components=2, iters=30
    )
    c = np.cov(x, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(c)
    top = evecs[:, ::-1][:, :2]
    for k in range(2):
        cos = abs(float(np.dot(comps[k], top[:, k])))
        assert cos > 0.999, (k, cos)
        assert lams[k] == pytest.approx(float(evals[::-1][k]), rel=1e-3)


def test_near_isotropic_corpus_rayleigh_bound(spark, emb):
    """The testdata embeddings are near-isotropic (lambda2/lambda1 ~
    0.93): no fixed-T power method can isolate eigenvector 1 there,
    but the captured VARIANCE (Rayleigh quotient = the returned
    eigenvalue) must still reach >= 97% of the exact lambda1 after 30
    iterations, and the components must be unit-norm and
    near-orthogonal (|cos| < 0.05 — deflation removes lambda1 along
    the FITTED v1, so a not-fully-converged v1 leaves a small residual
    the second component can pick up; the planted-gap test above pins
    true orthogonality where a gap exists)."""
    mu, comps, lams, n = pca_power_fit(
        emb, dim=64, n_components=2, iters=30
    )
    x = np.array(
        [r.embedding for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    c = np.cov(x, rowvar=False, bias=True)
    lam1 = float(np.linalg.eigvalsh(c)[-1])
    assert lams[0] >= 0.97 * lam1, (lams[0], lam1)
    for k in range(2):
        assert float(np.dot(comps[k], comps[k])) == pytest.approx(
            1.0, abs=1e-6
        )
    assert abs(float(np.dot(comps[0], comps[1]))) < 0.05


def test_fit_is_deterministic(spark, emb):
    a = pca_power_fit(emb, dim=64, n_components=2, iters=30)
    b = pca_power_fit(emb.repartition(7), dim=64, n_components=2, iters=30)
    assert a[0] == b[0]  # mu — decimal sums are partitioning-free
    assert a[1] == b[1]  # components bit-identical
    assert a[2] == b[2]


def test_projection_matches_numpy(spark, emb):
    """Scores equal the literal centered dot product."""
    mu, comps, _, _ = pca_power_fit(emb, dim=64, n_components=2, iters=30)
    rows = (
        pca_project(emb, mu, comps)
        .select("vec_id", "pc1", "pc2")
        .collect()
    )
    x = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    mu_a = np.array(mu)
    for r in rows[:50]:
        v = x[r.vec_id] - mu_a
        assert r.pc1 == pytest.approx(float(v @ np.array(comps[0])), abs=2e-6)
        assert r.pc2 == pytest.approx(float(v @ np.array(comps[1])), abs=2e-6)


def test_projection_plan_is_map_only(spark, emb, tmp_path):
    """After the fit collect, the projection pass must be scan →
    project: no exchange, no join, no python UDF. (Read the parquet
    directly — load_table's own RoundRobin repartition would otherwise
    show up as an Exchange that isn't the projection's.)"""
    mu, comps, _, _ = pca_power_fit(emb, dim=64, n_components=2, iters=30)
    emb.write.parquet(str(tmp_path / "emb"))
    raw = spark.read.parquet(str(tmp_path / "emb"))
    proj = pca_project(raw, mu, comps).select("vec_id", "pc1", "pc2")
    plan = proj._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, f"{bad} in projection plan:\n{plan}"


def test_rnd_is_shortest_repr_half_up():
    assert _rnd(0.1234567885, 9) == 0.123456789  # was 0.1234567885 tie
    assert _rnd(-0.1234567885, 9) == -0.123456789  # away from zero
    assert _rnd(0.125, 9) == 0.125


class TestStreamingCovIngest:
    """Lifecycle pins for the streamed covariance store beyond the
    parametrized versioned-store contract: batching invariance of the
    fitted model and constant compacted size."""

    def _drop_dir(self, tmp_path, rows, n_files):
        import json as _json
        import os

        in_dir = str(tmp_path / "in")
        os.makedirs(in_dir, exist_ok=True)
        n = len(rows)
        cuts = [i * n // n_files for i in range(n_files)] + [n]
        for i in range(n_files):
            p = os.path.join(in_dir, f"{i}.ndjson")
            with open(p, "w") as fh:
                fh.write(
                    "\n".join(
                        _json.dumps(
                            {"vec_id": r.vec_id,
                             "embedding": [float(x) for x in r.embedding]}
                        )
                        for r in rows[cuts[i]: cuts[i + 1]]
                    )
                )
            os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        return in_dir

    def test_streamed_fit_equals_batch_fit(self, spark, emb, tmp_path):
        from tweetaggregates_spark.streaming.covstream import (
            fit_from_cov_index,
            read_cov_index,
            run_streaming_cov_ingest,
        )

        rows = sorted(
            emb.select("vec_id", "embedding").collect(),
            key=lambda r: r.vec_id,
        )
        in_dir = self._drop_dir(tmp_path, rows, 3)
        index_path = str(tmp_path / "index")
        run_streaming_cov_ingest(
            spark, in_dir, index_path, str(tmp_path / "ckpt"),
            dim=64, available_now=True, max_files_per_trigger=1,
            compact_every=2,
        )
        streamed = fit_from_cov_index(spark, index_path, dim=64,
                                      n_components=2, iters=30)
        batch = pca_power_fit(emb, dim=64, n_components=2, iters=30)
        assert streamed == batch  # bit-identical model
        # compaction + deltas: folded index is d(d+3)/2 rows
        assert read_cov_index(spark, index_path).count() == 64 * 67 // 2

    def test_compaction_is_fold_invariant_and_constant_size(
        self, spark, emb, tmp_path
    ):
        from tweetaggregates_spark.streaming.covstream import (
            compact_cov_index,
            read_cov_index,
            run_streaming_cov_ingest,
        )

        rows = sorted(
            emb.select("vec_id", "embedding").collect(),
            key=lambda r: r.vec_id,
        )[:120]
        in_dir = self._drop_dir(tmp_path, rows, 4)
        index_path = str(tmp_path / "index")
        run_streaming_cov_ingest(
            spark, in_dir, index_path, str(tmp_path / "ckpt"),
            dim=64, available_now=True, max_files_per_trigger=1,
        )
        before = sorted(map(tuple, read_cov_index(spark, index_path).collect()))
        compact_cov_index(spark, index_path)
        after = sorted(map(tuple, read_cov_index(spark, index_path).collect()))
        assert after == before  # exact-sum fold
        import os
        base = [d for d in os.listdir(index_path) if d == "sums_base"]
        assert base, "compaction committed a base"
