"""PCA over an embedding column via distributed covariance + fixed
deterministic power iterations (round 9: the missing linear projection
between ``random_projection`` (data-independent) and a full eigensolver
(not cross-engine replayable)).

Public lineage: plain power iteration with deflation (Mises &
Pollaczek-Geringer 1929; any numerical linear algebra text), run for a
FIXED iteration count so the result is a pure function of the input —
the same derandomization convention as the repo's k-means / k-center /
KLL families, letting a DuckDB twin replay the fit bit-for-bit.

Determinism contract (every rule is pinned by the oracle gate):

* **Covariance** is the only pass over the corpus: ONE wide aggregate
  of ``d + d(d+1)/2`` DECIMAL(28,12) sums (Σx_i and the upper-triangle
  Σx_i·x_j), map-side combined, shuffling a single tiny row. Per-term
  double→decimal casts differ between engines by at most 1e-12 (Spark
  rounds the shortest-repr HALF_UP, DuckDB rounds its own scaled
  value), so the assembled cov entries are rounded to SIX dp — the
  same absorption margin the k-means centroid means rely on. Mantissas
  stay exact while n·|x·x| < 2^53/1e12 ≈ 9e3; beyond that (a 100 TB
  corpus) drop the sum scale to DECIMAL(28,6) and round cov to 3 dp —
  same two-orders-of-magnitude margin.
* **Iterations** run driver-side on the d×d cov matrix (model-sized,
  like the k-means centroid collect) in plain IEEE doubles with
  LEFT-TO-RIGHT folds, re-rounded to 9 dp each step via the
  shortest-repr HALF_UP rule (``_rnd``) — exactly reproducible as an
  unrolled left-associative ``+`` chain in SQL (DuckDB's list_reduce /
  list_sum have batch-dependent reduction order and canNOT be used).
  v0 = round(1/sqrt(d), 9) in every coordinate; after ``iters`` steps
  the eigenvalue is λ = round(vᵀ(Cv), 9) and deflation is
  C ← round(C - λ·v_i·v_j, 9) entrywise (left-assoc products).
* **Projection** is map-only: scores round(Σ_i (x_i - μ_i)·w_ki, 6)
  via ``F.aggregate``'s sequential left fold over one zip_with — the
  components ship as array literals (one Literal each, the
  F.lit(list)-not-CreateArray rule from round 8).

Output columns: ``pc<k>`` per component. Sign convention: whatever the
all-equal v0 converges to — deterministic, both engines identical.

Scale shape at 100 TB: one corpus scan with a d(d+1)/2-wide partial
aggregate (shuffle = one row per partition), an O(d^2) driver fit, one
map-only projection pass. A production variant would swap the decimal
aggregate for a per-partition numpy X^T X (Arrow-batched, BLAS) at the
cost of bit-determinism; the plan shape is identical.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cov_term_sums",
    "pca_fit_from_sums",
    "pca_fit_project",
    "pca_power_fit",
    "pca_project",
]


def _rnd(x: float, scale: int = 9) -> float:
    """round(double, s) as BOTH engines compute it: HALF_UP on the
    shortest decimal repr (Spark: BigDecimal.valueOf; DuckDB round():
    verified 0/200k mismatches vs this rule)."""
    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(float(x))).quantize(q, ROUND_HALF_UP))


def pca_power_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_components: int = 2,
    iters: int = 10,
) -> tuple[list[float], list[list[float]], list[float], int]:
    """Fit: returns (mu, components, eigenvalues, n). mu and cov are
    assembled from ONE wide decimal aggregate; the power iterations
    follow the module contract exactly."""
    got = cov_term_sums(df, vec_col=vec_col, dim=dim).collect()
    if not got:
        raise ValueError("pca_power_fit: empty input")
    n = got[0]["_c"]
    sums = {r["_k"]: r["_s"] for r in got}
    return pca_fit_from_sums(
        sums, n, dim=dim, n_components=n_components, iters=iters
    )


def cov_term_sums(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """The corpus pass of the PCA fit, as a mergeable aggregate:
    (_k, _s DECIMAL(38,12), _c BIGINT) rows — term index, exact
    decimal sum of that term over the rows, row count. Term layout:
    _k < dim are the plain Σx_i sums; the rest are the upper-triangle
    Σx_i·x_j sums in (i, j>=i) order. Because decimal sums and counts
    are ASSOCIATIVE AND COMMUTATIVE, these rows are the natural
    incremental state: per-batch outputs merge by (_k) summation into
    exactly the one-shot result — the streaming covariance ingest
    (streaming/covstream.py) appends one such 2144-row block per
    trigger.

    Shape: one wide row of d + d(d+1)/2 decimal sums WITHOUT d^2
    aggregate expressions — a 2000+-expression decimal aggregate OOMs
    codegen on a default-heap session (DecimalAddNoOverflowCheck code
    explodes; measured: 5.7 MB task binary, executor OOM at 1g).
    Instead the per-row terms come from ONE zip_with over two literal
    index arrays (a runtime loop over the 2144 elements, constant-size
    codegen), posexplode to (term_idx, term) rows, and a
    groupBy(term_idx) decimal sum — 2144 keys, map-side combined, so
    the shuffle is O(partitions * d^2/2) tiny rows and the per-task
    work is the same O(n * d^2) multiply-adds the wide agg would do.
    j = -1 encodes the plain Σx_i terms."""
    vec = F.col(vec_col)
    pairs: list[tuple[int, int]] = [(i, -1) for i in range(dim)]
    pairs += [(i, j) for i in range(dim) for j in range(i, dim)]
    ii = F.lit([p[0] for p in pairs])
    jj = F.lit([p[1] for p in pairs])

    def elem(k):
        return F.element_at(vec, (k + 1).cast("int")).cast("double")

    terms = F.zip_with(
        ii,
        jj,
        lambda i, j: F.when(j >= 0, elem(i) * elem(j))
        .otherwise(elem(i))
        .cast("decimal(28,12)"),
    )
    # posexplode_OUTER + null filter: a plain explode makes
    # InferFiltersFromGenerate push a size()>0 probe of the whole
    # terms pipeline into the scan (the round-8 DSIR hazard)
    rows = (
        df.filter(vec.isNotNull())
        .select(F.posexplode_outer(terms).alias("_k", "_t"))
        .filter(F.col("_k").isNotNull())
    )
    return rows.groupBy("_k").agg(
        F.sum("_t").alias("_s"), F.count(F.lit(1)).alias("_c")
    )


def pca_fit_from_sums(
    sums: dict[int, object],
    n: int,
    dim: int = 64,
    n_components: int = 2,
    iters: int = 10,
) -> tuple[list[float], list[list[float]], list[float], int]:
    """Driver-side fit from the collected term sums (``cov_term_sums``
    layout): assemble mu/cov, run the derandomized power iterations.
    Shared by the batch fit and the streaming-index fit — both produce
    bit-identical models for the same ingested multiset."""
    # float(Decimal) is the correctly-rounded cast — identical to both
    # engines' CAST(dec AS DOUBLE) while the scaled mantissa < 2^53
    mu = [_rnd(float(sums[i]) / n, 6) for i in range(dim)]
    cov = [[0.0] * dim for _ in range(dim)]
    k = dim
    for i in range(dim):
        for j in range(i, dim):
            c = _rnd(float(sums[k]) / n - mu[i] * mu[j], 6)
            cov[i][j] = c
            cov[j][i] = c
            k += 1

    def matvec(m: list[list[float]], v: list[float]) -> list[float]:
        out = []
        for i in range(dim):
            acc = m[i][0] * v[0]
            for j in range(1, dim):
                acc += m[i][j] * v[j]  # left-to-right, matches the
                # twin's unrolled left-assoc + chain
            out.append(_rnd(acc, 9))
        return out

    def dot(a: list[float], b: list[float]) -> float:
        acc = a[0] * b[0]
        for i in range(1, dim):
            acc += a[i] * b[i]
        return acc

    comps: list[list[float]] = []
    lams: list[float] = []
    c_mat = cov
    v0 = _rnd(1.0 / math.sqrt(dim), 9)
    for _ in range(n_components):
        v = [v0] * dim
        for _t in range(iters):
            w = matvec(c_mat, v)
            norm2 = dot(w, w)
            if norm2 == 0.0:
                break  # degenerate (all-constant dims): keep v as-is
            s = math.sqrt(norm2)
            v = [_rnd(wi / s, 9) for wi in w]
        w = matvec(c_mat, v)
        lam = _rnd(dot(v, w), 9)
        comps.append(v)
        lams.append(lam)
        # deflate: left-assoc lam * v_i * v_j, one subtraction, round
        c_mat = [
            [_rnd(c_mat[i][j] - lam * v[i] * v[j], 9) for j in range(dim)]
            for i in range(dim)
        ]
    return mu, comps, lams, n


def pca_project(
    df: DataFrame,
    mu: list[float],
    comps: list[list[float]],
    vec_col: str = "embedding",
    out_prefix: str = "pc",
) -> DataFrame:
    """Map-only projection onto the fitted components: round 6 scores,
    sequential double fold (F.aggregate) over one zip_with per
    component, model arrays as single Literals."""
    centered = F.zip_with(
        F.col(vec_col),
        F.lit([float(m) for m in mu]),
        lambda xv, mv: xv.cast("double") - mv,
    )
    out = df
    for k, comp in enumerate(comps, start=1):
        terms = F.zip_with(
            centered,
            F.lit([float(w) for w in comp]),
            lambda cv, wv: cv * wv,
        )
        score = F.aggregate(
            terms, F.lit(0.0), lambda acc, t: acc + t
        )
        out = out.withColumn(f"{out_prefix}{k}", F.round(score, 6))
    return out


def pca_fit_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_components: int = 2,
    iters: int = 10,
) -> DataFrame:
    """Fit + project in one call; output (id_col, pc1..pcm)."""
    mu, comps, _lams, _n = pca_power_fit(
        df, vec_col=vec_col, dim=dim, n_components=n_components,
        iters=iters,
    )
    proj = pca_project(df, mu, comps, vec_col=vec_col)
    return proj.select(
        id_col, *[f"pc{k}" for k in range(1, n_components + 1)]
    )
