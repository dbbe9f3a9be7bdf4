"""Hashed logistic-regression quality classifier (round 9) — the
model-based document filter of the GPT-3 / PaLM curation recipe
(public: Brown et al. 2020 Appendix A trains a classifier to separate
a reference corpus from raw CommonCrawl and keeps documents by its
score; fastText-style hashed bag-of-n-gram features, Joulin et al.
2016).

Training is FULL-BATCH gradient descent for a FIXED iteration count —
the repo's derandomization convention (k-means / k-center / KLL / PCA
precedents), so the fitted weights are a pure function of the input
and a DuckDB twin replays the training exactly.

Determinism contract:

* Features: unigram + word-bigram hashed into ``n_buckets`` with the
  portable md5 ``hash64`` (the DSIR convention), plus a constant BIAS
  feature at index ``n_buckets`` appended once per doc.
* Margin z: per-doc fold of the weight literal over the doc's feature
  OCCURRENCES in DECIMAL(18,6)/DECIMAL(38,6) — exact and order-free
  (weights are 6 dp values, and a 6 dp-rounded double casts back to
  DECIMAL(·,6) identically in both engines: it sits ~5e-17 from the
  decimal value, nowhere near a rounding boundary).
* Sigmoid: round(1/(1+exp(-z)), 9). JVM and libm exp() disagree by
  1 ulp on ~10% of inputs (measured), i.e. |Δσ| <= ~1e-16; the 9 dp
  round absorbs it with P(boundary) ≈ 2e-7 per value — the accepted
  absorption class (SCALE.md round-9 calibration notes).
* Gradient: g_b = Σ over occurrences of (σ_d - y_d), summed in
  DECIMAL(28,12) (cast drift ±1e-12/term absorbed by the 6 dp weight
  round); update w_b ← round(w_b - lr * g_b / n, 6) on the driver.
* Scores: round(sigmoid(z), 6), map-only with the weights as ONE
  array Literal.

Plan shape at 100 TB: each GD iteration is one corpus pass — a
map-only margin/σ projection and ONE (n_buckets+1)-key decimal
hash-aggregate (map-side combined, tiny shuffle), then an O(B) driver
update; scoring is map-only. ``iters`` passes total. A production
variant would mini-batch on a sample; full-batch keeps the twin
replayable and the pass count explicit.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tweetaggregates_spark.functions.hashing import hash64
from tweetaggregates_spark.functions.textstats import tokens, word_shingles
from tweetaggregates_spark.operators.pca import _rnd

__all__ = [
    "feature_buckets",
    "logreg_quality_scores",
    "logreg_quality_train",
    "logreg_quality_train_local",
]


def feature_buckets(
    frame: DataFrame, text_col: str = "text", n_buckets: int = 256
) -> DataFrame:
    """Hashed uni+bigram feature-bucket array ``_fb`` (the DSIR
    feature map, with the NULL-text coalesce), plus the constant bias
    feature at index ``n_buckets`` appended once per doc."""
    toks = tokens(F.col(text_col))
    feats = F.coalesce(
        F.concat(toks, word_shingles(toks, 2)),
        F.array().cast("array<string>"),
    )
    fb = F.transform(
        feats, lambda t: F.pmod(hash64(t), F.lit(n_buckets)).cast("int")
    )
    return frame.withColumn(
        "_fb", F.concat(fb, F.array(F.lit(n_buckets).cast("int")))
    )


def _margin(w: list[float]):
    """LENGTH-NORMALIZED margin (the fastText convention — raw counts
    make z scale with document length, saturating every sigmoid one
    way; measured on this corpus before normalizing): z =
    (Σ_occurrences w[b]) / |features|. The sum is an exact decimal
    fold of the weight literal (order-free); the single division by
    the integer feature count happens once, in double."""
    arr = F.lit([float(x) for x in w])
    zero = F.lit(0).cast("decimal(38,6)")
    z = F.aggregate(
        F.col("_fb"),
        zero,
        lambda acc, b: (
            acc + F.element_at(arr, b + 1).cast("decimal(18,6)")
        ).cast("decimal(38,6)"),
    )
    return z.cast("double") / F.size("_fb")


def _sigma(z):
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9)


def logreg_quality_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 256,
    iters: int = 3,
    lr: float = 0.5,
) -> list[float]:
    """Train by ``iters`` full-batch GD steps from w = 0; returns the
    n_buckets+1 weights (bias last) as 6 dp doubles. ``label_col``
    must be 0/1 (1 = reference/quality)."""
    fb = feature_buckets(df, text_col, n_buckets).select(
        F.col(label_col).cast("double").alias("_y"), "_fb"
    )
    # the feature map is consumed once per iteration; materialize it
    # (lazy) so the tokenize+hash pipeline runs once, not ``iters``
    # times (the round-9 two-consumer rule)
    fb = fb.localCheckpoint(eager=False)
    w = [0.0] * (n_buckets + 1)
    n = None
    for _ in range(iters):
        # per-occurrence gradient contribution is the normalized
        # (sigma - y) / |features| — the derivative of the normalized
        # margin wrt w_b counts each occurrence at 1/len
        resid = (
            (_sigma(_margin(w)) - F.col("_y")) / F.size("_fb")
        ).alias("_r")
        g = (
            fb.select(resid, "_fb")
            .select(
                F.col("_r"),
                F.explode_outer("_fb").alias("_b"),
            )
            .filter(F.col("_b").isNotNull())
            .groupBy("_b")
            .agg(
                F.sum(F.col("_r").cast("decimal(28,12)")).alias("_g"),
            )
            .collect()
        )
        if n is None:
            n = fb.count()
            if n == 0:
                raise ValueError("logreg_quality_train: empty input")
        grad = {r["_b"]: float(r["_g"]) for r in g}
        w = [
            _rnd(w[b] - lr * grad.get(b, 0.0) / n, 6)
            for b in range(n_buckets + 1)
        ]
    return w


def logreg_quality_train_local(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 256,
    iters: int = 3,
    lr: float = 0.5,
    max_rows: int = 200_000,
) -> list[float]:
    """Driver-side trainer for a BOUNDED training set — the production
    shape (Brown et al. 2020 App. A / fastText: the classifier's
    training set is a fixed-size reference sample regardless of corpus
    size, and a 257-weight model trains on one node; only SCORING is
    corpus-sized and distributed). One Spark job collects the sample's
    feature buckets (O(sample), guarded by ``max_rows`` — exceeding it
    is a caller error, not a silent driver OOM), then the ``iters`` GD
    steps run locally with ZERO per-iteration Spark jobs — vs
    ``logreg_quality_train``'s one corpus pass per step.

    Bit-identical to ``logreg_quality_train`` on the same input (pinned
    in tests/test_r10_ops.py): every decimal step is replayed exactly —
    6 dp weights sum as integer MICROS (exact, and int/1e6 is the same
    correctly-rounded double DECIMAL(38,6)->DOUBLE produces), the 9 dp
    sigmoid round is the shared HALF_UP-on-shortest-repr rule (libm vs
    JVM exp 1-ulp noise absorbed, the accepted class), per-occurrence
    residuals quantize to 12 dp and sum as integer PICOS (exact, the
    DECIMAL(28,12) sum), and the weight update reuses ``_rnd``."""
    rows = (
        feature_buckets(df, text_col, n_buckets)
        .select(F.col(label_col).cast("double").alias("_y"), "_fb")
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"logreg_quality_train_local: training set has {len(rows)} "
            f"rows > max_rows={max_rows}; cap the sample (hash bottom-k) "
            "or use the distributed logreg_quality_train"
        )
    if not rows:
        raise ValueError("logreg_quality_train_local: empty input")
    n = len(rows)
    docs = [(float(r["_y"]), list(r["_fb"])) for r in rows]
    q6 = Decimal(1).scaleb(-6)
    q9 = Decimal(1).scaleb(-9)
    q12 = Decimal(1).scaleb(-12)
    from decimal import ROUND_HALF_UP
    from math import exp

    w = [0.0] * (n_buckets + 1)
    for _ in range(iters):
        # weights as exact integer micros (the DECIMAL(18,6) cast of a
        # 6 dp-rounded double is that decimal exactly — shortest repr)
        wi = [
            int(
                Decimal(repr(x)).quantize(q6, ROUND_HALF_UP).scaleb(6)
            )
            for x in w
        ]
        grad = [0] * (n_buckets + 1)  # integer picos — exact decimal sum
        for y, fb in docs:
            flen = len(fb)
            z = sum(wi[b] for b in fb) / 1e6 / flen
            sig = float(
                Decimal(repr(1.0 / (1.0 + exp(-z)))).quantize(
                    q9, ROUND_HALF_UP
                )
            )
            r = (sig - y) / flen
            rq = int(
                Decimal(repr(r)).quantize(q12, ROUND_HALF_UP).scaleb(12)
            )
            for b in fb:
                grad[b] += rq
        # float(Decimal) is correctly rounded for ANY magnitude; a bare
        # grad[b]/1e12 would double-round once the pico sum passes 2^53
        w = [
            _rnd(
                w[b] - lr * float(Decimal(grad[b]).scaleb(-12)) / n, 6
            )
            for b in range(n_buckets + 1)
        ]
    return w


def logreg_quality_scores(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    n_buckets: int = 256,
    threshold: float = 0.5,
) -> DataFrame:
    """Map-only scoring: quality_prob = round(sigmoid(w·f), 6) and the
    keep verdict at ``threshold``. Weights ship as one array
    Literal."""
    fb = feature_buckets(df, text_col, n_buckets)
    score = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(weights))), 6
    )
    return (
        fb.withColumn("quality_prob", score)
        .withColumn("clf_keep", F.col("quality_prob") >= F.lit(threshold))
        .drop("_fb")
    )
