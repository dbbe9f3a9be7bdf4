"""Scale-up measurement: cosine near-dup pair generation on blowups of
the sf0.1 embeddings table — broadcast blocked matmul vs shuffle-tiled
block pairs (the no-driver-collect form).

Each blowup factor-f unions f variants of the corpus; ids are offset
per variant and every dimension is jittered by a deterministic
per-(id, variant, dim) epsilon so variants are near- (cos ~0.999) but
not exact-dups. Output volume is inherently quadratic in duplication
factor (variant families are cosine quasi-cliques); the number to watch
is wall-clock vs vectors², and that tiled stays within ~2x of the
broadcast path while never materializing the corpus on the driver.

Usage: python tools/scale_neardup.py [factors ...]   (default 1 8)
Prints one line per (factor, variant): vectors, pairs, seconds.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tweetaggregates_spark.operators import similarity
from tweetaggregates_spark.session import get_spark
from tweetaggregates_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def blowup(emb, factor: int):
    parts = []
    for v in range(factor):
        jitter = F.transform(
            F.col("embedding"),
            # deterministic +-0.005 per (id, variant, dim): near-dup,
            # not exact (cosine is scale-invariant, so jitter must be
            # per-dimension, not a whole-vector scale)
            lambda x, i: x
            + 0.005
            * F.when(
                F.pmod(F.hash(F.col("vec_id"), F.lit(v), i), 2) == 0, 1.0
            ).otherwise(-1.0),
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + 1_000_000 * v).alias("vec_id"),
                jitter.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def main() -> int:
    factors = [int(a) for a in sys.argv[1:]] or [1, 8]
    spark = get_spark("scale-neardup")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    for f in factors:
        corpus = blowup(base, f).persist()
        n = corpus.count()
        n_blocks = max(4, min(24, (n // 4000) + 4))
        for name, fn in (
            ("blocked", lambda d: similarity.cosine_near_dup_pairs_blocked(d, threshold=0.4)),
            (
                "tiled",
                lambda d: similarity.cosine_near_dup_pairs_tiled(
                    d, threshold=0.4, n_blocks=n_blocks
                ),
            ),
        ):
            t0 = time.perf_counter()
            n_pairs = fn(corpus).count()
            dt = time.perf_counter() - t0
            print(
                f"factor={f} variant={name} vectors={n} pairs={n_pairs} "
                f"sec={dt:.1f}",
                flush=True,
            )
        corpus.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
