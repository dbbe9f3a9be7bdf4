"""Round-9 scale-up measurements (best of 2, noop sinks) at
sf0.01 / sf0.1 / sf1 → per-decade exponents:

1. `pca`      — deterministic power-iteration PCA fit + projection
   (one covariance pass with a 2144-key decimal hash-agg, O(d^2)
   driver solve, map-only projection; should track the scan).
2. `linededup` — corpus line dedup over the boilerplate-augmented
   docs (explode → count-by-hash → AQE-skew join → reassemble).
3. `unimax`   — UniMax budget allocation (one corpus aggregate +
   model-sized windows; should be scan-bound).
4. `rank`     — grouped_partitioned_rank over events after the
   round-9 two-consumer checkpoint fix (the KLL build core).

Usage: python tools/scale_r9.py [pca|linededup|unimax|rank ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tweetaggregates_spark.session import get_spark
from tweetaggregates_spark.sources.tables import load_table

SFS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/testdata_sf1"),
]


def _exponents(label: str, r: dict[str, float]) -> None:
    e1 = math.log10(r["sf0.1"] / r["sf0.01"])
    e2 = math.log10(r["sf1"] / r["sf0.1"])
    print(
        f"{label:36s} "
        + "  ".join(f"{sf}:{r[sf]:7.2f}s" for sf, _ in SFS)
        + f"   0.01->0.1: {e1:+.2f}   0.1->1: {e2:+.2f}"
    )


def _noop_best2(build) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        build().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def run_pca(spark) -> None:
    from tweetaggregates_spark.plans.llm import pca_embeddings

    r = {}
    for sf, d in SFS:
        r[sf] = _noop_best2(lambda: pca_embeddings(spark, d))
    _exponents("pca fit + project", r)


def run_linededup(spark) -> None:
    from tweetaggregates_spark.plans.llm import line_dedup_docs

    r = {}
    for sf, d in SFS:
        r[sf] = _noop_best2(lambda: line_dedup_docs(spark, d))
    _exponents("line_dedup (corpus boilerplate)", r)


def run_unimax(spark) -> None:
    from tweetaggregates_spark.plans.llm import unimax_mixture_docs

    r = {}
    for sf, d in SFS:
        r[sf] = _noop_best2(lambda: unimax_mixture_docs(spark, d))
    _exponents("unimax_plan", r)


def run_rank(spark) -> None:
    from tweetaggregates_spark.functions.hashing import hash64
    from tweetaggregates_spark.operators.prefix import (
        grouped_partitioned_rank,
    )

    r = {}
    for sf, d in SFS:
        ev = load_table(spark, d, "events").select(
            F.window("ts", "1 day")["end"].alias("window_time"),
            "event_id",
            "value",
        ).withColumn("_h", hash64(F.col("event_id").cast("string")))
        r[sf] = _noop_best2(
            lambda: grouped_partitioned_rank(
                ev, ["window_time"], "value", ["_h"],
                ascending=True, rank_name="_p", count_name="_n",
            )
        )
    _exponents("grouped_partitioned_rank (events)", r)


if __name__ == "__main__":
    which = sys.argv[1:] or ["pca", "linededup", "unimax", "rank"]
    spark = get_spark()
    for name in which:
        {
            "pca": run_pca,
            "linededup": run_linededup,
            "unimax": run_unimax,
            "rank": run_rank,
        }[name](spark)
