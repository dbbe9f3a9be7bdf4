"""Round-4 scale-up measurement: time the new operators at sf0.01 /
sf0.1 / sf1 (best of 2, noop sink) and print per-decade wall-clock
exponents. sf1 comes from tools/make_sf1.py (testdata_sf1).

Usage: python tools/scale_r4.py [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from tweetaggregates_spark.session import get_spark

DEFAULT = [
    "substring_dup_docs",
    "kmeans_clusters_embeddings",
    "semantic_dup_embeddings",
    "knn_pq_embeddings",
    "conversion_funnel",
    "running_total_counts",
    "lm_quality_docs",
    "simhash_pairs_banded",  # round-4 production width (32-bit)
]

SFS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/testdata_sf1"),
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("scale-r4")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf, sf_dir in SFS:
        for name in names:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            results[name][sf] = best
            print(f"{sf} {name} {best:.3f}s", flush=True)
    print("\nper-decade exponents (t ~ n^e):")
    for name in names:
        r = results[name]
        e1 = math.log10(r["sf0.1"] / r["sf0.01"])
        e2 = math.log10(r["sf1"] / r["sf0.1"])
        print(f"{name:32s} 0.01->0.1: {e1:+.2f}   0.1->1: {e2:+.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
