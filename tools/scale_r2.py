"""Reproduce the round-2 scale-up measurements in SCALE.md: time the
round-2 query families at sf0.001 / sf0.01 / sf0.1 (best of 2, noop
sink — full computation, no driver collect).

Usage: python tools/scale_r2.py [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from tweetaggregates_spark.session import get_spark

DEFAULT = [
    "knn_cosine_quantized",
    "value_bucket_histogram",
    "rolling_user_value_avg",
    "repeated_ngrams_docs",
    "user_event_gaps",
    "curation_funnel_docs",
    "chunk_docs",
    "events_profile",
]

SFS = ["sf0.001", "sf0.01", "sf0.1"]


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("scale-r2")
    qs = entry_mod.queries()
    for sf in SFS:
        sf_dir = f"/root/testdata/{sf}"
        for name in names:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            print(f"{sf} {name} {best:.3f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
